"""Banded-SW extension as a Pallas TPU kernel.

Same contract as kernels/sw.py:sw_extend_batch (the XLA reference
implementation, which remains the semantic pin), re-expressed for
Mosaic's constraint set:

- the whole row loop runs inside one kernel invocation (no per-row XLA
  loop overhead), with H/E rows in VMEM scratch;
- lanes are processed in grid blocks of ``BL`` reads; each block's row
  loop exits as soon as *its own* lanes terminate — the slowest read in
  the batch no longer stalls every other read (the XLA version's
  while_loop is batch-global);
- no gathers: the 5x5 score matrix becomes arithmetic
  (match/mismatch/ambiguous), per-lane column reads become
  select-reduces over a lane iota, and the F prefix scan becomes
  log2(W) shift-max steps (Mosaic has no cummax).

Numerical semantics (scores, end coordinates, tie-breaks, Z-drop,
adaptive band) must match the XLA kernel exactly
(tests/test_sw_pallas.py pins them in interpret mode; the TPU-compiled
path is exercised by the benchmark harness).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -(1 << 30)  # plain int: a jnp scalar here would be captured as a
                  # traced constant, which pallas_call rejects


def _shift_right(x, sh, fill):
    pad = jnp.full(x.shape[:-1] + (sh,), fill, x.dtype)
    return jnp.concatenate([pad, x[..., :-sh]], axis=-1)


def _prefix_max(x):
    """Inclusive prefix max along the last axis via log2 shift steps."""
    n = x.shape[-1]
    sh = 1
    while sh < n:
        x = jnp.maximum(x, _shift_right(x, sh, NEG))
        sh <<= 1
    return x


def _sw_kernel(
    a_s, b_s, odel_s, edel_s, oins_s, eins_s, bonus_s, zdrop_s,
    q_ref, qlen_ref, t_ref, tlen_ref, w_ref, h0_ref,
    out_ref, h_scr, e_scr,
):
    BL, WQ = q_ref.shape
    a = a_s[0]
    b = b_s[0]
    o_del, e_del = odel_s[0], edel_s[0]
    o_ins, e_ins = oins_s[0], eins_s[0]
    end_bonus, zdrop = bonus_s[0], zdrop_s[0]
    oe_del = o_del + e_del
    oe_ins = o_ins + e_ins
    jj = jax.lax.broadcasted_iota(jnp.int32, (BL, WQ), 1)

    qv = q_ref[:]                               # (BL, WQ)
    qlen = qlen_ref[:, 0]
    tlen = tlen_ref[:, 0]
    h0 = h0_ref[:, 0]
    max_sc = jnp.maximum(a, 1)
    fi = lambda x: x.astype(jnp.float32)
    max_ins = (fi(qlen * max_sc + end_bonus - o_ins) / fi(e_ins) + 1.0).astype(jnp.int32)
    max_del = (fi(qlen * max_sc + end_bonus - o_del) / fi(e_del) + 1.0).astype(jnp.int32)
    w = jnp.minimum(w_ref[:, 0], jnp.maximum(max_ins, 1))
    w = jnp.minimum(w, jnp.maximum(max_del, 1))

    h_first = jnp.where(jj == 0, h0[:, None], h0[:, None] - oe_ins - e_ins * (jj - 1))
    h_init = jnp.where((h_first > 0) & (jj < qlen[:, None] + 1), h_first, 0)
    h_scr[:] = h_init
    e_scr[:] = jnp.zeros((BL, WQ), jnp.int32)

    def cond(st):
        return jnp.any(st["active"] > 0)

    def body(st):
        i = st["i"]
        active = st["active"] > 0  # carried as int32: Mosaic while loops
                                   # cannot carry i1 vectors
        beg = jnp.maximum(st["beg"], i - w)
        end = jnp.minimum(jnp.minimum(st["end"], i + w + 1), qlen)
        in_band = (jj >= beg[:, None]) & (jj < end[:, None])

        # per-lane target base for this row (select-reduce, no gather)
        ii = jnp.clip(i, 0, t_ref.shape[1] - 1)
        tb_col = jnp.max(
            jnp.where(
                jax.lax.broadcasted_iota(jnp.int32, t_ref.shape, 1)
                == ii[:, None],
                t_ref[:], 0,
            ),
            axis=1,
        )
        # arithmetic score row: match a, mismatch -b, any ambiguous -1
        amb = (qv > 3) | (tb_col[:, None] > 3)
        srow = jnp.where(amb, -1, jnp.where(qv == tb_col[:, None], a, -b))

        h_prev = h_scr[:]
        e_row = e_scr[:]
        h1_bound = jnp.where(beg == 0, jnp.maximum(h0 - (o_del + e_del * (i + 1)), 0), 0)

        M = jnp.where(h_prev != 0, h_prev + srow, 0)
        M = jnp.where(in_band, M, 0)
        e_cur = jnp.where(in_band, e_row, 0)

        t_ins = jnp.maximum(M - oe_ins, 0)
        scan_in = jnp.where(in_band, t_ins + e_ins * jj, NEG)
        run = _prefix_max(scan_in)
        g = run - e_ins * jj
        f = jnp.maximum(_shift_right(g, 1, NEG), 0)

        hrow = jnp.maximum(jnp.maximum(M, e_cur), f)
        hrow = jnp.where(in_band, hrow, 0)
        t_del = jnp.maximum(M - oe_del, 0)
        e_next = jnp.where(in_band, jnp.maximum(e_cur - e_del, t_del), 0)

        hmask = jnp.where(in_band, hrow, -1)
        m_best = jnp.maximum(jnp.max(hmask, axis=1), 0)
        # argmax with ties to the LARGEST j
        mj = jnp.max(jnp.where(hmask == m_best[:, None], jj, -1), axis=1)
        mj = jnp.where(m_best > 0, mj, -1)

        h_endm1 = jnp.max(jnp.where(jj == (end - 1)[:, None], hrow, NEG), axis=1)
        h_endm1 = jnp.where(end > beg, h_endm1, h1_bound)

        hrow_shift = _shift_right(hrow, 1, 0)
        new_h = jnp.where(jj == beg[:, None], h1_bound[:, None], hrow_shift)
        new_h = jnp.where((jj >= beg[:, None]) & (jj <= end[:, None]), new_h, 0)

        reach = end == qlen
        better_g = reach & (st["gscore"] <= h_endm1)
        gscore = jnp.where(active & better_g, h_endm1, st["gscore"])
        max_ie = jnp.where(active & better_g, i, st["max_ie"])

        break_zero = m_best == 0
        improved = m_best > st["max"]
        new_max = jnp.where(improved, m_best, st["max"])
        new_max_i = jnp.where(improved, i, st["max_i"])
        new_max_j = jnp.where(improved, mj, st["max_j"])
        off = jnp.abs(mj - i)
        new_moff = jnp.where(improved, jnp.maximum(st["max_off"], off), st["max_off"])
        di = i - st["max_i"]
        dj = mj - st["max_j"]
        zd1 = st["max"] - m_best - (di - dj) * e_del > zdrop
        zd2 = st["max"] - m_best - (dj - di) * e_ins > zdrop
        # no jnp.where on two bool vectors (Mosaic rejects i1 selects)
        big = di > dj
        break_z = (~improved) & (zdrop > 0) & ((big & zd1) | (~big & zd2))

        live = (new_h != 0) | (e_next != 0)
        live &= (jj >= beg[:, None]) & (jj <= end[:, None])
        any_live = jnp.any(live, axis=1)
        first_live = jnp.min(jnp.where(live, jj, WQ), axis=1)
        last_live = jnp.max(jnp.where(live, jj, -1), axis=1)
        new_beg = jnp.where(any_live, first_live, end)
        new_end = jnp.where(any_live, jnp.minimum(last_live + 2, qlen),
                            jnp.minimum(beg + 1, qlen))

        next_i = i + 1
        terminated = break_zero | break_z | (next_i >= tlen)

        am = active[:, None]
        h_scr[:] = jnp.where(am, new_h, h_prev)
        e_scr[:] = jnp.where(am, e_next, e_row)
        upds = lambda new, old: jnp.where(active, new, old)
        return dict(
            i=upds(next_i, st["i"]), beg=upds(new_beg, st["beg"]),
            end=upds(new_end, st["end"]), max=upds(new_max, st["max"]),
            max_i=upds(new_max_i, st["max_i"]), max_j=upds(new_max_j, st["max_j"]),
            max_ie=max_ie, gscore=gscore,
            max_off=upds(new_moff, st["max_off"]),
            active=(active & ~terminated).astype(jnp.int32),
        )

    z = jnp.zeros((BL,), jnp.int32)
    st = jax.lax.while_loop(cond, body, dict(
        i=z, beg=z, end=qlen.astype(jnp.int32), max=h0.astype(jnp.int32),
        max_i=z - 1, max_j=z - 1, max_ie=z - 1, gscore=z - 1,
        max_off=z, active=((tlen > 0) & (qlen > 0)).astype(jnp.int32),
    ))
    out = jnp.stack(
        [st["max"], st["max_j"] + 1, st["max_i"] + 1, st["max_ie"] + 1,
         st["gscore"], st["max_off"], z, z], axis=1,
    )
    out_ref[:] = out


@functools.partial(
    jax.jit,
    static_argnames=("max_qlen", "block_lanes", "interpret",
                     "o_del", "e_del", "o_ins", "e_ins",
                     "end_bonus", "zdrop", "match_score", "mismatch_penalty"),
)
def sw_extend_batch_pallas(
    query, qlen, target, tlen, w0, h0,
    match_score: int, mismatch_penalty: int,
    o_del: int, e_del: int, o_ins: int, e_ins: int,
    end_bonus: int, zdrop: int,
    max_qlen: int, block_lanes: int = 64, interpret: bool = False,
):
    """Pallas twin of sw_extend_batch (match/mismatch scoring form).
    Returns the same dict of int32[B] arrays."""
    B = query.shape[0]
    WT = target.shape[1]
    BL = block_lanes
    n_blocks = (B + BL - 1) // BL
    pad = n_blocks * BL - B
    if pad:
        pad2 = lambda x, v: jnp.concatenate(
            [x, jnp.full((pad,) + x.shape[1:], v, x.dtype)]
        )
        query = pad2(query, 4)
        target = pad2(target, 4)
        qlen = pad2(qlen, 0)
        tlen = pad2(tlen, 0)
        w0 = pad2(w0, 1)
        h0 = pad2(h0, 0)
    col = lambda x: x[:, None].astype(jnp.int32)
    scal = lambda v: jnp.asarray([v], jnp.int32)

    grid = (n_blocks,)
    bspec = lambda wdt: pl.BlockSpec((BL, wdt), lambda i: (i, 0),
                                     memory_space=pltpu.VMEM)
    # the kernel is int32 throughout and all operands are cast above;
    # under jax x64 (int64-rank indexes) weak-typed literals inside the
    # kernel would otherwise become int64, which Mosaic cannot lower
    # (convert_element_type recursion) — trace the kernel with x64 off
    import contextlib

    x32 = (jax.enable_x64(False) if jax.config.jax_enable_x64
           else contextlib.nullcontext())
    with x32:
        out = _call_sw(grid, bspec, BL, WT, max_qlen, n_blocks, interpret)(
            scal(match_score), scal(mismatch_penalty), scal(o_del),
            scal(e_del), scal(o_ins), scal(e_ins), scal(end_bonus),
            scal(zdrop),
            query.astype(jnp.int32), col(qlen), target.astype(jnp.int32),
            col(tlen), col(w0), col(h0),
        )
    out = out[:B]
    return dict(
        score=out[:, 0], qle=out[:, 1], tle=out[:, 2], gtle=out[:, 3],
        gscore=out[:, 4], max_off=out[:, 5],
    )


def _call_sw(grid, bspec, BL, WT, max_qlen, n_blocks, interpret):
    return pl.pallas_call(
        _sw_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 8 + [
            bspec(max_qlen), bspec(1), bspec(WT), bspec(1), bspec(1), bspec(1),
        ],
        out_specs=pl.BlockSpec((BL, 8), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_blocks * BL, 8), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((BL, max_qlen), jnp.int32),
            pltpu.VMEM((BL, max_qlen), jnp.int32),
        ],
        interpret=interpret,
    )
