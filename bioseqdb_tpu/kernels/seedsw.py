"""Batched windowed seed re-scoring for long queries (device).

The device counterpart of the oracle's ``flt_chained_seeds`` /
``mem_seed_sw`` (cpu/oracle.py:661-690 — bwa's mem_flt_chained_seeds,
which the reference reaches through mem_align1 at bwa.cpp:149): for
queries long enough that chain weights stop being selective
(~>= 900 bp at defaults), every short seed (< 200 bp) is re-scored with
a local affine-gap Smith-Waterman over a +-50-base window and dropped
below the min-HSP score.

Round 2 routed every such read wholesale to the scalar host oracle;
this stage closes the gap on device: windows are fixed 200-wide lanes
(one barrel-shift query extract + one packed-text row fetch per seed),
and the DP is the lazy-F prefix-max local SW vectorized over all B*S
seed lanes at once — 200 fori rows of pure vector work, no Pallas
needed (the stage runs once per batch, not per loop iteration).

Statically absent for short-read batches: ``possibly_active`` is False
whenever no read of the batch width can trigger the filter, so the
short-read pipeline's program is unchanged.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from bioseqdb_tpu.kernels import dense
from bioseqdb_tpu.kernels import fm as kfm

# oracle constants (cpu/oracle.py:582-586 — bwa macros)
MEM_SHORT_EXT = 50
MEM_SHORT_LEN = 200
MEM_HSP_COEF = 1.1
MEM_MINSC_COEF = 5.5
MEM_SEEDSW_COEF = 0.05

_W = MEM_SHORT_LEN  # window lane width (q and t segments are < 200)


def possibly_active(min_chain_weight: int, max_read_len: int) -> bool:
    """Whether ANY read of width <= max_read_len can trigger the filter
    (the static gate: short-read batches never trace this stage).
    Mirrors seed_sw_filter_active's guard; both sides of the inequality
    are monotone in l, so the batch-width check is exact."""
    l = max_read_len
    if l <= 0:
        return False
    min_l = (MEM_HSP_COEF * min_chain_weight if min_chain_weight
             else MEM_MINSC_COEF * math.log(l))
    return min_l <= MEM_SEEDSW_COEF * l


def _local_sw_batch(q, qlen, t, tlen, match_score, mismatch_penalty,
                    o_del, e_del, o_ins, e_ins):
    """Best local SW score per lane (N, _W) x (N, _W) — the vectorized
    form of cpu/oracle.py local_sw_score (lazy-F prefix-max rows).

    Codes >= 4 score -1 against everything (fill_scmat's N row/col), and
    padding can only lower a local alignment, so no q-side masking is
    needed; t rows past ``tlen`` are skipped."""
    N = q.shape[0]
    i32 = jnp.int32
    oe_del, oe_ins = o_del + e_del, o_ins + e_ins
    jj = jnp.arange(_W, dtype=i32)[None, :]
    NEG = -(1 << 28)  # plain int (jit-safe as a pad constant)

    def srow_of(ti):
        both_ok = (ti[:, None] < 4) & (q < 4)
        return jnp.where(
            both_ok & (ti[:, None] == q), match_score,
            jnp.where(both_ok, -mismatch_penalty, -1)).astype(i32)

    def body(i, carry):
        H, E, best = carry
        ti = dense.pick(t, jnp.full(N, i, i32), axis=1)
        srow = srow_of(ti)
        diag = jnp.pad(H[:, :-1], ((0, 0), (1, 0))) + srow
        E = jnp.maximum(E - e_del, H - oe_del)
        hne = jnp.maximum(jnp.maximum(diag, E), 0)
        opener = jax.lax.cummax(hne - oe_ins + e_ins * jj, axis=1)
        F = jnp.pad(opener[:, :-1], ((0, 0), (1, 0)),
                    constant_values=NEG) - e_ins * jj
        Hn = jnp.maximum(hne, F)
        ok = (i < tlen)[:, None]
        H = jnp.where(ok, Hn, H)
        E = jnp.where(ok, E, 0)
        best = jnp.maximum(best, jnp.where(ok[:, 0], Hn.max(axis=1), 0))
        return H, E, best

    H0 = jnp.zeros((N, _W), i32)
    _, _, best = jax.lax.fori_loop(
        0, _W, body, (H0, jnp.zeros((N, _W), i32), jnp.zeros(N, i32)))
    return best


def seed_sw_filter(fm: kfm.FMDevice, pac_rows, codes, lens, seeds,
                   match_score: int, mismatch_penalty: int,
                   o_del: int, e_del: int, o_ins: int, e_ins: int,
                   min_chain_weight: int):
    """Re-score short seeds of long reads and drop sub-HSP ones.

    Returns the seeds dict with ``valid`` pruned and a ``score`` column
    added (bwa's s->score: the SW score where checked, len * a
    otherwise) — extend_all orders seeds by it. Per-read gating matches
    seed_sw_filter_active; reads below the length threshold keep every
    seed and score = len * a (identical to the unfiltered pipeline).
    """
    B, S = seeds["rbeg"].shape
    i32 = jnp.int32
    rdt = seeds["rbeg"].dtype
    N = B * S

    slen = seeds["len"].reshape(N)
    qbeg = seeds["qbeg"].reshape(N)
    rbeg = seeds["rbeg"].reshape(N)
    valid = seeds["valid"].reshape(N)
    L = jnp.repeat(lens, S)
    l_pac = fm.l_pac

    # per-read activation (exact mirror of seed_sw_filter_active)
    logl = jnp.log(jnp.maximum(lens, 1).astype(jnp.float32))
    min_l_r = (jnp.full(B, MEM_HSP_COEF * min_chain_weight, jnp.float32)
               if min_chain_weight
               else MEM_MINSC_COEF * logl)
    active_r = (lens > 0) & (min_l_r <= MEM_SEEDSW_COEF
                             * lens.astype(jnp.float32))
    min_hsp_r = (match_score * min_l_r + 0.499).astype(i32)
    active = jnp.repeat(active_r, S)
    min_hsp = jnp.repeat(min_hsp_r, S)

    # window bounds (mem_seed_sw, oracle:633-658)
    qb0, qe0 = qbeg, qbeg + slen
    rb0, re0 = rbeg, rbeg + slen.astype(rdt)
    mid = (rb0 + re0) >> 1
    qb = jnp.maximum(qb0 - MEM_SHORT_EXT, 0)
    qe = jnp.minimum(qe0 + MEM_SHORT_EXT, L)
    rb = jnp.maximum(rb0 - MEM_SHORT_EXT, 0)
    re = jnp.minimum(re0 + MEM_SHORT_EXT, fm.seq_len)
    crosses = (rb < l_pac) & (l_pac < re)
    re = jnp.where(crosses & (mid < l_pac), l_pac.astype(rdt), re)
    rb = jnp.where(crosses & (mid >= l_pac), l_pac.astype(rdt), rb)
    # _clip_to_ref: shrink to the reference containing mid, same strand
    fmid = jnp.where(mid < l_pac, mid, fm.seq_len - 1 - mid)
    rid = kfm.rid_of(fm, fmid)
    off = kfm._small_rows(fm.ref_offsets, rid)
    end = off + kfm._small_rows(fm.ref_lens, rid)
    fwd = mid < l_pac
    rb = jnp.where(fwd, jnp.maximum(rb, off),
                   jnp.maximum(rb, fm.seq_len - end))
    re = jnp.where(fwd, jnp.minimum(re, end),
                   jnp.minimum(re, fm.seq_len - off))

    need = (active & valid & (slen < MEM_SHORT_LEN)
            & ((qe - qb) < MEM_SHORT_LEN)
            & ((re - rb) < MEM_SHORT_LEN) & (re > rb) & (qe > qb))

    # query window: per-seed barrel shift of the read row
    W = codes.shape[1]
    codes_rep = jnp.repeat(codes, S, axis=0)
    qseg = dense.shift_left(codes_rep, jnp.clip(qb, 0, W), W, fill=4)[:, :_W]
    qcols = jnp.arange(_W, dtype=i32)[None, :]
    qseg = jnp.where(qcols < (qe - qb)[:, None], qseg, 4)
    # target window from the packed doubled text
    from bioseqdb_tpu.kernels.extend import window_doubled

    tseg = window_doubled(pac_rows, fm.seq_len,
                          jnp.where(need, rb, 0), _W)
    tlen = jnp.where(need, (re - rb).astype(i32), 0)

    score = _local_sw_batch(qseg, (qe - qb).astype(i32), tseg, tlen,
                            match_score, mismatch_penalty,
                            o_del, e_del, o_ins, e_ins)
    checked = need
    keep = ~checked | (score >= min_hsp)
    out = dict(seeds)
    out["valid"] = (valid & keep).reshape(B, S)
    out["score"] = jnp.where(
        checked, score, slen * match_score).reshape(B, S).astype(i32)
    return out
