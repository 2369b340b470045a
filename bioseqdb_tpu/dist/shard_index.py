"""BWT-interval-sharded FM-index (human-scale references).

The replicated-index layout caps at one device's HBM; GRCh38's doubled
text does not fit (SURVEY.md §7 "32-bit limits", BASELINE configs 4-5).
This module shards the two rank-indexed tables — the interleaved Occ/BWT
``blocks`` and the SA-mark bit-rank ``sa_bits`` — across an ``index``
mesh axis by row range ("BWT interval"), keeping the small arrays
(C counts, sampled SA values, annotations) replicated.

Rank queries run under ``shard_map``: every device answers each query
against its local row range (out-of-range rows contribute zero) and a
``psum`` over the index axis selects the owner's answer — each rank is
owned by exactly one shard, so the sum *is* the value. One collective of
a few ints per lane per step rides the ICI; the tables never move.

Round-1 scope: sharded backward search + SA resolution (the seeding
primitives), pinned against the unsharded path on a virtual mesh. The
full pipeline over a 2-D (data × index) mesh is the follow-on.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from bioseqdb_tpu.index.fmindex import OCC_BLOCK, FMIndex
from bioseqdb_tpu.kernels.fm import _MASK_TABLE, _row_counts


class FMSharded(NamedTuple):
    """FM-index with rank tables split by row range across ``index``."""

    L2: jnp.ndarray            # (5,) replicated
    primary: jnp.ndarray       # () replicated
    blocks: jnp.ndarray        # (n_shards, rows_per_shard, 12) P(index)
    sa_bits: jnp.ndarray       # (n_shards, rows2_per_shard, 5) P(index)
    sa_sample: jnp.ndarray     # replicated
    l_pac: jnp.ndarray
    seq_len: jnp.ndarray


def shard_index(idx: FMIndex, mesh: Mesh, axis: str = "index") -> FMSharded:
    n_sh = mesh.shape[axis]

    def split(arr, cols):
        rows = arr.shape[0]
        rps = (rows + n_sh - 1) // n_sh
        pad = n_sh * rps - rows
        out = np.zeros((rows + pad, cols), arr.dtype)
        out[:rows] = arr
        return out.reshape(n_sh, rps, cols)

    sharded = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())
    put_s = lambda x: jax.device_put(jnp.asarray(x, jnp.int32), sharded)
    put_r = lambda x: jax.device_put(jnp.asarray(np.asarray(x), jnp.int32), repl)
    return FMSharded(
        L2=put_r(idx.L2),
        primary=put_r(idx.primary),
        blocks=put_s(split(np.asarray(idx.blocks), 12)),
        sa_bits=put_s(split(np.asarray(idx.sa_bits), 5)),
        sa_sample=put_r(idx.sa_sample),
        l_pac=put_r(idx.l_pac),
        seq_len=put_r(idx.seq_len),
    )


def _occ4B_local(blocks_l, L2, primary, axis, r):
    """Per-shard occ4 over the conceptual prefix [0, r); psum -> global."""
    rps = blocks_l.shape[0]
    base = jax.lax.axis_index(axis).astype(jnp.int32) * rps
    j = r - (r > primary).astype(jnp.int32)
    blk = j >> 7
    local = blk - base
    mine = (local >= 0) & (local < rps)
    row = blocks_l[jnp.clip(local, 0, rps - 1)]
    off = j & (OCC_BLOCK - 1)
    cs = jnp.arange(4, dtype=jnp.int32)
    cnt = _row_counts(row[..., None, :], jnp.broadcast_to(cs, j.shape + (4,)),
                      off[..., None])
    val = jnp.where(mine[..., None], row[..., :4] + cnt, 0)
    return jax.lax.psum(val, axis)


def _code_and_occ_local(blocks_l, L2, primary, axis, r):
    """Per-shard LF ingredients for inv_psi: (code, L2[c]+occ+1)."""
    rps = blocks_l.shape[0]
    base = jax.lax.axis_index(axis).astype(jnp.int32) * rps
    j = r - (r > primary).astype(jnp.int32)
    blk = j >> 7
    local = blk - base
    mine = (local >= 0) & (local < rps)
    row = blocks_l[jnp.clip(local, 0, rps - 1)]
    off = j & (OCC_BLOCK - 1)
    words = jax.lax.bitcast_convert_type(row[..., 4:], jnp.uint32)
    word = jnp.take_along_axis(words, (off >> 4)[..., None], axis=-1)[..., 0]
    c = ((word >> (2 * (15 - (off & 15))).astype(jnp.uint32)) & 3).astype(jnp.int32)
    ckpt = jnp.take_along_axis(row[..., :4], c[..., None], axis=-1)[..., 0]
    lf = L2[c] + ckpt + _row_counts(row, c, off) + 1
    lf = jnp.where(mine, lf, 0)
    return jax.lax.psum(lf, axis)


def _sa_mark_slot_local(sa_bits_l, axis, r):
    """(marked, slot) via the sharded bit-rank table; psum -> global."""
    rps = sa_bits_l.shape[0]
    base = jax.lax.axis_index(axis).astype(jnp.int32) * rps
    local = (r >> 7) - base
    mine = (local >= 0) & (local < rps)
    row = sa_bits_l[jnp.clip(local, 0, rps - 1)]
    words = jax.lax.bitcast_convert_type(row[..., 1:], jnp.uint32)
    w = (r >> 5) & 3
    word = jnp.take_along_axis(words, w[..., None], axis=-1)[..., 0]
    marked = ((word >> (r & 31).astype(jnp.uint32)) & 1).astype(jnp.int32)
    widx = jnp.arange(4, dtype=jnp.int32)
    bits = (r & 31).astype(jnp.uint32)
    nbits = jnp.where(
        widx < w[..., None], 32, jnp.where(widx == w[..., None], bits[..., None], 0)
    ).astype(jnp.uint32)
    mask = jnp.where(nbits >= 32, jnp.uint32(0xFFFFFFFF),
                     (jnp.uint32(1) << jnp.minimum(nbits, 31)) - jnp.uint32(1))
    part = jax.lax.population_count(words & mask).sum(axis=-1).astype(jnp.int32)
    slot = row[..., 0] + part
    marked = jax.lax.psum(jnp.where(mine, marked, 0), axis)
    slot = jax.lax.psum(jnp.where(mine, slot, 0), axis)
    return marked.astype(jnp.bool_), slot


@functools.partial(jax.jit, static_argnames=("mesh", "axis"))
def backward_search_sharded(fm: FMSharded, codes, lens, mesh: Mesh,
                            axis: str = "index"):
    """Exact-match intervals with the Occ table sharded by BWT interval.
    Reads replicated across the index axis; results replicated."""

    def inner(L2, primary, blocks_l, seq_len, codes, lens):
        blocks_l = blocks_l[0]
        B, W = codes.shape

        def step(t, state):
            lo, hi = state
            idx = jnp.clip(lens - 1 - t, 0, W - 1)
            c = jnp.take_along_axis(codes, idx[:, None], axis=1)[:, 0]
            active = (t < lens) & (lo < hi) & (c < 4)
            c_safe = jnp.clip(c, 0, 3)[:, None]
            o_lo = jnp.take_along_axis(
                _occ4B_local(blocks_l, L2, primary, axis, lo), c_safe, 1)[:, 0]
            o_hi = jnp.take_along_axis(
                _occ4B_local(blocks_l, L2, primary, axis, hi), c_safe, 1)[:, 0]
            C = L2[c_safe[:, 0]] + 1
            nlo, nhi = C + o_lo, C + o_hi
            bad = (t < lens) & (c >= 4)
            lo = jnp.where(active, nlo, jnp.where(bad, 1, lo))
            hi = jnp.where(active, nhi, jnp.where(bad, 1, hi))
            return lo, hi

        lo0 = jnp.zeros(B, jnp.int32)
        hi0 = jnp.broadcast_to(seq_len + 1, (B,)).astype(jnp.int32)
        lo, hi = jax.lax.fori_loop(0, W, step, (lo0, hi0))
        empty = (hi <= lo) | (lens == 0)
        return jnp.where(empty, 0, lo), jnp.where(empty, 0, hi)

    return jax.shard_map(
        inner, mesh=mesh,
        in_specs=(P(), P(), P(axis), P(), P(), P()),
        out_specs=(P(), P()),
    )(fm.L2, fm.primary, fm.blocks, fm.seq_len, codes, lens)


@functools.partial(jax.jit, static_argnames=("mesh", "axis", "sa_interval"))
def sa_resolve_sharded(fm: FMSharded, ranks, mesh: Mesh, axis: str = "index",
                       sa_interval: int = 32):
    """Position-sampled SA resolution with sharded rank tables."""

    def inner(L2, primary, blocks_l, sa_bits_l, sa_sample, ranks):
        blocks_l = blocks_l[0]
        sa_bits_l = sa_bits_l[0]
        r = ranks.astype(jnp.int32)
        steps = jnp.zeros_like(r)

        def body(_, state):
            r, steps = state
            done, _ = _sa_mark_slot_local(sa_bits_l, axis, r)
            lf = _code_and_occ_local(blocks_l, L2, primary, axis, r)
            nxt = jnp.where(r == primary, 0, lf)
            r = jnp.where(done, r, nxt)
            steps = jnp.where(done, steps, steps + 1)
            return r, steps

        r, steps = jax.lax.fori_loop(0, sa_interval - 1, body, (r, steps))
        _, slot = _sa_mark_slot_local(sa_bits_l, axis, r)
        return sa_sample[slot] + steps

    return jax.shard_map(
        inner, mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis), P(), P()),
        out_specs=P(),
    )(fm.L2, fm.primary, fm.blocks, fm.sa_bits, fm.sa_sample, ranks)
