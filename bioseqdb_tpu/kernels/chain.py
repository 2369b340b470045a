"""Batched seed resolution + chaining + chain filtering on device.

Device counterparts of the oracle's mem_chain / chain_flt
(cpu/oracle.py, bwa's mem_chain + mem_chain_flt). All stages are
per-lane loops over compile-time-capped tables with fully vectorized
bodies:

- ``resolve_seeds``: sorts each read's seed intervals by (start, end)
  (the reference sorts intervals before chaining), samples at most
  ``max_occ`` positions per interval with bwa's stride rule, resolves
  them through the position-sampled SA, and drops seeds bridging
  reference/strand boundaries.
- ``chain_seeds``: grows chains with the closest-chain test
  (test_and_merge) — chains live in per-lane slot tables; the kbtree
  lookup becomes a masked argmax over chain keys.
- ``filter_chains``: chain weights + the shadowing filter, producing
  kept flags (3 = primary, 2 = overlapped, 1 = promoted shadow) and a
  weight-descending chain order.

Caps: ``max_seeds`` seed slots and ``max_chains`` chain slots per read;
overflow flags mark reads for host fallback.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from bioseqdb_tpu.kernels import dense
from bioseqdb_tpu.kernels import fm as kfm

NEG = -(1 << 30)  # plain int: a module-level jnp scalar would be created UNDER
# an active trace when this module is lazily imported inside a jitted
# composition, leaking a tracer into every later trace (buffer-count
# crashes in the jit fastpath)


@functools.partial(
    jax.jit, static_argnames=("max_occ", "max_seeds", "shard_axis",
                              "sa_interval", "compact_cap")
)
def resolve_seeds(
    fm: kfm.FMDevice,
    mems: jnp.ndarray,    # int32[B, M, 5] (k, l, s, start, end)
    n_mem: jnp.ndarray,   # int32[B]
    max_occ: int,
    max_seeds: int,
    shard_axis: str | None = None,
    sa_interval: int = 32,
    compact_cap: int = 0,
):
    """Expand seed intervals into located seeds.

    Returns dict: rbeg/qbeg/len int32[B, S], rid int32[B, S],
    valid bool[B, S], frac_rep-style rep length not included here.
    Seed order matches the oracle: intervals ascending (start, end),
    positions by sampled rank order within each interval.

    Position-carrying rows (kernels/kmer.py): a mem row whose l column
    (mems[:, :, 1]) is nonzero carries a doubled-text POSITION in its k
    column instead of a rank interval (always s == 1). Such rows skip
    SA resolution entirely — their position is spliced in directly.
    The l column is dead everywhere else (seed.py mems layout note), so
    rank rows always carry l == 0 here.
    """
    B, M, _ = mems.shape
    S = max_seeds
    mm = jnp.arange(M, dtype=jnp.int32)[None, :]
    live = mm < n_mem[:, None]

    # sort intervals by (start, end) — key fits easily in int32
    key = mems[:, :, 3] * 4096 + jnp.minimum(mems[:, :, 4], 4095)
    key = jnp.where(live, key, jnp.int32(0x3FFFFFFF))
    order = jnp.argsort(key, axis=1).astype(jnp.int32)
    sm = dense.take_rows(mems, order)

    live_s = dense.take_rows(live, order)
    s_sz = sm[:, :, 2]
    step = jnp.where(s_sz > max_occ, s_sz // max_occ, 1)
    cnt = jnp.where(live_s, jnp.minimum(s_sz, max_occ), 0)

    off = jnp.cumsum(cnt, axis=1) - cnt          # exclusive offsets
    total = off[:, -1] + cnt[:, -1]
    overflow = total > S

    ss = jnp.arange(S, dtype=jnp.int32)[None, :]
    # mem index owning each slot: #mems with off <= slot, minus 1
    midx = (off[:, :, None] <= ss[:, None, :]).sum(axis=1).astype(jnp.int32) - 1
    midx = jnp.clip(midx, 0, M - 1)
    valid = ss < jnp.minimum(total, S)[:, None]

    take = lambda col: dense.lookup(col, midx)
    k0 = take(sm[:, :, 0])
    start = take(sm[:, :, 3])
    end = take(sm[:, :, 4])
    stp = take(step)
    ofs = take(off)
    isposrow = take(sm[:, :, 1]) > 0  # position-carrying rows (see doc)
    t = ss - ofs
    ranks = jnp.where(valid & ~isposrow, k0 + t * stp, 1)

    # Most of the (B, S) rank table is padding (reads rarely fill all S
    # slots), and every sa_resolve step gathers two table rows per LANE.
    # Compact the valid lanes into a 4x narrower buffer first; lanes
    # beyond the compact capacity (implausible in practice: it means
    # > S/4 located seeds per read on batch average) overflow to host.
    # The walk's cost scales with the STATIC lane count K, so callers
    # who know almost every seed skips resolution (the kmer path: only
    # round-2 rank rows walk) pass a small ``compact_cap``.
    K = (B * S) // 4
    if compact_cap > 0:
        K = min(K, compact_cap)
    if B * S > 4096:
        i32 = jnp.int32
        fvalid = (valid & ~isposrow).reshape(-1)
        franks = ranks.reshape(-1)
        cpos = jnp.cumsum(fvalid.astype(i32)) - 1
        slot = jnp.where(fvalid, jnp.minimum(cpos, K - 1), K)
        src = jnp.full(K + 1, -1, i32).at[slot].set(
            jnp.arange(B * S, dtype=i32), mode="drop"
        )[:K]
        safe_src = jnp.clip(src, 0, B * S - 1)
        cranks = jnp.where(src >= 0, franks[safe_src], 1)
        cres = kfm.sa_resolve(fm, cranks, sa_interval, axis=shard_axis)
        tgt = jnp.where(src >= 0, safe_src, B * S)
        pos = (
            jnp.zeros(B * S, cres.dtype).at[tgt].set(cres, mode="drop")
            .reshape(B, S)
        )
        truncated = (fvalid & (cpos >= K)).reshape(B, S)
        valid = valid & ~truncated
        overflow = overflow | truncated.any(axis=1)
    else:
        pos = kfm.sa_resolve(fm, ranks, sa_interval, axis=shard_axis)
    pos = jnp.where(isposrow, k0, pos)  # position rows bypass the SA walk
    slen = end - start

    # bns_intv2rid: drop seeds bridging strand or reference boundaries
    bridge = (pos < fm.l_pac) & (pos + slen > fm.l_pac)
    fb, _ = kfm.depos(fm, pos, 1)
    fe, _ = kfm.depos(fm, pos + slen - 1, 1)
    rid_b = kfm.rid_of(fm, fb)
    rid_e = kfm.rid_of(fm, fe)
    ok = valid & ~bridge & (rid_b == rid_e)
    return dict(
        rbeg=jnp.where(ok, pos, 0),
        qbeg=jnp.where(ok, start, 0).astype(jnp.int32),
        len=jnp.where(ok, slen, 0).astype(jnp.int32),
        rid=jnp.where(ok, rid_b, -1).astype(jnp.int32),
        valid=ok,
        overflow=overflow,
    )


@functools.partial(jax.jit, static_argnames=("max_occ",))
def l_rep_device(mems: jnp.ndarray, n_mem: jnp.ndarray,
                 max_occ: int) -> jnp.ndarray:
    """Repetitive-coverage length per read, on device (mem_chain's l_rep:
    union length of the query spans of seed intervals with occurrence
    count > max_occ). Bit-equal to finalize.frac_rep_batch's numerator —
    computing it here keeps the 10+ MB mems table out of the
    host transfer (the host only needs this (B,) column)."""
    B, M, _ = mems.shape
    mm = jnp.arange(M, dtype=jnp.int32)[None, :]
    valid = (mm < n_mem[:, None]) & (mems[:, :, 2] > max_occ)
    start = mems[:, :, 3]
    end = mems[:, :, 4]
    # sort spans by start (ties safe: union length is tie-independent)
    key = jnp.where(valid, start * 8192 + jnp.minimum(end, 8191), 0x7FFFFFFF)
    order = jnp.argsort(key, axis=1)
    ss = jnp.take_along_axis(start, order, axis=1)
    ee = jnp.take_along_axis(end, order, axis=1)
    vv = jnp.take_along_axis(valid, order, axis=1)
    run = jax.lax.cummax(jnp.where(vv, ee, 0), axis=1)
    prev = jnp.concatenate(
        [jnp.zeros((B, 1), run.dtype), run[:, :-1]], axis=1)
    contrib = jnp.where(vv, jnp.maximum(ee - jnp.maximum(ss, prev), 0), 0)
    # the host divides by lens in float64 for bit-parity with the oracle
    return contrib.sum(axis=1).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("max_chains", "bandwidth", "max_chain_gap"))
def chain_seeds(
    fm: kfm.FMDevice,
    seeds: dict,
    max_chains: int,
    bandwidth: int,
    max_chain_gap: int,
):
    """Grow chains over located seeds (mem_chain's insertion loop).

    Returns per-read chain tables + a seed->chain assignment (-1 for
    dropped/contained seeds).
    """
    B, S = seeds["rbeg"].shape
    C = max_chains
    i32 = jnp.int32
    rdt = seeds["rbeg"].dtype  # rank dtype (int64 for >2^31 indexes)

    st = dict(
        pos=jnp.zeros((B, C), rdt),
        rid=jnp.full((B, C), -1, i32),
        f_qbeg=jnp.zeros((B, C), i32),
        f_rbeg=jnp.zeros((B, C), rdt),
        l_qbeg=jnp.zeros((B, C), i32),
        l_rbeg=jnp.zeros((B, C), rdt),
        l_len=jnp.zeros((B, C), i32),
        n=jnp.zeros(B, i32),
        assign=jnp.full((B, S), -1, i32),
        overflow=jnp.zeros(B, jnp.bool_),
    )
    rows = jnp.arange(B)

    def body(s, st):
        rbeg = seeds["rbeg"][:, s]
        qbeg = seeds["qbeg"][:, s]
        slen = seeds["len"][:, s]
        srid = seeds["rid"][:, s]
        ok = seeds["valid"][:, s]

        slots = jnp.arange(C, dtype=i32)[None, :]
        active = slots < st["n"][:, None]
        # closest chain: largest pos <= rbeg
        val = jnp.where(active & (st["pos"] <= rbeg[:, None]), st["pos"], NEG)
        # ties/argmax: pick the largest pos; among equals the first slot
        ci = jnp.argmax(val, axis=1).astype(i32)
        found = dense.pick_row(val, ci) > NEG

        g = lambda a: dense.pick_row(st[a], ci)
        qend = g("l_qbeg") + g("l_len")
        rend = g("l_rbeg") + g("l_len")
        same_rid = srid == g("rid")
        contained = (
            (qbeg >= g("f_qbeg")) & (qbeg + slen <= qend)
            & (rbeg >= g("f_rbeg")) & (rbeg + slen <= rend)
        )
        diff_strand = (
            ((g("l_rbeg") < fm.l_pac) | (g("f_rbeg") < fm.l_pac))
            & (rbeg >= fm.l_pac)
        )
        x = qbeg - g("l_qbeg")
        y = rbeg - g("l_rbeg")
        grow = (
            (y >= 0) & (x - y <= bandwidth) & (y - x <= bandwidth)
            & (x - g("l_len") < max_chain_gap) & (y - g("l_len") < max_chain_gap)
        )
        merged_grow = ok & found & same_rid & ~contained & ~diff_strand & grow
        merged_cont = ok & found & same_rid & contained
        new_chain = ok & ~(merged_grow | merged_cont)

        # grow: update last-seed fields of chain ci
        def upd(name, value, cond):
            return dense.put_row(st[name], ci, value, cond)

        st = dict(st)
        st["l_qbeg"] = upd("l_qbeg", qbeg, merged_grow)
        st["l_rbeg"] = upd("l_rbeg", rbeg, merged_grow)
        st["l_len"] = upd("l_len", slen, merged_grow)
        st["assign"] = st["assign"].at[:, s].set(
            jnp.where(merged_grow, ci, jnp.where(merged_cont, -2, -1))
        )

        # new chain allocation
        ovf = new_chain & (st["n"] >= C)
        alloc = new_chain & ~ovf
        slot = jnp.minimum(st["n"], C - 1)

        def put(name, value):
            return dense.put_row(st[name], slot, value, alloc)

        st["pos"] = put("pos", rbeg)
        st["rid"] = put("rid", srid)
        st["f_qbeg"] = put("f_qbeg", qbeg)
        st["f_rbeg"] = put("f_rbeg", rbeg)
        st["l_qbeg"] = put("l_qbeg", qbeg)
        st["l_rbeg"] = put("l_rbeg", rbeg)
        st["l_len"] = put("l_len", slen)
        st["assign"] = st["assign"].at[:, s].set(
            jnp.where(alloc, slot, st["assign"][:, s])
        )
        st["n"] = st["n"] + alloc.astype(i32)
        st["overflow"] = st["overflow"] | ovf
        return st

    st = jax.lax.fori_loop(0, S, body, st)
    return st


@functools.partial(
    jax.jit,
    static_argnames=("min_chain_weight", "min_seed_len", "max_chain_gap"),
)
def filter_chains(
    chains: dict,
    seeds: dict,
    mask_level: float,
    chain_drop_ratio: float,
    min_chain_weight: int,
    min_seed_len: int,
    max_chain_gap: int,
):
    """Chain weights + the shadowing filter (mem_chain_flt).

    Returns: weight int32[B, C], kept int32[B, C] (0 dropped / 1
    promoted shadow / 2 overlapped / 3 primary), order int32[B, C]
    (chain slots in weight-descending processing order), beg/end
    int32[B, C] (query span of each chain).
    """
    B, S = seeds["rbeg"].shape
    C = chains["pos"].shape[1]
    i32 = jnp.int32
    rows = jnp.arange(B)

    # chain weights: single pass over seeds (assigned in ascending qbeg
    # and rbeg order within each chain)
    rdt = seeds["rbeg"].dtype
    st = dict(
        wq=jnp.zeros((B, C), i32), endq=jnp.zeros((B, C), i32),
        wr=jnp.zeros((B, C), i32), endr=jnp.zeros((B, C), rdt),
        beg=jnp.full((B, C), 1 << 29, i32), end=jnp.zeros((B, C), i32),
    )

    def wbody(s, st):
        ci = chains["assign"][:, s]
        isin = ci >= 0
        cis = jnp.clip(ci, 0, C - 1)
        qb = seeds["qbeg"][:, s]
        rb32 = seeds["rbeg"][:, s]
        ln = seeds["len"][:, s]

        def acc(wname, ename, b):
            w = dense.pick_row(st[wname], cis)
            e = dense.pick_row(st[ename], cis)
            add = jnp.where(b >= e, ln, jnp.maximum(b + ln - e, 0)).astype(w.dtype)
            st[wname] = dense.put_row(st[wname], cis, w + add, isin)
            st[ename] = dense.put_row(
                st[ename], cis, jnp.maximum(e, b + ln).astype(e.dtype), isin
            )

        st = dict(st)
        acc("wq", "endq", qb)
        acc("wr", "endr", rb32)
        b0 = dense.pick_row(st["beg"], cis)
        e0 = dense.pick_row(st["end"], cis)
        st["beg"] = dense.put_row(st["beg"], cis, jnp.minimum(b0, qb), isin)
        st["end"] = dense.put_row(st["end"], cis, jnp.maximum(e0, qb + ln), isin)
        return st

    st = jax.lax.fori_loop(0, S, wbody, st)
    slots = jnp.arange(C, dtype=i32)[None, :]
    exists = slots < chains["n"][:, None]
    weight = jnp.where(exists, jnp.minimum(st["wq"], st["wr"]), -1)
    alive = exists & (weight >= min_chain_weight)
    weight = jnp.where(alive, weight, -1)

    # process in weight-descending order; ties broken by chain pos
    # ascending (the pinned clean-room tie-break, cf. oracle chain_flt)
    pos_rank = jnp.argsort(jnp.argsort(
        jnp.where(exists, chains["pos"],
                  jnp.asarray(0x7FFFFFFF, chains["pos"].dtype)), axis=1,
        stable=True), axis=1).astype(i32)
    combined = weight * C + (C - 1 - pos_rank)
    order = jnp.argsort(-combined, axis=1, stable=True).astype(i32)

    beg = st["beg"]
    end = st["end"]
    kept = jnp.zeros((B, C), i32)
    first = jnp.full((B, C), -1, i32)

    # the best chain is always kept (3)
    best = order[:, 0]
    kept = dense.put_row(
        kept, best, jnp.full_like(best, 3), dense.pick_row(alive, best)
    )

    rank_of = jnp.argsort(order, axis=1).astype(i32)  # slot -> weight rank

    def fbody(r, state):
        kept, first = state
        ci = order[:, r]
        ok = dense.pick_row(alive, ci)
        bi = dense.pick_row(beg, ci)
        ei = dense.pick_row(end, ci)
        wi = dense.pick_row(weight, ci)
        li = ei - bi
        # vector over candidate shadowing chains j (all slots; kept > 0)
        considered = kept > 0
        bj, ej, wj = beg, end, weight
        b_max = jnp.maximum(bj, bi[:, None])
        e_min = jnp.minimum(ej, ei[:, None])
        ovl = e_min > b_max
        lj = ej - bj
        min_l = jnp.minimum(li[:, None], lj)
        sig = (
            considered & ovl
            & ((e_min - b_max) >= min_l * mask_level)
            & (min_l < max_chain_gap)
        )
        dropc = sig & (
            (wi[:, None] < wj * chain_drop_ratio)
            & ((wj - wi[:, None]) >= (min_seed_len * 2))
        )
        # the reference scans kept chains in weight order and breaks at
        # the first drop-condition chain; sig chains after it don't get
        # their `first` updated.
        drop_rank = jnp.where(dropc, rank_of, 1 << 29)
        first_drop = jnp.min(drop_rank, axis=1)
        sig_eff = sig & (rank_of <= first_drop[:, None])
        dropped = first_drop < (1 << 29)
        large = jnp.any(sig_eff, axis=1)
        # first[j] := i where unset, for effective sig chains
        set_first = sig_eff & (first < 0)
        first = jnp.where(ok[:, None] & set_first, ci[:, None], first)
        newk = jnp.where(ok & ~dropped, jnp.where(large, 2, 3), 0)
        kept = dense.put_row(
            kept, ci, newk, ok & (dense.pick_row(kept, ci) == 0)
        )
        return kept, first

    kept, first = jax.lax.fori_loop(1, C, fbody, (kept, first))

    # promote shadows referenced by kept chains (kept = 1)
    def pbody(c, kept):
        fi = first[:, c]
        do = (kept[:, c] > 0) & (fi >= 0)
        fis = jnp.clip(fi, 0, C - 1)
        cur = dense.pick_row(kept, fis)
        return dense.put_row(kept, fis, jnp.ones_like(cur), do & (cur == 0))

    kept = jax.lax.fori_loop(0, C, pbody, kept)
    return dict(weight=weight, kept=kept, order=order, beg=beg, end=end)
