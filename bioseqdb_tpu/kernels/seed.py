"""Batched SMEM seeding on device.

The device counterpart of the oracle's three seeding rounds
(cpu/oracle.py collect_intv == bwa's mem_collect_intv feeding
mem_align1, reference bwa.cpp:149). Each read is a lane running a small
state machine (pivot selection / forward pass / backward pass / re-seed
/ LAST-like pass); every global iteration performs exactly one batched
FMD extension — two occ4 row gathers across all lanes — so the
irregular per-read control flow costs control-overhead only, while the
memory traffic stays perfectly batched (SURVEY.md §7).

State sizes are compile-time caps tuned for short reads (<= ~300 bp):
``P`` candidate intervals per pass and ``M`` output seeds per read; the
``overflow`` output flags any read that exceeded them (callers fall
back to the host oracle for those — none in practice for 151 bp reads).

Must agree exactly with the oracle's collect_intv (tests/test_seed_device.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from bioseqdb_tpu.kernels import fm as kfm
from bioseqdb_tpu.kernels import dense

# phases
PH_PIVOT = 0   # choose the next pivot / round transition
PH_FWD = 1     # forward pass of smem1
PH_BWD = 2     # backward pass of smem1
PH_R3 = 3      # bwt_seed_strategy1 forward scan
PH_DONE = 4
PH_R3J = 5     # round-3 jump pending: fetch the depth-J prefix interval

JUMP_DEPTH = 8  # r3 jump table depth (4^J keys)

# rounds
RD_SMEM = 0    # round 1: SMEMs
RD_RESEED = 1  # round 2: re-seed long low-occ SMEMs
RD_LAST = 2    # round 3: LAST-like seeds

DEBUG_CENSUS = False  # tools/iter_split.py: per-phase iteration counters


@functools.partial(jax.jit, static_argnames=("depth",))
def _r3_jump_rows(fm: kfm.FMDevice, depth: int = JUMP_DEPTH) -> jnp.ndarray:
    """Bi-intervals of every length-``depth`` pattern, encoded as
    synthetic Occ-block rows (int32[2*4^depth, 12]).

    Appended after the real blocks (build_r3_jump), key ``key``'s
    interval is recovered through the seeding loop's ONE shared fused
    gather: a rank query at block ``base + 2*key`` offset 0 returns the
    row's checkpoint columns verbatim (in-block count 0; the appended
    zero major-checkpoint row contributes 0), so fmd_extend_back's
    ``k4 - (L2+1)`` IS row A and ``s4`` IS row B - row A. Ranks are
    30-bit lo/hi split so the scheme survives int64 (>2^31) indexes
    whose values don't fit the int32 block table."""
    K = 4 ** depth
    keys = jnp.arange(K, dtype=jnp.int32)
    c0 = keys & 3
    k = fm.L2[c0] + 1
    l = fm.L2[3 - c0] + 1
    s = fm.L2[c0 + 1] - fm.L2[c0]

    def step(t, kls):
        k, l, s = kls
        ct = ((keys >> (2 * t)) & 3).astype(jnp.int32)
        k4, l4, s4 = kfm.fmd_extend_fwd(fm, k, l, s)
        take = lambda m: jnp.take_along_axis(m, ct[:, None], axis=1)[:, 0]
        return take(k4), take(l4), take(s4)

    k, l, s = jax.lax.fori_loop(1, depth, step, (k, l, s))
    lo = lambda v: (v & 0x3FFFFFFF).astype(jnp.int32)
    hi = lambda v: (v >> 30).astype(jnp.int32)
    zeros = jnp.zeros((K, 8), jnp.int32)
    row_a = jnp.concatenate(
        [jnp.stack([lo(k), hi(k), lo(l), hi(l)], axis=1), zeros], axis=1)
    row_b = jnp.concatenate(
        [jnp.stack([lo(k) + lo(s), hi(k) + hi(s), lo(l), hi(l)], axis=1),
         zeros], axis=1)
    return jnp.stack([row_a, row_b], axis=1).reshape(2 * K, 12)


# v5e gathers run ~2x slower once the table leaves a fast tier
# (measured on the seeding loop: a 5.1 MB extended table gathers at the
# small-table rate, 6.3 MB does not). The jump must not push a small
# table over the cliff; tables already clearly past it pay nothing
# extra for the full-depth extension.
_FAST_TIER_BYTES = int(5.2 * (1 << 20))


def build_r3_jump(fm: kfm.FMDevice, depth: int | None = None,
                  host_blocks=None,
                  host_splice_threshold: int = 1 << 30,
                  ) -> tuple[kfm.FMDevice, int, int]:
    """Extend an FMDevice with the r3 jump table; returns
    (fm', base, depth).

    ``base`` is the first synthetic block row (64-aligned so extended
    rows resolve to the appended all-zero major checkpoint); 0 means the
    jump is disabled (rank range exhausted, or the extension would push
    a fast-tier table over the gather cliff). ``depth`` None picks the
    largest profitable depth for the table size.

    ``host_blocks`` (the numpy blocks table, e.g. ``idx.blocks``) lets
    multi-GB indexes splice the jump rows on HOST: the device
    concatenate transiently multiplies the table allocation and OOMs a
    16 GB HBM at GRCh38 scale."""
    import numpy as np

    n_blocks = fm.n_block_rows  # octo layout: blocks.shape[0] * 8
    base = -(-n_blocks // kfm.MAJOR_BLOCKS) * kfm.MAJOR_BLOCKS
    if depth is None:
        if n_blocks * 48 >= _FAST_TIER_BYTES:
            depth = JUMP_DEPTH  # already past the cliff: maximize skips
        elif (base + 2 * (4 ** 6)) * 48 <= _FAST_TIER_BYTES:
            depth = 6           # fits under the cliff
        else:
            return fm, 0, 0     # any extension would cross it: no jump
    K = 4 ** depth
    max_rank = (base + 2 * K) * kfm.OCC_BLOCK + 2
    if fm.rank_dtype == jnp.int32 and max_rank >= 2**31:
        return fm, 0, 0
    rows = _r3_jump_rows(fm, depth)  # (2K, 12) block rows; 2K % 8 == 0
    rows_oct = rows.reshape(2 * K // kfm.OCT_BLOCKS, 12 * kfm.OCT_BLOCKS)
    majors_ext = jnp.concatenate(
        [fm.occ_majors, jnp.zeros((1, 4), fm.occ_majors.dtype)], axis=0)
    if host_blocks is not None and fm.blocks.nbytes > host_splice_threshold:
        dev = next(iter(fm.blocks.devices()), None)
        ext = np.zeros((base + 2 * K, 12), np.int32)
        ext[: host_blocks.shape[0]] = host_blocks
        ext[base:] = np.asarray(jax.device_get(rows))
        blocks_ext = jax.device_put(jnp.asarray(kfm.pack_oct(ext)), dev)
    else:
        pad = jnp.zeros(((base - n_blocks) // kfm.OCT_BLOCKS,
                         12 * kfm.OCT_BLOCKS), jnp.int32)
        blocks_ext = jnp.concatenate([fm.blocks, pad, rows_oct], axis=0)
    return fm._replace(blocks=blocks_ext, occ_majors=majors_ext), base, depth


@functools.partial(
    jax.jit,
    static_argnames=("min_seed_len", "split_width", "max_mem_intv", "split_len",
                     "max_cand", "max_mem", "max_iters", "shard_axis",
                     "jump_base", "jump_depth", "dual", "sa_interval",
                     "serve_every", "kcand"),
)
def collect_seeds_device(
    fm: kfm.FMDevice,
    codes: jnp.ndarray,   # int32[B, W] 0..3 bases, >=4 ambiguous/padding
    lens: jnp.ndarray,    # int32[B]
    min_seed_len: int,
    split_len: int,
    split_width: int,
    max_mem_intv: int,
    max_cand: int = 24,
    max_mem: int = 48,
    max_iters: int = 0,
    shard_axis: str | None = None,
    jump_base: int = 0,
    jump_depth: int = JUMP_DEPTH,
    dual: bool = False,
    pac_rows: jnp.ndarray | None = None,
    isa: jnp.ndarray | None = None,
    sa_interval: int = 32,
    serve_every: int = 32,
    kcand: int = 1,
):
    """Run all three seeding rounds for a batch of reads.

    ``max_iters`` (0 = 10*W + 256) caps per-lane state-machine steps:
    pathological repeat-heavy lanes otherwise stretch the whole batch's
    while_loop tail (every lane pays for the slowest). Capped lanes set
    ``overflow`` and fall back to the host oracle.

    ``jump_base`` > 0 enables the round-3 depth-8 jump: the fm must be
    build_r3_jump-extended, and each bwt_seed_strategy1 scan then starts
    at depth 8 via one prefix-table fetch instead of 8 stepwise
    extensions (exact-equivalent: stops before depth min_seed_len are
    impossible, so the skipped states are unobservable).

    ``pac_rows`` + ``isa`` enable the **s==1 fast-forward** service: once
    a lane's live interval is unique (s == 1), its single occurrence has
    a fixed doubled-text position, and every further extension is
    exactly equivalent to a direct packed-text comparison — so a
    periodic (every ``serve_every`` body steps) batched service resolves
    the position (sa_resolve), compares the read tail against
    ``pac_rows`` (extend.pack_doubled_rows layout), and jumps the lane's
    state over the whole matched run in one step:

    - PH_FWD with ik.s == 1: the forward interval's k is INVARIANT while
      s stays 1 (the occurrence start is fixed; extending right keeps
      the same unique suffix), so the jump is {i += t, ik_end += t}; the
      next stepwise iteration performs the mismatch/end step exactly.
    - PH_BWD with a single s == 1 candidate: each matched column is
      k <- LF(k); the landing k after t columns is the rank of the
      suffix at (occurrence - t), recovered via the sampled inverse
      suffix array (``isa``, kfm.isa_walk) instead of t LF steps.
    - PH_R3 with ik.s == 1: the scan's remaining outcome (stop position,
      emit-or-not) is fully determined (s <= 1 < max_mem_intv already,
      so the scan stops at the first length >= min_seed_len), and k is
      invariant — the service emits/stops directly.

    Mems emitted through a fast-forwarded path carry ``l = 0``: the
    l half of the bi-interval is mathematically dead after the forward
    pass (backward extension's k/s updates never read l — fm.py
    fmd_extend_from_occ — and no downstream stage reads mems[:, 1];
    chain.resolve_seeds uses columns 0/2/3/4 only). Lanes the service
    doesn't reach keep running stepwise between services, so results are
    exactly equal with the service on or off (tests/test_seed_ff.py);
    only iteration counts differ. Sharded seeding (``shard_axis``)
    currently disables the service (the pac/isa tables are not sharded
    yet — dist/shard_index.py).

    ``dual`` switches to dual-slot scheduling: adjacent lane PAIRS share
    two gather-row slots per iteration. 67% of extensions have both
    rank positions in one 512-base quad row (1 slot), so a pair usually
    advances both reads per iteration while gathering HALF the rows per
    read of the classic mode. Results are exactly equal to
    ``dual=False`` (tests/test_seed_dual.py); only the schedule differs.
    MEASURED SLOWER on v5e (5-6x per iteration, BENCH_NOTES session 3):
    per-kernel launch overhead dominates at these widths, and the
    arbitration/row-select constructs cost far more than the gather
    rows they save. Kept as a documented negative result — revisit on
    hardware with cheaper per-op overhead.

    Returns dict with
      mems:  int32[B, max_mem, 5] — (k, l, s, start, end) per seed
      n_mem: int32[B]
      overflow: bool[B] — caps exceeded (fall back to host)
    """
    B, W = codes.shape
    P, M = max_cand, max_mem
    i32 = jnp.int32
    rdt = fm.seq_len.dtype  # rank dtype (int64 for >2^31 indexes)
    if dual:
        assert B % 2 == 0, "dual-slot seeding pairs adjacent lanes"
    if max_iters <= 0:
        max_iters = (10 * W + 256) * (2 if dual else 1)
    J = jump_depth
    # stepwise r3 cannot stop before depth min_seed_len, so the jump is
    # only exact-equivalent when it skips strictly shorter depths
    jump = jump_base > 0 and J > 0 and min_seed_len >= J and W > J
    # multi-candidate backward columns: KC candidates per iteration.
    # Disabled under dual-slot scheduling and BWT-interval sharding (the
    # in-row decodes are unsharded; sharded rank math would need a psum
    # per candidate).
    KC = kcand if (not dual and shard_axis is None and kcand > 0) else 1

    st = dict(
        phase=jnp.zeros(B, i32),
        round=jnp.zeros(B, i32),
        x=jnp.zeros(B, i32),                      # pivot
        i=jnp.zeros(B, i32),                      # scan position
        ik=jnp.zeros((B, 3), rdt),                # current bi-interval
        ik_end=jnp.zeros(B, i32),
        # candidate tables carry (k, s, end) — the l half of the
        # bi-interval is dead once a pass turns backward (backward
        # extension's k/s updates never read l, fm.fmd_extend_from_occ,
        # and mems' l column is unread downstream), and dropping it cuts
        # the loop's dominant HBM cost: the state tables are rewritten
        # every iteration.
        cand=jnp.zeros((B, P, 3), rdt),           # (k, s, end)
        n_cand=jnp.zeros(B, i32),
        prev=jnp.zeros((B, P, 3), rdt),
        n_prev=jnp.zeros(B, i32),
        curr=jnp.zeros((B, P, 3), rdt),
        n_curr=jnp.zeros(B, i32),
        j=jnp.zeros(B, i32),                      # index into prev
        ret=jnp.zeros(B, i32),                    # next pivot after smem1
        rev1=jnp.zeros(B, jnp.bool_),             # first bwd column reads
                                                  # prev (=cand) in reverse
        min_intv=jnp.ones(B, rdt),                # per-lane (round 2 overrides)
        # in-loop mems are (k, s, start, end); the dead l column is
        # re-expanded to the 5-wide output layout only at return
        mems=jnp.zeros((B, M, 4), rdt),
        n_mem=jnp.zeros(B, i32),
        n_mem_r1=jnp.zeros(B, i32),               # count after round 1
        r2i=jnp.zeros(B, i32),                    # round-2 source mem index
        last_start=jnp.full(B, W + 1, i32),       # containment check state
        iters=jnp.zeros(B, i32),
        it_r1=jnp.zeros(B, i32),                  # iters when round 1 ended
        it_r2=jnp.zeros(B, i32),                  # iters when round 2 ended
        overflow=jnp.zeros(B, jnp.bool_),
        # per-lane inputs live in the state so straggler compaction can
        # gather a lane's whole context in one tree_map
        codes=codes,
        lens=lens,
    )
    if jump:
        # r3 jump keys per position: key(x) = sum_t q[x+t] << 2t over the
        # next J bases. Packed with the base code into one int32
        # (code | (key+1) << 3) so the pivot's existing column pick
        # decodes both — the jump must add no per-iteration pick.
        cpad = jnp.pad(codes, ((0, 0), (0, J)), constant_values=4)
        key = jnp.zeros((B, W), i32)
        clean = jnp.ones((B, W), jnp.bool_)
        for t in range(J):
            win = cpad[:, t : t + W]
            key = key + (jnp.where(win < 4, win, 0) << (2 * t)).astype(i32)
            clean = clean & (win < 4)
        st["jpack"] = codes.astype(i32) | (
            (jnp.where(clean, key, -1) + 1) << 3)
        st["jkey_pend"] = jnp.zeros(B, i32)  # key latched at pivot time
    if dual:
        # pair arbitration fairness bit (even lane of each pair read;
        # incoherence after compaction re-pairing is harmless)
        st["pprio"] = jnp.zeros(B, i32)
    if DEBUG_CENSUS:
        st["ph_census"] = jnp.zeros((B, 6), i32)
        st["bwd_dead"] = jnp.zeros(B, i32)
        st["same_quad"] = jnp.zeros(B, i32)
        st["same_oct"] = jnp.zeros(B, i32)
        st["same_wrow"] = jnp.zeros(B, i32)
        st["ext_n"] = jnp.zeros(B, i32)
        st["bwd_np1"] = jnp.zeros(B, i32)
        st["bwd_cols"] = jnp.zeros(B, i32)
        st["bwd_cov"] = jnp.zeros(B, i32)
    # lanes with no bases never run
    st["phase"] = jnp.where(lens > 0, PH_PIVOT, PH_DONE)

    def qat_in(codes_, pos):
        # dense column pick: a (B,)-row take_along_axis costs ~19 ns/row
        # on TPU (a full gather op); the masked reduction is ~free
        return dense.pick(codes_, jnp.clip(pos, 0, W - 1), axis=1)

    def set_intv(c):
        c = jnp.clip(c, 0, 3)
        k = kfm._lut(fm.L2, c) + 1
        l = kfm._lut(fm.L2, 3 - c) + 1
        s = kfm._lut(fm.L2, c + 1) - kfm._lut(fm.L2, c)
        return jnp.stack([k, l, s], axis=-1).astype(rdt)

    def push_row(buf, n, row, do):
        """Append `row` to per-lane buffer where `do`; returns new buf, n, ovf.

        One-hot write — no scatter (XLA TPU scatter is per-row-cost)."""
        cap = buf.shape[1]
        ovf = do & (n >= cap)
        write = do & ~ovf
        buf = dense.put_row(buf, jnp.minimum(n, cap - 1), row, write)
        n = n + write.astype(i32)
        return buf, n, ovf

    def pivot_step(st):
        """Pivot/bookkeeping transitions, applied BEFORE the shared
        gather (transition-fused state machine): a lane that picks a new
        pivot runs its first extension in the same global iteration
        instead of burning a whole gather slot on bookkeeping. Pure
        vector work — this is the exact PH_PIVOT logic that used to run
        (equally unconditionally) after the gather, so fusing it is
        free; only multi-step chains (ambiguous pivot chars, ineligible
        round-2 sources) still take an iteration per step."""
        st = dict(st)
        phase = st["phase"]
        rnd = st["round"]
        L = st["lens"]
        x = st["x"]
        qx = qat_in(st["codes"], x)
        at_pivot = phase == PH_PIVOT
        # round transitions when the scan is exhausted
        r1_done = at_pivot & (rnd == RD_SMEM) & (x >= L)
        to_r2 = r1_done
        rnd = jnp.where(to_r2, RD_RESEED, rnd)
        st["n_mem_r1"] = jnp.where(to_r2, st["n_mem"], st["n_mem_r1"])
        r2i = jnp.where(to_r2, 0, st["r2i"])
        st["it_r1"] = jnp.where(to_r2, st["iters"], st["it_r1"])

        # round 2 iterates over round-1 mems
        at_r2 = at_pivot & (rnd == RD_RESEED)
        r2_src = dense.pick_row(st["mems"], jnp.clip(r2i, 0, M - 1))
        r2_len = (r2_src[:, 3] - r2_src[:, 2]).astype(i32)
        r2_eligible = (r2_len >= split_len) & (r2_src[:, 1] <= split_width)
        r2_exhausted = at_r2 & (r2i >= st["n_mem_r1"])
        r2_skip = at_r2 & ~r2_exhausted & ~r2_eligible
        r2_go = at_r2 & ~r2_exhausted & r2_eligible
        r2i = jnp.where(r2_skip, r2i + 1, r2i)

        # round 3 start
        to_r3 = r2_exhausted
        rnd = jnp.where(to_r3, RD_LAST, rnd)
        st["round"] = rnd
        x = jnp.where(to_r3, 0, x)
        st["it_r2"] = jnp.where(to_r3, st["iters"], st["it_r2"])
        at_r3p = at_pivot & (rnd == RD_LAST)
        r3_off = at_r3p & ((max_mem_intv <= 0) | (x >= L))
        st["phase"] = jnp.where(r3_off, PH_DONE, st["phase"])

        # round-1 pivot handling
        p1 = at_pivot & (rnd == RD_SMEM) & (x < L)
        amb1 = p1 & (qx >= 4)
        x = jnp.where(amb1, x + 1, x)
        go1 = p1 & (qx < 4)
        # round-2 pivot: x = (start+end)>>1, min_intv = s+1
        go2 = r2_go
        piv2 = ((r2_src[:, 2] + r2_src[:, 3]) >> 1).astype(i32)
        x = jnp.where(go2, piv2, x)
        st["min_intv"] = jnp.where(
            go2, r2_src[:, 1] + 1, jnp.where(go1, 1, st["min_intv"]))
        go = go1 | go2
        qpiv = qat_in(st["codes"], x)
        piv_amb2 = go2 & (qpiv >= 4)  # re-seed pivot on an N: skip it
        r2i = jnp.where(piv_amb2, r2i + 1, r2i)
        go = go & ~piv_amb2
        st["ik"] = jnp.where(go[:, None], set_intv(qpiv), st["ik"])
        st["ik_end"] = jnp.where(go, x + 1, st["ik_end"])
        st["i"] = jnp.where(go, x + 1, st["i"])
        st["n_cand"] = jnp.where(go, 0, st["n_cand"])
        st["phase"] = jnp.where(go, PH_FWD, st["phase"])

        # round-3 pivot handling (one pick: go3 lanes leave x unchanged,
        # so the post-advance code equals the ambiguity-check code)
        p3 = at_r3p & ~r3_off & (max_mem_intv > 0)
        if jump:
            v3 = dense.pick(st["jpack"], jnp.clip(x, 0, W - 1), axis=1)
            q3 = v3 & 7
            jk3 = (v3 >> 3) - 1
        else:
            q3 = qat_in(st["codes"], x)
        amb3 = p3 & (q3 >= 4)
        x = jnp.where(amb3, x + 1, x)
        go3 = p3 & ~amb3
        if jump:
            # start at depth J via the prefix table when the window is
            # clean and inside the read (PH_R3J redirects this step's
            # gather at it)
            jump3 = go3 & (jk3 >= 0) & (x + J <= L)
            go3 = go3 & ~jump3
            st["phase"] = jnp.where(jump3, PH_R3J, st["phase"])
            st["jkey_pend"] = jnp.where(jump3, jnp.maximum(jk3, 0),
                                        st["jkey_pend"])
        st["ik"] = jnp.where(go3[:, None], set_intv(q3), st["ik"])
        st["i"] = jnp.where(go3, x + 1, st["i"])
        st["phase"] = jnp.where(go3, PH_R3, st["phase"])
        st["x"] = x
        st["r2i"] = r2i
        return st

    def body(st):
        # per-lane step budget: cap pathological lanes (overflow -> host)
        over_budget = (st["phase"] != PH_DONE) & (st["iters"] >= max_iters)
        st = dict(st)
        st["overflow"] = st["overflow"] | over_budget
        st["phase"] = jnp.where(over_budget, PH_DONE, st["phase"])
        st["iters"] = st["iters"] + (st["phase"] != PH_DONE).astype(i32)

        st = pivot_step(st)

        if "ph_census" in st:  # debug instrumentation (tools/iter_split.py)
            oh = jax.nn.one_hot(st["phase"], 6, dtype=i32)
            st["ph_census"] = st["ph_census"] + oh
            st["bwd_dead"] = st["bwd_dead"] + (
                (st["phase"] == PH_BWD)
                & ((st["i"] < 0) | (qat_in(st["codes"], st["i"]) >= 4))
            ).astype(i32)
            # same-quad fraction: extensions whose two rank positions
            # fall in one 512-base quad row (the dual-read premise)
            live = (st["phase"] == PH_FWD) | (st["phase"] == PH_BWD) | (
                st["phase"] == PH_R3)
            jj = st["j"]
            je = jnp.where(st["rev1"], st["n_prev"] - 1 - jj, jj)
            biv = dense.pick_row(st["prev"], jnp.clip(je, 0, P - 1))
            kk = jnp.where(st["phase"] == PH_BWD, biv[:, 0], st["ik"][:, 0])
            ss = jnp.maximum(
                jnp.where(st["phase"] == PH_BWD, biv[:, 1], st["ik"][:, 2]), 0)
            p1 = kk - (kk > fm.primary).astype(kk.dtype)
            k2 = kk + ss
            p2 = k2 - (k2 > fm.primary).astype(k2.dtype)
            same = (p1 >> 9) == (p2 >> 9)
            st["same_quad"] = st["same_quad"] + (live & same).astype(i32)
            # octo-row (1024-base) and wide-row (row pair, 2048-base
            # window anchored at p1's octo row) locality: the candidate
            # 192-int32 overlapping-row gather scheme needs p2 within
            # p1's octo row + 1
            st["same_oct"] = st["same_oct"] + (
                live & ((p1 >> 10) == (p2 >> 10))).astype(i32)
            st["same_wrow"] = st["same_wrow"] + (
                live & ((p2 >> 10) - (p1 >> 10) <= 1)).astype(i32)
            st["ext_n"] = st["ext_n"] + live.astype(i32)
            # BWD column structure: how much of the backward pass is the
            # serial n_prev==1 chain vs multi-candidate columns, and how
            # often the column's covering interval (the shortest / last
            # visited candidate — nesting makes it the widest) fits two
            # octo rows (the multi-candidate decode premise)
            inb = st["phase"] == PH_BWD
            st["bwd_np1"] = st["bwd_np1"] + (
                inb & (st["n_prev"] == 1)).astype(i32)
            st["bwd_cols"] = st["bwd_cols"] + (inb & (jj == 0)).astype(i32)
            cidx = jnp.where(st["rev1"], 0, jnp.clip(st["n_prev"] - 1, 0, P - 1))
            cov = dense.pick_row(st["prev"], cidx)
            ckv, csv = cov[:, 0], jnp.maximum(cov[:, 1], 0)
            jAv = ckv - (ckv > fm.primary).astype(ckv.dtype)
            c2 = ckv + csv
            jBv = c2 - (c2 > fm.primary).astype(c2.dtype)
            st["bwd_cov"] = st["bwd_cov"] + (
                inb & ((jBv >> 10) - (jAv >> 10) <= 1)).astype(i32)

        phase = st["phase"]
        rnd = st["round"]
        lens = st["lens"]
        L = lens
        qat = lambda pos: qat_in(st["codes"], pos)
        x, i, j = st["x"], st["i"], st["j"]
        qi = qat(i)
        in_fwd = phase == PH_FWD
        in_bwd = phase == PH_BWD
        in_r3 = phase == PH_R3

        # ---- the one batched FMD extension everybody shares ----
        # forward lanes extend st.ik (or r3 ik) forward by q[i];
        # backward lanes extend prev[j] backward by q[i] (prev is stored
        # longest-first: reversed once at the fwd->bwd transition)
        # the first backward column must visit candidates longest-first
        # (bwt_reverse_intvs); instead of materializing a reversed copy
        # of `cand` (a (B,P,P) one-hot every iteration), read prev in
        # reverse index order while `rev1` is set
        j_eff = jnp.where(st["rev1"], st["n_prev"] - 1 - j, j)
        bwd_iv = dense.pick_row(st["prev"], jnp.clip(j_eff, 0, P - 1))  # (B, 4)
        if KC > 1:
            # ---- multi-candidate backward columns ----
            # A column's candidates are NESTED intervals (they share the
            # start bw_i+1, so shorter patterns have superset intervals;
            # visit order is longest-first = ascending interval size).
            # The (j+KC-1)-th visited candidate therefore COVERS the next
            # KC: when its interval spans <= 2 octo rows, this
            # iteration's shared gather (its two rows) contains every
            # occ position of all KC candidates — decode them all and
            # process the whole group in one iteration (the backward
            # pass is ~50% of all iterations, ~6 candidates per column).
            cov_v = jnp.minimum(j + (KC - 1), st["n_prev"] - 1)
            cov_st = jnp.where(st["rev1"], st["n_prev"] - 1 - cov_v, cov_v)
            cov_iv = dense.pick_row(st["prev"], jnp.clip(cov_st, 0, P - 1))
            ck = cov_iv[:, 0]
            cs = jnp.maximum(cov_iv[:, 1], 0)
            jA = ck - (ck > fm.primary).astype(rdt)
            ce = ck + cs
            jB = ce - (ce > fm.primary).astype(rdt)
            multi = (
                in_bwd & (i >= 0) & (qi < 4)
                & (((jB >> 10) - (jA >> 10)) <= 1) & (cov_v > j)
            )
            src_k = jnp.where(
                in_bwd, jnp.where(multi, ck, bwd_iv[:, 0]), st["ik"][:, 0])
            src_s = jnp.where(
                in_bwd, jnp.where(multi, cs, bwd_iv[:, 1]), st["ik"][:, 2])
        else:
            multi = jnp.zeros_like(in_bwd)
            src_k = jnp.where(in_bwd, bwd_iv[:, 0], st["ik"][:, 0])
            src_s = jnp.where(in_bwd, bwd_iv[:, 1], st["ik"][:, 2])
        # backward lanes have no live l (dropped column): 0 feeds the
        # dead l4 side only
        src_l = jnp.where(in_bwd, 0, st["ik"][:, 1])
        # unify: fwd == back on the (l, k) swap + code flip
        a = jnp.where(in_bwd, src_k, src_l)
        b = jnp.where(in_bwd, src_l, src_k)
        s_eff = jnp.maximum(src_s, 0)
        if jump:
            # r3-jump lanes redirect their two gather slots at the prefix
            # table: rank A hits synthetic block base+2*key at offset 0,
            # A + 128 the next row (_r3_jump_rows layout; base is
            # 64-aligned and keys take 2 rows, so both rows always share
            # one quad — a 1-slot fetch under dual)
            in_r3j = phase == PH_R3J
            A = ((jnp.asarray(jump_base, rdt) + 2 * st["jkey_pend"])
                 * kfm.OCC_BLOCK + 1).astype(rdt)
            a = jnp.where(in_r3j, A, a)
            s_eff = jnp.where(in_r3j, kfm.OCC_BLOCK, s_eff)
        else:
            in_r3j = jnp.zeros_like(in_fwd)
        if not dual and KC > 1:
            # rows-based form of fmd_extend_back (bit-identical): the raw
            # octo rows stay available for the multi-candidate decodes
            both = jnp.concatenate([a, a + s_eff])
            rows2, blk2, off2, mine2 = kfm.occ_rows_for(fm, both, shard_axis)
            occ4b = kfm.occ4_from_quad(fm, rows2, blk2, off2, mine2,
                                       shard_axis)
            nB = a.shape[0]  # local width (compaction narrows the state)
            o1, o2 = occ4b[:nB], occ4b[nB:]
            k4, l4, s4 = kfm.fmd_extend_from_occ(fm, a, b, s_eff, o1, o2)
        elif not dual:
            k4, l4, s4 = kfm.fmd_extend_back(fm, a, b, s_eff, axis=shard_axis)
        else:
            # ---- dual-slot schedule: 2 gather rows per lane PAIR ----
            # Each extension needs occ4 at positions a and a+s. Quads
            # (512-base / 192-byte rows) usually cover both; arbitrate
            # the pair's two row slots between its two machines, gather
            # once, and decode occ4 from the fetched quads.
            live = in_fwd | in_bwd | in_r3 | in_r3j
            r2p = a + s_eff
            nmax = fm.n_block_rows * kfm.OCC_BLOCK - 1
            j1 = jnp.clip(a - (a > fm.primary).astype(rdt), 0, nmax)
            j2 = jnp.clip(r2p - (r2p > fm.primary).astype(rdt), 0, nmax)
            b1 = j1 >> 7
            b2 = j2 >> 7
            q1 = (b1 >> 3).astype(i32)   # octo row ids (kfm.OCT_BLOCKS)
            q2 = (b2 >> 3).astype(i32)
            need = jnp.where(live, 1 + (q1 != q2).astype(i32), 0)
            nA, nB = need[0::2], need[1::2]
            prio = st["pprio"][0::2]
            both_go = (nA + nB) <= 2
            tie = ~both_go & (nA == nB)          # (2,2): fairness bit picks
            winA = ~both_go & ((nA > nB) | (tie & (prio == 0)))
            winB = ~both_go & ~winA
            goA = (nA > 0) & (both_go | winA)
            goB = (nB > 0) & (both_go | winB)
            npq = jnp.where(tie, 1 - prio, prio)
            st["pprio"] = jnp.stack([npq, npq], axis=1).reshape(-1)
            q1A, q2A = q1[0::2], q2[0::2]
            q1B, q2B = q1[1::2], q2[1::2]
            # slot contents: granted machines in machine order; a lone
            # 1-row grant duplicates its quad into the spare slot
            slot0 = jnp.where(goA, q1A, jnp.where(goB, q1B, 0))
            slot1 = jnp.where(
                goA & (nA == 2), q2A,
                jnp.where(goB, jnp.where(nB == 2, q2B, q1B),
                          jnp.where(goA, q1A, 0)))
            # ONE flat gather (2-D index gathers and half-width strided
            # math lower terribly on TPU — first draft ran 6x slower)
            rows_flat, mine_flat = kfm._table_row(
                fm.blocks,
                jnp.stack([slot0, slot1], axis=1).reshape(-1), shard_axis)
            pairs = rows_flat.reshape(-1, 2, 96)
            rep2 = lambda v: jnp.repeat(v, 2, axis=0)
            rows0m = rep2(pairs[:, 0])       # pair slot0 row, per machine
            rows1m = rep2(pairs[:, 1])
            # which slot serves each (machine, position): machine A's j1
            # is always slot0; its j2 is slot1 iff it needs 2 rows;
            # machine B sits in slot1 iff A was granted slot0
            selA2 = goA & (nA == 2)
            selB1 = goA
            selB2 = jnp.where(nB == 2, True, selB1)
            zs = jnp.zeros_like(selB1)
            sel1 = jnp.stack([zs, selB1], axis=1).reshape(-1)
            sel2 = jnp.stack([selA2, selB2], axis=1).reshape(-1)
            row_j1 = jnp.where(sel1[:, None], rows1m, rows0m)
            row_j2 = jnp.where(sel2[:, None], rows1m, rows0m)
            if mine_flat is None:
                mine_j1 = mine_j2 = None
            else:
                mp = mine_flat.reshape(-1, 2)
                m0, m1 = rep2(mp[:, 0:1])[:, 0], rep2(mp[:, 1:2])[:, 0]
                mine_j1 = jnp.where(sel1, m1, m0)
                mine_j2 = jnp.where(sel2, m1, m0)
            om = kfm.OCC_BLOCK - 1
            o1 = kfm.occ4_from_quad(
                fm, row_j1, b1, (j1 & om).astype(i32), mine_j1, shard_axis)
            o2 = kfm.occ4_from_quad(
                fm, row_j2, b2, (j2 & om).astype(i32), mine_j2, shard_axis)
            k4, l4, s4 = kfm.fmd_extend_from_occ(fm, a, b, s_eff, o1, o2)
            go = live & jnp.stack([goA, goB], axis=1).reshape(-1)
            # machines not granted this iteration do nothing: gate every
            # phase predicate (their extension runs on a later iteration)
            in_fwd = in_fwd & go
            in_bwd = in_bwd & go
            in_r3 = in_r3 & go
            in_r3j = in_r3j & go
        c_raw = qi
        c_ext = jnp.where(in_bwd, c_raw, 3 - c_raw)
        c_sel = jnp.clip(c_ext, 0, 3)
        ok_k = dense.pick(jnp.where(in_bwd[:, None], k4, l4), c_sel, axis=1)
        ok_l = dense.pick(jnp.where(in_bwd[:, None], l4, k4), c_sel, axis=1)
        ok_s = dense.pick(s4, c_sel, axis=1)

        if KC > 1:
            # single-code extensions of the earlier-visited (longer,
            # nested) candidates, decoded from the two fetched covering
            # rows — no extra gather rows
            nB = j.shape[0]  # local width (compaction narrows the state)
            rowsA, rowsB = rows2[:nB], rows2[nB:]
            octA = (blk2[:nB] >> 3)
            L2c = kfm._lut(fm.L2, c_sel)
            sub_k, sub_s, sub_iv = [], [], []
            for t in range(KC - 1):
                vt = j + t
                stx = jnp.where(st["rev1"], st["n_prev"] - 1 - vt, vt)
                civ = dense.pick_row(st["prev"], jnp.clip(stx, 0, P - 1))
                pk = civ[:, 0]
                ps = jnp.maximum(civ[:, 1], 0)
                o1c = kfm.occ_c_from_pair(fm, rowsA, rowsB, octA, c_sel, pk)
                o2c = kfm.occ_c_from_pair(fm, rowsA, rowsB, octA, c_sel,
                                          pk + ps)
                sub_k.append(L2c + 1 + o1c)
                sub_s.append(o2c - o1c)
                sub_iv.append(civ)

        new = dict(st)

        # ============== PH_R3J: decode the prefix row ==============
        if jump:
            # fmd_extend_back returns row A as k4 - (L2+1) and
            # row B - row A as s4; 30-bit lo/hi words reassemble ranks
            o1 = k4 - (fm.L2[:4] + 1)
            k8 = o1[:, 0] + (o1[:, 1] << 30)
            l8 = o1[:, 2] + (o1[:, 3] << 30)
            s8 = s4[:, 0].astype(rdt) + (s4[:, 1].astype(rdt) << 30)
            new["ik"] = jnp.where(
                in_r3j[:, None], jnp.stack([k8, l8, s8], axis=1), new["ik"]
            )
            new["i"] = jnp.where(in_r3j, x + J, new["i"])
            new["phase"] = jnp.where(in_r3j, PH_R3, new["phase"])

        # ============== PH_FWD ==============
        # (uses this step's extension result)
        fwd_end_of_read = in_fwd & (i >= L)
        fwd_amb = in_fwd & (i < L) & (qi >= 4)
        fwd_ext = in_fwd & (i < L) & (qi < 4)
        ik_row = jnp.stack(
            [st["ik"][:, 0], st["ik"][:, 2], st["ik_end"].astype(rdt)],
            axis=1)
        # push current ik when: end-of-read, ambiguous, or size change
        size_change = fwd_ext & (ok_s != st["ik"][:, 2])
        push_fwd = fwd_end_of_read | fwd_amb | size_change
        new["cand"], new["n_cand"], ovf1 = push_row(
            new["cand"], new["n_cand"], ik_row, push_fwd
        )
        new["overflow"] = st["overflow"] | ovf1
        drop_below = size_change & (ok_s < st["min_intv"])
        adv = fwd_ext & ~drop_below
        new["ik"] = jnp.where(
            adv[:, None], jnp.stack([ok_k, ok_l, ok_s], axis=1), new["ik"]
        )
        new["ik_end"] = jnp.where(adv, i + 1, new["ik_end"])
        new["i"] = jnp.where(adv, i + 1, new["i"])
        fwd_done = fwd_end_of_read | fwd_amb | drop_below
        # transition to backward pass: prev := cand, visited in reverse
        # (longest candidate first, bwt_reverse_intvs) via the rev1 flag
        new["prev"] = jnp.where(fwd_done[:, None, None], new["cand"], st["prev"])
        new["n_prev"] = jnp.where(fwd_done, new["n_cand"], st["n_prev"])
        new["rev1"] = jnp.where(fwd_done, True, st["rev1"])
        # ret (next round-1 pivot) = end of the longest candidate = last pushed
        lastc = jnp.clip(new["n_cand"] - 1, 0, P - 1)
        new["ret"] = jnp.where(
            fwd_done, dense.pick_row(new["cand"][:, :, 2], lastc).astype(i32),
            st["ret"],
        )
        new["i"] = jnp.where(fwd_done, x - 1, new["i"])
        new["j"] = jnp.where(fwd_done, 0, st["j"])
        new["n_curr"] = jnp.where(fwd_done, 0, st["n_curr"])
        new["last_start"] = jnp.where(fwd_done, W + 1, st["last_start"])
        new["phase"] = jnp.where(fwd_done, PH_BWD, new["phase"])

        # ============== PH_BWD ==============
        # Processes up to KC candidates of the column per iteration (one
        # batched extension for the covering candidate + in-row decodes
        # for the rest); the fold below replays the per-candidate
        # sequential semantics (emit gating, distinct-size pushes) as
        # pure vector work. KC == 1 degenerates to the classic
        # one-candidate-per-iteration form.
        bw_i = i  # current backward position (may be -1)
        c_ok = in_bwd & (bw_i >= 0) & (qi < 4)  # qi == qat(bw_i) here
        if KC > 1:
            n_proc = jnp.where(multi, cov_v - j + 1, 1)
            main_iv = jnp.where(multi[:, None], cov_iv, bwd_iv)
        else:
            n_proc = jnp.ones_like(j)
            main_iv = bwd_iv
        n_curr_r = st["n_curr"]
        lastq = jnp.clip(n_curr_r - 1, 0, P - 1)
        last_s_r = dense.pick_row(st["curr"][:, :, 1], lastq)
        last_start_r = st["last_start"]
        curr_buf = st["curr"]
        emit_any = jnp.zeros(j.shape[0], jnp.bool_)
        emit_row = jnp.zeros((j.shape[0], 4), rdt)
        ovf_bwd = jnp.zeros(j.shape[0], jnp.bool_)
        slot_l, row_l, push_l = [], [], []
        for t in range(KC):
            active_t = in_bwd & (t < n_proc)
            is_last = t == (n_proc - 1)
            if KC > 1 and t < KC - 1:
                res_k = jnp.where(is_last, ok_k, sub_k[t])
                res_s = jnp.where(is_last, ok_s, sub_s[t])
                piv_t = jnp.where(is_last[:, None], main_iv, sub_iv[t])
            else:  # t == KC-1 active implies is_last (n_proc <= KC)
                res_k, res_s, piv_t = ok_k, ok_s, main_iv
            fail = active_t & (~c_ok | (c_ok & (res_s < st["min_intv"])))
            emit = fail & (n_curr_r == 0) & (bw_i + 1 < last_start_r)
            # round filters: emit only seeds meeting the round's length
            slen = (piv_t[:, 2].astype(i32)) - (bw_i + 1)
            emit = emit & (slen >= min_seed_len) & ~emit_any
            mem_row_t = jnp.stack(
                [piv_t[:, 0], piv_t[:, 1],
                 (bw_i + 1).astype(rdt), piv_t[:, 2]], axis=1
            )
            emit_row = jnp.where(emit[:, None], mem_row_t, emit_row)
            emit_any = emit_any | emit
            last_start_r = jnp.where(emit, bw_i + 1, last_start_r)
            # grow curr when extension survives, size distinct from last
            keep = active_t & c_ok & (res_s >= st["min_intv"])
            distinct = (n_curr_r == 0) | (res_s != last_s_r)
            push_t = keep & distinct
            curr_row = jnp.stack(
                [res_k, res_s, piv_t[:, 2].astype(rdt)], axis=1)
            # defer the buffer write: collect (slot, row, do) per t and
            # write curr ONCE after the fold — each push_row is a full
            # (B, P, 3) rewrite, and KC of them per iteration would eat
            # the iterations the fold saves
            ovf_bwd = ovf_bwd | (push_t & (n_curr_r >= P))
            slot_l.append(jnp.minimum(n_curr_r, P - 1))
            row_l.append(curr_row)
            push_l.append(push_t & (n_curr_r < P))
            n_curr_r = n_curr_r + (push_t & (n_curr_r < P)).astype(i32)
            last_s_r = jnp.where(push_t, res_s, last_s_r)
        if KC > 1:
            slots = jnp.stack(slot_l, axis=1)              # (B, KC)
            pushes = jnp.stack(push_l, axis=1)             # (B, KC)
            vals = jnp.stack(row_l, axis=1)                # (B, KC, 3)
            oh = (jnp.arange(P, dtype=i32)[None, :, None]
                  == slots[:, None, :]) & pushes[:, None, :]   # (B, P, KC)
            contrib = jnp.where(oh[..., None], vals[:, None], 0).sum(
                axis=2, dtype=rdt)                          # (B, P, 3)
            curr_buf = jnp.where(jnp.any(oh, axis=2)[..., None], contrib,
                                 curr_buf)
        else:
            curr_buf = dense.put_row(curr_buf, slot_l[0], row_l[0], push_l[0])
        new["mems"], new["n_mem"], ovf2 = push_row(
            new["mems"], new["n_mem"], emit_row, emit_any
        )
        new["overflow"] = new["overflow"] | ovf2 | ovf_bwd
        new["last_start"] = jnp.where(in_bwd, last_start_r,
                                      new["last_start"])
        new["curr"] = jnp.where(in_bwd[:, None, None], curr_buf, new["curr"])
        new["n_curr"] = jnp.where(in_bwd, n_curr_r, new["n_curr"])
        nj = j + n_proc
        # dead-column shortcut: with bw_i < 0 or an ambiguous base, EVERY
        # candidate fails and no push happens, and only the first (longest;
        # ends are descending in visit order) candidate can pass the
        # last_start emit gate — so the whole column finishes in one
        # iteration instead of n_prev (saves ~12 iters/read: pivot-0
        # passes die at bw_i = -1 with a full candidate stack)
        dead = in_bwd & ((bw_i < 0) | (qi >= 4))
        row_done = in_bwd & ((nj >= st["n_prev"]) | dead)
        new["j"] = jnp.where(in_bwd, jnp.where(row_done, 0, nj), new["j"])
        bwd_finished = row_done & (new["n_curr"] == 0)
        cont = row_done & ~bwd_finished
        new["prev"] = jnp.where(cont[:, None, None], new["curr"], new["prev"])
        new["n_prev"] = jnp.where(cont, new["n_curr"], new["n_prev"])
        # curr is already built longest-first: subsequent columns iterate
        # forward
        new["rev1"] = jnp.where(cont, False, new["rev1"])
        new["n_curr"] = jnp.where(cont, 0, new["n_curr"])
        new["i"] = jnp.where(cont, bw_i - 1, new["i"])
        # (when i reaches -1 the whole row fails with c < 0: curr stays
        # empty, so bwd_finished fires — no separate exit needed)
        new["phase"] = jnp.where(bwd_finished, PH_PIVOT, new["phase"])
        # round 1: advance pivot to ret; round 2: next source mem
        new["x"] = jnp.where(bwd_finished & (rnd == RD_SMEM), st["ret"], new["x"])
        new["r2i"] = jnp.where(
            bwd_finished & (rnd == RD_RESEED), st["r2i"] + 1, new["r2i"]
        )

        # ============== PH_R3 ==============
        r3_end = in_r3 & (i >= L)
        r3_amb = in_r3 & (i < L) & (qi >= 4)
        r3_ext = in_r3 & (i < L) & (qi < 4)
        hit = r3_ext & (ok_s < max_mem_intv) & ((i - x) >= min_seed_len)
        emit3 = hit & (ok_s > 0)
        mem3 = jnp.stack([ok_k, ok_s, x.astype(rdt),
                          (i + 1).astype(rdt)], axis=1)
        new["mems"], new["n_mem"], ovf4 = push_row(
            new["mems"], new["n_mem"], mem3, emit3
        )
        new["overflow"] = new["overflow"] | ovf4
        r3_stop = r3_end | r3_amb | hit
        new["x"] = jnp.where(r3_stop & in_r3, jnp.where(r3_end, L, i + 1), new["x"])
        new["phase"] = jnp.where(r3_stop, PH_PIVOT, new["phase"])
        keep3 = r3_ext & ~hit
        new["ik"] = jnp.where(
            keep3[:, None], jnp.stack([ok_k, ok_l, ok_s], axis=1), new["ik"]
        )
        new["i"] = jnp.where(keep3, i + 1, new["i"])

        return new

    # ---- s==1 fast-forward service (see docstring) ----
    ff_on = (pac_rows is not None and isa is not None and serve_every > 0
             and shard_axis is None and max_mem_intv > 1)

    def service(st):
        """Batched fast-forward of every lane currently in an s==1 state
        (exact-equivalent state jump; see the collect_seeds_device
        docstring). Runs between body chunks; lanes it misses simply
        keep running stepwise until the next service.

        The gather-heavy middle (rank resolve, packed-text window, ISA
        walks — ~20 row-gathers per lane) runs COMPACTED to the eligible
        lanes: eligibility is a sparse event (a few jumps per read), so
        paying those gathers for every lane every service would cost
        more than the skipped iterations save (measured: uncompacted
        serve_every=16 returned only 38.5K vs 35.4K reads/s). Eligible
        lanes beyond the compact capacity simply wait for a later
        service (exactness is cadence-independent)."""
        from bioseqdb_tpu.kernels.extend import window_doubled

        st = dict(st)
        phase, x, i, L = st["phase"], st["x"], st["i"], st["lens"]
        Bc = phase.shape[0]
        ik = st["ik"]
        p0 = dense.pick_row(st["prev"], jnp.zeros(Bc, i32))
        e_fwd = (phase == PH_FWD) & (ik[:, 2] == 1) & (i < L)
        e_bwd = (
            (phase == PH_BWD) & (st["n_prev"] == 1) & (st["j"] == 0)
            & (p0[:, 1] == 1) & (st["min_intv"] == 1) & (i >= 0)
        )
        # r3 covers s <= 1: at s == 1 the scan outcome is the packed-text
        # comparison; at s == 0 (dead scan — every occurrence already
        # mismatched) the scan just burns steps to the fixed stop with no
        # emit possible, so only the ambiguity/end preemption matters.
        e_r3 = ((phase == PH_R3) & (ik[:, 2] <= 1) & (i < L)
                & (x + min_seed_len - i >= 0))
        any_e = e_fwd | e_bwd | e_r3

        # ---- compact eligible lanes to K slots ----
        # eligible fraction measures ~10-25% at serve_every=8..16; K/8
        # with a 512 floor covers it, spill waits for the next service
        K = Bc if Bc <= 512 else max(512, Bc // 8)
        if K >= Bc:
            lane_of = jnp.arange(Bc, dtype=i32)
        else:
            cum = jnp.cumsum(any_e.astype(i32))
            slot = jnp.where(any_e & (cum <= K), cum - 1, K)
            lane_of = jnp.full(K + 1, -1, i32).at[slot].set(
                jnp.arange(Bc, dtype=i32), mode="drop")[:K]
        safe = jnp.clip(lane_of, 0, Bc - 1)
        hasK = lane_of >= 0
        fK = e_fwd[safe] & hasK
        bK = e_bwd[safe] & hasK
        rK = e_r3[safe] & hasK
        anyK = fK | bK | rK
        iK, xK, LK = i[safe], x[safe], L[safe]
        ikK = ik[safe]

        # the unique occurrence's start position (of pattern [x, i) for
        # fwd/r3; of the candidate pattern [i+1, end) for bwd)
        rank = jnp.where(bK, p0[safe, 0], ikK[:, 0])
        rank = jnp.where(anyK, rank, 1)
        pos = kfm.sa_resolve(fm, rank, sa_interval)

        # one packed-text window per lane: forward lanes read the text
        # right of the pattern end, backward lanes the W bases left of
        # the occurrence (reversed). Out-of-range reads 4 == mismatch,
        # which matches stepwise semantics (extending past the text or
        # onto an ambiguous base kills the interval).
        d = (iK - xK).astype(pos.dtype)
        start = jnp.where(bK, pos - W, pos + d)
        win = window_doubled(pac_rows, fm.seq_len,
                             jnp.where(anyK, start, 0), W)
        codesK = st["codes"][safe]
        rw_f = dense.shift_left(codesK, jnp.clip(iK, 0, W), W, fill=4)
        rw_b = dense.shift_left(codesK[:, ::-1],
                                jnp.clip(W - 1 - iK, 0, W), W, fill=4)
        rd = jnp.where(bK[:, None], rw_b, rw_f)
        pc = jnp.where(bK[:, None], win[:, ::-1], win)
        mm = (rd == pc) & (rd < 4) & (pc < 4)
        tK = jnp.where(jnp.any(~mm, axis=1),
                       jnp.argmax(~mm, axis=1).astype(i32), W)

        # landing l for fwd jumps (rank of the reverse-complement suffix
        # of the jumped pattern — see docstring) and landing k for bwd
        # jumps — ONE fused ISA walk (per-op dispatch floors dominate the
        # service cost at compact widths, so every op counts)
        rcpos = fm.seq_len - pos - (iK + tK - xK).astype(pos.dtype)
        posw = jnp.concatenate([rcpos, pos - tK.astype(pos.dtype)])
        dow = jnp.concatenate([fK & (tK > 0), bK & (tK > 0)])
        landw, okw = kfm.isa_walk(fm, isa, posw, sa_interval, dow)
        Kc = rcpos.shape[0]
        llandK, okfK = landw[:Kc], okw[:Kc]
        klandK, okbK = landw[Kc:], okw[Kc:]

        # r3 verdict: the scan stops at the first consumed position
        # >= x + min_seed_len (s <= 1 < max_mem_intv), unless an
        # ambiguous base / end-of-read preempts it.
        tau_stop = (xK + min_seed_len - iK).astype(i32)
        bad = rw_f >= 4
        tau_bad = jnp.where(jnp.any(bad, axis=1),
                            jnp.argmax(bad, axis=1).astype(i32), W)
        pre = tau_bad <= tau_stop
        span = jnp.arange(W, dtype=i32)[None, :] > tau_stop[:, None]
        clean = jnp.all(mm | span, axis=1)
        is_end = (iK + tau_bad) >= LK
        x3K = jnp.where(pre, jnp.where(is_end, LK, iK + tau_bad + 1),
                        iK + tau_stop + 1)
        emit3K = rK & (ikK[:, 2] == 1) & ~pre & clean

        # ---- scatter verdicts back (3 packed scatters); apply wide ----
        tgt = jnp.where(lane_of >= 0, lane_of, Bc)

        def scat2(vK, dt):
            return jnp.zeros((Bc + 1, vK.shape[1]), dt).at[tgt].set(
                vK, mode="drop")[:Bc]

        flagsK = ((fK & (tK > 0) & okfK).astype(i32)
                  | ((bK & (tK > 0) & okbK).astype(i32) << 1)
                  | (rK.astype(i32) << 2)
                  | (emit3K.astype(i32) << 3))
        ints = scat2(jnp.stack([tK, x3K, flagsK], axis=1), i32)
        lands = scat2(jnp.stack([llandK, klandK], axis=1), rdt)
        t, x3, flags = ints[:, 0], ints[:, 1], ints[:, 2]
        lland, kland = lands[:, 0], lands[:, 1]
        do_f = (flags & 1) > 0
        do_b = (flags & 2) > 0
        svc_r3 = (flags & 4) > 0
        emit3 = (flags & 8) > 0

        # PH_FWD jump: k invariant while s == 1; the next stepwise
        # iteration performs the mismatch/end-of-read step exactly.
        st["i"] = jnp.where(do_f, i + t, st["i"])
        st["ik_end"] = jnp.where(do_f, i + t, st["ik_end"])
        st["ik"] = jnp.where(
            do_f[:, None],
            jnp.stack([ik[:, 0], lland, ik[:, 2]], axis=1),
            st["ik"])

        # PH_BWD jump: the next stepwise iteration fails the column and
        # emits exactly.
        st["i"] = jnp.where(do_b, i - t, st["i"])
        row_b = jnp.stack(
            [kland, jnp.ones_like(kland), p0[:, 2]], axis=1)
        st["prev"] = dense.put_row(st["prev"], jnp.zeros(Bc, i32), row_b,
                                   do_b)
        st["rev1"] = jnp.where(do_b, False, st["rev1"])

        # PH_R3 stop/emit
        row3 = jnp.stack(
            [ik[:, 0], jnp.ones_like(ik[:, 0]),
             x.astype(rdt), (x + min_seed_len + 1).astype(rdt)], axis=1)
        st["mems"], st["n_mem"], ovf3 = push_row(
            st["mems"], st["n_mem"], row3, emit3)
        st["overflow"] = st["overflow"] | ovf3
        st["x"] = jnp.where(svc_r3, x3, st["x"])
        st["phase"] = jnp.where(svc_r3, PH_PIVOT, st["phase"])
        return st

    def run_compacting(st, sizes):
        """Run the state machine with progressive straggler compaction:
        run the full width until at most ``sizes[0]`` lanes are still
        live, gather those lanes into a ``sizes[0]``-wide state (4x
        cheaper per iteration), recurse, and scatter the results back.
        The per-lane iteration count is long-tailed (p50 ~630 vs max
        ~1260 for 150 bp reads), so the whole batch otherwise pays the
        slowest lane's trip count at full width."""
        from bioseqdb_tpu.kernels.loops import LOOP_UNROLL

        U = max(1, min(LOOP_UNROLL, 32))
        # the service's fixed per-op dispatch cost (~0.3 ms) outweighs
        # 16+ iterations at narrow tail widths (and tail lanes are the
        # repeat-heavy, rarely fast-forwardable ones): run it only at
        # wide levels
        svc = ff_on and st["phase"].shape[0] >= min(B, max(2048, B // 8))
        chunk = max(U, (serve_every // U) * U) if svc else 32

        def bodyU(_, s):
            # U state-machine steps per loop iteration: each while/fori
            # iteration boundary costs ~40 us regardless of the body
            # (see loops.chunked_while)
            for _ in range(U):
                s = body(s)
            return s

        def chunkf(s):
            s = jax.lax.fori_loop(0, chunk // U, bodyU, s)
            return service(s) if svc else s

        def run_chunks(s, live_gt: int):
            return jax.lax.while_loop(
                lambda s: jnp.sum(s["phase"] != PH_DONE) > live_gt, chunkf, s
            )

        if not sizes:
            return run_chunks(st, 0)
        B2 = sizes[0]
        Bc = st["phase"].shape[0]
        st = run_chunks(st, B2)
        unfin = st["phase"] != PH_DONE
        slot = jnp.where(
            unfin, jnp.minimum(jnp.cumsum(unfin.astype(i32)) - 1, B2 - 1), B2
        )
        lane_of = jnp.full(B2 + 1, -1, i32).at[slot].set(
            jnp.arange(Bc, dtype=i32), mode="drop"
        )[:B2]
        safe = jnp.clip(lane_of, 0, Bc - 1)
        sub = {k: v[safe] for k, v in st.items()}
        sub["phase"] = jnp.where(lane_of < 0, PH_DONE, sub["phase"])
        sub = run_compacting(sub, sizes[1:])
        tgt = jnp.where(lane_of >= 0, lane_of, Bc)
        return {k: v.at[tgt].set(sub[k], mode="drop") for k, v in st.items()}

    sizes = []
    b = B
    while b >= 1024:
        b //= 2 if not sizes else 4
        sizes.append(b)
    st = run_compacting(st, sizes)
    m4 = st["mems"]
    mems5 = jnp.concatenate(
        [m4[:, :, :1], jnp.zeros_like(m4[:, :, :1]), m4[:, :, 1:]], axis=2)
    out = dict(mems=mems5, n_mem=st["n_mem"], overflow=st["overflow"],
               iters=st["iters"], it_r1=st["it_r1"], it_r2=st["it_r2"])
    if DEBUG_CENSUS:
        out["ph_census"] = st["ph_census"]
        out["bwd_dead"] = st["bwd_dead"]
        out["same_quad"] = st["same_quad"]
        out["same_oct"] = st["same_oct"]
        out["same_wrow"] = st["same_wrow"]
        out["ext_n"] = st["ext_n"]
        out["bwd_np1"] = st["bwd_np1"]
        out["bwd_cols"] = st["bwd_cols"]
        out["bwd_cov"] = st["bwd_cov"]
    return out
