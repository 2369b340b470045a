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
import typing

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
# in-loop s==1 fast-forward phases (see collect_seeds_device docstring);
# every one of them costs exactly one shared-gather iteration
PH_FR = 6      # SA resolve: LF walk to a marked rank (marks ride in-row)
PH_FCT = 7     # fetch the sa_cnt word -> sample slot            [heavy]
PH_FSM = 8     # fetch the sa_sample value -> text position      [heavy]
PH_FCM = 9     # packed-text compare, <=64 bases per iteration   [heavy]
PH_FIA = 10    # fetch the ISA anchor (BWD landing rank)         [heavy]
PH_FIW = 11    # LF walk down from the anchor to the landing rank

N_PHASES = 12

JUMP_DEPTH = 8  # r3 jump table depth (4^J keys)

# rounds
RD_SMEM = 0    # round 1: SMEMs
RD_RESEED = 1  # round 2: re-seed long low-occ SMEMs
RD_LAST = 2    # round 3: LAST-like seeds

DEBUG_CENSUS = False  # tools/iter_split.py: per-phase iteration counters
# debug bisection: subset of {"fwd", "bwd", "r3"} whose fast-forward
# entries are suppressed (module-level, trace-time — tests only)
FF_DISABLE: set = set()
FF_LIGHT = True     # trace the light decode (LF walk / marks)  [debug]
FF_HEAVY = "half"   # "half" | "never" | "always"               [debug]
# finer static bisection of the ff trace: parts to SKIP tracing
# ("entry", "addr", "land", "cols", "push")                     [debug]
FF_SKIP: set = set()


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


# v5e gathers slow down once the table leaves a fast tier. RE-MEASURED
# round 3 (tools/ab_table_size.py, the real seeding loop with junk rows
# appended): 5.1 -> 13.1 MB free, ~29 MB +6%, ~53 MB +66% — the round-1
# "5.1 fast / 6.3 slow" cliff is gone on current libtpu. The depth-8
# jump (+6.3 MB) and the fast-forward regions (~21 MB at E. coli scale,
# mostly cold rows) both fit under the knee.
_FAST_TIER_BYTES = int(20 * (1 << 20))


def _pick_jump_depth(n_blocks: int, base: int) -> int:
    """Largest jump depth whose table extension stays under the gather
    fast tier (any depth is free once the table is already past it)."""
    if n_blocks * 48 >= _FAST_TIER_BYTES:
        return JUMP_DEPTH
    for d in (JUMP_DEPTH, 6):
        if (base + 2 * (4 ** d)) * 48 <= _FAST_TIER_BYTES:
            return d
    return 0


def _pack_jump_oct(rows: jnp.ndarray) -> jnp.ndarray:
    """(2K, 12) synthetic block rows -> (2K/8, 128) octo rows (mark
    columns zero: jump rows are never LF-stepped)."""
    K2 = rows.shape[0]
    r96 = rows.reshape(K2 // kfm.OCT_BLOCKS, 12 * kfm.OCT_BLOCKS)
    return jnp.concatenate(
        [r96, jnp.zeros((r96.shape[0], kfm.OCT_COLS - 96), jnp.int32)],
        axis=1)


def build_r3_jump(fm: kfm.FMDevice, depth: int | None = None,
                  host_blocks=None, host_sa_bits=None,
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
    16 GB HBM at GRCh38 scale. ``host_sa_bits`` must ride along there so
    the spliced table keeps its in-row SA-mark words (pack_oct)."""
    import numpy as np

    n_blocks = fm.n_block_rows  # octo layout: blocks.shape[0] * 8
    base = -(-n_blocks // kfm.MAJOR_BLOCKS) * kfm.MAJOR_BLOCKS
    if depth is None:
        depth = _pick_jump_depth(n_blocks, base)
        if depth == 0:
            return fm, 0, 0
    K = 4 ** depth
    max_rank = (base + 2 * K) * kfm.OCC_BLOCK + 2
    if fm.rank_dtype == jnp.int32 and max_rank >= 2**31:
        return fm, 0, 0
    rows = _r3_jump_rows(fm, depth)  # (2K, 12) block rows; 2K % 8 == 0
    rows_oct = _pack_jump_oct(rows)
    majors_ext = jnp.concatenate(
        [fm.occ_majors, jnp.zeros((1, 4), fm.occ_majors.dtype)], axis=0)
    if host_blocks is not None and fm.blocks.nbytes > host_splice_threshold:
        dev = next(iter(fm.blocks.devices()), None)
        ext = np.zeros((base + 2 * K, 12), np.int32)
        ext[: host_blocks.shape[0]] = host_blocks
        ext[base:] = np.asarray(jax.device_get(rows))
        blocks_ext = jax.device_put(
            jnp.asarray(kfm.pack_oct(ext, host_sa_bits)), dev)
    else:
        pad = jnp.zeros(((base - n_blocks) // kfm.OCT_BLOCKS, kfm.OCT_COLS),
                        jnp.int32)
        blocks_ext = jnp.concatenate([fm.blocks, pad, rows_oct], axis=0)
    return fm._replace(blocks=blocks_ext, occ_majors=majors_ext), base, depth


class SeedTable(typing.NamedTuple):
    """Static (hashable) row map of the unified seeding table.

    Everything the seeding loop ever looks up lives as ROWS of ONE
    device table (``fm.blocks``), so every phase — Occ extensions, the
    r3 prefix jump, and all five fast-forward lookups — rides the
    loop's single fused row gather with zero extra gather ops (the
    round-2 finding: a dependent-chain gather step costs ~77 us FIXED
    regardless of rows, so any second gather op per iteration is ruinous
    — BENCH_NOTES). Region bases are octo-ROW indices into the table;
    0 disables a region. ``pair`` marks rank-valued regions stored as
    lo/hi int32 pairs (int64 indexes, > 2^31 doubled bases)."""

    jump_base: int = 0   # r3 prefix-jump base (BLOCK units, as before)
    jump_depth: int = 0
    cnt_row: int = 0     # sa_cnt words: marks before each 128-rank row
    smp_row: int = 0     # sa_sample values (SA of marked ranks)
    isa_row: int = 0     # sampled inverse SA (rank of position k*interval)
    pac_row: int = 0     # packed doubled text, 2048 bases/row
    pair: bool = False

    @property
    def ff(self) -> bool:
        return self.smp_row > 0


def build_seed_table(fm: kfm.FMDevice, idx, depth: int | None = None,
                     with_ff: bool = True) -> tuple[kfm.FMDevice, SeedTable]:
    """Assemble the unified seeding table: the (mark-carrying) Occ octo
    rows, the r3 jump rows, and — when ``with_ff`` — the fast-forward
    regions (sa_cnt / sa_sample / ISA / packed doubled text) appended as
    128-int32 rows of the same array. Assembly is HOST-side numpy (one
    device_put): device concatenates transiently double the allocation
    and OOM a 16 GB HBM at GRCh38 scale.

    ``idx`` is the host FMIndex. ``depth`` None auto-picks the jump
    depth (build_r3_jump rules); 0 disables the jump."""
    import numpy as np

    from bioseqdb_tpu.kernels.extend import pack_doubled_rows

    n_blocks = fm.n_block_rows
    base = -(-n_blocks // kfm.MAJOR_BLOCKS) * kfm.MAJOR_BLOCKS
    jd = depth
    if jd is None:
        jd = _pick_jump_depth(n_blocks, base)
    if jd > 0:
        K = 4 ** jd
        max_rank = (base + 2 * K) * kfm.OCC_BLOCK + 2
        if fm.rank_dtype == jnp.int32 and max_rank >= 2**31:
            jd = 0
    if jd == 0:
        base = n_blocks  # no jump: regions start right after the blocks
        K = 0
    pair = fm.rank_dtype == jnp.int64


    def val_rows(vals: np.ndarray, as_pair: bool | None = None) -> np.ndarray:
        """Values -> (ceil(n/vpr), 128) int32 rows (lo/hi pairs when
        ``as_pair``; value v at row v//per_row, word v%per_row (pairs))."""
        v = np.asarray(vals)
        as_pair = pair if as_pair is None else as_pair
        nrows = -(-max(v.shape[0], 1) // (64 if as_pair else 128))
        if as_pair:
            out = np.zeros((nrows, 128), np.int32)
            flat = out.reshape(-1)
            v64 = v.astype(np.uint64)
            flat[0 : 2 * v.shape[0] : 2] = (v64 & 0xFFFFFFFF).astype(
                np.uint32).view(np.int32)
            flat[1 : 2 * v.shape[0] : 2] = (v64 >> 32).astype(
                np.uint32).view(np.int32)
            return flat.reshape(nrows, 128)
        out = np.zeros(nrows * 128, np.int32)
        out[: v.shape[0]] = v.astype(np.uint32).view(np.int32)
        return out.reshape(nrows, 128)

    parts = []  # (row_offset, np array) appended after base8 rows
    base8 = base // kfm.OCT_BLOCKS
    cursor = base8 + (2 * K) // kfm.OCT_BLOCKS
    cnt_row = smp_row = isa_row = pac_row = 0
    if with_ff:
        # the sa_cnt region is ALWAYS single int32 words (relative minor
        # counts fit int32 at any scale), even when rank values pair up
        cnt = val_rows(np.asarray(idx.sa_bits[:, 0]), as_pair=False)
        cnt_row, cursor = cursor, cursor + cnt.shape[0]
        parts.append(cnt)
        smp = val_rows(np.asarray(idx.sa_sample))
        smp_row, cursor = cursor, cursor + smp.shape[0]
        parts.append(smp)
        isa = val_rows(idx.isa_sample_array())
        isa_row, cursor = cursor, cursor + isa.shape[0]
        parts.append(isa)
        pac = np.asarray(idx.packed_doubled_rows(pack_doubled_rows))
        pac_row, cursor = cursor, cursor + pac.shape[0]
        parts.append(pac)

    # host assembly: existing blocks + pad-to-base + jump + regions
    out = np.zeros((cursor, kfm.OCT_COLS), np.int32)
    nb8 = fm.blocks.shape[0]
    out[:nb8] = np.asarray(jax.device_get(fm.blocks))
    if jd > 0:
        rows = np.asarray(jax.device_get(_r3_jump_rows(fm, jd)))
        out[base8 : base8 + (2 * K) // kfm.OCT_BLOCKS] = np.concatenate(
            [rows.reshape(-1, 96),
             np.zeros((2 * K // kfm.OCT_BLOCKS, kfm.OCT_COLS - 96),
                      np.int32)], axis=1)
    r = base8 + (2 * K) // kfm.OCT_BLOCKS
    for p in parts:
        out[r : r + p.shape[0]] = p
        r += p.shape[0]
    # preserve the ORIGINAL placement — under a data-parallel mesh the
    # tables are mesh-replicated, and device_put to a bare device would
    # strand the extended table on one device (test_dist caught this)
    place = getattr(fm.blocks, "sharding", None)
    if place is None:
        place = next(iter(fm.blocks.devices()), None)
    blocks_ext = jax.device_put(jnp.asarray(out), place)
    majors_ext = jnp.concatenate(
        [fm.occ_majors, jnp.zeros((1, 4), fm.occ_majors.dtype)], axis=0)
    table = SeedTable(jump_base=base if jd > 0 else 0, jump_depth=jd,
                      cnt_row=cnt_row, smp_row=smp_row, isa_row=isa_row,
                      pac_row=pac_row, pair=pair)
    return fm._replace(blocks=blocks_ext, occ_majors=majors_ext), table


# ---- bit helpers for the in-loop fast-forward ------------------------------


def _row_addr(row, rdt):
    """A conceptual rank whose occ_rows_for row fetch lands exactly on
    octo row ``row`` (mid-row rank: immune to the primary off-by-one)."""
    return (row.astype(rdt) << 10) + 512


def _hibit(y: jnp.ndarray) -> jnp.ndarray:
    """floor(log2(y)) for uint32 y > 0 (0 for y == 0); 5 dense steps."""
    y = y.astype(jnp.uint32)
    hb = jnp.zeros(y.shape, jnp.int32)
    for s in (16, 8, 4, 2, 1):
        big = (y >> jnp.uint32(s)) != 0
        y = jnp.where(big, y >> jnp.uint32(s), y)
        hb = hb + jnp.where(big, s, 0)
    return hb


def _rev2(v: jnp.ndarray) -> jnp.ndarray:
    """Reverse the 16 2-bit groups within each uint32 word."""
    v = v.astype(jnp.uint32)
    m1, m2, m3 = jnp.uint32(0x33333333), jnp.uint32(0x0F0F0F0F), jnp.uint32(0x00FF00FF)
    v = ((v >> jnp.uint32(2)) & m1) | ((v & m1) << jnp.uint32(2))
    v = ((v >> jnp.uint32(4)) & m2) | ((v & m2) << jnp.uint32(4))
    v = ((v >> jnp.uint32(8)) & m3) | ((v & m3) << jnp.uint32(8))
    return (v >> jnp.uint32(16)) | (v << jnp.uint32(16))


def _funnel(words: jnp.ndarray, wshift: jnp.ndarray, bshift: jnp.ndarray,
            nw: int, fill: int = 0) -> jnp.ndarray:
    """Extract ``nw`` uint32 words of the 2-bit base stream starting at
    base offset ``16*wshift + bshift`` of ``words`` (big-endian within
    words). Pure barrel/funnel shifts — no gathers."""
    W = words.shape[-1]
    x = dense.shift_left(words, wshift.astype(jnp.int32), W, fill=fill)
    x = jnp.concatenate(
        [x[..., : nw + 1],
         jnp.full(x.shape[:-1] + (max(0, nw + 1 - x.shape[-1]),), fill,
                  x.dtype)], axis=-1)[..., : nw + 1]
    u = jax.lax.bitcast_convert_type(x, jnp.uint32)
    s = (2 * bshift).astype(jnp.uint32)[..., None]
    lo = jnp.where(s > 0, u[..., 1:] >> (jnp.uint32(32) - s), 0)
    return jnp.where(s > 0, (u[..., :-1] << s) | lo, u[..., :-1])


def _pack16(codes: jnp.ndarray, amb_fill: bool = False):
    """Pack (B, W) int32 codes into (codes_words, amb_words): 16
    2-bit codes per uint32-as-int32 word, big-endian; amb words flag
    codes >= 4 as group 0b11 (so one funnel pipeline serves both)."""
    B, W = codes.shape
    NW = -(-W // 16)
    pad = NW * 16 - W
    c = jnp.pad(codes, ((0, 0), (0, pad)), constant_values=4)
    grp = c.reshape(B, NW, 16).astype(jnp.uint32)
    sh = (2 * (15 - jnp.arange(16, dtype=jnp.uint32)))[None, None, :]
    cw = ((grp & 3) << sh).sum(axis=2, dtype=jnp.uint32)
    aw = (jnp.where(grp >= 4, jnp.uint32(3), jnp.uint32(0)) << sh).sum(
        axis=2, dtype=jnp.uint32)
    i32 = lambda u: jax.lax.bitcast_convert_type(u, jnp.int32)
    return i32(cw), i32(aw)


def _first_group(y: jnp.ndarray, cap: jnp.ndarray) -> jnp.ndarray:
    """Index of the first flagged 2-bit group in a (…, NW) uint32 flag
    stream (flags at even bit 2*(15-j) of each word), capped at ``cap``.
    """
    nz = y != 0
    anyw = jnp.any(nz, axis=-1)
    fw = jnp.argmax(nz, axis=-1).astype(jnp.int32)
    yw = dense.pick(jax.lax.bitcast_convert_type(y, jnp.int32), fw,
                    axis=-1)
    j = 15 - (_hibit(yw) >> 1)
    t = jnp.where(anyw, fw * 16 + j, jnp.int32(1 << 20))
    return jnp.minimum(t, cap)
@functools.partial(
    jax.jit,
    static_argnames=("min_seed_len", "split_width", "max_mem_intv", "split_len",
                     "max_cand", "max_mem", "max_iters", "shard_axis",
                     "jump_base", "jump_depth", "sa_interval", "kcand",
                     "table"),
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
    sa_interval: int = 32,
    kcand: int = 1,
    table: SeedTable | None = None,
):
    """Run all three seeding rounds for a batch of reads.

    ``max_iters`` (0 = 10*W + 256) caps per-lane state-machine steps:
    pathological repeat-heavy lanes otherwise stretch the whole batch's
    while_loop tail (every lane pays for the slowest). Capped lanes set
    ``overflow`` and fall back to the host oracle.

    ``jump_base`` > 0 enables the round-3 depth-J jump: the fm must be
    build_r3_jump/build_seed_table-extended, and each bwt_seed_strategy1
    scan then starts at depth J via one prefix-table fetch instead of J
    stepwise extensions (exact-equivalent: stops before depth
    min_seed_len are impossible, so the skipped states are unobservable).

    ``table`` (a build_seed_table result) enables the **in-loop s==1
    fast-forward**: once a lane's live interval is unique (s == 1), its
    single occurrence has a fixed doubled-text position, and every
    further extension is exactly equivalent to a direct packed-text
    comparison. Round 2 shipped this as a batched out-of-loop service
    and measured it a NET LOSS: every service op paid a fixed dispatch
    floor (~20 gathers x ~80 us per invocation — BENCH_NOTES round 2).
    This round's form runs the whole fast-forward as extra state-machine
    PHASES whose lookups ride the loop's ONE shared row gather — the
    mark words live in the octo rows' spare 32 int32s (kernels/fm.py
    pack_oct), and the sa_cnt / sa_sample / ISA / packed-text lookups
    are appended ROWS of the same table (SeedTable) — so fast-forward
    costs zero extra gather ops. Per origin phase:

    - PH_FWD with ik.s == 1: resolve the occurrence (PH_FR LF walk with
      in-row marked checks -> PH_FCT slot -> PH_FSM position), compare
      the read tail against the packed doubled text (PH_FCM, <=64
      bases/iteration), then complete the WHOLE forward pass directly:
      push (k, 1, i+t) and take the fwd_done transition — bit-equal to
      stepwise because with s == 1, k is invariant, no size change (and
      hence no candidate push) can occur before the mismatch, and the
      pass always terminates at the first mismatch/ambiguity/read-end,
      which the comparison finds. The l half of the bi-interval is dead
      after the pass (backward extension never reads it), so no reverse
      rank is needed.
    - PH_BWD with a single s == 1 candidate (min_intv == 1): same
      resolve + reversed comparison; the landing k after t matched
      columns is the rank of the suffix at (occurrence - t), recovered
      via the sampled ISA (PH_FIA anchor + PH_FIW LF walk-down, <=
      sa_interval - 1 steps) instead of t LF steps. The lane then jumps
      to (prev[0] = (k_land, 1, end), i -= t) and the next stepwise
      iteration fails the column and emits exactly.
    - PH_R3 with ik.s <= 1: the scan's outcome is fully determined (at
      s == 1 by the text comparison; at s == 0 by the read alone), so
      the verdict (stop position, emit-or-not) is computed directly.

    In-row mark checks carry an off-by-one caveat: marks are indexed by
    RANK, Occ blocks by STORED position, so a rank that is a multiple of
    128 (above ``primary``) has its mark word in the NEXT block's row.
    The walk simply treats that case as unmarked and keeps stepping —
    the next marked rank (<= interval steps later) yields the same
    position arithmetic, and the primary rank (SA = 0, always marked) is
    special-cased, so walks terminate and results are exact.

    Heavy fast-forward phases (value decodes, the comparison) advance
    only on every SECOND body step; their vector cost halves while a
    waiting lane stalls at most one step per heavy phase (the round-1
    lesson: every extra per-iteration (B, W) pick costs like a rank
    query). Lanes in those phases simply wait, their gather slot parked.

    MEASURED VERDICT (round 3, tools/ab_ff.py): even with the fused row
    pick and the shared heavy stage-1 pick, every fast-forward class
    nets NEGATIVE on this stack (ff-fwd 1.11x .. ff-bwd 1.28x vs
    stepwise) — the ~25 extra in-loop ops cost ~1-2 us each per
    iteration in the dependent-chain schedule, exceeding the 15-27%
    iteration savings. The machinery stays exact and tested; enable
    with a SeedTable only when the hardware's per-op floor shrinks.

    Sharded seeding (``shard_axis``) disables the fast-forward (the
    appended regions are unsharded); results are exactly equal with the
    fast-forward on or off (tests/test_seed_ff.py) — only iteration
    counts differ.

    Returns dict with
      mems:  int32[B, max_mem, 5] — (k, l, s, start, end) per seed
      n_mem: int32[B]
      overflow: bool[B] — caps exceeded (fall back to host)
    """
    B, W = codes.shape
    P, M = max_cand, max_mem
    i32 = jnp.int32
    rdt = fm.seq_len.dtype  # rank dtype (int64 for >2^31 indexes)
    if max_iters <= 0:
        max_iters = 10 * W + 256
    J = jump_depth
    # stepwise r3 cannot stop before depth min_seed_len, so the jump is
    # only exact-equivalent when it skips strictly shorter depths
    jump = jump_base > 0 and J > 0 and min_seed_len >= J and W > J
    # multi-candidate backward columns: KC candidates per iteration
    # (in-row decodes are unsharded; sharded rank math would need a psum
    # per candidate)
    KC = kcand if (shard_axis is None and kcand > 0) else 1
    ff = table is not None and table.ff and shard_axis is None
    ff_r3 = ff and max_mem_intv > 1  # r3 verdicts assume s<=1 < max_mem_intv
    v_ = sa_interval
    pair = bool(table.pair) if ff else False
    # ffa bitfield layout (i32): [0:2] origin (1 fwd, 2 bwd, 3 r3),
    # [2:12] resolve steps / ISA walk-down remaining, [12:21] below-count
    # then first-ambiguity offset, [21] dirty (r3 text mismatch),
    # [22:31] compare progress
    F_ORIG, F_STEP, F_AUX, F_DIRTY, F_FFT = 0, 2, 12, 21, 22

    def fget(a, lo, width):
        return (a >> lo) & ((1 << width) - 1)

    def fset(a, lo, width, val):
        m = ((1 << width) - 1) << lo
        return (a & ~m) | ((val.astype(i32) << lo) & m)

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
        # in-loop mems are FOUR (B, M) COLUMN arrays (k, s, start, end):
        # a (B, M, 4) table tempts XLA into layouts whose 4-wide minor
        # dim pads to 128 lanes — the per-iteration put_row fusion then
        # materializes 32x the logical bytes (~2.3 ms/iteration,
        # measured as an 11x loop slowdown; tools/ab_ff.py round 3 +
        # XLA estimated_cycles). The dead l column is re-added to the
        # 5-wide output layout only at return.
        mem_k=jnp.zeros((B, M), rdt),
        mem_s=jnp.zeros((B, M), rdt),
        mem_b=jnp.zeros((B, M), rdt),
        mem_e=jnp.zeros((B, M), rdt),
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
    if ff:
        st["ffr"] = jnp.ones(B, rdt)     # walk rank / slot / landing rank
        st["ffpos"] = jnp.zeros(B, rdt)  # resolved doubled-text position
        st["ffa"] = jnp.zeros(B, i32)    # packed fast-forward scratch
        # re-entry cooldown: a backward fast-forward that aborts (t == 0
        # or no ISA anchor) returns to PH_BWD with state unchanged — the
        # next entry check would fire again forever. The flag suppresses
        # re-entry until the stepwise column completes (row_done).
        st["ffcool"] = jnp.zeros(B, jnp.bool_)
        # packed read streams (forward + reversed), 16 codes/word; amb
        # streams flag codes >= 4 as 0b11 groups so one funnel pipeline
        # serves codes and ambiguity alike. Inputs (loop-invariant), but
        # carried in the state for straggler compaction.
        if "cols" not in FF_SKIP:
            cpk, apk = _pack16(codes)
            rpk, rapk = _pack16(codes[:, ::-1])
            st["cpk"], st["apk"] = cpk, apk
            st["rpk"], st["rapk"] = rpk, rapk
    if DEBUG_CENSUS:
        st["ph_census"] = jnp.zeros((B, N_PHASES), i32)
        st["bwd_dead"] = jnp.zeros(B, i32)
        st["bwd_np1"] = jnp.zeros(B, i32)
        st["bwd_cols"] = jnp.zeros(B, i32)
        st["ff_events"] = jnp.zeros((B, 3), i32)  # fwd/bwd/r3 entries
        st["ff_skip"] = jnp.zeros(B, i32)         # iterations skipped
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

        # round 2 iterates over round-1 mems (column picks: (B, M) one-
        # hots, no narrow-minor-dim table materialization)
        at_r2 = at_pivot & (rnd == RD_RESEED)
        r2ix = jnp.clip(r2i, 0, M - 1)
        r2_s = dense.pick_row(st["mem_s"], r2ix)
        r2_b = dense.pick_row(st["mem_b"], r2ix)
        r2_e = dense.pick_row(st["mem_e"], r2ix)
        r2_len = (r2_e - r2_b).astype(i32)
        r2_eligible = (r2_len >= split_len) & (r2_s <= split_width)
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
        piv2 = ((r2_b + r2_e) >> 1).astype(i32)
        x = jnp.where(go2, piv2, x)
        st["min_intv"] = jnp.where(
            go2, r2_s + 1, jnp.where(go1, 1, st["min_intv"]))
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

    def ff_entry(st):
        """Divert eligible s==1 lanes into the fast-forward phases.

        Entry gates are pure perf heuristics (results are identical
        either way): a fast-forward event costs ~(sa_interval/2 + 4)
        iterations of phase traffic, so short remaining runs stay
        stepwise."""
        st = dict(st)
        phase, x, i, L = st["phase"], st["x"], st["i"], st["lens"]
        iks = st["ik"][:, 2]
        p0 = st["prev"][:, 0, :]
        gate = v_ // 2 + 6
        e_fwd = (phase == PH_FWD) & (iks == 1) & (i < L) & (L - i >= gate)
        e_bwd = ((phase == PH_BWD) & (st["n_prev"] == 1) & (st["j"] == 0)
                 & (p0[:, 1] == 1) & (st["min_intv"] == 1) & (i >= gate)
                 & ~st["ffcool"])
        if ff_r3:
            tau = x + min_seed_len - i
            r3g = (phase == PH_R3) & (i < L) & (tau >= 0)
            e_r31 = r3g & (iks == 1) & (tau >= max(2, v_ // 2 + 2))
            e_r30 = r3g & (iks <= 0) & (tau >= 1)
        else:
            e_r31 = e_r30 = jnp.zeros_like(e_fwd)
        if FF_DISABLE:  # debug bisection (module-level, tests only)
            z = jnp.zeros_like(e_fwd)
            if "fwd" in FF_DISABLE:
                e_fwd = z
            if "bwd" in FF_DISABLE:
                e_bwd = z
            if "r3" in FF_DISABLE:
                e_r31 = e_r30 = z
        res = e_fwd | e_bwd | e_r31
        st["ffr"] = jnp.where(res, jnp.where(e_bwd, p0[:, 0], st["ik"][:, 0]),
                              st["ffr"])
        orig = jnp.where(e_fwd, 1, jnp.where(e_bwd, 2, 3)).astype(i32)
        # fresh scratch: origin set, steps/fft/dirty zero, aux = 511
        # (the first-ambiguity sentinel, > any read offset)
        st["ffa"] = jnp.where(res | e_r30, orig | (511 << F_AUX), st["ffa"])
        st["ffpos"] = jnp.where(e_r30, 0, st["ffpos"])
        st["phase"] = jnp.where(
            res, PH_FR, jnp.where(e_r30, PH_FCM, st["phase"]))
        if "ff_events" in st:
            ev = jnp.stack([e_fwd, e_bwd, e_r31 | e_r30], axis=1)
            st["ff_events"] = st["ff_events"] + ev.astype(i32)
        return st

    def body(st, heavy: bool = True):
        # per-lane step budget: cap pathological lanes (overflow -> host)
        over_budget = (st["phase"] != PH_DONE) & (st["iters"] >= max_iters)
        st = dict(st)
        st["overflow"] = st["overflow"] | over_budget
        st["phase"] = jnp.where(over_budget, PH_DONE, st["phase"])
        st["iters"] = st["iters"] + (st["phase"] != PH_DONE).astype(i32)

        st = pivot_step(st)
        if ff and "entry" not in FF_SKIP:
            st = ff_entry(st)

        if "ph_census" in st:  # debug instrumentation (tools/iter_split.py)
            oh = jax.nn.one_hot(st["phase"], N_PHASES, dtype=i32)
            st["ph_census"] = st["ph_census"] + oh
            st["bwd_dead"] = st["bwd_dead"] + (
                (st["phase"] == PH_BWD)
                & ((st["i"] < 0) | (qat_in(st["codes"], st["i"]) >= 4))
            ).astype(i32)
            inb = st["phase"] == PH_BWD
            st["bwd_np1"] = st["bwd_np1"] + (
                inb & (st["n_prev"] == 1)).astype(i32)
            st["bwd_cols"] = st["bwd_cols"] + (inb & (st["j"] == 0)).astype(i32)

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
        nB = phase.shape[0]  # local width (compaction narrows the state)

        # ---- the one batched FMD extension everybody shares ----
        # forward lanes extend st.ik (or r3 ik) forward by q[i];
        # backward lanes extend prev[j] backward by q[i] (prev is stored
        # longest-first: reversed once at the fwd->bwd transition)
        # the first backward column must visit candidates longest-first
        # (bwt_reverse_intvs); instead of materializing a reversed copy
        # of `cand` (a (B,P,P) one-hot every iteration), read prev in
        # reverse index order while `rev1` is set
        j_eff = jnp.where(st["rev1"], st["n_prev"] - 1 - j, j)
        bwd_iv = dense.pick_row(st["prev"], jnp.clip(j_eff, 0, P - 1))  # (B, 3)
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
            # A + 128 the next row (_r3_jump_rows layout)
            in_r3j = phase == PH_R3J
            A = ((jnp.asarray(jump_base, rdt) + 2 * st["jkey_pend"])
                 * kfm.OCC_BLOCK + 1).astype(rdt)
            a = jnp.where(in_r3j, A, a)
            s_eff = jnp.where(in_r3j, kfm.OCC_BLOCK, s_eff)
        else:
            in_r3j = jnp.zeros_like(in_fwd)

        if ff:
            ffr = st["ffr"]
            ffa = st["ffa"]
            ffpos = st["ffpos"]
            orig2 = ffa & 3
            steps_v = fget(ffa, F_STEP, 10)
            fft_v = fget(ffa, F_FFT, 9)
            in_fr = phase == PH_FR
            in_fiw = phase == PH_FIW
            in_fct = phase == PH_FCT
            in_fsm = phase == PH_FSM
            in_fcm = phase == PH_FCM
            in_fia = phase == PH_FIA
            heavy_ph = in_fct | in_fsm | in_fcm | in_fia
            # LF-walk lanes gather the octo row of their current rank
            walk = in_fr | in_fiw
            if "addr" not in FF_SKIP:
                a = jnp.where(walk, ffr, a)
                s_eff = jnp.where(walk, 0, s_eff)
            if "addr" in FF_SKIP:
                pass
            elif heavy:
                # synthesized row addresses (see _row_addr): every
                # fast-forward lookup is a row of the SAME table
                rb7 = (ffr >> 7)
                addr_cnt = _row_addr(
                    jnp.asarray(table.cnt_row, rdt) + (rb7 >> 7), rdt)
                vsh = 6 if pair else 7
                addr_smp = _row_addr(
                    jnp.asarray(table.smp_row, rdt) + (ffr >> vsh), rdt)
                ptv = jnp.maximum(ffpos - fft_v.astype(rdt), 0)
                anchor = ((ptv + (v_ - 1)) // v_) * v_
                aidx = anchor // v_
                addr_isa = _row_addr(
                    jnp.asarray(table.isa_row, rdt) + (aidx >> vsh), rdt)
                is_bo = orig2 == 2
                tpos_f = ffpos + (i + fft_v - x).astype(rdt)
                tpos_b = ffpos - fft_v.astype(rdt) - 1
                tcur = jnp.where(is_bo, tpos_b, tpos_f)
                tcur_c = jnp.clip(tcur, 0, fm.seq_len)
                addr_pac = _row_addr(
                    jnp.asarray(table.pac_row, rdt) + (tcur_c >> 11), rdt)
                a = jnp.where(in_fct, addr_cnt, a)
                a = jnp.where(in_fsm, addr_smp, a)
                a = jnp.where(in_fia, addr_isa, a)
                a = jnp.where(in_fcm, addr_pac, a)
            else:
                a = jnp.where(heavy_ph, 1, a)
            s_eff = jnp.where(heavy_ph, 0, s_eff)
            if "ff_skip" in st and not heavy:
                st["ff_skip"] = st["ff_skip"] + heavy_ph.astype(i32)

        # rows-based fused extension (bit-identical to fmd_extend_back):
        # the raw octo rows stay available for the fast-forward decodes
        # and the multi-candidate decodes
        both = jnp.concatenate([a, a + s_eff])
        rows2, blk2, off2, mine2 = kfm.occ_rows_for(fm, both, shard_axis)
        occ4b, rows12b = kfm.occ4_and_block(fm, rows2, blk2, off2, mine2,
                                            shard_axis)
        o1, o2 = occ4b[:nB], occ4b[nB:]
        k4, l4, s4 = kfm.fmd_extend_from_occ(fm, a, b, s_eff, o1, o2)
        rowsA, blkA, offA = rows2[:nB], blk2[:nB], off2[:nB]
        rowA12 = rows12b[:nB]  # the already-picked 12-int32 block row

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
            rowsB = rows2[nB:]
            octA = (blkA >> 3)
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

        # ---- fast-forward decodes --------------------------------------
        # default (ff off / not heavy): no verdicts this iteration
        ffD_fwd = jnp.zeros(nB, jnp.bool_)
        total_f = jnp.zeros(nB, i32)
        ffD_r3 = jnp.zeros(nB, jnp.bool_)
        r3_pre = jnp.zeros(nB, jnp.bool_)
        r3_emit = jnp.zeros(nB, jnp.bool_)
        x3_ff = jnp.zeros(nB, i32)
        apply_bwd = jnp.zeros(nB, jnp.bool_)
        kland = jnp.zeros(nB, rdt)
        ff_abort = jnp.zeros(nB, jnp.bool_)
        if ff and FF_LIGHT:
            new_ffr, new_ffa, new_ffpos = ffr, ffa, ffpos
            new_phase_ff = phase
            # ---- LF step + in-row mark check (PH_FR / PH_FIW) ----
            # c at stored position (blkA, offA); LF = L2[c] + occ4B[c] + 1
            # (rowA12 rides along from the shared occ4 decode — no
            # duplicate 8-way pick)
            wsel_i = dense.pick(rowA12[:, 4:], (offA >> 4), axis=-1)
            wsel = jax.lax.bitcast_convert_type(wsel_i, jnp.uint32)
            c_fr = ((wsel >> (2 * (15 - (offA & 15))).astype(jnp.uint32))
                    & 3).astype(i32)
            occ_c = dense.pick(o1, c_fr, axis=-1)
            lf = kfm._lut(fm.L2, c_fr) + occ_c + 1
            lf = jnp.where(ffr == fm.primary, 0, lf)
            # in-row mark bit + below-count for the walked rank. Marks
            # are rank-indexed: valid only when the rank's 128-block is
            # the gathered stored block (see docstring caveat).
            msubA = rowsA[..., 96:].reshape((nB, kfm.OCT_BLOCKS, 4))
            mpick = jnp.broadcast_to(((blkA & 7).astype(i32))[:, None],
                                     (nB, 4))
            mrow = dense.pick(msubA, mpick, axis=-2)      # (nB, 4) int32
            mvalid = (ffr >> 7) == blkA
            mw = ((ffr >> 5) & 3).astype(i32)
            mword = jax.lax.bitcast_convert_type(
                dense.pick(mrow, mw, axis=-1), jnp.uint32)
            mbit = (ffr & 31).astype(jnp.uint32)
            marked = mvalid & (((mword >> mbit) & 1) == 1)
            wall = jax.lax.bitcast_convert_type(mrow, jnp.uint32)
            widx4 = jnp.arange(4, dtype=i32)[None, :]
            nbits = jnp.where(
                widx4 < mw[:, None], 32,
                jnp.where(widx4 == mw[:, None],
                          (ffr & 31).astype(i32)[:, None], 0)
            ).astype(jnp.uint32)
            bmask = jnp.where(
                nbits >= 32, jnp.uint32(0xFFFFFFFF),
                (jnp.uint32(1) << jnp.minimum(nbits, 31)) - jnp.uint32(1))
            below = jax.lax.population_count(wall & bmask).sum(
                axis=-1).astype(i32)

            at_prim = in_fr & (ffr == fm.primary)
            fr_done = in_fr & marked & ~at_prim
            fr_step = in_fr & ~marked & ~at_prim
            new_ffr = jnp.where(fr_step, lf.astype(rdt), new_ffr)
            new_ffa = jnp.where(fr_step, fset(ffa, F_STEP, 10, steps_v + 1),
                                new_ffa)
            new_ffa = jnp.where(fr_done, fset(ffa, F_AUX, 9, below), new_ffa)
            new_phase_ff = jnp.where(fr_done, PH_FCT, new_phase_ff)
            # primary rank: SA = 0, so position = steps directly
            new_ffpos = jnp.where(at_prim, steps_v.astype(rdt), new_ffpos)
            new_phase_ff = jnp.where(at_prim, PH_FCM, new_phase_ff)

            # ---- ISA walk-down (PH_FIW) ----
            fiw_apply = in_fiw & (steps_v <= 1)
            fiw_step = in_fiw & ~fiw_apply
            new_ffr = jnp.where(in_fiw, lf.astype(rdt), new_ffr)
            new_ffa = jnp.where(fiw_step, fset(ffa, F_STEP, 10, steps_v - 1),
                                new_ffa)
            apply_bwd = apply_bwd | fiw_apply
            kland = jnp.where(fiw_apply, lf.astype(rdt), kland)

            if heavy:
                # ---- value decodes (PH_FCT / PH_FSM / PH_FIA) + the
                # compare's unit fetch share ONE 8-way stage-1 pick:
                # the heavy phases are mutually exclusive per lane, so
                # each lane selects its own 16-int32 sub-block
                sub16 = rowsA.reshape((nB, 8, 16))
                widx_cnt = (rb7 & 127).astype(i32)
                vsel = jnp.where(in_fsm, ffr, aidx)
                if pair:
                    w0 = (2 * (vsel & 63)).astype(i32)
                    vhi, vlo = (w0 >> 4), (w0 & 15)
                else:
                    vhi = ((vsel & 127) >> 4).astype(i32)
                    vlo = (vsel & 15).astype(i32)
                idx8 = jnp.where(in_fct, widx_cnt >> 4, vhi)
                idx8 = jnp.where(in_fcm, ((tcur_c >> 8) & 7).astype(i32),
                                 idx8)
                sel16 = dense.pick(
                    sub16, jnp.broadcast_to(idx8[:, None], (nB, 16)),
                    axis=-2)                                  # (nB, 16)
                wlo = jnp.where(in_fct, widx_cnt & 15, vlo)
                val0 = dense.pick(sel16, wlo, axis=-1)
                if pair:
                    hi = dense.pick(sel16, vlo + 1, axis=-1)
                    rankv = ((val0.astype(rdt) & 0xFFFFFFFF)
                             + (hi.astype(rdt) << 32))
                else:
                    rankv = val0.astype(rdt)
                cntv = val0
                rmaj = kfm._small_rows(
                    fm.sa_majors,
                    jnp.clip((rb7 >> kfm._LOG2_MAJOR).astype(i32), 0,
                             fm.sa_majors.shape[0] - 1))
                slot_new = (cntv.astype(rdt) + rmaj
                            + fget(ffa, F_AUX, 9).astype(rdt))
                # FCT: slot computed -> fetch the sample next
                new_ffr = jnp.where(in_fct, slot_new, new_ffr)
                new_phase_ff = jnp.where(in_fct, PH_FSM, new_phase_ff)
                # FSM: position = sample + steps -> compare next. The
                # aux field (below-count during the walk) becomes the
                # first-ambiguity tracker: reset its sentinel.
                new_ffpos = jnp.where(in_fsm,
                                      rankv + steps_v.astype(rdt), new_ffpos)
                new_ffa = jnp.where(in_fsm, fset(ffa, F_AUX, 9,
                                                 jnp.full(nB, 511, i32)),
                                    new_ffa)
                new_phase_ff = jnp.where(in_fsm, PH_FCM, new_phase_ff)
                # FIA: anchor rank fetched; walk down (anchor - pt) steps
                ok_a = in_fia & (anchor <= fm.seq_len)
                down0 = jnp.where(in_fia, (anchor - ptv).astype(i32), 0)
                fia_apply = ok_a & (down0 == 0)
                fia_walk = ok_a & (down0 > 0)
                fia_abort = in_fia & ~ok_a
                ff_abort = ff_abort | fia_abort
                new_ffr = jnp.where(fia_walk, rankv, new_ffr)
                new_ffa = jnp.where(fia_walk, fset(ffa, F_STEP, 10, down0),
                                    new_ffa)
                new_phase_ff = jnp.where(fia_walk, PH_FIW, new_phase_ff)
                new_phase_ff = jnp.where(fia_abort, PH_BWD, new_phase_ff)
                apply_bwd = apply_bwd | fia_apply
                kland = jnp.where(fia_apply, rankv, kland)

                # ---- packed-text compare (PH_FCM) ----
                # sel16 IS the 256-base text unit for fcm lanes
                u32 = jax.lax.bitcast_convert_type(sel16, jnp.uint32)
                rev32 = _rev2(u32)[:, ::-1]
                tw_i = jax.lax.bitcast_convert_type(
                    jnp.where(is_bo[:, None], rev32, u32), jnp.int32)
                start_in = jnp.where(
                    is_bo, 255 - (tcur_c & 255), tcur_c & 255).astype(i32)
                NWC = 5  # 64-base compare window + shift overrun
                tww = _funnel(tw_i, start_in >> 4, start_in & 15, NWC)
                ipf = (i + fft_v).astype(i32)
                ipb = (W - 1 - i + fft_v).astype(i32)
                ip = jnp.where(is_bo, ipb, ipf)
                rcw = jnp.where(is_bo[:, None], st["rpk"], st["cpk"])
                raw = jnp.where(is_bo[:, None], st["rapk"], st["apk"])
                rww = _funnel(rcw, ip >> 4, ip & 15, NWC)
                aww = _funnel(raw, ip >> 4, ip & 15, NWC, fill=-1)
                is_r3o = orig2 == 3
                s0 = is_r3o & (st["ik"][:, 2] <= 0)
                tau_stop = (x + min_seed_len - i).astype(i32)
                cap_unit = 256 - start_in
                cap_r3 = jnp.where(is_r3o, tau_stop + 1 - fft_v,
                                   jnp.int32(1 << 20))
                cmp_len = jnp.clip(jnp.minimum(cap_unit, cap_r3), 0, 64)
                cap_txt = jnp.where(
                    is_bo, (tcur + 1).astype(i32),
                    jnp.clip(fm.seq_len - tcur, 0, 1 << 20).astype(i32))
                odd = jnp.uint32(0x55555555)
                xw = tww ^ rww
                y_txt = jnp.where(s0[:, None], jnp.uint32(0),
                                  (xw | (xw >> jnp.uint32(1))) & odd)
                y_amb = (aww | (aww >> jnp.uint32(1))) & odd
                t_txt = jnp.minimum(_first_group(y_txt, cmp_len),
                                    jnp.maximum(cap_txt, 0))
                t_amb = _first_group(y_amb, cmp_len)
                t_run = jnp.minimum(t_txt, t_amb)
                # r3 bookkeeping: first read-ambiguity offset + text dirt
                firstamb_o = fget(ffa, F_AUX, 9)
                firstamb_n = jnp.where(
                    in_fcm & (t_amb < cmp_len),
                    jnp.minimum(firstamb_o, fft_v + t_amb), firstamb_o)
                dirty_o = fget(ffa, F_DIRTY, 1)
                dirty_n = dirty_o | (in_fcm & is_r3o & (t_txt < cmp_len)
                                     & (fft_v + t_txt <= tau_stop)).astype(i32)
                fin_r3 = in_fcm & is_r3o & (
                    (firstamb_n <= tau_stop) | (fft_v + cmp_len > tau_stop))
                cont_fb = (~is_r3o) & (t_run == cmp_len) & (cmp_len > 0)
                cont = in_fcm & (jnp.where(is_r3o, ~fin_r3, cont_fb))
                total = fft_v + t_run
                newfft = jnp.where(is_r3o, fft_v + cmp_len, total)
                upd = fset(fset(fset(ffa, F_FFT, 9, newfft),
                                F_AUX, 9, firstamb_n),
                           F_DIRTY, 1, dirty_n)
                new_ffa = jnp.where(in_fcm, upd, new_ffa)
                # verdicts
                ffD_fwd = in_fcm & (orig2 == 1) & ~cont
                total_f = jnp.where(ffD_fwd, total, 0)
                d_bwd = in_fcm & (orig2 == 2) & ~cont
                bwd_go = d_bwd & (total > 0)
                # abort (t == 0): nothing learned beyond "the very next
                # column fails", which the stepwise iteration re-derives
                # (the cooldown flag stops immediate re-entry)
                ff_abort = ff_abort | (d_bwd & ~bwd_go)
                new_phase_ff = jnp.where(d_bwd & ~bwd_go, PH_BWD,
                                         new_phase_ff)
                new_phase_ff = jnp.where(bwd_go, PH_FIA, new_phase_ff)
                ffD_r3 = fin_r3
                r3_pre = firstamb_n <= tau_stop
                r3_emit = ffD_r3 & ~r3_pre & (dirty_n == 0) & (
                    st["ik"][:, 2] == 1)
                x3_ff = jnp.where(
                    r3_pre,
                    jnp.where(i + firstamb_n >= L, L, i + firstamb_n + 1),
                    i + tau_stop + 1)

            st["ffr"], st["ffa"], st["ffpos"] = new_ffr, new_ffa, new_ffpos
            st["phase"] = new_phase_ff
            phase = new_phase_ff

        new = dict(st)

        # ============== PH_R3J: decode the prefix row ==============
        if jump:
            # fmd_extend_back returns row A as k4 - (L2+1) and
            # row B - row A as s4; 30-bit lo/hi words reassemble ranks
            o1j = k4 - (fm.L2[:4] + 1)
            k8 = o1j[:, 0] + (o1j[:, 1] << 30)
            l8 = o1j[:, 2] + (o1j[:, 3] << 30)
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
        # a finishing forward fast-forward completes the whole pass: its
        # push row is (k, 1, i + matched) and it takes the fwd_done
        # transition below — bit-equal to the stepwise mismatch step
        ff_fwd_row = jnp.stack(
            [st["ik"][:, 0], st["ik"][:, 2], (i + total_f).astype(rdt)],
            axis=1)
        # push current ik when: end-of-read, ambiguous, or size change
        size_change = fwd_ext & (ok_s != st["ik"][:, 2])
        push_fwd = fwd_end_of_read | fwd_amb | size_change | ffD_fwd
        new["cand"], new["n_cand"], ovf1 = push_row(
            new["cand"], new["n_cand"],
            jnp.where(ffD_fwd[:, None], ff_fwd_row, ik_row), push_fwd
        )
        new["overflow"] = st["overflow"] | ovf1
        drop_below = size_change & (ok_s < st["min_intv"])
        adv = fwd_ext & ~drop_below
        new["ik"] = jnp.where(
            adv[:, None], jnp.stack([ok_k, ok_l, ok_s], axis=1), new["ik"]
        )
        new["ik_end"] = jnp.where(adv, i + 1, new["ik_end"])
        new["i"] = jnp.where(adv, i + 1, new["i"])
        fwd_done = fwd_end_of_read | fwd_amb | drop_below | ffD_fwd
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
        emit_any = jnp.zeros(nB, jnp.bool_)
        # emitted mem as SCALAR columns (no (B, 4) row materialization —
        # see the mems layout note in the state init)
        em_k = jnp.zeros(nB, rdt)
        em_s = jnp.zeros(nB, rdt)
        em_e = jnp.zeros(nB, rdt)
        ovf_bwd = jnp.zeros(nB, jnp.bool_)
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
            em_k = jnp.where(emit, piv_t[:, 0], em_k)
            em_s = jnp.where(emit, piv_t[:, 1], em_s)
            em_e = jnp.where(emit, piv_t[:, 2], em_e)
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
        # ============== PH_R3 (emit shares the mems push below) ==========
        r3_end = in_r3 & (i >= L)
        r3_amb = in_r3 & (i < L) & (qi >= 4)
        r3_ext = in_r3 & (i < L) & (qi < 4)
        hit = r3_ext & (ok_s < max_mem_intv) & ((i - x) >= min_seed_len)
        emit3 = hit & (ok_s > 0)
        # ---- the one shared mems push (bwd emit | r3 emit | ff r3) ----
        # the three sources are phase-exclusive per lane; an r3
        # fast-forward verdict emits (k, 1, x, x+min_seed_len+1) — the
        # stepwise scan stops at i = x + min_seed_len with s still 1.
        # Columns push independently (no (B, 4) row tensor; see the
        # mems layout note in the state init).
        push_any = emit_any | emit3 | r3_emit
        pv_k = jnp.where(emit_any, em_k,
                         jnp.where(r3_emit, st["ik"][:, 0], ok_k))
        pv_s = jnp.where(emit_any, em_s,
                         jnp.where(r3_emit, jnp.ones_like(ok_s), ok_s))
        pv_b = jnp.where(emit_any, (bw_i + 1).astype(rdt), x.astype(rdt))
        pv_e = jnp.where(
            emit_any, em_e,
            jnp.where(r3_emit, (x + min_seed_len + 1).astype(rdt),
                      (i + 1).astype(rdt)))
        nmm = new["n_mem"]
        ovf2 = push_any & (nmm >= M)
        wr = push_any & ~ovf2
        ohm = (jnp.arange(M, dtype=i32)[None, :]
               == jnp.minimum(nmm, M - 1)[:, None]) & wr[:, None]
        new["mem_k"] = jnp.where(ohm, pv_k[:, None], new["mem_k"])
        new["mem_s"] = jnp.where(ohm, pv_s[:, None], new["mem_s"])
        new["mem_b"] = jnp.where(ohm, pv_b[:, None], new["mem_b"])
        new["mem_e"] = jnp.where(ohm, pv_e[:, None], new["mem_e"])
        new["n_mem"] = nmm + wr.astype(i32)
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
        cont2 = row_done & ~bwd_finished
        new["prev"] = jnp.where(cont2[:, None, None], new["curr"], new["prev"])
        new["n_prev"] = jnp.where(cont2, new["n_curr"], new["n_prev"])
        # curr is already built longest-first: subsequent columns iterate
        # forward
        new["rev1"] = jnp.where(cont2, False, new["rev1"])
        new["n_curr"] = jnp.where(cont2, 0, new["n_curr"])
        new["i"] = jnp.where(cont2, bw_i - 1, new["i"])
        # (when i reaches -1 the whole row fails with c < 0: curr stays
        # empty, so bwd_finished fires — no separate exit needed)
        new["phase"] = jnp.where(bwd_finished, PH_PIVOT, new["phase"])
        # round 1: advance pivot to ret; round 2: next source mem
        new["x"] = jnp.where(bwd_finished & (rnd == RD_SMEM), st["ret"], new["x"])
        new["r2i"] = jnp.where(
            bwd_finished & (rnd == RD_RESEED), st["r2i"] + 1, new["r2i"]
        )

        # ---- backward fast-forward landing ----
        # prev[0] <- (landing k, 1, end); i -= matched; the next stepwise
        # iteration fails the column and emits exactly (service-equal)
        if ff and "land" not in FF_SKIP:
            p0e = st["prev"][:, 0, 2]
            fft_now = fget(new["ffa"], F_FFT, 9)
            land_row = jnp.stack(
                [kland, jnp.ones_like(kland), p0e], axis=1)
            # dense one-hot write, NOT .at[:, 0].set: a dynamic-update-
            # slice into the tiled (B, P, 3) buffer (minor dim 3 pads to
            # 128 lanes on TPU) lowers to non-fused padded-buffer copies
            # — measured 11x on the whole loop (tools/ab_ff.py round 3)
            new["prev"] = dense.put_row(
                new["prev"], jnp.zeros(nB, i32), land_row, apply_bwd)
            new["i"] = jnp.where(apply_bwd, i - fft_now, new["i"])
            new["rev1"] = jnp.where(apply_bwd, False, new["rev1"])
            new["phase"] = jnp.where(apply_bwd, PH_BWD, new["phase"])
            # cooldown: set on aborts, cleared once the lane makes
            # stepwise progress (a bwd column completes or a new
            # backward pass starts)
            new["ffcool"] = (st["ffcool"] | ff_abort) & ~row_done & ~fwd_done

        # PH_R3 stepwise stop/advance
        r3_stop = r3_end | r3_amb | hit
        new["x"] = jnp.where(r3_stop & in_r3, jnp.where(r3_end, L, i + 1), new["x"])
        new["phase"] = jnp.where(r3_stop, PH_PIVOT, new["phase"])
        keep3 = r3_ext & ~hit
        new["ik"] = jnp.where(
            keep3[:, None], jnp.stack([ok_k, ok_l, ok_s], axis=1), new["ik"]
        )
        new["i"] = jnp.where(keep3, i + 1, new["i"])
        # r3 fast-forward verdict: jump the scan cursor, back to pivoting
        if ff:
            new["x"] = jnp.where(ffD_r3, x3_ff, new["x"])
            new["phase"] = jnp.where(ffD_r3, PH_PIVOT, new["phase"])

        return new

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
        chunk = 32

        def bodyU(_, s):
            # U state-machine steps per loop iteration: each while/fori
            # iteration boundary costs ~40 us regardless of the body
            # (see loops.chunked_while). Heavy fast-forward phases run
            # on every SECOND step: their vector cost halves while a
            # waiting lane stalls at most one step per heavy phase.
            for u in range(U):
                hv = {"half": u % 2 == 0, "never": False,
                      "always": True}[FF_HEAVY]
                s = body(s, heavy=hv)
            return s

        def chunkf(s):
            return jax.lax.fori_loop(0, chunk // U, bodyU, s)

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
    mems5 = jnp.stack(
        [st["mem_k"], jnp.zeros_like(st["mem_k"]), st["mem_s"],
         st["mem_b"], st["mem_e"]], axis=2)
    out = dict(mems=mems5, n_mem=st["n_mem"], overflow=st["overflow"],
               iters=st["iters"], it_r1=st["it_r1"], it_r2=st["it_r2"])
    if DEBUG_CENSUS:
        for k in ("ph_census", "bwd_dead", "bwd_np1", "bwd_cols"):
            out[k] = st[k]
        if ff:
            out["ff_events"] = st["ff_events"]
            out["ff_skip"] = st["ff_skip"]
    return out
