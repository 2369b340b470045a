"""Kmer (minimizer) seeder parity gates — kernels/kmer.py.

The kmer path must EQUAL the FM path's observable output: identical
mems (spans, occurrence counts, and positions for its s==1 rows) vs
the oracle's three-round decomposition, an exactly-safe round-2
emptiness certificate, and identical final records end-to-end (the
needs_r2 lanes run the FM machine's reseed entry; hard cases take the
overflow -> fat-FM-retry path). Reference role: the seeding half of
mem_align1 (bwa.cpp:149)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from bioseqdb_tpu.align.options import AlignOptions
from bioseqdb_tpu.align.pipeline import Aligner
from bioseqdb_tpu.cpu import oracle as O
from bioseqdb_tpu.index.builder import build_index
from bioseqdb_tpu.io.batch import pack_reads
from bioseqdb_tpu.kernels import kmer as km
from bioseqdb_tpu.kernels.extend import pack_doubled_rows
from bioseqdb_tpu.kernels.seed import collect_seeds_device
from bioseqdb_tpu.utils.sim import simulate_genome, simulate_reads


def oracle_rounds(idx, opt, q):
    """The oracle's collect_intv split into its three rounds."""
    length = len(q)
    split_len = int(opt.min_seed_len * opt.reseed_factor + 0.499)
    r1 = []
    x = 0
    while x < length:
        if q[x] < 4:
            x, found = O.smem1(idx, q, x, min_intv=1)
            r1.extend(p for p in found
                      if p.end - p.start >= opt.min_seed_len)
        else:
            x += 1
    r2 = []
    for p in list(r1):
        if p.end - p.start < split_len or p.s > opt.split_width:
            continue
        _, found = O.smem1(idx, q, (p.start + p.end) >> 1, min_intv=p.s + 1)
        r2.extend(m for m in found if m.end - m.start >= opt.min_seed_len)
    r3 = []
    if opt.max_mem_intv > 0:
        x = 0
        while x < length:
            if q[x] < 4:
                x, m = O.seed_strategy1(idx, q, x, opt.min_seed_len,
                                        opt.max_mem_intv)
                if m is not None:
                    r3.append(m)
            else:
                x += 1
    return r1, r2, r3


def kmer_setup(g):
    idx = build_index([("g", g)])
    host, meta = km.build_kmer_table(idx.pac)
    kt = km.KmerTable(bmeta=jnp.asarray(host["bmeta"]),
                      entries=jnp.asarray(host["entries"]))
    pac_dev = jnp.asarray(idx.packed_doubled_rows(pack_doubled_rows))
    return idx, kt, meta, pac_dev


def run_kmer(idx, kt, meta, pac_dev, batch, opt):
    split_len = int(opt.min_seed_len * opt.reseed_factor + 0.499)
    return jax.device_get(km.collect_seeds_kmer(
        kt, pac_dev, idx.seq_len, jnp.asarray(batch.codes, jnp.int32),
        jnp.asarray(batch.lens, jnp.int32), bb=meta.bb,
        min_seed_len=opt.min_seed_len, split_len=split_len,
        split_width=opt.split_width, max_mem_intv=opt.max_mem_intv,
        smax=km.smax_for(opt.max_mem_intv)))


def assert_parity(idx, opt, batch, out, min_fast=1):
    """Non-fallback reads: r1+r3 mems (span, s, position) equal the
    oracle's; the r2-emptiness certificate never misses an emission."""
    n_fast = 0
    for i in range(len(batch.names)):
        if out["overflow"][i]:
            continue
        n_fast += 1
        q = np.asarray(batch.codes[i, : batch.lens[i]], np.int64)
        r1, r2, r3 = oracle_rounds(idx, opt, q)
        want = sorted((p.start, p.end, p.s) for p in r1 + r3)
        n = int(out["n_mem"][i])
        got = sorted(zip(out["mem_b"][i][:n].tolist(),
                         out["mem_e"][i][:n].tolist(),
                         out["mem_s"][i][:n].tolist()))
        assert got == want, (i, got, want)
        got_pos = {(int(b), int(e)): int(p) for b, e, p in
                   zip(out["mem_b"][i][:n], out["mem_e"][i][:n],
                       out["mem_pos"][i][:n])}
        for p in r1 + r3:
            if p.s == 1:
                assert got_pos[(p.start, p.end)] == idx.sa_at(p.k), (i, p)
        if not out["needs_r2"][i]:
            assert not r2, (i, "certificate missed r2 emissions", r2)
    assert n_fast >= min_fast


@pytest.fixture(scope="module")
def random_setup():
    g = simulate_genome(60_000, seed=101)
    return g, *kmer_setup(g)


def test_minimizer_selection_matches_brute():
    rng = np.random.default_rng(3)
    B, NP = 256, 120
    h = rng.integers(0, 1 << 32, (B, NP), dtype=np.uint32)
    h[:48] = rng.integers(0, 4, (48, NP), dtype=np.uint32)   # heavy ties
    h[48:64] = np.sort(h[48:64], axis=1)
    h[64:80] = np.sort(h[64:80], axis=1)[:, ::-1]
    h[80:96] = 9
    for i in range(96, 160):
        a, b = sorted(rng.integers(0, NP, 2))
        h[i, a : b + 1] = np.uint32(0xFFFFFFFF)
    NW = NP - km.WIN + 1
    sel = np.asarray(km._select_minimizers(jnp.asarray(h), NW))
    for i in range(B):
        brute = np.zeros(NP, bool)
        for s in range(NW):
            brute[s + int(np.argmin(h[i, s : s + km.WIN]))] = True
        assert (sel[i] == brute).all(), i


def test_mems_parity_random(random_setup):
    g, idx, kt, meta, pac_dev = random_setup
    opt = AlignOptions()
    sim = simulate_reads(g, 48, read_len=150, sub_rate=0.02, seed=7)
    reads = list(sim.reads)
    reads[0] = reads[0][:40] + "N" * 7 + reads[0][47:]   # N run
    reads[1] = "".join(np.random.default_rng(5).choice(list("ACGT"), 150))
    reads[2] = reads[2][:21]                             # short
    reads[3] = "N" * 150                                 # all-N
    batch = pack_reads(reads, [f"r{i}" for i in range(len(reads))])
    out = run_kmer(idx, kt, meta, pac_dev, batch, opt)
    assert_parity(idx, opt, batch, out, min_fast=40)


def test_mems_parity_repeats_and_multiref():
    rng = np.random.default_rng(17)
    core = simulate_genome(40_000, seed=23)
    rep = simulate_genome(300, seed=24)
    g = core[:9000] + rep + core[9000:27000] + rep + core[27000:]
    b2 = simulate_genome(9_000, seed=25)
    idx = build_index([("chrA", g), ("chrB", b2)])
    host, meta = km.build_kmer_table(idx.pac)
    kt = km.KmerTable(bmeta=jnp.asarray(host["bmeta"]),
                      entries=jnp.asarray(host["entries"]))
    pac_dev = jnp.asarray(idx.packed_doubled_rows(pack_doubled_rows))
    opt = AlignOptions()
    reads = [g[9000 + o : 9150 + o] for o in (0, 100, 151, 210)]  # on/near rep
    reads += [b2[40:190], g[20_000:20_150]]
    reads += [(g + b2)[len(g) - 80 : len(g) + 70]]  # ref-bridging read
    sim = simulate_reads(g, 24, read_len=150, sub_rate=0.02, seed=31)
    reads += list(sim.reads)
    batch = pack_reads(reads, [f"r{i}" for i in range(len(reads))])
    out = run_kmer(idx, kt, meta, pac_dev, batch, opt)
    assert_parity(idx, opt, batch, out, min_fast=20)
    # reads fully inside the duplicated 300bp block carry s==2 SMEMs:
    # the fast path must refuse them (they need SA-order positions)
    assert out["overflow"][1]


def test_mems_parity_n_holes():
    g = simulate_genome(40_000, seed=41, n_frac=0.03)
    idx, kt, meta, pac_dev = kmer_setup(g)
    opt = AlignOptions()
    sim = simulate_reads(g, 32, read_len=150, sub_rate=0.01, seed=43)
    batch = pack_reads(list(sim.reads),
                       [f"r{i}" for i in range(32)])
    out = run_kmer(idx, kt, meta, pac_dev, batch, opt)
    assert_parity(idx, opt, batch, out, min_fast=24)


def test_r2_reseed_machine_matches_oracle():
    rng = np.random.default_rng(53)
    glen = 50_000
    g = simulate_genome(glen, seed=59)
    gl = list(g)
    dsts = []
    for _ in range(60):
        ln = int(rng.integers(20, 61))
        src = int(rng.integers(0, glen - ln))
        dst = int(rng.integers(200, glen - ln - 200))
        gl[dst : dst + ln] = gl[src : src + ln]
        dsts.append((dst, ln))
    g = "".join(gl)
    idx, kt, meta, pac_dev = kmer_setup(g)
    opt = AlignOptions()
    reads = [g[dst + ln // 2 - 75 : dst + ln // 2 + 75]
             for dst, ln in dsts[:48]]
    sim = simulate_reads(g, 16, read_len=150, sub_rate=0.01, seed=61)
    reads += list(sim.reads)
    batch = pack_reads(reads, [f"r{i}" for i in range(len(reads))])
    out = run_kmer(idx, kt, meta, pac_dev, batch, opt)

    from bioseqdb_tpu.kernels import fm as kfm

    fm = kfm.FMDevice.from_host(idx)
    codes = jnp.asarray(batch.codes, jnp.int32)
    lens = jnp.asarray(batch.lens, jnp.int32)
    split_len = int(opt.min_seed_len * opt.reseed_factor + 0.499)
    M_tot = 24
    r2m = jax.device_get(collect_seeds_device(
        fm, codes, lens, min_seed_len=opt.min_seed_len,
        split_len=split_len, split_width=opt.split_width, max_mem_intv=0,
        jump_base=0, jump_depth=0, max_cand=16, max_mem=M_tot,
        entry_reseed=True,
        reseed_entry=dict(
            mem_s=jnp.asarray(out["mem_s"]), mem_b=jnp.asarray(out["mem_b"]),
            mem_e=jnp.asarray(out["mem_e"]), n_mem=jnp.asarray(out["n_mem"]),
            active=jnp.asarray(out["needs_r2"]))))
    n_emitting = 0
    for i in range(len(reads)):
        if out["overflow"][i] or r2m["overflow"][i]:
            continue
        q = np.asarray(batch.codes[i, : batch.lens[i]], np.int64)
        _, r2, _ = oracle_rounds(idx, opt, q)
        if not out["needs_r2"][i]:
            assert not r2, (i, r2)
            continue
        n0, n1 = int(out["n_mem"][i]), int(r2m["n_mem"][i])
        got = sorted(
            (int(r2m["mems"][i, j, 3]), int(r2m["mems"][i, j, 4]),
             int(r2m["mems"][i, j, 2]), int(r2m["mems"][i, j, 0]))
            for j in range(n0, n1))
        want = sorted((p.start, p.end, p.s, p.k) for p in r2)
        assert got == want, (i, got, want)
        n_emitting += bool(r2)
    assert n_emitting >= 4  # the crafted reads must exercise emissions


def test_end_to_end_kmer_equals_oracle():
    """Full pipeline under the kmer seeder (Aligner default) vs the
    oracle, including repeat reads that take the FM fallback."""
    from bioseqdb_tpu.cpu.ksw import cigar_to_string

    core = simulate_genome(30_000, seed=71)
    rep = simulate_genome(250, seed=72)
    g = core[:8000] + rep + core[8000:20000] + rep + core[20000:]
    idx = build_index([("ref", g)])
    opt = AlignOptions()
    al = Aligner.build(idx, opt, mode="full")
    assert al.kmer_meta is not None, "kmer seeder should be the default"
    sim = simulate_reads(g, 40, read_len=150, sub_rate=0.02, seed=73)
    reads = list(sim.reads)
    reads += [g[8100:8250], g[8050:8200]]        # inside/straddling repeat
    reads += [reads[0][:60] + "N" * 5 + reads[0][65:]]
    batch = pack_reads(reads, [f"r{i}" for i in range(len(reads))])
    results = al.align_batch(batch)
    LUT = np.zeros(256, np.uint8)
    for _i, _c in enumerate(b"ACGT"):
        LUT[_c] = _i
    LUT[ord("N")] = 4
    for i, r in enumerate(reads):
        q = LUT[np.frombuffer(r.encode(), np.uint8)]
        want = O.align_read(idx, opt, q, rand_id=i,
                            min_score=opt.min_score, all_hits=True)
        w = [(a.pos, a.is_rev, cigar_to_string(a.cigar), a.score, a.mapq,
              a.NM, bool(a.flag & 0x100)) for a in want]
        gg = [(h.ref_begin, h.is_reverse, h.cigar, h.score, h.mapq, h.nm,
               h.is_secondary) for h in results[i].hits]
        assert gg == w, (i, gg, w)


def test_fm_seeder_end_to_end_still_covered():
    """BST_SEEDER=fm keeps the FM pipeline end-to-end oracle-equal —
    the FM machine remains the sharded/long-read/fat-retry seeder, so
    its full-pipeline coverage must not silently vanish now that kmer
    is the default."""
    import os

    from bioseqdb_tpu.cpu.ksw import cigar_to_string

    g = simulate_genome(25_000, seed=87)
    idx = build_index([("ref", g)])
    opt = AlignOptions()
    os.environ["BST_SEEDER"] = "fm"
    try:
        al = Aligner.build(idx, opt, mode="full")
    finally:
        del os.environ["BST_SEEDER"]
    assert al.kmer_meta is None
    sim = simulate_reads(g, 24, read_len=150, sub_rate=0.02, seed=88)
    batch = pack_reads(list(sim.reads), [f"r{i}" for i in range(24)])
    results = al.align_batch(batch)
    LUT = np.zeros(256, np.uint8)
    for _i, _c in enumerate(b"ACGT"):
        LUT[_c] = _i
    for i, r in enumerate(sim.reads):
        q = LUT[np.frombuffer(r.encode(), np.uint8)]
        want = O.align_read(idx, opt, q, rand_id=i,
                            min_score=opt.min_score, all_hits=True)
        w = [(a.pos, a.is_rev, cigar_to_string(a.cigar), a.score, a.mapq)
             for a in want]
        gg = [(h.ref_begin, h.is_reverse, h.cigar, h.score, h.mapq)
              for h in results[i].hits]
        assert gg == w, (i, gg, w)


def test_kmer_gating():
    g = simulate_genome(5_000, seed=91)
    idx = build_index([("g", g)])
    assert km.kmer_eligible(idx, AlignOptions())
    assert not km.kmer_eligible(idx, AlignOptions(min_seed_len=15))
    assert not km.kmer_eligible(idx, AlignOptions(reseed_factor=1.0))
    al = Aligner.build(idx, AlignOptions(min_seed_len=15), mode="full")
    assert al.kmer_meta is None
    import os
    os.environ["BST_SEEDER"] = "fm"
    try:
        al = Aligner.build(idx, AlignOptions(), mode="full")
        assert al.kmer_meta is None
    finally:
        del os.environ["BST_SEEDER"]
