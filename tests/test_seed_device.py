"""Device SMEM seeding must agree exactly with the oracle's collect_intv."""

import numpy as np
import pytest

import jax.numpy as jnp

from bioseqdb_tpu.align.options import AlignOptions
from bioseqdb_tpu.cpu import oracle as O
from bioseqdb_tpu.index.builder import build_index
from bioseqdb_tpu.kernels import fm as kfm
from bioseqdb_tpu.kernels.seed import collect_seeds_device
from bioseqdb_tpu.utils.sim import simulate_genome, simulate_reads


@pytest.fixture(scope="module")
def setup():
    g = simulate_genome(30_000, seed=11)
    idx = build_index([("ref", g)])
    return g, idx, kfm.FMDevice.from_host(idx)


LUT = np.zeros(256, np.uint8)
for _i, _c in enumerate(b"ACGT"):
    LUT[_c] = _i
LUT[ord("N")] = 4


def enc(s):
    return LUT[np.frombuffer(s.encode(), np.uint8)]


def device_seeds(fm, reads_codes, opt, W=160, jump_base=0, jump_depth=8,
                 kcand=4):
    B = len(reads_codes)
    codes = np.full((B, W), 4, np.int32)
    lens = np.zeros(B, np.int32)
    for i, rc in enumerate(reads_codes):
        codes[i, : len(rc)] = rc
        lens[i] = len(rc)
    split_len = int(opt.min_seed_len * opt.reseed_factor + 0.499)
    out = collect_seeds_device(
        fm, jnp.asarray(codes), jnp.asarray(lens),
        min_seed_len=opt.min_seed_len, split_len=split_len,
        split_width=opt.split_width, max_mem_intv=opt.max_mem_intv,
        jump_base=jump_base, jump_depth=jump_depth, kcand=kcand,
    )
    return {k: np.asarray(v) for k, v in out.items()}


def oracle_seeds(idx, rc, opt):
    # the l half of the bi-interval is dead downstream of seeding and the
    # device path does not materialize it (kernels/seed.py candidate
    # tables); compare (start, end, k, s)
    mems, _ = O.collect_intv(idx, opt, rc)
    return sorted((m.start, m.end, m.k, m.s) for m in mems)


def compare(idx, fm, reads_codes, opt):
    got = device_seeds(fm, reads_codes, opt)
    assert not got["overflow"].any()
    for i, rc in enumerate(reads_codes):
        n = got["n_mem"][i]
        dev = sorted(
            (int(r[3]), int(r[4]), int(r[0]), int(r[2]))
            for r in got["mems"][i, :n]
        )
        want = oracle_seeds(idx, rc, opt)
        assert dev == want, (i, dev, want)


def test_exact_reads(setup):
    g, idx, fm = setup
    sim = simulate_reads(g, 16, read_len=100, seed=1)
    compare(idx, fm, [enc(r) for r in sim.reads], AlignOptions())


def test_mismatched_reads(setup):
    g, idx, fm = setup
    sim = simulate_reads(g, 24, read_len=150, sub_rate=0.04, seed=2)
    compare(idx, fm, [enc(r) for r in sim.reads], AlignOptions())


def test_reads_with_ns(setup):
    g, idx, fm = setup
    sim = simulate_reads(g, 8, read_len=120, seed=3)
    reads = []
    rng = np.random.default_rng(4)
    for r in sim.reads:
        rc = enc(r)
        for _ in range(int(rng.integers(1, 4))):
            rc[int(rng.integers(0, len(rc)))] = 4
        reads.append(rc)
    compare(idx, fm, reads, AlignOptions())


def test_random_junk_reads(setup):
    g, idx, fm = setup
    rng = np.random.default_rng(5)
    reads = [rng.integers(0, 4, int(rng.integers(30, 150))).astype(np.uint8)
             for _ in range(16)]
    compare(idx, fm, reads, AlignOptions())


def test_chimeric_reads(setup):
    g, idx, fm = setup
    reads = []
    for a, b in [(1000, 9000), (2000, 20000), (4000, 15000)]:
        reads.append(enc(g[a : a + 70] + g[b : b + 80]))
    compare(idx, fm, reads, AlignOptions())


def test_short_and_edge_reads(setup):
    g, idx, fm = setup
    reads = [
        enc(g[:40]),                    # genome start
        enc(g[-40:]),                   # genome end
        enc(g[500:525]),                # just above min_seed_len
        enc("ACGT" * 5),                # short, likely multi-hit
        np.full(30, 4, np.uint8),       # all N: no seeds
    ]
    compare(idx, fm, reads, AlignOptions())


def test_min_seed_1_matches_round1(setup):
    # with min_seed_len=1 and rounds 2/3 off, output = pure SMEMs
    g, idx, fm = setup
    opt = AlignOptions(min_seed_len=1, max_mem_intv=0, reseed_factor=1.5,
                      split_width=0)
    rng = np.random.default_rng(6)
    reads = [rng.integers(0, 4, 20).astype(np.uint8) for _ in range(8)]
    compare(idx, fm, reads, opt)


def test_compaction_path_matches_uncompacted():
    """B >= 1024 engages straggler compaction; results must be
    identical to the plain path (smaller sub-batches)."""
    import numpy as np

    from bioseqdb_tpu.index.builder import build_index
    from bioseqdb_tpu.io.batch import pack_reads
    from bioseqdb_tpu.kernels import fm as kfm
    from bioseqdb_tpu.kernels.seed import collect_seeds_device
    from bioseqdb_tpu.utils.sim import simulate_genome, simulate_reads

    genome = simulate_genome(40_000, seed=11)
    idx = build_index([("g", genome)])
    fm = kfm.FMDevice.from_host(idx)
    sim = simulate_reads(genome, 1024, read_len=36, sub_rate=0.03, seed=12)
    rb = pack_reads(sim.reads, sim.names)
    import jax.numpy as jnp

    codes = jnp.asarray(rb.codes, jnp.int32)
    lens = jnp.asarray(rb.lens, jnp.int32)
    kw = dict(min_seed_len=15, split_len=21, split_width=10, max_mem_intv=200)
    big = collect_seeds_device(fm, codes, lens, **kw)
    for s in range(0, 1024, 256):
        small = collect_seeds_device(fm, codes[s:s + 256], lens[s:s + 256], **kw)
        np.testing.assert_array_equal(np.asarray(big["n_mem"])[s:s + 256],
                                      np.asarray(small["n_mem"]))
        np.testing.assert_array_equal(np.asarray(big["mems"])[s:s + 256],
                                      np.asarray(small["mems"]))
        np.testing.assert_array_equal(np.asarray(big["overflow"])[s:s + 256],
                                      np.asarray(small["overflow"]))


def test_r3_jump_exact_equivalence(setup):
    """The depth-8 r3 prefix jump must be output-identical to the
    stepwise path (mems content AND order; iters may differ)."""
    from bioseqdb_tpu.kernels.seed import build_r3_jump

    g, idx, fm = setup
    opt = AlignOptions()
    fm_j, base, depth = build_r3_jump(fm, depth=6)
    assert base > 0 and depth == 6
    sim = simulate_reads(g, 48, read_len=150, sub_rate=0.02, seed=3)
    reads = list(sim.reads)
    # ambiguity near pivots exercises the clean-window gate
    reads.append(sim.reads[0][:40] + "N" + sim.reads[0][41:])
    reads.append("N" * 10 + sim.reads[1][10:])
    rc = [enc(r) for r in reads]
    ref = device_seeds(fm, rc, opt)
    got = device_seeds(fm_j, rc, opt, jump_base=base, jump_depth=depth)
    np.testing.assert_array_equal(np.asarray(ref["n_mem"]),
                                  np.asarray(got["n_mem"]))
    np.testing.assert_array_equal(np.asarray(ref["mems"]),
                                  np.asarray(got["mems"]))
    assert not np.asarray(got["overflow"]).any()
    # the jump must actually engage (fewer iterations)
    assert np.asarray(got["iters"]).sum() < np.asarray(ref["iters"]).sum()


def test_r3_jump_host_splice_matches_device_concat(setup):
    """The host-spliced jump-table build (multi-GB indexes: the device
    concatenate transiently multiplies the table allocation and OOMs
    HBM at GRCh38 scale) must produce the identical extended index."""
    import numpy as np
    from bioseqdb_tpu.kernels.seed import build_r3_jump

    g, idx, fm = setup
    dev, b_dev, d_dev = build_r3_jump(fm, depth=6)
    host, b_h, d_h = build_r3_jump(fm, depth=6,
                                   host_blocks=np.asarray(idx.blocks),
                                   host_sa_bits=np.asarray(idx.sa_bits),
                                   host_splice_threshold=0)
    assert (b_dev, d_dev) == (b_h, d_h) and b_dev > 0
    assert np.array_equal(np.asarray(dev.blocks), np.asarray(host.blocks))
    assert np.array_equal(np.asarray(dev.occ_majors),
                          np.asarray(host.occ_majors))


def test_multi_candidate_columns_match_classic(setup):
    """kcand > 1 (multi-candidate backward columns) must emit exactly
    the classic one-candidate-per-iteration results — only iteration
    counts may differ (fewer)."""
    g, idx, fm = setup
    sim = simulate_reads(g, 32, read_len=150, sub_rate=0.03, seed=13)
    reads = [enc(r) for r in sim.reads]
    # include repeat-crossing reads (nested multi-candidate columns)
    reads += [enc(g[500:620] + g[500:530])]
    opt = AlignOptions()
    ref = device_seeds(fm, reads, opt, kcand=1)
    for kc in (2, 4, 8):
        got = device_seeds(fm, reads, opt, kcand=kc)
        assert (got["n_mem"] == ref["n_mem"]).all(), kc
        assert (got["mems"] == ref["mems"]).all(), kc
        assert (got["overflow"] == ref["overflow"]).all(), kc
        assert (got["iters"] <= ref["iters"]).all(), kc
