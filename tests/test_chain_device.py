"""Device seed resolution + chaining + filtering vs the oracle."""

import numpy as np
import pytest

import jax.numpy as jnp

from bioseqdb_tpu.align.options import AlignOptions
from bioseqdb_tpu.cpu import oracle as O
from bioseqdb_tpu.index.builder import build_index
from bioseqdb_tpu.kernels import fm as kfm
from bioseqdb_tpu.kernels.chain import chain_seeds, filter_chains, resolve_seeds
from bioseqdb_tpu.kernels.seed import collect_seeds_device
from bioseqdb_tpu.utils.sim import simulate_genome, simulate_reads

LUT = np.zeros(256, np.uint8)
for _i, _c in enumerate(b"ACGT"):
    LUT[_c] = _i
LUT[ord("N")] = 4
enc = lambda s: LUT[np.frombuffer(s.encode(), np.uint8)]


@pytest.fixture(scope="module")
def setup():
    core = simulate_genome(25_000, seed=21)
    rep = simulate_genome(400, seed=22)
    # include a repeat so multi-chain/secondary paths get exercised
    g = core[:8000] + rep + core[8000:16000] + rep + core[16000:]
    idx = build_index([("ref", g)])
    return g, idx, kfm.FMDevice.from_host(idx)


def run_device(fm, reads_codes, opt, idx, W=160, S=64, C=16):
    B = len(reads_codes)
    codes = np.full((B, W), 4, np.int32)
    lens = np.zeros(B, np.int32)
    for i, rc in enumerate(reads_codes):
        codes[i, : len(rc)] = rc
        lens[i] = len(rc)
    split_len = int(opt.min_seed_len * opt.reseed_factor + 0.499)
    seeds_out = collect_seeds_device(
        fm, jnp.asarray(codes), jnp.asarray(lens),
        min_seed_len=opt.min_seed_len, split_len=split_len,
        split_width=opt.split_width, max_mem_intv=opt.max_mem_intv,
    )
    max_occ = opt.resolve_max_occ(idx.n_refs)
    seeds = resolve_seeds(fm, seeds_out["mems"], seeds_out["n_mem"],
                          max_occ=max_occ, max_seeds=S)
    chains = chain_seeds(fm, seeds, max_chains=C, bandwidth=opt.bandwidth,
                         max_chain_gap=opt.max_chain_gap)
    flt = filter_chains(chains, seeds, mask_level=opt.mask_level,
                        chain_drop_ratio=opt.chain_drop_ratio,
                        min_chain_weight=opt.min_chain_weight,
                        min_seed_len=opt.min_seed_len,
                        max_chain_gap=opt.max_chain_gap)
    return (
        {k: np.asarray(v) for k, v in seeds.items()},
        {k: np.asarray(v) for k, v in chains.items()},
        {k: np.asarray(v) for k, v in flt.items()},
    )


def oracle_chains(idx, rc, opt):
    chains = O.mem_chain(idx, opt, rc)
    flt = O.chain_flt(opt, [  # filter on copies to keep the originals
        O.Chain(pos=c.pos, rid=c.rid, seeds=list(c.seeds), frac_rep=c.frac_rep)
        for c in chains
    ])
    return chains, flt


def device_chain_sets(seeds, chains, i):
    """Reconstruct device chains as seed-tuple lists per chain slot."""
    out = {}
    for s in range(seeds["rbeg"].shape[1]):
        ci = chains["assign"][i, s]
        if ci >= 0:
            out.setdefault(int(ci), []).append(
                (int(seeds["rbeg"][i, s]), int(seeds["qbeg"][i, s]),
                 int(seeds["len"][i, s]))
            )
    return out


def compare_reads(setup_t, reads, opt=None):
    g, idx, fm = setup_t
    opt = opt or AlignOptions()
    rcs = [enc(r) for r in reads]
    seeds, chains, flt = run_device(fm, rcs, opt, idx)
    assert not seeds["overflow"].any() and not chains["overflow"].any()
    for i, rc in enumerate(rcs):
        want_chains, want_kept = oracle_chains(idx, rc, opt)
        dev = device_chain_sets(seeds, chains, i)
        # device chains (in slot order = creation order) must equal the
        # oracle's chains (sorted by pos; creation order differs), so
        # compare as sets keyed by first-seed
        dev_sets = sorted(dev.values())
        want_sets = sorted(
            [[(s.rbeg, s.qbeg, s.len) for s in c.seeds] for c in want_chains]
        )
        assert dev_sets == want_sets, (i, dev_sets, want_sets)
        # filtering: kept device chains (kept>0) == oracle's kept, with
        # matching weights
        kept_dev = sorted(
            int(flt["weight"][i, c]) for c in range(flt["kept"].shape[1])
            if flt["kept"][i, c] > 0
        )
        kept_want = sorted(c.w for c in want_kept)
        assert kept_dev == kept_want, (i, kept_dev, kept_want)


def test_unique_reads(setup):
    g, idx, fm = setup
    sim = simulate_reads(g, 16, read_len=120, seed=1)
    compare_reads(setup, sim.reads)


def test_mismatched_reads(setup):
    g, idx, fm = setup
    sim = simulate_reads(g, 24, read_len=150, sub_rate=0.04, seed=2)
    compare_reads(setup, sim.reads)


def test_repeat_reads_multi_chain(setup):
    g, idx, fm = setup
    # reads inside the duplicated 400bp block: two chains, one kept pair
    reads = [g[8000 + off : 8000 + off + 120] for off in (0, 100, 250)]
    compare_reads(setup, reads)


def test_chimeric_reads(setup):
    g, idx, fm = setup
    reads = [
        g[1000:1075] + g[20000:20075],
        g[3000:3080] + g[12000:12070],
    ]
    compare_reads(setup, reads)


def test_indel_reads(setup):
    g, idx, fm = setup
    reads = [
        g[5000:5060] + g[5063:5123],      # deletion
        g[6000:6050] + "ACGTA" + g[6050:6110],  # insertion
    ]
    compare_reads(setup, reads)


def test_l_rep_device_matches_host():
    """Device l_rep must equal frac_rep_batch's numerator bit-for-bit
    (MAPQ depends on it through frac_rep)."""
    import numpy as np

    from bioseqdb_tpu.align.finalize import frac_rep_batch
    from bioseqdb_tpu.kernels.chain import l_rep_device

    rng = np.random.default_rng(11)
    B, M = 64, 24
    mems = np.zeros((B, M, 5), np.int32)
    n_mem = rng.integers(0, M + 1, B).astype(np.int32)
    start = rng.integers(0, 140, (B, M))
    length = rng.integers(1, 40, (B, M))
    mems[:, :, 3] = start
    mems[:, :, 4] = start + length
    mems[:, :, 2] = rng.integers(0, 1200, (B, M))  # occ counts
    lens = np.full(B, 150, np.int32)
    max_occ = 500
    want = frac_rep_batch(mems, n_mem, max_occ, lens) * 150
    got = np.asarray(l_rep_device(mems, n_mem, max_occ=max_occ))
    np.testing.assert_array_equal(got, np.round(want).astype(np.int64))
