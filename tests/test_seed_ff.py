"""The in-loop s==1 fast-forward must be exactly result-equivalent to
stepwise device seeding (kernels/seed.py, SeedTable phases): same mems
on columns (k, s, start, end) — the l column is dead downstream
(chain.resolve_seeds reads columns 0/2/3/4 only) — same n_mem, same
overflow; only iteration counts may differ."""

import numpy as np
import pytest

import jax.numpy as jnp

from bioseqdb_tpu.align.options import AlignOptions
from bioseqdb_tpu.index.builder import build_index
from bioseqdb_tpu.kernels import fm as kfm
from bioseqdb_tpu.kernels.seed import build_seed_table, collect_seeds_device
from bioseqdb_tpu.io.batch import pack_reads
from bioseqdb_tpu.utils.sim import simulate_genome, simulate_reads


def run_pair(genome_n, B, sub_rate, seed, read_len=150, with_ns=False,
             jump=True, sa_interval=None, rank_dtype=None):
    g = simulate_genome(genome_n, seed=seed)
    idx = build_index([("r", g)], sa_interval=sa_interval)
    fm = kfm.FMDevice.from_host(idx, rank_dtype=rank_dtype)
    fm, table = build_seed_table(fm, idx, depth=None if jump else 0)
    assert table.ff
    opt = AlignOptions()
    sim = simulate_reads(g, B, read_len=read_len, sub_rate=sub_rate,
                         seed=seed + 1)
    reads = list(sim.reads)
    if with_ns:
        rng = np.random.default_rng(seed)
        reads = [
            "".join("N" if rng.random() < 0.03 else ch for ch in r)
            for r in reads
        ]
    rb = pack_reads(reads, sim.names)
    codes = jnp.asarray(rb.codes, jnp.int32)
    lens = jnp.asarray(rb.lens, jnp.int32)
    sl = int(opt.min_seed_len * opt.reseed_factor + 0.499)
    kw = dict(min_seed_len=opt.min_seed_len, split_len=sl,
              split_width=opt.split_width, max_mem_intv=opt.max_mem_intv,
              jump_base=table.jump_base, jump_depth=table.jump_depth,
              sa_interval=idx.sa_interval)
    ref = collect_seeds_device(fm, codes, lens, **kw)
    got = collect_seeds_device(fm, codes, lens, table=table, **kw)
    return ({k: np.asarray(v) for k, v in ref.items()},
            {k: np.asarray(v) for k, v in got.items()})


def assert_equal(ref, got):
    np.testing.assert_array_equal(ref["n_mem"], got["n_mem"])
    np.testing.assert_array_equal(ref["overflow"], got["overflow"])
    cols = [0, 2, 3, 4]  # k, s, start, end (l is dead downstream)
    eq = (ref["mems"][..., cols] == got["mems"][..., cols]).all(axis=-1)
    live = (np.arange(ref["mems"].shape[1])[None, :]
            < ref["n_mem"][:, None])
    bad = np.argwhere(live & ~eq)
    assert bad.size == 0, (bad[:5], ref["mems"][bad[0][0]],
                           got["mems"][bad[0][0]])


def test_ff_equal_mutated():
    ref, got = run_pair(150_000, 96, 0.02, seed=5)
    assert_equal(ref, got)
    assert got["iters"].mean() < ref["iters"].mean()


def test_ff_equal_exact_reads():
    ref, got = run_pair(80_000, 64, 0.0, seed=7)
    assert_equal(ref, got)


def test_ff_equal_with_ns():
    ref, got = run_pair(60_000, 64, 0.03, seed=9, with_ns=True)
    assert_equal(ref, got)


def test_ff_equal_no_jump():
    ref, got = run_pair(60_000, 48, 0.02, seed=11, jump=False)
    assert_equal(ref, got)


def test_ff_equal_tiny_genome_short_reads():
    # tiny genome: s==1 reached at depth 1-2, heavy fast-forward traffic;
    # short reads stress the window/end-of-read edges
    ref, got = run_pair(3_000, 48, 0.05, seed=13, read_len=40)
    assert_equal(ref, got)


def test_ff_equal_sa_interval_32():
    # bwa's sparse sampling: long resolve walks + ISA walk-downs
    ref, got = run_pair(120_000, 64, 0.02, seed=17, sa_interval=32)
    assert_equal(ref, got)


def test_ff_equal_int64_pairs():
    # forced int64 ranks on a small index: the lo/hi paired value
    # regions (SeedTable.pair) must decode exactly
    from jax import enable_x64

    with enable_x64():
        ref, got = run_pair(60_000, 48, 0.02, seed=19,
                            rank_dtype=jnp.int64)
    assert_equal(ref, got)


def test_isa_walk_matches_host():
    g = simulate_genome(50_000, seed=21)
    idx = build_index([("r", g)])
    fm = kfm.FMDevice.from_host(idx)
    isa = jnp.asarray(idx.isa_sample_array(), fm.rank_dtype)
    rng = np.random.default_rng(3)
    pos = rng.integers(0, idx.seq_len, size=256)
    ranks, ok = kfm.isa_walk(fm, isa, jnp.asarray(pos, fm.rank_dtype),
                             idx.sa_interval, jnp.ones(256, bool))
    ranks, ok = np.asarray(ranks), np.asarray(ok)
    for p, r, o in zip(pos, ranks, ok):
        if o:
            assert idx.sa_at(int(r)) == p, (p, r)
    assert ok.mean() > 0.95  # only the final partial stripe may bail
