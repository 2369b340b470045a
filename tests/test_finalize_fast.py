"""The vectorized single-region finalize fast path must agree exactly
with the per-read path (finalize_read) on every field."""

import numpy as np

from bioseqdb_tpu.align.finalize import (
    finalize_batch, finalize_read, frac_rep_batch, frac_rep_of,
    regions_to_alnregs,
)
from bioseqdb_tpu.align.options import AlignOptions
from bioseqdb_tpu.align.pipeline import Aligner
from bioseqdb_tpu.cpu.ksw import fill_scmat
from bioseqdb_tpu.index.builder import build_index
from bioseqdb_tpu.io.batch import pack_reads
from bioseqdb_tpu.utils.sim import simulate_genome, simulate_reads

import jax


def _reference_results(idx, opt, batch, out):
    mat = fill_scmat(opt.match_score, opt.mismatch_penalty)
    max_occ = opt.resolve_max_occ(idx.n_refs)
    res = []
    for i, name in enumerate(batch.names):
        q = batch.codes[i, : batch.lens[i]].astype(np.uint8)
        frac = frac_rep_of(out["mems"][i], int(out["n_mem"][i]), max_occ,
                           int(batch.lens[i]))
        regs = regions_to_alnregs(out, i, frac)
        res.append(finalize_read(idx, opt, q, regs, mat, i, name, i))
    return res


def test_fast_path_matches_per_read():
    genome = simulate_genome(120_000, seed=21)
    idx = build_index([("g", genome)])
    opt = AlignOptions()
    # substitutions ensure nonzero NM/MD variety; some short reads clip
    sim = simulate_reads(genome, 192, read_len=120, sub_rate=0.03, seed=22)
    reads = list(sim.reads)
    # append soft-clip cases: reads with junk tails
    rng = np.random.default_rng(5)
    for k in range(16):
        pos = int(rng.integers(0, len(genome) - 80))
        core = genome[pos:pos + 80]
        junk = "".join("ACGT"[c] for c in rng.integers(0, 4, 25))
        reads.append(core + junk if k % 2 else junk + core)
    batch = pack_reads(reads)
    al = Aligner.build(idx, opt, mode="full")
    out = jax.device_get(al.device_regions(batch, keep_mems=True))
    assert not np.asarray(out["overflow"]).any()

    got = finalize_batch(idx, opt, batch, out)
    want = _reference_results(idx, opt, batch, out)
    n_checked = 0
    for g, w in zip(got, want):
        assert g.query_name == w.query_name
        assert len(g.hits) == len(w.hits), g.query_name
        for hg, hw in zip(g.hits, w.hits):
            assert hg == hw, (g.query_name, hg, hw)
            n_checked += 1
    assert n_checked > 150


def test_frac_rep_batch_matches_scalar():
    rng = np.random.default_rng(3)
    B, M = 64, 12
    mems = np.zeros((B, M, 5), np.int64)
    mems[:, :, 3] = rng.integers(0, 100, (B, M))
    mems[:, :, 4] = mems[:, :, 3] + rng.integers(1, 60, (B, M))
    mems[:, :, 2] = rng.integers(0, 1200, (B, M))
    n_mem = rng.integers(0, M + 1, B)
    lens = rng.integers(1, 151, B)
    vec = frac_rep_batch(mems, n_mem, 500, lens)
    for i in range(B):
        ref = frac_rep_of(mems[i], int(n_mem[i]), 500, int(lens[i]))
        assert abs(vec[i] - ref) < 1e-12, i
