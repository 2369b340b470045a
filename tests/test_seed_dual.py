"""Dual-slot seeding (collect_seeds_device(dual=True)) must produce
exactly the classic mode's outputs — only the iteration schedule
differs."""
import numpy as np
import pytest

from bioseqdb_tpu.align.options import AlignOptions
from bioseqdb_tpu.index.builder import build_index
from bioseqdb_tpu.io.batch import pack_reads
from bioseqdb_tpu.kernels import fm as kfm
from bioseqdb_tpu.kernels.seed import build_r3_jump, collect_seeds_device
from bioseqdb_tpu.utils.sim import simulate_genome, simulate_reads


@pytest.fixture(scope="module", params=[False, True], ids=["nojump", "jump"])
def setup(request):
    import jax.numpy as jnp

    genome = simulate_genome(80_000, seed=31)
    idx = build_index([("ref", genome)])
    fm = kfm.FMDevice.from_host(idx)
    jb = jd = 0
    if request.param:
        fm, jb, jd = build_r3_jump(fm, depth=6)
    rng = np.random.default_rng(32)
    sim = simulate_reads(genome, 60, read_len=120, sub_rate=0.03, seed=33)
    reads = list(sim.reads)
    # ambiguity / pathology coverage: N runs, short reads, all-N
    reads[3] = reads[3][:50] + "N" * 7 + reads[3][57:]
    reads[7] = "N" * 120
    reads[11] = reads[11][:20]
    reads[13] = "ACGT" * 30  # repetitive
    batch = pack_reads(reads)
    codes = jnp.asarray(batch.codes, jnp.int32)
    lens = jnp.asarray(batch.lens, jnp.int32)
    return fm, jb, jd, codes, lens


def test_dual_equals_classic(setup):
    fm, jb, jd, codes, lens = setup
    opt = AlignOptions()
    split_len = int(opt.min_seed_len * opt.reseed_factor + 0.499)
    kw = dict(min_seed_len=opt.min_seed_len, split_len=split_len,
              split_width=opt.split_width, max_mem_intv=opt.max_mem_intv,
              jump_base=jb, jump_depth=jd, max_iters=50_000,
              max_cand=16, max_mem=24)
    ref = collect_seeds_device(fm, codes, lens, **kw)
    out = collect_seeds_device(fm, codes, lens, dual=True, **kw)
    assert not np.asarray(ref["overflow"]).any()
    assert not np.asarray(out["overflow"]).any()
    np.testing.assert_array_equal(np.asarray(out["n_mem"]),
                                  np.asarray(ref["n_mem"]))
    n_mem = np.asarray(ref["n_mem"])
    for i in range(codes.shape[0]):
        np.testing.assert_array_equal(
            np.asarray(out["mems"])[i, : n_mem[i]],
            np.asarray(ref["mems"])[i, : n_mem[i]], err_msg=f"read {i}")
