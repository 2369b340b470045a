"""Data-parallel distribution tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax

from bioseqdb_tpu.align.options import AlignOptions
from bioseqdb_tpu.align.pipeline import Aligner
from bioseqdb_tpu.dist.mesh import batch_sharded, make_mesh, pad_batch_rows
from bioseqdb_tpu.index.builder import build_index
from bioseqdb_tpu.io.batch import pack_reads
from bioseqdb_tpu.utils.sim import simulate_genome, simulate_reads


@pytest.fixture(scope="module")
def setup():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    g = simulate_genome(20_000, seed=61)
    idx = build_index([("ref", g)])
    return g, idx


def test_mesh_helpers(setup):
    mesh = make_mesh(8)
    assert mesh.devices.size == 8
    assert pad_batch_rows(13, mesh) == 16
    assert pad_batch_rows(16, mesh) == 16


def test_sharded_full_pipeline_matches_single_device(setup):
    g, idx = setup
    sim = simulate_reads(g, 24, read_len=100, sub_rate=0.03, seed=3)
    batch = pack_reads(sim.reads, sim.names)
    opt = AlignOptions()

    single = Aligner.build(idx, opt, mode="full").align_batch(batch)
    mesh = make_mesh(8)
    sharded = Aligner.build(idx, opt, mode="full", mesh=mesh).align_batch(batch)

    assert len(single) == len(sharded)
    for a, b in zip(single, sharded):
        ka = [(h.ref_begin, h.is_reverse, h.cigar, h.score, h.mapq, h.nm)
              for h in a.hits]
        kb = [(h.ref_begin, h.is_reverse, h.cigar, h.score, h.mapq, h.nm)
              for h in b.hits]
        assert ka == kb


def test_sharded_batch_actually_distributed(setup):
    g, idx = setup
    mesh = make_mesh(8)
    aligner = Aligner.build(idx, AlignOptions(), mode="full", mesh=mesh)
    sim = simulate_reads(g, 16, read_len=80, seed=4)
    batch = pack_reads(sim.reads, sim.names)
    codes, lens = aligner._put_batch(batch)
    assert codes.sharding == batch_sharded(mesh)
    assert len(codes.sharding.device_set) == 8
    # the replicated index is present on every device
    assert len(aligner.fm.blocks.sharding.device_set) == 8


def test_sharded_exact_mode(setup):
    g, idx = setup
    mesh = make_mesh(8)
    aligner = Aligner.build(idx, AlignOptions(), mode="exact", mesh=mesh)
    sim = simulate_reads(g, 19, read_len=60, seed=5)  # odd count -> padding
    batch = pack_reads(sim.reads, sim.names, pad_reads_to=1)
    results = aligner.align_batch(batch)
    assert len(results) == 19
    for res, p, s in zip(results, sim.positions, sim.strands):
        assert res.primary.ref_begin == p and res.primary.is_reverse == bool(s)


def test_dryrun_multichip_entry():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
