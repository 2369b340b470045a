"""Columnar finalize (align/columns.py) must agree with the object path
(finalize_batch), and the columnar SAM emitter with the per-record one."""
import numpy as np
import pytest

from bioseqdb_tpu.align.columns import finalize_columns
from bioseqdb_tpu.align.finalize import finalize_batch
from bioseqdb_tpu.align.options import AlignOptions
from bioseqdb_tpu.align.pipeline import Aligner
from bioseqdb_tpu.index.builder import build_index
from bioseqdb_tpu.io.batch import pack_reads
from bioseqdb_tpu.sam.emit import emit_sam, emit_sam_columns
from bioseqdb_tpu.utils.sim import simulate_genome, simulate_reads


@pytest.fixture(scope="module")
def setup():
    genome = simulate_genome(120_000, seed=11)
    idx = build_index([("ref", genome)])
    opt = AlignOptions()
    al = Aligner.build(idx, opt, mode="full")
    sim = simulate_reads(genome, 48, read_len=150, sub_rate=0.02, seed=12)
    # a couple of junk reads to exercise unmapped + short rows
    reads = list(sim.reads)
    names = list(sim.names)
    reads[5] = "ACGT" * 8
    names[5] = "short"
    reads[11] = "N" * 150
    names[11] = "junk"
    batch = pack_reads(reads, names)
    import jax

    out = jax.device_get(al.device_regions(batch))
    return idx, opt, batch, out, reads


def test_columns_match_results(setup):
    idx, opt, batch, out, reads = setup
    cols = finalize_columns(idx, opt, batch, dict(out))
    res = finalize_batch(idx, opt, batch, dict(out))
    assert cols.n == len(batch.names)
    for i, r in enumerate(res):
        assert cols.mapped[i] == r.mapped, i
        if not r.mapped:
            continue
        h = r.primary
        assert cols.pos[i] == h.ref_begin, i
        assert cols.ref_end[i] == h.ref_end, i
        assert cols.rid[i] == h.rid
        assert cols.mapq[i] == h.mapq
        assert cols.nm[i] == h.nm
        assert cols.score[i] == h.score
        assert bool(cols.is_rev[i]) == h.is_reverse
        assert cols.qb[i] == h.query_begin
        assert cols.qe[i] == h.query_end
        if i not in cols.extra:
            assert cols.cigar(i) == h.cigar, i
            assert cols.md(i) == h.md, i


def test_sam_columns_match_records(setup):
    idx, opt, batch, out, reads = setup
    cols = finalize_columns(idx, opt, batch, dict(out))
    res = finalize_batch(idx, opt, batch, dict(out))
    sam_obj = emit_sam(res, idx, [r for r in reads], header=False)
    sam_col = emit_sam_columns(cols, idx, batch, header=False)
    # the columnar emitter writes only the primary line for fast rows;
    # compare line-by-line on reads without secondary/supplementary hits
    lines_obj = sam_obj.splitlines()
    lines_col = sam_col.splitlines()
    by_name_obj = {}
    for ln in lines_obj:
        by_name_obj.setdefault(ln.split("\t", 1)[0], []).append(ln)
    by_name_col = {}
    for ln in lines_col:
        by_name_col.setdefault(ln.split("\t", 1)[0], []).append(ln)
    assert set(by_name_obj) == set(by_name_col)
    n_checked = 0
    for name, objs in by_name_obj.items():
        if len(objs) == 1:
            assert by_name_col[name] == objs, name
            n_checked += 1
    assert n_checked >= 40  # the vast majority single-line
