"""Reference-parity search API tests (nuclseq_search_bwa semantics)."""

import pytest

from bioseqdb_tpu.align.options import AlignOptions, bwa_opts
from bioseqdb_tpu.align.pipeline import Aligner
from bioseqdb_tpu.api import SearchResult, multi_search, search
from bioseqdb_tpu.index.builder import build_index
from bioseqdb_tpu.seq.codec import Sequence
from bioseqdb_tpu.utils.sim import simulate_genome


@pytest.fixture(scope="module")
def refs():
    a = simulate_genome(3000, seed=51)
    b = simulate_genome(2000, seed=52)
    return a, b, [(100, "chrA", a), (200, "chrB", b)]


def test_search_single_query(refs):
    a, b, rows = refs
    hits = search(a[500:580], rows)
    assert len(hits) >= 1
    h = hits[0]
    assert h.ref_id == 100 and h.ref_name == "chrA"
    assert h.query_id is None  # reference emits NULL in single-query mode
    assert (h.ref_match_start, h.ref_match_end, h.ref_match_len) == (500, 580, 80)
    assert (h.query_match_start, h.query_match_end) == (0, 80)
    assert h.ref_subseq == a[500:580]
    assert h.query_subseq == a[500:580]
    assert h.is_primary and not h.is_secondary and not h.is_reverse
    assert h.cigar == "80M" and h.score == 80


def test_search_accepts_sequence_objects(refs):
    a, b, rows = refs
    hits = search(Sequence.from_text(b[100:170]), rows)
    assert hits[0].ref_name == "chrB" and hits[0].ref_id == 200


def test_multi_search_query_ids(refs):
    a, b, rows = refs
    hits = multi_search([a[0:80], b[0:80], a[1000:1080]], rows)
    by_qid = {}
    for h in hits:
        by_qid.setdefault(h.query_id, []).append(h)
    assert set(by_qid) == {0, 1, 2}
    assert by_qid[0][0].ref_name == "chrA"
    assert by_qid[1][0].ref_name == "chrB"
    assert by_qid[2][0].ref_match_start == 1000


def test_search_with_prebuilt_index_and_options(refs):
    a, b, rows = refs
    idx = build_index(rows)
    opts = bwa_opts(min_seed_len=25)
    hits = search(a[600:700], idx, opts)
    assert hits[0].ref_match_start == 600
    aligner = Aligner.build(idx, AlignOptions())
    hits2 = search(a[600:700], aligner)
    assert hits2[0].ref_match_start == 600


def test_search_ref_subseq_with_holes():
    g = simulate_genome(2000, seed=53)
    ref = g[:800] + "NNNN" + g[800:]
    hits = search(g[760:840], [(1, "r", ref)])
    # the matched window crosses the N run: ref_subseq re-overlays holes
    h = hits[0]
    assert "NNNN" in h.ref_subseq or h.ref_match_len < 80


def test_search_reverse_strand(refs):
    a, b, rows = refs
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    rc = "".join(comp[c] for c in reversed(a[300:380]))
    h = search(rc, rows)[0]
    assert h.is_reverse
    assert h.ref_match_start == 300
    assert h.ref_subseq == a[300:380]  # forward-strand window


def test_search_no_hits(refs):
    a, b, rows = refs
    assert search("N" * 60, rows) == []
