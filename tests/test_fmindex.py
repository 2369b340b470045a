"""FM-index property tests against naive suffix-array oracles.

The reference has no tests at this layer (its compute lives in linked
libbwa); SURVEY.md §4 calls for FM-index property tests vs a naive
oracle — these are them. Every rank/interval convention of
index/fmindex.py is pinned here.
"""

import numpy as np
import pytest

from bioseqdb_tpu.index.builder import build_index, build_index_from_fasta
from bioseqdb_tpu.index.fmindex import FMIndex, build_fmindex_from_codes
from bioseqdb_tpu.utils.sim import simulate_genome


def naive_all_hits(S: np.ndarray, pat: np.ndarray) -> list[int]:
    """All positions where pat occurs in S (doubled text)."""
    n, m = len(S), len(pat)
    return [i for i in range(n - m + 1) if np.array_equal(S[i : i + m], pat)]


def doubled(pac: np.ndarray) -> np.ndarray:
    return np.concatenate([pac, (3 - pac)[::-1]])


@pytest.fixture(scope="module")
def small_index():
    rng = np.random.default_rng(42)
    pac = rng.integers(0, 4, size=500, dtype=np.uint8)
    return pac, build_fmindex_from_codes(pac)


def test_l2_counts(small_index):
    pac, idx = small_index
    S = doubled(pac)
    counts = np.bincount(S, minlength=4)
    assert idx.L2[0] == 0
    assert np.array_equal(np.diff(idx.L2), np.append(counts[:4], 0)[:4])
    assert idx.L2[4] == len(S)


def test_backward_search_matches_naive(small_index):
    pac, idx = small_index
    S = doubled(pac)
    rng = np.random.default_rng(7)
    for m in [1, 2, 3, 5, 8, 13, 21]:
        for _ in range(20):
            # half sampled from the text (guaranteed hits), half random
            if rng.random() < 0.5:
                start = int(rng.integers(0, len(S) - m))
                pat = S[start : start + m]
            else:
                pat = rng.integers(0, 4, size=m, dtype=np.uint8)
            lo, hi = idx.backward_search(pat)
            hits = naive_all_hits(S, pat)
            assert hi - lo == len(hits), (m, pat)
            # resolve every rank in the interval and compare positions
            got = sorted(idx.sa_at(r) for r in range(lo, hi))
            assert got == hits


def test_occ_consistency_full_scan(small_index):
    _, idx = small_index
    n = idx.seq_len
    # occ at n equals total counts
    for c in range(4):
        assert idx.occ_stored(c, n) == idx.L2[c + 1] - idx.L2[c]
    # occ is monotone with unit steps matching stored codes
    rng = np.random.default_rng(3)
    for j in rng.integers(0, n, size=100):
        j = int(j)
        c = idx.stored_code(j)
        assert idx.occ_stored(c, j + 1) == idx.occ_stored(c, j) + 1


def test_sa_resolution_every_rank():
    rng = np.random.default_rng(5)
    pac = rng.integers(0, 4, size=101, dtype=np.uint8)  # odd length
    idx = build_fmindex_from_codes(pac)
    S = doubled(pac)
    from bioseqdb_tpu.index.native.build import suffix_array

    sa = suffix_array(S)
    # rank 0 is the sentinel row: sample[0] = -1 by construction (the bwa
    # wrap trick) and no non-empty pattern interval ever contains it.
    for r in range(1, idx.seq_len + 1):
        assert idx.sa_at(r) == sa[r], r


def test_fmd_extend_backward_matches_naive(small_index):
    pac, idx = small_index
    S = doubled(pac)
    rng = np.random.default_rng(11)
    for _ in range(30):
        m = int(rng.integers(1, 12))
        start = int(rng.integers(0, len(S) - m))
        pat = S[start : start + m]
        lo, hi = idx.backward_search(pat)
        rc = (3 - pat)[::-1]
        lo_rc, hi_rc = idx.backward_search(rc)
        s = hi - lo
        assert hi_rc - lo_rc == s  # doubled text: strand symmetry
        k4, l4, s4 = idx.fmd_extend(lo, lo_rc, s, is_back=True)
        for c in range(4):
            elo, ehi = idx.backward_search(np.concatenate([[c], pat]))
            assert s4[c] == ehi - elo
            if s4[c] > 0:
                assert k4[c] == elo
                erc_lo, _ = idx.backward_search((3 - np.concatenate([[c], pat]))[::-1])
                assert l4[c] == erc_lo


def test_fmd_extend_forward_matches_naive(small_index):
    pac, idx = small_index
    S = doubled(pac)
    rng = np.random.default_rng(13)
    for _ in range(30):
        m = int(rng.integers(1, 12))
        start = int(rng.integers(0, len(S) - m))
        pat = S[start : start + m]
        lo, _ = idx.backward_search(pat)
        rc = (3 - pat)[::-1]
        lo_rc, hi_rc = idx.backward_search(rc)
        s = hi_rc - lo_rc
        k4, l4, s4 = idx.fmd_extend(lo, lo_rc, s, is_back=False)
        for c in range(4):
            ext = np.concatenate([pat, [c]])
            elo, ehi = idx.backward_search(ext)
            assert s4[c] == ehi - elo, (pat, c)
            if s4[c] > 0:
                assert k4[c] == elo
                erc_lo, _ = idx.backward_search((3 - ext)[::-1])
                assert l4[c] == erc_lo


def test_depos_strand_mapping(small_index):
    pac, idx = small_index
    # a hit at doubled position p >= l_pac of length m maps to the
    # forward window whose revcomp equals the pattern
    S = doubled(pac)
    m = 10
    p = idx.l_pac + 17
    pat = S[p : p + m]
    fwd, is_rev = idx.depos(p, m)
    assert is_rev
    window = pac[fwd : fwd + m]
    assert np.array_equal((3 - window)[::-1], pat)
    fwd2, rev2 = idx.depos(33, m)
    assert (fwd2, rev2) == (33, False)


def test_multi_ref_annotations_and_rid():
    idx = build_index([(7, "chrA", "ACGTACGTAA"), (9, "chrB", "TTTTCCCC")])
    assert idx.n_refs == 2
    assert list(idx.ref_ids) == [7, 9]
    assert list(idx.ref_offsets) == [0, 10]
    assert list(idx.ref_lens) == [10, 8]
    assert idx.rid_of(0) == 0 and idx.rid_of(9) == 0
    assert idx.rid_of(10) == 1 and idx.rid_of(17) == 1


def test_hole_rebase_multi_ref():
    # the reference's hole-offset rebase is buggy for every ref after the
    # first (bwa.cpp:100-104) — ours must be correct
    idx = build_index([("a", "ACGTN"), ("b", "NNACGT")])
    assert list(idx.hole_offsets) == [4, 5]
    assert list(idx.hole_lens) == [1, 2]
    assert idx.extract_subseq(0, 11) == "ACGTNNNACGT"


def test_extract_subseq_window(small_index):
    pac, idx = small_index
    from bioseqdb_tpu.seq.codec import CHAR_OF

    assert idx.extract_subseq(5, 25) == CHAR_OF[pac[5:25]].tobytes().decode()


def test_save_load_roundtrip(tmp_path, small_index):
    _, idx = small_index
    p = str(tmp_path / "idx")
    idx.save(p)
    loaded = FMIndex.load(p)
    assert loaded.primary == idx.primary
    assert np.array_equal(loaded.blocks, idx.blocks)
    assert np.array_equal(loaded.sa_sample, idx.sa_sample)
    assert loaded.ref_names == idx.ref_names
    # queries work identically on the mmap'd copy
    pat = np.array([0, 1, 2, 3], np.uint8)
    assert loaded.backward_search(pat) == idx.backward_search(pat)


def test_build_from_fasta(tmp_path):
    g = simulate_genome(2000, seed=9)
    fa = tmp_path / "g.fa"
    fa.write_text(f">genome test\n{g}\n")
    idx = build_index_from_fasta(fa)
    assert idx.l_pac == 2000
    assert idx.ref_names == ["genome"]


def test_ambiguous_bases_get_filler_and_are_indexed():
    idx = build_index([("a", "ACGTNNNNACGT")])
    assert idx.l_pac == 12
    # filler codes are 0..3 — the doubled text is well-formed
    assert idx.pac.max() <= 3


def test_empty_refs_rejected():
    with pytest.raises(ValueError, match="zero reference"):
        build_index([])
