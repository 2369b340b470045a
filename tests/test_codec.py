"""Codec unit tests.

Ports the semantics of all 18 reference SQL integration cases
(reference: test/run.py:25-171) onto the Python codec, then extends
coverage to the operations the reference left untested (complement,
reverse, compare — SURVEY.md §4).
"""

import string

import numpy as np
import pytest

from bioseqdb_tpu.seq.codec import (
    ALLOWED_NUCLEOTIDES,
    Sequence,
    minstd_stream,
    nuclseq_in,
)

ALLOWED = set(ALLOWED_NUCLEOTIDES)


# -- input acceptance (test/run.py:25-38) ---------------------------------

def test_accept_basic_symbols():
    assert nuclseq_in("ACGT").to_text() == "ACGT"


def test_accept_wildcard_symbol():
    assert nuclseq_in("N").to_text() == "N"


def test_accept_subset_symbols():
    assert nuclseq_in("RYKMSWBDHVN").to_text() == "RYKMSWBDHVN"


# -- input rejection (test/run.py:40-94) ----------------------------------

def test_reject_lowercase_symbols():
    for symbol in string.ascii_lowercase:
        with pytest.raises(ValueError) as e:
            nuclseq_in(symbol)
        assert f"invalid nucleotide in nuclseq_in: '{symbol}'" in str(e.value)


def test_reject_unknown_letters():
    for symbol in set(string.ascii_uppercase) - ALLOWED:
        with pytest.raises(ValueError) as e:
            nuclseq_in(symbol)
        assert f"invalid nucleotide in nuclseq_in: '{symbol}'" in str(e.value)


def test_reject_nonletter_ascii():
    for symbol in set(chr(i) for i in range(1, 128)) - set(string.ascii_letters):
        with pytest.raises(ValueError) as e:
            nuclseq_in(symbol)
        assert f"invalid nucleotide in nuclseq_in: '{symbol}'" in str(e.value)


def test_reject_valid_utf8():
    with pytest.raises(ValueError) as e:
        nuclseq_in("żółć")
    assert "invalid nucleotide in nuclseq_in: '�'" in str(e.value)


def test_reject_invalid_utf8():
    with pytest.raises(ValueError) as e:
        nuclseq_in(b"\xc3\x28")
    assert "invalid nucleotide in nuclseq_in: '�'" in str(e.value)


# -- length (test/run.py:96-109) ------------------------------------------

def test_length_zero():
    assert len(nuclseq_in("")) == 0


def test_length_one():
    assert len(nuclseq_in("A")) == 1


def test_length_ten():
    assert len(nuclseq_in("ACGTNRYKMS")) == 10


# -- content (test/run.py:111-171) ----------------------------------------

def test_content_zero():
    assert nuclseq_in("ACACACAC").content("G") == 0.0


def test_content_one():
    assert nuclseq_in("GGGGGGGG").content("G") == 1.0


def test_content_half():
    assert nuclseq_in("ACACACAC").content("A") == 0.5


def test_content_with_wildcards():
    assert nuclseq_in("ANNNANNN").content("A") == 0.25


def test_content_with_subsets():
    assert nuclseq_in("ARRRARRR").content("A") == 0.25


def test_content_of_wildcard():
    assert nuclseq_in("ARNNARNN").content("N") == 0.5


def test_content_of_subset():
    assert nuclseq_in("ARRRARRR").content("R") == 0.75


def test_content_null_on_empty_sequence():
    assert nuclseq_in("").content("A") is None


def test_content_rejects_empty_needle():
    with pytest.raises(ValueError) as e:
        nuclseq_in("ACGT").content("")
    assert "invalid nucleotide in nuclseq_content: ''" in str(e.value)


def test_content_rejects_empty_needle_on_empty_sequence():
    with pytest.raises(ValueError) as e:
        nuclseq_in("").content("")
    assert "invalid nucleotide in nuclseq_content: ''" in str(e.value)


def test_content_rejects_invalid_needles():
    # the reference's acknowledged TODO (test/run.py:161)
    for needle in ["X", "a", "?", "AC"]:
        with pytest.raises(ValueError) as e:
            nuclseq_in("ACGT").content(needle)
        assert "invalid nucleotide in nuclseq_content" in str(e.value)


def test_too_long_rejected():
    # extension.cpp:50-51 guard, parity-wrapper only
    class FakeLen:
        def __len__(self):
            return (2**31 - 1) // 4 + 1

        def __bytes__(self):
            raise AssertionError("should fail before materializing")

    with pytest.raises(ValueError) as e:
        nuclseq_in(FakeLen())
    assert "provided sequence is too long" in str(e.value)


# -- beyond the reference suite -------------------------------------------

def test_roundtrip_all_symbols():
    s = "ACGTNWSMKRYBDHV" * 3
    assert nuclseq_in(s).to_text() == s


def test_holes_run_length():
    s = Sequence.from_text("ANNNNRRAC")
    assert s.holes_num == 2
    assert list(s.hole_offsets) == [1, 5]
    assert list(s.hole_lens) == [4, 2]


def test_adjacent_different_ambiguity_symbols_are_separate_holes():
    # reference: new hole when symbol changes (sequence.cpp:49-51)
    s = Sequence.from_text("NNRRNN")
    assert s.holes_num == 3


def test_complement():
    assert Sequence.from_text("ACGT").complement().to_text() == "TGCA"
    assert (
        Sequence.from_text("ACGTNWSMKRYBDHV").complement().to_text()
        == "TGCANWSKMYRVHDB"
    )


def test_complement_preserves_hole_filler_bits():
    s = Sequence.from_text("ANNA")
    c = s.complement()
    mask = s.hole_mask()
    assert np.array_equal(s.codes[mask], c.codes[mask])


def test_reverse():
    assert Sequence.from_text("AACGT").reverse().to_text() == "TGCAA"
    assert Sequence.from_text("ANNGT").reverse().to_text() == "TGNNA"


def test_reverse_multibase_hole_correct():
    # the reference version is defective here (sequence.cpp:150); we do
    # the correct thing: holes land at mirrored positions.
    s = Sequence.from_text("ACGNNNACGT").reverse()
    assert s.to_text() == "TGCANNNGCA"


def test_compare_and_operators():
    a, c = Sequence.from_text("A"), Sequence.from_text("C")
    assert a < c and c > a and a != c
    assert Sequence.from_text("ACG") < Sequence.from_text("ACGT")  # prefix shorter
    assert Sequence.from_text("ACGT") == Sequence.from_text("ACGT")
    assert Sequence.from_text("") < Sequence.from_text("A")


def test_equal_sequences_hash_equal():
    a, b = Sequence.from_text("ACGNNT"), Sequence.from_text("ACGNNT")
    assert a == b and hash(a) == hash(b)


def test_occurrences_with_filler_not_counted():
    # 2-bit symbol counts skip hole positions regardless of filler value
    s = Sequence.from_text("ANNNNNNNNNNNNA")
    assert s.occurrences("A") == 2
    assert s.occurrences("C") == 0
    assert s.occurrences("N") == 12


def test_packed_layout_big_endian_within_byte():
    s = Sequence.from_text("ACGT")  # codes 0,1,2,3
    # base i at bits (~i&3)<<1: 00 01 10 11 -> 0b00011011
    assert s.packed()[0] == 0b00011011


def test_packed_deterministic_padding():
    a = Sequence.from_text("ACG")
    b = Sequence.from_text("ACG")
    assert np.array_equal(a.packed(), b.packed())


def test_minstd_stream_matches_cpp_minstd_rand():
    # std::minstd_rand(1): 48271, 182605794, 1291394886 ...
    vals = minstd_stream(1, 3)
    assert list(vals) == [48271, 182605794, 1291394886]


def test_minstd_stream_zero_seed_normalized():
    assert list(minstd_stream(0, 1)) == [48271]


def test_from_codes_filler_matches_reference_rng():
    # "N" -> holes_num=1, len=1, seed=1^1=0 -> normalized to 1 -> 48271&3=3
    s = Sequence.from_text("N")
    assert s.codes[0] == 48271 & 3
