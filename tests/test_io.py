"""FASTA/FASTQ ingest + read batching tests (bioseqdb-import analogue)."""

import gzip
import io

import numpy as np
import pytest

from bioseqdb_tpu.io.batch import AMBIG_CODE, pack_reads, pack_reads_from_file, revcomp_codes
from bioseqdb_tpu.io.fasta import FastaRecord, read_fasta, read_fastq, read_seqs, write_fasta, write_fastq
from bioseqdb_tpu.utils.sim import simulate_genome, simulate_reads

FASTA = ">ref1 first genome\nACGTacgt\nNNAC\n>ref2\nGGGG\n"
FASTQ = "@r1 desc\nACGT\n+\nIIII\n@r2\nNNAC\n+\n!!!!\n"


def test_read_fasta_uppercases_and_joins(tmp_path):
    p = tmp_path / "a.fa"
    p.write_text(FASTA)
    recs = list(read_fasta(p))
    assert [r.name for r in recs] == ["ref1", "ref2"]
    assert recs[0].description == "ref1 first genome"
    # lowercase residues uppercased at ingest (main.cpp:66-67 rule)
    assert recs[0].sequence == "ACGTACGTNNAC"
    assert recs[1].sequence == "GGGG"


def test_read_fasta_gzip(tmp_path):
    p = tmp_path / "a.fa.gz"
    with gzip.open(p, "wt") as fh:
        fh.write(FASTA)
    recs = list(read_fasta(p))
    assert recs[0].sequence == "ACGTACGTNNAC"


def test_read_fastq(tmp_path):
    p = tmp_path / "a.fq"
    p.write_text(FASTQ)
    recs = list(read_fastq(p))
    assert [r.name for r in recs] == ["r1", "r2"]
    assert recs[0].sequence == "ACGT"
    assert recs[0].quality == "IIII"
    assert recs[1].quality == "!!!!"


def test_read_seqs_sniffs_format(tmp_path):
    fa, fq = tmp_path / "x.fa", tmp_path / "x.fq"
    fa.write_text(FASTA)
    fq.write_text(FASTQ)
    assert len(list(read_seqs(fa))) == 2
    assert next(iter(read_seqs(fq))).quality == "IIII"


def test_fastq_malformed_raises(tmp_path):
    p = tmp_path / "bad.fq"
    p.write_text("@r1\nACGT\nIIII\n")
    with pytest.raises(ValueError, match="expected '\\+'"):
        list(read_fastq(p))


def test_write_roundtrip(tmp_path):
    p = tmp_path / "w.fa"
    write_fasta(p, [("a", "ACGT" * 50)], width=70)
    recs = list(read_fasta(p))
    assert recs[0].sequence == "ACGT" * 50
    q = tmp_path / "w.fq"
    write_fastq(q, [FastaRecord("r", "r", "ACGT", "IIII")])
    assert next(iter(read_fastq(q))).quality == "IIII"


def test_pack_reads_shapes_and_codes():
    b = pack_reads(["ACGT", "GGNNA"], pad_reads_to=8, pad_width_to=32)
    assert b.codes.shape == (8, 32)
    assert b.n == 2 and b.n_padded == 8
    assert list(b.lens[:2]) == [4, 5]
    assert list(b.codes[0, :4]) == [0, 1, 2, 3]
    assert list(b.codes[1, :5]) == [2, 2, AMBIG_CODE, AMBIG_CODE, 0]
    assert (b.codes[0, 4:] == AMBIG_CODE).all()  # padding
    assert b.read_text(1) == "GGNNA"  # ambiguity degrades to N in batch form


def test_pack_reads_rejects_invalid():
    with pytest.raises(ValueError, match="invalid nucleotide in read"):
        pack_reads(["ACXT"])


def test_pack_reads_width_overflow():
    with pytest.raises(ValueError, match="exceeds batch width"):
        pack_reads(["A" * 100], width=64)


def test_pack_reads_from_file_batches(tmp_path):
    p = tmp_path / "r.fq"
    write_fastq(p, [FastaRecord(f"r{i}", f"r{i}", "ACGT", "IIII") for i in range(10)])
    batches = list(pack_reads_from_file(p, batch_size=4))
    assert [b.n for b in batches] == [4, 4, 2]
    assert batches[0].qualities is not None


def test_revcomp_codes():
    b = pack_reads(["ACGT", "AANC"], pad_reads_to=1, pad_width_to=8)
    rc = revcomp_codes(b.codes, b.lens)
    assert list(rc[0, :4]) == [0, 1, 2, 3]  # ACGT is its own revcomp
    # AANC -> GNTT
    assert list(rc[1, :4]) == [2, AMBIG_CODE, 3, 3]
    assert (rc[:, 4:] == AMBIG_CODE).all()


def test_simulated_reads_map_back():
    g = simulate_genome(10_000, seed=1)
    sim = simulate_reads(g, 20, read_len=50, sub_rate=0.0, seed=2)
    for r, p, s in zip(sim.reads, sim.positions, sim.strands):
        frag = g[p : p + 50]
        if s:
            comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
            frag = "".join(comp[c] for c in reversed(frag))
        assert r == frag


def test_simulated_reads_sub_rate():
    g = simulate_genome(10_000, seed=1)
    sim = simulate_reads(g, 50, read_len=100, sub_rate=0.02, seed=3, rc_frac=0.0)
    assert (sim.n_subs > 0).any()
    for r, p, k in zip(sim.reads, sim.positions, sim.n_subs):
        diff = sum(a != b for a, b in zip(r, g[p : p + 100]))
        assert diff == k
