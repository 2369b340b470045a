"""Regenerate the golden SAM fixtures (tests/golden/*.sam).

The correctness gate of BASELINE.md is SAM equality against `bwa mem`;
no bwa binary exists in this sandbox (ROADMAP #2), so the goldens freeze
the clean-room oracle/device pipeline's CURRENT output text — any future
change to seeding/chaining/extension/finalize/SAM emission that shifts a
single byte fails tests/test_golden.py and must be justified against the
bwa-mem behavior it models (and these files re-frozen deliberately).

    PYTHONPATH=. JAX_PLATFORMS=cpu python tools/regen_golden.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "golden")


def build_cases():
    import numpy as np

    from bioseqdb_tpu.align.options import AlignOptions
    from bioseqdb_tpu.align.pipeline import Aligner
    from bioseqdb_tpu.index.builder import build_index
    from bioseqdb_tpu.io.batch import pack_reads
    from bioseqdb_tpu.sam.emit import emit_sam, emit_sam_pairs
    from bioseqdb_tpu.utils.sim import (simulate_genome, simulate_pairs,
                                        simulate_reads)

    cases = {}

    # config-1-class: exact-match reads, two references, SE
    g1 = simulate_genome(48_000, seed=101)
    g2 = simulate_genome(21_000, seed=102)
    idx = build_index([("lambda_a", g1), ("lambda_b", g2)])
    sim = simulate_reads(g1, 48, read_len=100, sub_rate=0.0, seed=103)
    batch = pack_reads(sim.reads, sim.names)
    al = Aligner.build(idx, AlignOptions())
    res = al.align_batch(batch)
    cases["se_exact.sam"] = emit_sam(res, idx, list(sim.reads),
                                     program_args="golden se_exact")

    # config-2-class: mutated reads incl. Ns, SE, all hits + XA behavior
    g = simulate_genome(120_000, seed=111)
    idx2 = build_index([("ecoli_t", g)])
    sim2 = simulate_reads(g, 64, read_len=150, sub_rate=0.03, seed=112)
    rng = np.random.default_rng(113)
    reads = ["".join("N" if rng.random() < 0.01 else c for c in r)
             for r in sim2.reads]
    batch2 = pack_reads(reads, sim2.names)
    al2 = Aligner.build(idx2, AlignOptions())
    res2 = al2.align_batch(batch2)
    cases["se_mutated.sam"] = emit_sam(res2, idx2, reads,
                                       program_args="golden se_mutated")

    # config-3-class: paired-end
    sr1, sr2, _ = simulate_pairs(g, 32, read_len=100, insert_mean=300.0,
                                 insert_std=30.0, sub_rate=0.02, seed=114)
    b1 = pack_reads(sr1.reads, sr1.names)
    b2 = pack_reads(sr2.reads, sr2.names)
    pairs = al2.align_pairs(b1, b2)
    cases["pe_mutated.sam"] = emit_sam_pairs(
        pairs, idx2, list(sr1.reads), list(sr2.reads),
        program_args="golden pe_mutated")
    return cases


def main():
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for name, text in build_cases().items():
        path = os.path.join(GOLDEN_DIR, name)
        with open(path, "w") as fh:
            fh.write(text)
        print(f"wrote {path} ({len(text.splitlines())} lines)")


if __name__ == "__main__":
    main()
