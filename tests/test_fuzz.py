"""Randomized device-vs-oracle equivalence fuzzing.

Each case draws a fresh genome shape (size, repeat structure, N runs,
multi-reference split) and a mixed bag of reads (clean, mutated,
indel'd, clipped, reverse, chimeric), then requires the batched device
pipeline's final records to equal the host oracle's exactly. The
fixed-seed budget keeps CI fast; crank FUZZ_CASES up for soak runs
(FUZZ_CASES=50 python -m pytest tests/test_fuzz.py -q).
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # ~minutes of DP sweeps; -m 'not slow' skips

from bioseqdb_tpu.align.options import AlignOptions
from bioseqdb_tpu.align.pipeline import Aligner
from bioseqdb_tpu.cpu import oracle as O
from bioseqdb_tpu.cpu.ksw import cigar_to_string
from bioseqdb_tpu.index.builder import build_index
from bioseqdb_tpu.io.batch import pack_reads
from bioseqdb_tpu.utils.sim import simulate_genome

N_CASES = int(os.environ.get("FUZZ_CASES", "4"))

LUT = np.zeros(256, np.uint8)
for _i, _c in enumerate(b"ACGT"):
    LUT[_c] = _i
LUT[ord("N")] = 4
enc = lambda s: LUT[np.frombuffer(s.encode(), np.uint8)]


def make_genome(rng):
    # genome sizes quantize to a few buckets so index shapes (and thus
    # XLA compilations) are reused across cases — long soaks otherwise
    # accumulate hundreds of distinct-shape compiles and can crash the
    # XLA CPU compiler; mutations below preserve length
    size = int(rng.choice([8_000, 16_000, 32_000]))
    g = simulate_genome(size, seed=int(rng.integers(1 << 30)))
    # plant a repeat half the time (by replacement, keeping length)
    if rng.random() < 0.5:
        rep_len = int(rng.integers(100, 400))
        rep = simulate_genome(rep_len, seed=int(rng.integers(1 << 30)))
        p1 = int(rng.integers(0, size // 2 - rep_len))
        p2 = int(rng.integers(size // 2, size - rep_len))
        g = g[:p1] + rep + g[p1 + rep_len : p2] + rep + g[p2 + rep_len :]
    # sprinkle N runs
    if rng.random() < 0.4:
        gl = list(g)
        for _ in range(int(rng.integers(1, 4))):
            p = int(rng.integers(0, len(gl) - 20))
            for k in range(int(rng.integers(1, 15))):
                gl[p + k] = "N"
        g = "".join(gl)
    # multi-reference split (total length unchanged)
    if rng.random() < 0.4:
        cut = int(rng.integers(len(g) // 4, 3 * len(g) // 4))
        return [(1, "rA", g[:cut]), (2, "rB", g[cut:])]
    return [(1, "r0", g)]


COMP = str.maketrans("ACGTN", "TGCAN")


def make_reads(rng, refs, long_reads=False):
    texts = [t for _, _, t in refs]
    reads = []
    sizes = [300, 600] if long_reads else [48, 96, 144]
    for _ in range(int(rng.choice([6, 8] if long_reads else [8, 12]))):
        g = texts[int(rng.integers(len(texts)))]
        L = int(rng.choice(sizes))
        L = min(L, len(g) - 1)
        p = int(rng.integers(0, len(g) - L))
        r = g[p : p + L]
        kind = rng.integers(0, 7)
        rl = list(r)
        if kind == 1:  # substitutions
            for _ in range(int(rng.integers(1, 1 + L // 20))):
                i = int(rng.integers(0, L))
                rl[i] = "ACGT"[int(rng.integers(0, 4))]
        elif kind == 2 and L > 30:  # deletion
            d = int(rng.integers(1, 6))
            rl = rl[: L // 2] + rl[L // 2 + d :]
        elif kind == 3:  # insertion
            ins = "".join("ACGT"[c] for c in rng.integers(0, 4, int(rng.integers(1, 6))))
            rl = rl[: L // 2] + list(ins) + rl[L // 2 :]
        elif kind == 4:  # junk clip
            junk = "".join("ACGT"[c] for c in rng.integers(0, 4, int(rng.integers(5, 20))))
            rl = list(junk) + rl if rng.random() < 0.5 else rl + list(junk)
        elif kind == 5:  # chimeric/split: two far-apart segments (the
            # class that exercises supplementary marking + SA tags)
            g2 = texts[int(rng.integers(len(texts)))]
            L2 = max(L // 2, 40)
            if len(g2) > L2 + 1:
                p2 = int(rng.integers(0, len(g2) - L2))
                seg2 = g2[p2 : p2 + L2]
                if rng.random() < 0.5:
                    seg2 = seg2.translate(COMP)[::-1]
                rl = rl[: max(L // 2, 40)] + list(seg2)
        r = "".join(rl)
        if rng.random() < 0.5:
            r = r.translate(COMP)[::-1]
        reads.append(r)
    return reads


def run_case(case, long_reads=False, pad=32):
    rng = np.random.default_rng((5678 if long_reads else 1234) + case)
    refs = make_genome(rng)
    idx = build_index(refs)
    reads = make_reads(rng, refs, long_reads=long_reads)
    opt = AlignOptions()
    aligner = Aligner.build(idx, opt, mode="full")
    batch = pack_reads(reads, [f"f{i}" for i in range(len(reads))],
                       pad_width_to=pad)
    results = aligner.align_batch(batch)
    for i, r in enumerate(reads):
        want = O.align_read(idx, opt, enc(r), rand_id=i)
        got = [
            (h.ref_name, h.ref_begin, h.is_reverse, h.cigar, h.score,
             h.mapq, h.nm, h.is_secondary)
            for h in results[i].hits
        ]
        exp = [
            (idx.ref_names[a.rid], a.pos, a.is_rev, cigar_to_string(a.cigar),
             a.score, a.mapq, a.NM, bool(a.flag & 0x100))
            for a in want
        ]
        assert got == exp, (case, i, r, got, exp)


@pytest.mark.parametrize("case", range(N_CASES))
def test_fuzz_device_equals_oracle(case):
    run_case(case)


# one fixed-width bucket for long reads (chimeric long reads routinely
# split; the windowed seed-SW filter is active at these widths)
@pytest.mark.parametrize("case", range(max(N_CASES // 4, 1)))
def test_fuzz_long_reads(case):
    run_case(case, long_reads=True, pad=768)
