"""One-off validation of the >2^31 doubled-base host path (ROADMAP #1).

Builds a 1.15 Gbase synthetic genome (doubled text 2.3e9 > int32 range),
exercising the int64 SA-IS path and the major/minor Occ checkpoints,
then validates oracle search / SA resolution / full alignment at truth
positions. Heavy (tens of GB, ~15-30 min) — run manually, not in CI:
    PYTHONPATH=. python tools/bigindex_check.py [genome_gbases]
"""

import sys
import time

import numpy as np

from bioseqdb_tpu.align.options import AlignOptions
from bioseqdb_tpu.cpu import oracle as O
from bioseqdb_tpu.cpu.ksw import cigar_to_string
from bioseqdb_tpu.index.builder import build_index
from bioseqdb_tpu.utils.sim import simulate_genome, simulate_reads

LUT = np.zeros(256, np.uint8)
for i, c in enumerate(b"ACGT"):
    LUT[c] = i


def main():
    gb = float(sys.argv[1]) if len(sys.argv) > 1 else 1.15
    n = int(gb * 1e9)
    t0 = time.time()
    g = simulate_genome(n, seed=5)
    print(f"genome {n/1e9:.2f}Gb in {time.time()-t0:.0f}s", flush=True)
    t0 = time.time()
    idx = build_index([("big", g)])
    print(f"index built in {time.time()-t0:.0f}s; doubled={idx.seq_len/1e9:.2f}G "
          f"(int32 max {2**31/1e9:.2f}G); blocks {idx.blocks.nbytes/1e9:.1f}GB "
          f"majors {idx.occ_majors.shape} sa_sample dtype {idx.sa_sample.dtype}",
          flush=True)
    assert idx.seq_len >= 2**31, "genome too small to exercise the big path"

    sim = simulate_reads(g, 20, read_len=100, sub_rate=0.0, seed=6)
    t0 = time.time()
    ok = 0
    for r, p, s in zip(sim.reads, sim.positions, sim.strands):
        codes = LUT[np.frombuffer(r.encode(), np.uint8)]
        lo, hi = idx.backward_search(codes)
        assert hi > lo, "read not found"
        hits = {idx.depos(idx.sa_at(rk), 100) for rk in range(lo, min(hi, lo + 4))}
        assert (int(p), bool(s)) in hits, (p, s, hits)
        ok += 1
    print(f"exact search+resolve: {ok}/20 at truth ({time.time()-t0:.0f}s)", flush=True)

    t0 = time.time()
    opt = AlignOptions()
    sim2 = simulate_reads(g, 3, read_len=150, sub_rate=0.02, seed=7)
    for i, (r, p, s) in enumerate(zip(sim2.reads, sim2.positions, sim2.strands)):
        alns = O.align_read(idx, opt, LUT[np.frombuffer(r.encode(), np.uint8)],
                            rand_id=i)
        a = alns[0]
        assert (a.pos, a.is_rev) == (p, bool(s)), (a.pos, p)
        print(f"  read{i}: pos {a.pos} {cigar_to_string(a.cigar)} mapq {a.mapq}",
              flush=True)
    print(f"oracle full alignment OK ({time.time()-t0:.0f}s)", flush=True)
    print("BIG-INDEX HOST PATH: PASS", flush=True)


if __name__ == "__main__":
    main()
