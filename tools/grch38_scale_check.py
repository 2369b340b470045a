"""GRCh38-scale (3.1 Gbase) build + host validation + index save
(ROADMAP #1). The saved index feeds the on-chip int64-rank check
(tools/grch38_chip_check.py). Heavy: ~60-90 GB RAM, ~30-60 min.

    PYTHONPATH=. python tools/grch38_scale_check.py [out_dir]
"""
import os
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
    out = sys.argv[1] if len(sys.argv) > 1 else ".bigindex"
    n = 3_100_000_000
    t0 = time.time()
    g = simulate_genome(n, seed=5)
    print(f"genome {n/1e9:.2f}Gb in {time.time()-t0:.0f}s", flush=True)
    # simulate reads up front so the genome string can be freed before
    # the (memory-dominant) index build
    sim = simulate_reads(g, 20, read_len=150, sub_rate=0.0, seed=6)
    sim2 = simulate_reads(g, 3, read_len=150, sub_rate=0.02, seed=7)
    t0 = time.time()
    idx = build_index([("grch38scale", g)])
    del g
    print(f"index built in {time.time()-t0:.0f}s; doubled={idx.seq_len/1e9:.2f}G"
          f" blocks {idx.blocks.nbytes/1e9:.2f}GB sa_sample "
          f"{idx.sa_sample.nbytes/1e9:.2f}GB ({idx.sa_sample.dtype},"
          f" interval {idx.sa_interval})", flush=True)

    ok = 0
    for r, p, s in zip(sim.reads, sim.positions, sim.strands):
        codes = LUT[np.frombuffer(r.encode(), np.uint8)]
        lo, hi = idx.backward_search(codes)
        assert hi > lo, "read not found"
        hits = {idx.depos(idx.sa_at(rk), 150) for rk in range(lo, min(hi, lo + 4))}
        assert (int(p), bool(s)) in hits, (p, s, hits)
        ok += 1
    print(f"exact search+resolve: {ok}/20 at truth", flush=True)

    opt = AlignOptions()
    for i, (r, p, s) in enumerate(zip(sim2.reads, sim2.positions, sim2.strands)):
        alns = O.align_read(idx, opt, LUT[np.frombuffer(r.encode(), np.uint8)],
                            rand_id=i)
        a = alns[0]
        assert (a.pos, a.is_rev) == (p, bool(s)), (a.pos, p)
        print(f"  read{i}: pos {a.pos} {cigar_to_string(a.cigar)} mapq {a.mapq}",
              flush=True)
    del sim, sim2
    t0 = time.time()
    os.makedirs(out, exist_ok=True)
    path = os.path.join(out, "grch38_scale.idx")
    idx.save(path)
    print(f"saved {path} in {time.time()-t0:.0f}s", flush=True)
    print("GRCH38-SCALE HOST PATH: PASS", flush=True)


if __name__ == "__main__":
    main()
