"""Host-finalize cost breakdown (CPU backend; no chip needed).

Where do the microseconds/read go?  Runs the device pipeline once on the
CPU backend to get real region tables, then profiles finalize_batch:
fast-path coverage, per-read cost of fast vs slow rows, and a cProfile
of the whole batch.
"""
import cProfile
import pstats
import sys
import time

import numpy as np


def main():
    import jax

    from bioseqdb_tpu.align.finalize import (
        fast_fields, finalize_batch, frac_rep_batch)
    from bioseqdb_tpu.align.options import AlignOptions
    from bioseqdb_tpu.align.pipeline import Aligner
    from bioseqdb_tpu.index.builder import build_index
    from bioseqdb_tpu.io.batch import pack_reads
    from bioseqdb_tpu.utils.sim import simulate_genome, simulate_reads

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    genome = simulate_genome(1_000_000, seed=1)
    idx = build_index([("g", genome)])
    opt = AlignOptions()
    sim = simulate_reads(genome, B, read_len=150, sub_rate=0.01, seed=7)
    batch = pack_reads(sim.reads, sim.names)
    al = Aligner.build(idx, opt, mode="full")
    t0 = time.time()
    out = jax.device_get(al.device_regions(batch, keep_mems=True))
    print(f"device pipeline (cpu backend): {time.time()-t0:.1f}s")
    out = {k: np.asarray(v) if not isinstance(v, dict) else
           {kk: np.asarray(vv) for kk, vv in v.items()} for k, v in out.items()}

    max_occ = opt.resolve_max_occ(idx.n_refs)
    frac = frac_rep_batch(np.asarray(out["mems"]), np.asarray(out["n_mem"]),
                          max_occ, np.asarray(batch.lens))
    f = fast_fields(idx, opt, batch, out, frac)
    n_fast = int(f["fast"].sum())
    n_ovf = int(np.asarray(out["overflow"]).sum())
    n_regs = np.asarray(out["n_regs"])
    multi = int((n_regs > 1).sum())
    print(f"B={B}: fast={n_fast} ({100*n_fast/B:.1f}%)  overflow={n_ovf}  "
          f"multi-region={multi}  zero-region={(n_regs==0).sum()}")
    slow = ~f["fast"]
    sl = np.flatnonzero(slow)
    print(f"slow rows: {len(sl)}; of those single-region={int((n_regs[sl]==1).sum())}")

    # timed full finalize
    t0 = time.time()
    res = finalize_batch(idx, opt, batch, out)
    dt = time.time() - t0
    print(f"finalize_batch: {dt*1e3:.0f} ms  ({dt/B*1e6:.1f} us/read)")

    # fast rows only cost: re-run with slow rows masked out is intrusive;
    # instead profile and read the split from cumtime
    pr = cProfile.Profile()
    pr.enable()
    finalize_batch(idx, opt, batch, out)
    pr.disable()
    st = pstats.Stats(pr)
    st.sort_stats("cumulative").print_stats(25)


if __name__ == "__main__":
    main()
