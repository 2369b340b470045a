"""Benchmark: 150bp reads aligned per second per chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline = the north-star target of 1,000,000 150bp reads/s/chip on
TPU v5e (BASELINE.md; the reference publishes no numbers of its own —
its ceiling is single-core bwa-mem minus per-call index rebuild).

Current scope: the exact-match end-to-end path (backward search + SA
resolution + coordinate rebase) on an E. coli-scale synthetic genome
(BASELINE.md config 2 shapes; mismatched-read SW extension lands next).
"""

import json
import sys
import time

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    from bioseqdb_tpu.align.pipeline import exact_align_step
    from bioseqdb_tpu.index.builder import build_index
    from bioseqdb_tpu.io.batch import pack_reads
    from bioseqdb_tpu.kernels import fm as kfm
    from bioseqdb_tpu.utils.sim import simulate_genome, simulate_reads

    genome_len = 4_600_000   # E. coli K-12 scale
    read_len = 150
    batch = 16384
    iters = 5
    max_hits = 4

    t0 = time.time()
    genome = simulate_genome(genome_len, seed=1)
    idx = build_index([("ecoli", genome)])
    print(f"[bench] index built in {time.time() - t0:.1f}s", file=sys.stderr)

    sim = simulate_reads(genome, batch, read_len=read_len, sub_rate=0.0, seed=2)
    rb = pack_reads(sim.reads, sim.names)
    fm = kfm.FMDevice.from_host(idx)
    codes = jnp.asarray(rb.codes, jnp.int32)
    lens = jnp.asarray(rb.lens, jnp.int32)

    # warm up / compile; fetch results to drain the dispatch queue —
    # block_until_ready is unreliable through the axon remote relay,
    # so timing always forces a device_get roundtrip.
    out = jax.device_get(exact_align_step(fm, codes, lens, max_hits))
    print(f"[bench] compiled; device={jax.devices()[0]}", file=sys.stderr)

    t0 = time.time()
    for _ in range(iters):
        out = jax.device_get(exact_align_step(fm, codes, lens, max_hits))
    dt = time.time() - t0
    reads_per_s = batch * iters / dt

    # sanity: all reads must map to their simulated origin
    n_hits = np.asarray(out["n_hits"])[: rb.n]
    assert (n_hits >= 1).all(), "bench correctness check failed: unmapped reads"

    print(
        json.dumps({
            "metric": "150bp exact-match reads aligned/s/chip (E.coli-scale index)",
            "value": round(reads_per_s),
            "unit": "reads/s",
            "vs_baseline": round(reads_per_s / 1_000_000, 4),
        })
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
