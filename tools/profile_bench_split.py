"""Split the bench's per-batch wall time: device compute vs transfer vs
host finalize, on the real chip with the real overlap structure."""
import time

import numpy as np


def log(*a):
    import sys
    print("[split]", *a, file=sys.stderr, flush=True)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      __file__.rsplit("/", 2)[0] + "/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bioseqdb_tpu.align.finalize import finalize_batch
    from bioseqdb_tpu.align.options import AlignOptions
    from bioseqdb_tpu.align.pipeline import Aligner
    from bioseqdb_tpu.index.builder import build_index
    from bioseqdb_tpu.io.batch import pack_reads
    from bioseqdb_tpu.utils.sim import simulate_genome, simulate_reads

    B = int(__import__("os").environ.get("BST_BENCH_BATCH", 8192))
    genome = simulate_genome(4_600_000, seed=1)
    idx = build_index([("ecoli", genome)])
    al = Aligner.build(idx, AlignOptions(), mode="full")
    batches = [pack_reads(*(lambda s: (s.reads, s.names))(
        simulate_reads(genome, B, read_len=150, sub_rate=0.01, seed=100 + k)))
        for k in range(4)]
    out = jax.device_get(al.device_regions(batches[0]))  # compile
    log("compiled")

    # sequential split: dispatch+wait, then transfer, then finalize
    for k in range(2):
        t0 = time.time()
        dev = al.device_regions(batches[k])
        jax.block_until_ready(dev)  # may be a relay no-op; note the time
        t1 = time.time()
        out = jax.device_get(dev)
        t2 = time.time()
        res = finalize_batch(idx, al.options, batches[k], out)
        t3 = time.time()
        log(f"batch {k}: dispatch+block {t1-t0:.3f}s  device_get {t2-t1:.3f}s"
            f"  finalize {t3-t2:.3f}s")

    # overlapped (bench structure)
    t0 = time.time()
    pending = al.device_regions(batches[0])
    for k in range(4):
        nxt = al.device_regions(batches[k + 1]) if k + 1 < 4 else None
        out = jax.device_get(pending)
        finalize_batch(idx, al.options, batches[k], out)
        pending = nxt
    dt = time.time() - t0
    log(f"overlapped: {dt/4:.3f}s/batch  ({4*B/dt:.0f} reads/s)")

    nbytes = sum(np.asarray(v).nbytes for v in jax.tree.leaves(out))
    log(f"out payload: {nbytes/1e6:.2f} MB")


if __name__ == "__main__":
    main()
