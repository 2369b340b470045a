"""Device-pipeline rate vs host-finalize rate, separately timed.

Reuses the exact bench program (cache hit if bench.py ran): times
al.device_regions alone (device throughput), then finalize_columns on a
fetched output (a) with the device idle and (b) while the device is
busy with the next batch — the axon relay client burns ~a core polling
whenever a computation is in flight, so (b) is the number that gates
the overlapped steady state.

Usage: python tools/split_device_host.py [batch] [n_batches]
"""
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def log(*a):
    print("[split]", *a, file=sys.stderr, flush=True)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      __file__.rsplit("/", 2)[0] + "/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bioseqdb_tpu.align.columns import finalize_columns
    from bioseqdb_tpu.align.options import AlignOptions
    from bioseqdb_tpu.align.pipeline import Aligner
    from bioseqdb_tpu.index.builder import build_index
    from bioseqdb_tpu.io.batch import pack_reads
    from bioseqdb_tpu.utils.sim import simulate_genome, simulate_reads

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    genome = simulate_genome(4_600_000, seed=1)
    idx = build_index([("ecoli", genome)])
    al = Aligner.build(idx, AlignOptions(), mode="full")
    batches = []
    for k in range(N):
        sim = simulate_reads(genome, B, read_len=150, sub_rate=0.01,
                             seed=100 + k)
        batches.append(pack_reads(sim.reads, sim.names))

    t0 = time.time()
    out0 = jax.device_get(al.device_regions(batches[0]))
    log(f"compile+first batch: {time.time() - t0:.1f}s")
    finalize_columns(idx, al.options, batches[0], out0)  # warm host path

    # device-only rate (serial device_gets, host does nothing)
    t0 = time.time()
    for k in range(N):
        out = jax.device_get(al.device_regions(batches[k]))
    dt_dev = time.time() - t0
    log(f"device-only: {dt_dev:.2f}s = {B * N / dt_dev:,.0f} reads/s "
        f"({dt_dev / N * 1e3:.0f} ms/batch)")

    # host finalize, device idle
    outs = [jax.device_get(al.device_regions(b)) for b in batches]
    t0 = time.time()
    for k in range(N):
        finalize_columns(idx, al.options, batches[k], outs[k])
    dt_fin = time.time() - t0
    log(f"finalize (device idle): {dt_fin:.2f}s = {B * N / dt_fin:,.0f} "
        f"reads/s ({dt_fin / N * 1e3:.0f} ms/batch, "
        f"{dt_fin / (B * N) * 1e6:.1f} us/read)")

    # host finalize while the device is busy (the overlapped regime).
    # Re-enqueue a device batch at the top of EVERY finalize iteration:
    # a single in-flight batch (~280 ms) outlasted by N finalizes would
    # leave the device idle for the loop's tail and understate the
    # relay-polling contention (ADVICE round 2).
    dt_busy = 0.0
    for k in range(N):
        pend = al.device_regions(batches[k])  # fresh batch in flight
        t0 = time.time()
        finalize_columns(idx, al.options, batches[k], outs[k])
        dt_busy += time.time() - t0           # finalize-only time
        jax.device_get(pend)                  # drain outside the timer
    log(f"finalize (device busy): {dt_busy:.2f}s = {B * N / dt_busy:,.0f} "
        f"reads/s ({dt_busy / N * 1e3:.0f} ms/batch)")
    print(f"device_ms_per_batch={dt_dev / N * 1e3:.0f} "
          f"finalize_idle_ms={dt_fin / N * 1e3:.0f} "
          f"finalize_busy_ms={dt_busy / N * 1e3:.0f}")


if __name__ == "__main__":
    main()
