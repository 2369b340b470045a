"""Config-4-class bench leg: a saved >=2 G-doubled (int64-rank) index,
full device pipeline, driver-ledger JSON on stdout.

Run by bench.py as a SUBPROCESS when BST_BENCH_GRCH38=1 (the main bench
process stays x64-free and its HBM tables are released before this
leg's ~6.5 GB of tables load). Prints ONE JSON object:

    {"grch38_reads_s": N, "grch38_doubled_gbases": G,
     "grch38_truth": t, "grch38_total": n, "grch38_overflow": o,
     "grch38_pass_rps": [...]}

Reads come from the <index>_reads.npz saved next to the build
(tools/grch38_scale_check.py); without it the genome is re-simulated
from the build seed (slow). VERDICT r4 item 6: configs >= 4 stop living
only in tools/ notes — this output lands in BENCH_r{N}.json.

    PYTHONPATH=. python tools/grch38_bench_leg.py [.bigindex12] [batch]
"""
import sys; sys.path.insert(0, __file__.rsplit("/", 2)[0])  # noqa: E702
import json
import os
import statistics
import time

import numpy as np

os.environ.setdefault("JAX_ENABLE_X64", "1")


def log(*a):
    print("[grch38]", *a, file=sys.stderr, flush=True)


def main() -> int:
    import jax

    jax.config.update("jax_enable_x64", True)
    root = __file__.rsplit("/", 2)[0]
    jax.config.update("jax_compilation_cache_dir", root + "/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bioseqdb_tpu.align.columns import finalize_columns
    from bioseqdb_tpu.align.options import AlignOptions
    from bioseqdb_tpu.align.pipeline import Aligner
    from bioseqdb_tpu.index.fmindex import FMIndex
    from bioseqdb_tpu.io.batch import pack_reads

    out_dir = sys.argv[1] if len(sys.argv) > 1 else ".bigindex12"
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    n_passes = int(os.environ.get("BST_BENCH_GRCH38_PASSES", 3))

    t0 = time.time()
    sub = os.path.join(out_dir, "grch38_scale.idx")
    idx = FMIndex.load(sub if os.path.isdir(sub) else out_dir)
    log(f"index loaded in {time.time()-t0:.0f}s: doubled "
        f"{idx.seq_len/1e9:.2f}G, sa_interval {idx.sa_interval}")
    assert idx.seq_len + 1 >= 2**31, "expected an int64-rank index"

    reads_npz = out_dir.rstrip("/") + "_reads.npz"
    if os.path.exists(reads_npz):
        data = np.load(reads_npz, allow_pickle=True)
        reads = [str(r) for r in data["reads"]][:B]
        positions, strands = data["positions"][:B], data["strands"][:B]
        B = len(reads)
        log(f"{B} saved truth reads loaded")
    else:
        from bioseqdb_tpu.utils.sim import simulate_genome, simulate_reads

        g = simulate_genome(idx.l_pac, seed=5)
        sim = simulate_reads(g, B, read_len=150, sub_rate=0.01, seed=11)
        del g
        reads, positions, strands = sim.reads, sim.positions, sim.strands
        log(f"genome re-simulated + {B} reads")
    batch = pack_reads(reads, [f"r{i}" for i in range(B)])

    t0 = time.time()
    al = Aligner.build(idx, AlignOptions(), mode="full")
    log(f"device tables resident in {time.time()-t0:.0f}s "
        f"(device={jax.devices()[0]})")

    t0 = time.time()
    out = jax.device_get(al.device_regions(batch))
    out = al.absorb_overflow(batch, out)
    cols = finalize_columns(idx, al.options, batch, out)
    log(f"compile+first batch+finalize: {time.time()-t0:.0f}s")

    # timed: the same read batch re-dispatched per pass (device work is
    # identical per pass; the number's job is a config-4 ledger figure,
    # not a streaming headline). Median of per-batch times within a
    # pass, best-confirmed-by-second across passes (bench.py rule).
    rates = []
    for p in range(n_passes):
        bt = []
        for _ in range(3):
            t0 = time.time()
            out = jax.device_get(al.device_regions(batch))
            out = al.absorb_overflow(batch, out)
            finalize_columns(idx, al.options, batch, out)
            bt.append(time.time() - t0)
        med = statistics.median(bt)
        rates.append(B / med)
        log(f"pass {p+1}: median {med:.2f} s/batch = {B/med:,.0f} reads/s "
            f"(batches {' '.join(f'{t:.2f}' for t in bt)})")
    conf = sorted(rates)[-2] if len(rates) > 1 else rates[0]

    n = len(batch.names)
    at_truth = (cols.mapped[:n] & (cols.pos[:n] == positions)
                & (cols.is_rev[:n] == strands.astype(bool)))
    ok = int(at_truth.sum())
    novf = len(cols.extra)
    log(f"truth {ok}/{n}, overflow/slow-path {novf}")
    assert ok >= 0.98 * n, "grch38 leg correctness check failed"
    print(json.dumps(dict(
        grch38_reads_s=round(conf),
        grch38_doubled_gbases=round(idx.seq_len / 1e9, 2),
        grch38_truth=ok, grch38_total=n, grch38_overflow=novf,
        grch38_pass_rps=[round(r) for r in rates],
    )))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
