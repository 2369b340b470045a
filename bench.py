"""Benchmark: 150bp reads aligned per second per chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline = the north-star target of 1,000,000 150bp reads/s/chip on
TPU v5e (BASELINE.md; the reference publishes no numbers — its ceiling
is single-core bwa-mem minus per-call index rebuild).

Measures the FULL BWA-MEM pipeline (SMEM seeding, chaining, banded-SW
extension on device; dedup/MAPQ/CIGAR finalize on host) on an
E. coli-scale synthetic index with 1%-mutated reads — BASELINE.md
config 2 — plus a paired-end leg (same capture, columnar PE finalize).

Noise defenses (the axon relay's throughput varies 2-3x run to run —
BENCH_NOTES): every pass times each batch individually and scores the
pass by its MEDIAN batch time (first-batch warmup and relay stalls do
not pollute the number); passes repeat (up to BST_BENCH_PASSES, default
5) until the two best agree within 10%, and the HEADLINE is the
second-best pass — i.e. the best rate CONFIRMED by another pass. All
per-pass rates ride in the JSON for auditability.

Uses a persistent compilation cache (.jax_cache) — the first-ever run
pays one slow remote compile; later runs start in seconds. Timing
forces jax.device_get (block_until_ready is unreliable through the
axon relay).
"""

import json
import os
import statistics
import sys
import time


def _log(*a):
    print("[bench]", *a, file=sys.stderr, flush=True)


def _confirmed(pass_rps: list[float]) -> float:
    """Best rate confirmed by a second pass: the second-best value."""
    return sorted(pass_rps)[-2] if len(pass_rps) > 1 else pass_rps[0]


def _converged(pass_rps: list[float]) -> bool:
    if len(pass_rps) < 2:
        return False
    a, b = sorted(pass_rps)[-2:]
    return b <= 1.10 * a


def bench_full(jax, idx, genome, batch_size=None, n_batches=6):
    if batch_size is None:
        batch_size = int(os.environ.get("BST_BENCH_BATCH", 16384))
    max_passes = int(os.environ.get("BST_BENCH_PASSES", 5))
    import numpy as np

    from bioseqdb_tpu.align.columns import finalize_columns
    from bioseqdb_tpu.align.options import AlignOptions
    from bioseqdb_tpu.align.pipeline import Aligner
    from bioseqdb_tpu.io.batch import pack_reads
    from bioseqdb_tpu.utils.sim import simulate_reads

    al = Aligner.build(idx, AlignOptions(), mode="full")
    batches = []
    sims = []
    for k in range(n_batches):
        sim = simulate_reads(genome, batch_size, read_len=150, sub_rate=0.01,
                             seed=100 + k)
        sims.append(sim)
        batches.append(pack_reads(sim.reads, sim.names))

    t0 = time.time()
    out = jax.device_get(al.device_regions(batches[0]))
    _log(f"full-pipeline compile+first batch: {time.time() - t0:.1f}s")
    # warm the host finalize path too (native lib load, numpy dispatch
    # caches) — the metric is steady-state serving throughput. The
    # serving output is the columnar batch (align/columns.py): every
    # bwa_result field as arrays + CIGAR/MD text blob, SAM-renderable
    # via sam.emit.emit_sam_columns.
    finalize_columns(idx, al.options, batches[0], out)

    # timed: overlap device compute (async dispatch) with host finalize,
    # per-batch timestamps so each pass is scored by its median batch
    def one_pass():
        bt = []
        results = []
        t0 = time.time()
        pending = al.device_regions(batches[0])
        for k in range(n_batches):
            nxt = (al.device_regions(batches[k + 1])
                   if k + 1 < n_batches else None)
            out = jax.device_get(pending)
            results.append(finalize_columns(idx, al.options, batches[k], out))
            t1 = time.time()
            bt.append(t1 - t0)
            t0 = t1
            pending = nxt
        return bt, results

    pass_rps, pass_meta = [], []
    results = None
    for p in range(max_passes):
        bt, results = one_pass()
        med = statistics.median(bt)
        pass_rps.append(batch_size / med)
        pass_meta.append(dict(median_batch_s=round(med, 3),
                              min_batch_s=round(min(bt), 3),
                              max_batch_s=round(max(bt), 3),
                              pass_s=round(sum(bt), 3)))
        _log(f"pass {p + 1}: median {med * 1e3:.0f} ms/batch = "
             f"{batch_size / med:,.0f} reads/s "
             f"(batches {' '.join(f'{t:.2f}' for t in bt)})")
        if _converged(pass_rps):
            break
    rps = _confirmed(pass_rps)
    if not _converged(pass_rps):
        _log(f"WARNING: passes never agreed within 10% "
             f"({[round(r) for r in pass_rps]}); reporting the "
             f"confirmed (second-best) rate")

    total = batch_size * n_batches
    ok = novf = 0
    for cols, sim in zip(results, sims):
        n = len(sim.positions)
        ok += int((cols.mapped[:n] & (cols.pos[:n] == sim.positions)
                   & (cols.is_rev[:n] == sim.strands.astype(bool))).sum())
        # overflow telemetry: reads that exceeded any device cap and fell
        # back to the host oracle (they are counted in the timing; a
        # nonzero rate at scale would make host finalize the ceiling)
        novf += len(cols.extra)
    _log(f"truth: {ok}/{total}; overflow/slow-path reads: {novf}/{total} "
         f"({100 * novf / total:.3f}%)")
    assert ok >= 0.98 * total, "bench correctness check failed"
    return rps, dict(
        se_pass_rps=[round(r) for r in pass_rps],
        se_passes=pass_meta,
        truth=ok, total=total, overflow_reads=novf,
    ), al


def bench_pe(jax, idx, genome, al, batch_size=None, n_batches=3):
    """Paired-end leg: pairs/s through the columnar PE path (two device
    batches + finalize_pairs_columns per pair batch). Reuses the SE
    Aligner/compiled program; reported in READS/s (2 reads per pair)."""
    if batch_size is None:
        batch_size = int(os.environ.get("BST_BENCH_BATCH", 16384))
    max_passes = int(os.environ.get("BST_BENCH_PE_PASSES", 3))

    from bioseqdb_tpu.align.paired import finalize_pairs_columns
    from bioseqdb_tpu.io.batch import pack_reads
    from bioseqdb_tpu.utils.sim import simulate_pairs

    PB = batch_size
    psims, pbatches = [], []
    for k in range(n_batches):
        sr1, sr2, _ = simulate_pairs(genome, PB, read_len=150, sub_rate=0.01,
                                     insert_mean=400, insert_std=40,
                                     seed=700 + k)
        psims.append(sr1)
        pbatches.append((pack_reads(sr1.reads, sr1.names),
                         pack_reads(sr2.reads, sr2.names)))

    dev = lambda k: (al.device_regions(pbatches[k][0]),
                     al.device_regions(pbatches[k][1]))
    w1, w2 = dev(0)
    finalize_pairs_columns(idx, al.options, pbatches[0][0],
                           jax.device_get(w1), pbatches[0][1],
                           jax.device_get(w2))  # warm PE finalize

    def one_pass():
        bt, cols1 = [], []
        t0 = time.time()
        pending = dev(0)
        for k in range(n_batches):
            nxt = dev(k + 1) if k + 1 < n_batches else None
            o1 = jax.device_get(pending[0])
            o2 = jax.device_get(pending[1])
            c1, _c2 = finalize_pairs_columns(
                idx, al.options, pbatches[k][0], o1, pbatches[k][1], o2)
            cols1.append(c1)
            t1 = time.time()
            bt.append(t1 - t0)
            t0 = t1
            pending = nxt
        return bt, cols1

    pass_rps = []
    cols1 = None
    for p in range(max_passes):
        bt, cols1 = one_pass()
        med = statistics.median(bt)
        pass_rps.append(2 * PB / med)
        _log(f"PE pass {p + 1}: median {med * 1e3:.0f} ms/pair-batch = "
             f"{2 * PB / med:,.0f} reads/s")
        if _converged(pass_rps):
            break
    rps = _confirmed(pass_rps)

    okp = proper = 0
    for c1, sr1 in zip(cols1, psims):
        okp += int((c1.mapped[:PB] & (c1.pos[:PB] == sr1.positions)).sum())
        proper += int((c1.pe_flag[:PB] & 0x2 > 0).sum())
    totp = PB * n_batches
    _log(f"PE truth (R1): {okp}/{totp}; proper {100 * proper / totp:.1f}%")
    assert okp >= 0.95 * totp, "PE bench correctness check failed"
    return rps, dict(pe_pass_rps=[round(r) for r in pass_rps],
                     pe_truth=okp, pe_total_pairs=totp,
                     pe_proper_pct=round(100 * proper / totp, 1))


def bench_exact(jax, idx, genome, batch=16384, iters=5):
    import numpy as np
    import jax.numpy as jnp

    from bioseqdb_tpu.align.pipeline import exact_align_step
    from bioseqdb_tpu.io.batch import pack_reads
    from bioseqdb_tpu.kernels import fm as kfm
    from bioseqdb_tpu.utils.sim import simulate_reads

    sim = simulate_reads(genome, batch, read_len=150, sub_rate=0.0, seed=2)
    rb = pack_reads(sim.reads, sim.names)
    fm = kfm.FMDevice.from_host(idx)
    codes = jnp.asarray(rb.codes, jnp.int32)
    lens = jnp.asarray(rb.lens, jnp.int32)
    out = jax.device_get(exact_align_step(fm, codes, lens, 4,
                                          sa_interval=idx.sa_interval))
    t0 = time.time()
    for _ in range(iters):
        out = jax.device_get(exact_align_step(fm, codes, lens, 4,
                                              sa_interval=idx.sa_interval))
    dt = time.time() - t0
    n_hits = np.asarray(out["n_hits"])[: rb.n]
    assert (n_hits >= 1).all()
    return batch * iters / dt


def main() -> int:
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      __file__.rsplit("/", 1)[0] + "/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bioseqdb_tpu.index.builder import build_index
    from bioseqdb_tpu.utils.sim import simulate_genome

    genome_len = 4_600_000  # E. coli K-12 scale
    t0 = time.time()
    genome = simulate_genome(genome_len, seed=1)
    idx = build_index([("ecoli", genome)])
    _log(f"index built in {time.time() - t0:.1f}s; device={jax.devices()[0]}")

    stats = {}
    try:
        rps, stats, al = bench_full(jax, idx, genome)
        metric = ("150bp reads/s/chip, full BWA-MEM pipeline "
                  "(1% mutated reads, E.coli-scale index)")
        try:
            pe_rps, pe_stats = bench_pe(jax, idx, genome, al)
            stats.update(pe_stats)
            stats["pe_reads_s"] = round(pe_rps)
            stats["pe_se_ratio"] = round(pe_rps / rps, 3)
        except Exception as e:  # PE leg must not cost the SE number
            _log(f"PE leg failed ({type(e).__name__}: {e}); "
                 "SE result stands alone")
    except Exception as e:  # compile budget / tunnel flakes: keep a result
        _log(f"full-pipeline bench failed ({type(e).__name__}: {e}); "
             "falling back to exact-match path")
        rps = bench_exact(jax, idx, genome)
        metric = "150bp exact-match reads/s/chip (E.coli-scale index)"

    # per-pass rates + overflow ride along so the round-over-round perf
    # signal is auditable (VERDICT r2 item 4: the headline is the
    # median-batch rate confirmed by a second pass, not min-of-two)
    print(json.dumps({
        "metric": metric,
        "value": round(rps),
        "unit": "reads/s",
        "vs_baseline": round(rps / 1_000_000, 4),
        **stats,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
