"""Benchmark: 150bp reads aligned per second per chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline = the north-star target of 1,000,000 150bp reads/s/chip on
TPU v5e (BASELINE.md; the reference publishes no numbers — its ceiling
is single-core bwa-mem minus per-call index rebuild).

Measures the FULL BWA-MEM pipeline (SMEM seeding, chaining, banded-SW
extension on device; dedup/MAPQ/CIGAR finalize on host) on an
E. coli-scale synthetic index with 1%-mutated reads — BASELINE.md
config 2 — plus a paired-end leg (same capture, ONE fused device
dispatch per pair batch) and a chr20-scale paired-end leg
(BASELINE.md config 3 class) so the driver ledger carries a
human-chromosome-scale number.

Noise defenses (the axon relay's throughput varies 2-3x run to run —
BENCH_NOTES): every pass times each batch individually and scores the
pass by its MEDIAN batch time; passes repeat (up to BST_BENCH_PASSES)
until the two best agree within 10%, and the HEADLINE is the
second-best pass — the best rate CONFIRMED by another pass. Each pass
additionally times a FIXED reference op (a dependent-gather chain, the
pipeline's cost-dominant primitive): passes whose reference time is
>1.5x the session best are LABELED degraded and excluded from the
confirmed-rate selection while >= 2 healthy passes exist — "degraded
tunnel window" is a measured annotation, not a narrative one
(VERDICT r3 item 7). All per-pass rates + health times ride in the
JSON for auditability.

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


def _select(pass_rps: list[float], healthy: list[bool]):
    """(confirmed_rate, converged, used_idx): the second-best rate among
    healthy passes (all passes when fewer than two are healthy).
    Convergence additionally requires >= 3 healthy passes — round 4's
    ledger capture was two degraded passes agreeing with each other
    (VERDICT r4 weak 2)."""
    idx = [i for i, h in enumerate(healthy) if h]
    if len(idx) < 2:
        idx = list(range(len(pass_rps)))
    sel = sorted(pass_rps[i] for i in idx)
    if len(sel) < 2:
        return sel[0], False, idx
    conf = sel[-2]
    return conf, sel[-1] <= 1.10 * sel[-2] and len(idx) >= 3, idx


def make_health(jax):
    """Fixed reference ops timed alongside every pass: a 50-step
    dependent row-gather chain at the pipeline's hot shape (compute
    health) PLUS a 2 MB host->device round trip (relay bandwidth
    health — round 4 found windows where the chain stayed at ~25 ms
    but batch transfers ran ~2x slow). Their times move with the
    tunnel/device, not with this repo's code. Returns (chain_ms,
    xfer_ms); a pass is degraded when EITHER is >1.5x the session
    best."""
    import numpy as np
    import jax.numpy as jnp

    N = 16384
    tab = jax.random.randint(jax.random.PRNGKey(0), (N, 128), 0, 1 << 20,
                             jnp.int32)
    idx0 = jax.random.randint(jax.random.PRNGKey(1), (N,), 0, N, jnp.int32)
    buf = np.arange(2 * 1024 * 1024, dtype=np.uint8)

    @jax.jit
    def chain(idx, tab):
        def body(_, idx):
            row = tab[idx]
            return (idx * 48271 + row[:, 0] + 11) % N

        return jax.lax.fori_loop(0, 50, body, idx).sum()

    jax.device_get(chain(idx0, tab))  # compile+warm
    jax.device_get(jax.device_put(buf).sum())

    def health() -> tuple[float, float]:
        t0 = time.time()
        jax.device_get(chain(idx0, tab))
        t1 = time.time()
        jax.device_get(jax.device_put(buf).sum())
        t2 = time.time()
        return (t1 - t0) * 1e3, (t2 - t1) * 1e3

    return health


def _run_passes(name, one_pass, rate_of, health, max_passes):
    """Common pass loop: score each pass, track health, stop when the
    two best healthy passes agree within 10% AND >= 3 healthy passes
    exist.

    A pass is healthy only if (a) its side-channel probes (compute
    chain + 2 MB transfer) are within 1.5x the session best AND (b) its
    own median batch time is within 1.25x the session-best pass median
    — the workload itself is the strongest degradation signal (round
    4's ledger capture had ~43K passes whose probes looked fine while
    batches ran 40% slow; VERDICT r4 item 2). Excluded passes extend
    the pass budget (up to 2x + 2) so degraded windows don't starve the
    capture of healthy samples."""
    pass_rps, pass_health, metas, last = [], [], [], None
    pass_med = []

    def healthy_mask():
        cmin = min(h[0] for h in pass_health)
        xmin = min(h[1] for h in pass_health)
        mmin = min(pass_med)
        return [h[0] <= 1.5 * cmin and h[1] <= 1.5 * xmin
                and m <= 1.25 * mmin
                for h, m in zip(pass_health, pass_med)]

    budget = max_passes
    p = 0
    while p < budget:
        hc, hx = health() if health else (0.0, 0.0)
        bt, last = one_pass()
        med = statistics.median(bt)
        pass_rps.append(rate_of(med))
        pass_med.append(med)
        pass_health.append((round(hc, 1), round(hx, 1)))
        metas.append(dict(median_batch_s=round(med, 3),
                          min_batch_s=round(min(bt), 3),
                          max_batch_s=round(max(bt), 3),
                          pass_s=round(sum(bt), 3), health_ms=round(hc, 1),
                          health_xfer_ms=round(hx, 1)))
        healthy = healthy_mask()
        conf, converged, used = _select(pass_rps, healthy)
        _log(f"{name} pass {p + 1}: median {med * 1e3:.0f} ms/batch = "
             f"{rate_of(med):,.0f} reads/s  health {hc:.1f}/{hx:.1f} ms"
             f"{'' if healthy[-1] else ' [degraded]'} "
             f"(batches {' '.join(f'{t:.2f}' for t in bt)})")
        # degraded passes don't count against the budget (bounded at
        # 2x + 2 so a permanently bad window still terminates)
        n_excluded = sum(not h for h in healthy)
        budget = min(max_passes + n_excluded, 2 * max_passes + 2)
        # insist on at least three passes so a healthier window gets a
        # chance to show up (round 4: two early passes agreed inside
        # one degraded window)
        if converged and p >= 2:
            break
        p += 1
    healthy = healthy_mask()
    conf, converged, used = _select(pass_rps, healthy)
    if not converged:
        _log(f"WARNING: {name} passes never agreed within 10% with >= 3 "
             f"healthy ({[round(r) for r in pass_rps]}); reporting the "
             f"confirmed (second-best) rate among healthy passes")
    for m, h in zip(metas, healthy):
        m["healthy"] = h
    return conf, pass_rps, pass_health, metas, last, converged


def bench_full(jax, idx, genome, batch_size=None, n_batches=6, health=None):
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
    # warm the fat-cap overflow-retry program too (absorb_overflow):
    # its first dispatch compiles, and that must not land inside a
    # timed pass
    out = al.absorb_overflow(batches[0], out)
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
            out = al.absorb_overflow(batches[k], out)
            results.append(finalize_columns(idx, al.options, batches[k], out))
            t1 = time.time()
            bt.append(t1 - t0)
            t0 = t1
            pending = nxt
        return bt, results

    rps, pass_rps, pass_health, metas, results, converged = _run_passes(
        "SE", one_pass, lambda med: batch_size / med, health, max_passes)

    total = batch_size * n_batches
    ok = novf = 0
    off_truth = []  # (batch k, row i) of reads not at simulated truth
    for k, (cols, sim) in enumerate(zip(results, sims)):
        n = len(sim.positions)
        at_truth = (cols.mapped[:n] & (cols.pos[:n] == sim.positions)
                    & (cols.is_rev[:n] == sim.strands.astype(bool)))
        ok += int(at_truth.sum())
        off_truth.extend((k, int(i)) for i in np.flatnonzero(~at_truth))
        # overflow telemetry: reads that exceeded any device cap and fell
        # back to the host oracle (they are counted in the timing; a
        # nonzero rate at scale would make host finalize the ceiling)
        novf += len(cols.extra)
    _log(f"truth: {ok}/{total}; overflow/slow-path reads: {novf}/{total} "
         f"({100 * novf / total:.3f}%)")
    assert ok >= 0.98 * total, "bench correctness check failed"

    # classify every off-truth read against the host oracle (untimed;
    # VERDICT r3 item 3): the invariant is device == oracle — a read
    # whose primary record differs from the oracle's is a correctness
    # bug and fails the bench; oracle-agreeing reads are legitimate
    # BWA-MEM outcomes (repeat placement / clipped placement shift /
    # low-score drop), counted by class in the JSON
    from bioseqdb_tpu.cpu import oracle as O

    classes = dict(oracle_agree_mapped=0, oracle_agree_unmapped=0,
                   device_ne_oracle=0)
    for k, i in off_truth:
        cols, sim, batch = results[k], sims[k], batches[k]
        q = np.asarray(batch.codes)[i, : batch.lens[i]].astype(np.uint8)
        regs = O.align_read(idx, al.options, q, rand_id=i,
                            min_score=al.options.min_score, all_hits=True)
        prim = next((a for a in regs if not a.flag & 0x100), None)
        if prim is None:
            agree = not cols.mapped[i]
            classes["oracle_agree_unmapped" if agree
                    else "device_ne_oracle"] += 1
            continue
        agree = (bool(cols.mapped[i]) and int(cols.pos[i]) == prim.pos
                 and bool(cols.is_rev[i]) == bool(prim.is_rev)
                 and int(cols.score[i]) == prim.score)
        classes["oracle_agree_mapped" if agree else "device_ne_oracle"] += 1
    _log(f"off-truth classification: {classes}")
    assert classes["device_ne_oracle"] == 0, (
        "bench found device-vs-oracle disagreements", classes)
    return rps, dict(
        se_pass_rps=[round(r) for r in pass_rps],
        se_pass_health_ms=pass_health,
        se_passes=metas,
        converged=converged,
        truth=ok, total=total, overflow_reads=novf,
        off_truth_classes=classes,
    ), al


def _pe_leg(jax, idx, al, genome, name, PB, n_batches, max_passes, health,
            seed0, compile_log=None):
    """Shared fused-PE pass loop (bench_pe and bench_chr20): simulate
    pair batches, warm the dispatch + fat retry + finalize outside
    timing, then run double-buffered passes. Returns (rps, pass data,
    truth/proper counts)."""
    from bioseqdb_tpu.align.paired import finalize_pairs_columns
    from bioseqdb_tpu.io.batch import pack_reads
    from bioseqdb_tpu.utils.sim import simulate_pairs

    psims, pbatches = [], []
    for k in range(n_batches):
        sr1, sr2, _ = simulate_pairs(genome, PB, read_len=150, sub_rate=0.01,
                                     insert_mean=400, insert_std=40,
                                     seed=seed0 + k)
        psims.append(sr1)
        pbatches.append((pack_reads(sr1.reads, sr1.names),
                         pack_reads(sr2.reads, sr2.names)))

    dev = lambda k: al.device_regions_pair(*pbatches[k])
    t0 = time.time()
    w1, w2 = dev(0)
    wo1, wo2 = al.absorb_overflow_pair(
        pbatches[0][0], jax.device_get(w1),
        pbatches[0][1], jax.device_get(w2))
    finalize_pairs_columns(idx, al.options, pbatches[0][0], wo1,
                           pbatches[0][1], wo2)  # warm
    if compile_log:
        _log(f"{compile_log}: {time.time() - t0:.1f}s")

    def one_pass():
        bt, cols1 = [], []
        t0 = time.time()
        pending = dev(0)
        for k in range(n_batches):
            nxt = dev(k + 1) if k + 1 < n_batches else None
            o1, o2 = al.absorb_overflow_pair(
                pbatches[k][0], jax.device_get(pending[0]),
                pbatches[k][1], jax.device_get(pending[1]))
            c1, _c2 = finalize_pairs_columns(
                idx, al.options, pbatches[k][0], o1, pbatches[k][1], o2)
            cols1.append(c1)
            t1 = time.time()
            bt.append(t1 - t0)
            t0 = t1
            pending = nxt
        return bt, cols1

    rps, pass_rps, pass_health, metas, cols1, converged = _run_passes(
        name, one_pass, lambda med: 2 * PB / med, health, max_passes)

    okp = proper = 0
    for c1, sr1 in zip(cols1, psims):
        okp += int((c1.mapped[:PB] & (c1.pos[:PB] == sr1.positions)).sum())
        proper += int((c1.pe_flag[:PB] & 0x2 > 0).sum())
    totp = PB * n_batches
    _log(f"{name} PE truth (R1): {okp}/{totp}; "
         f"proper {100 * proper / totp:.1f}%")
    assert okp >= 0.95 * totp, f"{name} bench correctness check failed"
    return rps, pass_rps, pass_health, metas, okp, totp, proper, converged


def bench_pe(jax, idx, genome, al, batch_size=None, n_batches=3, health=None):
    """Paired-end leg through the FUSED pair dispatch: both mates of a
    pair batch run as ONE compiled device program at the same total row
    count as an SE batch (pairs = batch_size/2), finalized by the
    columnar PE path. Reported in READS/s (2 reads per pair)."""
    if batch_size is None:
        batch_size = int(os.environ.get("BST_BENCH_BATCH", 16384))
    max_passes = int(os.environ.get("BST_BENCH_PE_PASSES", 4))
    PB = batch_size // 2  # pairs per batch -> batch_size device rows
    rps, pass_rps, pass_health, metas, okp, totp, proper, conv = _pe_leg(
        jax, idx, al, genome, "PE", PB, n_batches, max_passes, health,
        seed0=700)
    return rps, dict(pe_pass_rps=[round(r) for r in pass_rps],
                     pe_pass_health_ms=pass_health, pe_passes=metas,
                     pe_converged=conv,
                     pe_truth=okp, pe_total_pairs=totp,
                     pe_proper_pct=round(100 * proper / totp, 1))


def bench_chr20(jax, batch_size=None, n_batches=4, health=None):
    """Human-chromosome-scale PE leg (BASELINE.md config 3 class):
    chr20-sized synthetic genome (64 Mb), paired-end reads through the
    fused dispatch. Smaller pass budget — the number's job is to put a
    human-scale figure in the driver ledger, not to be the headline."""
    if batch_size is None:
        batch_size = int(os.environ.get("BST_BENCH_BATCH", 16384))
    max_passes = int(os.environ.get("BST_BENCH_CHR20_PASSES", 3))

    from bioseqdb_tpu.align.options import AlignOptions
    from bioseqdb_tpu.align.pipeline import Aligner
    from bioseqdb_tpu.index.builder import build_index
    from bioseqdb_tpu.utils.sim import simulate_genome

    t0 = time.time()
    genome = simulate_genome(64_000_000, seed=20)
    idx = build_index([("chr20", genome)])
    _log(f"chr20-scale index built in {time.time() - t0:.1f}s")
    al = Aligner.build(idx, AlignOptions(), mode="full")
    PB = batch_size // 2
    rps, pass_rps, pass_health, metas, okp, totp, proper, conv = _pe_leg(
        jax, idx, al, genome, "chr20", PB, n_batches, max_passes, health,
        seed0=900, compile_log="chr20 compile+first pair batch")
    return rps, dict(chr20_pe_pass_rps=[round(r) for r in pass_rps],
                     chr20_pe_pass_health_ms=pass_health,
                     chr20_pe_converged=conv,
                     chr20_pe_truth=okp, chr20_pe_total_pairs=totp,
                     chr20_pe_proper_pct=round(100 * proper / totp, 1))


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
        health = make_health(jax)
        rps, stats, al = bench_full(jax, idx, genome, health=health)
        metric = ("150bp reads/s/chip, full BWA-MEM pipeline "
                  "(1% mutated reads, E.coli-scale index)")
        try:
            pe_rps, pe_stats = bench_pe(jax, idx, genome, al, health=health)
            stats.update(pe_stats)
            stats["pe_reads_s"] = round(pe_rps)
            stats["pe_se_ratio"] = round(pe_rps / rps, 3)
        except Exception as e:  # PE leg must not cost the SE number
            _log(f"PE leg failed ({type(e).__name__}: {e}); "
                 "SE result stands alone")
        if os.environ.get("BST_BENCH_NO_CHR20") != "1":
            try:
                c_rps, c_stats = bench_chr20(jax, health=health)
                stats.update(c_stats)
                stats["chr20_pe_reads_s"] = round(c_rps)
            except Exception as e:  # chr20 leg must not cost the headline
                _log(f"chr20 leg failed ({type(e).__name__}: {e})")
        if os.environ.get("BST_BENCH_NO_GRCH38") != "1":
            # config-4-class leg (VERDICT r4 item 6): a saved >=2 G-doubled
            # int64-rank index in a SUBPROCESS (own x64 config + HBM;
            # verified to coexist with this process's device claim);
            # skips gracefully when the artifact is absent
            import subprocess

            gdir = os.environ.get("BST_GRCH38_INDEX",
                                  __file__.rsplit("/", 1)[0] + "/.bigindex12")
            if os.path.isdir(gdir):
                try:
                    r = subprocess.run(
                        [sys.executable,
                         __file__.rsplit("/", 1)[0]
                         + "/tools/grch38_bench_leg.py", gdir],
                        capture_output=True, text=True, timeout=3600)
                    sys.stderr.write(r.stderr)
                    stats.update(json.loads(r.stdout.strip().splitlines()[-1]))
                except Exception as e:
                    _log(f"grch38 leg failed ({type(e).__name__}: {e})")
            else:
                _log(f"grch38 leg skipped: no index at {gdir}")
    except Exception as e:  # compile budget / tunnel flakes: keep a result
        _log(f"full-pipeline bench failed ({type(e).__name__}: {e}); "
             "falling back to exact-match path")
        rps = bench_exact(jax, idx, genome)
        metric = "150bp exact-match reads/s/chip (E.coli-scale index)"

    # per-pass rates + health + overflow ride along so the
    # round-over-round perf signal is auditable (the headline is the
    # median-batch rate confirmed by a second pass, degraded-health
    # passes excluded — VERDICT r3 items 4 and 7)
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
