"""BASELINE config 3: human-chr20-scale (64 Mb) on one chip.

Builds a 64 Mb synthetic reference, streams 150bp read batches through
the full device pipeline (replicated index, data-parallel reads), and
reports sustained reads/s plus truth-position accuracy; then validates
a paired-end sample end-to-end. Run on the real chip:

    PYTHONPATH=. python tools/config3_check.py [n_reads] [n_pairs]
    (no PYTHONPATH: it breaks this environment's axon TPU plugin
    registration — the script inserts the repo root itself)
"""

import sys; sys.path.insert(0, __file__.rsplit("/", 2)[0])  # noqa: E702
import time

import numpy as np


def log(*a):
    print("[config3]", *a, flush=True)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      __file__.rsplit("/", 2)[0] + "/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bioseqdb_tpu.align.finalize import finalize_batch
    from bioseqdb_tpu.align.options import AlignOptions
    from bioseqdb_tpu.align.pipeline import Aligner
    from bioseqdb_tpu.io.batch import pack_reads
    from bioseqdb_tpu.utils.sim import simulate_genome, simulate_pairs, simulate_reads

    n_reads = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
    B = 8192

    t0 = time.time()
    genome = simulate_genome(64_000_000, seed=30)
    log(f"genome 64Mb in {time.time()-t0:.0f}s")
    t0 = time.time()
    from bioseqdb_tpu.index.builder import build_index

    idx = build_index([("chr20", genome)])
    log(f"index built in {time.time()-t0:.0f}s "
        f"(blocks {idx.blocks.nbytes/1e6:.0f}MB)")

    al = Aligner.build(idx, AlignOptions(), mode="full")
    n_batches = max(1, n_reads // B)

    sims, batches = [], []
    for k in range(n_batches):
        sim = simulate_reads(genome, B, read_len=150, sub_rate=0.01,
                             seed=500 + k)
        sims.append(sim)
        batches.append(pack_reads(sim.reads, sim.names))
    log(f"simulated {n_batches * B} reads")

    out = jax.device_get(al.device_regions(batches[0]))  # compile
    log("compiled")
    t0 = time.time()
    pending = al.device_regions(batches[0])
    ok = total = 0
    for k in range(n_batches):
        nxt = al.device_regions(batches[k + 1]) if k + 1 < n_batches else None
        out = jax.device_get(pending)
        res = finalize_batch(idx, al.options, batches[k], out)
        sim = sims[k]
        for r, p, s in zip(res, sim.positions, sim.strands):
            total += 1
            if r.hits and r.hits[0].ref_begin == p and r.hits[0].is_reverse == bool(s):
                ok += 1
        pending = nxt
    dt_se = time.time() - t0
    log(f"single-end: {total} reads in {dt_se:.1f}s = {total/dt_se:.0f} reads/s; "
        f"truth {ok}/{total} ({100*ok/total:.2f}%)")

    # paired-end: columnar finalize (align_pairs_columns), device compute
    # of batch k+1 overlapping host finalize of batch k — the PE
    # counterpart of the SE loop above. VERDICT r1 item 5's gate:
    # PE reads/s within 1.5x of the SE reads/s.
    from bioseqdb_tpu.align.paired import finalize_pairs_columns

    PB = min(B, n_pairs)
    n_pb = max(1, n_pairs // PB)
    psims, pbatches = [], []
    for k in range(n_pb):
        sr1, sr2, _ = simulate_pairs(genome, PB, read_len=150, sub_rate=0.01,
                                     insert_mean=400, insert_std=40,
                                     seed=700 + k)
        psims.append((sr1, sr2))
        pbatches.append((pack_reads(sr1.reads, sr1.names),
                         pack_reads(sr2.reads, sr2.names)))
    dev = lambda k: (al.device_regions(pbatches[k][0]),
                     al.device_regions(pbatches[k][1]))
    w1, w2 = dev(0)
    finalize_pairs_columns(idx, al.options, pbatches[0][0],
                           jax.device_get(w1), pbatches[0][1],
                           jax.device_get(w2))  # compile/warm
    t0 = time.time()
    pending = dev(0)
    okp = totp = proper = 0
    for k in range(n_pb):
        nxt = dev(k + 1) if k + 1 < n_pb else None
        o1, o2 = jax.device_get(pending[0]), jax.device_get(pending[1])
        c1, c2 = finalize_pairs_columns(
            idx, al.options, pbatches[k][0], o1, pbatches[k][1], o2)
        sr1 = psims[k][0]
        okp += int((c1.mapped[:PB] & (c1.pos[:PB] == sr1.positions)).sum())
        proper += int((c1.pe_flag[:PB] & 0x2 > 0).sum())
        totp += PB
        pending = nxt
    dt = time.time() - t0
    log(f"paired-end (columnar): {totp} pairs ({2*totp} reads) in {dt:.1f}s"
        f" = {totp/dt:.0f} pairs/s = {2*totp/dt:.0f} reads/s;"
        f" R1 truth {okp}/{totp} ({100*okp/totp:.2f}%),"
        f" proper {100*proper/totp:.1f}%; PE/SE reads ratio"
        f" {(2*totp/dt)/(total/max(dt_se,1e-9)):.2f}")
    log("CONFIG 3: PASS" if ok >= 0.98 * total and okp >= 0.95 * totp
        else "CONFIG 3: DEGRADED")


if __name__ == "__main__":
    main()
