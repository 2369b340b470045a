"""Where does the chr20-scale PE leg's time go?

bench.py's new chr20 leg (64 Mb genome, fused PE dispatch) measured
3.0K reads/s vs 67.6K at E. coli scale in the same window — 22x.
This splits the batch cost: device dispatch wall, host finalize wall,
overflow/slow-path read counts, and the SE device path at the same
scale for comparison.

Usage: python tools/profile_chr20.py [genome_mb] [batch]
"""

import sys
import time

import numpy as np


def log(*a):
    print("[chr20]", *a, file=sys.stderr, flush=True)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      __file__.rsplit("/", 2)[0] + "/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bioseqdb_tpu.align.columns import finalize_columns
    from bioseqdb_tpu.align.options import AlignOptions
    from bioseqdb_tpu.align.paired import finalize_pairs_columns
    from bioseqdb_tpu.align.pipeline import Aligner
    from bioseqdb_tpu.index.builder import build_index
    from bioseqdb_tpu.io.batch import pack_reads
    from bioseqdb_tpu.utils.sim import simulate_genome, simulate_pairs, \
        simulate_reads

    mb = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 16384
    t0 = time.time()
    genome = simulate_genome(mb * 1_000_000, seed=20)
    idx = build_index([("chr20", genome)])
    log(f"{mb} Mb index built in {time.time() - t0:.1f}s")
    al = Aligner.build(idx, AlignOptions(), mode="full")

    # --- SE leg at this scale ---
    sim = simulate_reads(genome, B, read_len=150, sub_rate=0.01, seed=900)
    rb = pack_reads(sim.reads, sim.names)
    t0 = time.time()
    out = jax.device_get(al.device_regions(rb))
    log(f"SE compile+first batch: {time.time() - t0:.1f}s")
    for rep in range(3):
        t0 = time.time()
        out = jax.device_get(al.device_regions(rb))
        t_dev = time.time() - t0
        t0 = time.time()
        cols = finalize_columns(idx, al.options, rb, out)
        t_fin = time.time() - t0
        log(f"SE rep{rep}: device {t_dev * 1e3:.0f} ms  finalize "
            f"{t_fin * 1e3:.0f} ms  -> {B / (t_dev + t_fin):,.0f} reads/s  "
            f"overflow {len(cols.extra)}/{B}")
    n = len(sim.positions)
    ok = int((cols.mapped[:n] & (cols.pos[:n] == sim.positions)).sum())
    log(f"SE truth {ok}/{n}")

    # --- PE leg (fused dispatch) ---
    PB = B // 2
    sr1, sr2, _ = simulate_pairs(genome, PB, read_len=150, sub_rate=0.01,
                                 insert_mean=400, insert_std=40, seed=900)
    rb1 = pack_reads(sr1.reads, sr1.names)
    rb2 = pack_reads(sr2.reads, sr2.names)
    t0 = time.time()
    w1, w2 = al.device_regions_pair(rb1, rb2)
    o1, o2 = jax.device_get(w1), jax.device_get(w2)
    log(f"PE compile+first dispatch: {time.time() - t0:.1f}s")
    for rep in range(3):
        t0 = time.time()
        w1, w2 = al.device_regions_pair(rb1, rb2)
        o1, o2 = jax.device_get(w1), jax.device_get(w2)
        t_dev = time.time() - t0
        t0 = time.time()
        c1, c2 = finalize_pairs_columns(idx, al.options, rb1, o1, rb2, o2)
        t_fin = time.time() - t0
        log(f"PE rep{rep}: device {t_dev * 1e3:.0f} ms  finalize "
            f"{t_fin * 1e3:.0f} ms  -> {2 * PB / (t_dev + t_fin):,.0f} "
            f"reads/s  overflow {len(c1.extra)}+{len(c2.extra)}/{2 * PB}")
    okp = int((c1.mapped[:PB] & (c1.pos[:PB] == sr1.positions)).sum())
    proper = int((c1.pe_flag[:PB] & 0x2 > 0).sum())
    log(f"PE truth (R1) {okp}/{PB}; proper {100 * proper / PB:.1f}%")


if __name__ == "__main__":
    main()
