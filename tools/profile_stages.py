"""Per-stage on-chip profiler for the full pipeline.

Times each device stage in isolation on the real chip, reports seeding
iteration statistics (straggler shape), and sweeps the seeding
iteration cap to expose the per-iteration cost model. Run ONE instance
at a time (the axon relay serializes chip claimants).

Usage: python tools/profile_stages.py [batch_size]
"""

import sys
import time

import numpy as np


def log(*a):
    print("[prof]", *a, file=sys.stderr, flush=True)


def timed(jax, fn, *args, reps=3, **kw):
    out = jax.device_get(fn(*args, **kw))  # compile + warm
    t0 = time.time()
    for _ in range(reps):
        out = jax.device_get(fn(*args, **kw))
    return (time.time() - t0) / reps, out


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      __file__.rsplit("/", 2)[0] + "/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from bioseqdb_tpu.align.options import AlignOptions
    from bioseqdb_tpu.cpu.ksw import fill_scmat
    from bioseqdb_tpu.index.builder import build_index
    from bioseqdb_tpu.io.batch import pack_reads
    from bioseqdb_tpu.kernels import fm as kfm
    from bioseqdb_tpu.kernels.chain import chain_seeds, filter_chains, resolve_seeds
    from bioseqdb_tpu.kernels.extend import extend_all
    from bioseqdb_tpu.kernels.seed import collect_seeds_device
    from bioseqdb_tpu.utils.sim import simulate_genome, simulate_reads

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    opt = AlignOptions()
    genome = simulate_genome(4_600_000, seed=1)
    idx = build_index([("ecoli", genome)])
    log(f"index built; device={jax.devices()[0]}")
    fm = kfm.FMDevice.from_host(idx)
    from bioseqdb_tpu.kernels.extend import pack_doubled_rows
    pac_dev = jax.device_put(jnp.asarray(pack_doubled_rows(np.asarray(idx.pac))))
    sim = simulate_reads(genome, B, read_len=150, sub_rate=0.01, seed=7)
    rb = pack_reads(sim.reads, sim.names)
    codes = jnp.asarray(rb.codes, jnp.int32)
    lens = jnp.asarray(rb.lens, jnp.int32)
    mat = jnp.asarray(fill_scmat(opt.match_score, opt.mismatch_penalty).astype(np.int32))
    split_len = int(opt.min_seed_len * opt.reseed_factor + 0.499)

    seed_kw = dict(min_seed_len=opt.min_seed_len, split_len=split_len,
                   split_width=opt.split_width, max_mem_intv=opt.max_mem_intv)

    # ---- seeding: iteration stats + cap sweep ----
    t_seed, mems = timed(jax, collect_seeds_device, fm, codes, lens, **seed_kw)
    it = np.asarray(mems["iters"])
    log(f"B={B} seed: {t_seed*1e3:.0f} ms  ({B/t_seed:.0f} reads/s)")
    log(f"  iters: mean={it.mean():.0f} p50={np.percentile(it,50):.0f} "
        f"p90={np.percentile(it,90):.0f} p99={np.percentile(it,99):.0f} "
        f"max={it.max()}")
    log(f"  overflow={np.asarray(mems['overflow']).sum()}")
    r1 = np.asarray(mems["it_r1"]); r2 = np.asarray(mems["it_r2"])
    log(f"  round split (mean iters): r1={r1.mean():.0f} "
        f"r2={(r2 - r1).mean():.0f} r3={(it - r2).mean():.0f}")
    for cap in (128, 256, 512, 1024):
        t_c, out_c = timed(jax, collect_seeds_device, fm, codes, lens,
                           max_iters=cap, **seed_kw)
        ovf = np.asarray(out_c["overflow"]).sum()
        log(f"  cap={cap}: {t_c*1e3:.0f} ms  ovf={ovf}")

    # ---- downstream stages ----
    seeds_kw = dict(max_occ=opt.resolve_max_occ(idx.n_refs), max_seeds=64,
                    sa_interval=idx.sa_interval)
    t_res, seeds = timed(jax, resolve_seeds, fm, mems["mems"], mems["n_mem"], **seeds_kw)
    log(f"resolve: {t_res*1e3:.0f} ms")
    t_ch, chains = timed(jax, chain_seeds, fm, seeds, max_chains=16,
                         bandwidth=opt.bandwidth, max_chain_gap=opt.max_chain_gap)
    log(f"chain:   {t_ch*1e3:.0f} ms")
    t_fl, flt = timed(jax, filter_chains, chains, seeds, mask_level=opt.mask_level,
                      chain_drop_ratio=opt.chain_drop_ratio,
                      min_chain_weight=opt.min_chain_weight,
                      min_seed_len=opt.min_seed_len,
                      max_chain_gap=opt.max_chain_gap)
    log(f"filter:  {t_fl*1e3:.0f} ms")
    ext_kw = dict(match_score=opt.match_score, mismatch_penalty=opt.mismatch_penalty,
                  o_del=opt.o_del, e_del=opt.e_del, o_ins=opt.o_ins, e_ins=opt.e_ins,
                  bandwidth=opt.bandwidth, zdrop=opt.zdrop,
                  pen_clip5=opt.pen_clip5, pen_clip3=opt.pen_clip3)
    t_ext, ext = timed(jax, extend_all, fm, pac_dev, codes, lens, seeds, chains,
                       flt, mat, use_pallas_sw=True, **ext_kw)
    log(f"extend:  {t_ext*1e3:.0f} ms")
    total = t_seed + t_res + t_ch + t_fl + t_ext
    log(f"TOTAL:   {total*1e3:.0f} ms  ({B/total:.0f} reads/s device-side)")


if __name__ == "__main__":
    main()
