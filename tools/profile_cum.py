"""Cumulative-prefix on-chip profiler: true per-stage costs.

Isolated stage timings overstate badly — device_get of a stage's
intermediate tables pays ~25 ms/MB through the axon relay. Here each
measurement jits a prefix of the pipeline reduced to a few scalars, so
transfer is nil; stage cost = delta between consecutive prefixes.

Usage: python tools/profile_cum.py [batch_size]
"""

import sys
import time

import numpy as np


def log(*a):
    print("[cum]", *a, file=sys.stderr, flush=True)


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
    from bioseqdb_tpu.kernels.extend import extend_all, pack_doubled_rows
    from bioseqdb_tpu.kernels.seed import build_r3_jump, collect_seeds_device
    from bioseqdb_tpu.utils.sim import simulate_genome, simulate_reads

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    opt = AlignOptions()
    genome = simulate_genome(4_600_000, seed=1)
    idx = build_index([("ecoli", genome)])
    log(f"index built (sa_interval={idx.sa_interval}); device={jax.devices()[0]}")
    fm = kfm.FMDevice.from_host(idx)
    fm, jump_base, jump_depth = build_r3_jump(fm)
    pac_dev = jax.device_put(jnp.asarray(pack_doubled_rows(np.asarray(idx.pac))))
    sim = simulate_reads(genome, B, read_len=150, sub_rate=0.01, seed=7)
    rb = pack_reads(sim.reads, sim.names)
    codes = jnp.asarray(rb.codes, jnp.int32)
    lens = jnp.asarray(rb.lens, jnp.int32)
    mat = jnp.asarray(fill_scmat(opt.match_score, opt.mismatch_penalty).astype(np.int32))
    split_len = int(opt.min_seed_len * opt.reseed_factor + 0.499)
    max_occ = opt.resolve_max_occ(idx.n_refs)

    def s_seed(codes, lens):
        # match pipeline.full_align_step: r3 jump + short-read caps
        mems = collect_seeds_device(fm, codes, lens, min_seed_len=opt.min_seed_len,
                                    split_len=split_len, split_width=opt.split_width,
                                    max_mem_intv=opt.max_mem_intv,
                                    jump_base=jump_base, jump_depth=jump_depth,
                                    max_cand=16, max_mem=16)
        return mems

    def s_resolve(codes, lens):
        mems = s_seed(codes, lens)
        seeds = resolve_seeds(fm, mems["mems"], mems["n_mem"], max_occ=max_occ,
                              max_seeds=64, sa_interval=idx.sa_interval)
        return mems, seeds

    def s_chain(codes, lens):
        mems, seeds = s_resolve(codes, lens)
        chains = chain_seeds(fm, seeds, max_chains=16, bandwidth=opt.bandwidth,
                             max_chain_gap=opt.max_chain_gap)
        return mems, seeds, chains

    def s_filter(codes, lens):
        mems, seeds, chains = s_chain(codes, lens)
        flt = filter_chains(chains, seeds, mask_level=opt.mask_level,
                            chain_drop_ratio=opt.chain_drop_ratio,
                            min_chain_weight=opt.min_chain_weight,
                            min_seed_len=opt.min_seed_len,
                            max_chain_gap=opt.max_chain_gap)
        return mems, seeds, chains, flt

    def s_extend(codes, lens):
        mems, seeds, chains, flt = s_filter(codes, lens)
        ext = extend_all(fm, pac_dev, codes, lens, seeds, chains, flt, mat,
                         match_score=opt.match_score,
                         mismatch_penalty=opt.mismatch_penalty,
                         o_del=opt.o_del, e_del=opt.e_del, o_ins=opt.o_ins,
                         e_ins=opt.e_ins, bandwidth=opt.bandwidth,
                         zdrop=opt.zdrop, pen_clip5=opt.pen_clip5,
                         pen_clip3=opt.pen_clip3, use_pallas_sw=True)
        return mems, seeds, chains, flt, ext

    def chk(tree):
        leaves = jax.tree.leaves(tree)
        return sum(jnp.sum(x.astype(jnp.int32)) if x.dtype != jnp.bool_
                   else jnp.sum(x) for x in leaves)

    stages = [
        ("seed", lambda c, l: chk(s_seed(c, l))),
        ("+resolve", lambda c, l: chk(s_resolve(c, l))),
        ("+chain", lambda c, l: chk(s_chain(c, l))),
        ("+filter", lambda c, l: chk(s_filter(c, l))),
        ("+extend", lambda c, l: chk(s_extend(c, l))),
    ]
    prev = 0.0
    for name, fn in stages:
        jfn = jax.jit(fn)
        t0 = time.time()
        r = jax.device_get(jfn(codes, lens))
        log(f"{name}: compile+run {time.time()-t0:.1f}s (chk={int(r)})")
        t0 = time.time()
        reps = 3
        for _ in range(reps):
            r = jax.device_get(jfn(codes, lens))
        dt = (time.time() - t0) / reps
        log(f"{name}: {dt*1e3:7.0f} ms cumulative  (+{(dt-prev)*1e3:6.0f} ms)"
            f"  {B/dt:8.0f} reads/s")
        prev = dt

    log("done")


if __name__ == "__main__":
    main()
