"""Where does the extend stage's time go? A/B max_rounds (each round =
one containment scan + 2 directions x 2 retry Pallas SW calls) and
check how many reads actually need each round.

    PYTHONPATH=. python tools/ab_extend_rounds.py [batch]
"""
import sys; sys.path.insert(0, __file__.rsplit("/", 2)[0])  # noqa: E702
import time

import numpy as np


def log(*a):
    print("[abx]", *a, file=sys.stderr, flush=True)


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

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    opt = AlignOptions()
    genome = simulate_genome(4_600_000, seed=1)
    idx = build_index([("ecoli", genome)])
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

    def upstream(codes, lens):
        mems = collect_seeds_device(fm, codes, lens, min_seed_len=opt.min_seed_len,
                                    split_len=split_len, split_width=opt.split_width,
                                    max_mem_intv=opt.max_mem_intv,
                                    jump_base=jump_base, jump_depth=jump_depth,
                                    max_cand=16, max_mem=16)
        seeds = resolve_seeds(fm, mems["mems"], mems["n_mem"], max_occ=max_occ,
                              max_seeds=64, sa_interval=idx.sa_interval)
        chains = chain_seeds(fm, seeds, max_chains=16, bandwidth=opt.bandwidth,
                             max_chain_gap=opt.max_chain_gap)
        flt = filter_chains(chains, seeds, mask_level=opt.mask_level,
                            chain_drop_ratio=opt.chain_drop_ratio,
                            min_chain_weight=opt.min_chain_weight,
                            min_seed_len=opt.min_seed_len,
                            max_chain_gap=opt.max_chain_gap)
        return seeds, chains, flt

    def run(mr, use_pallas=True):
        def fn(codes, lens):
            seeds, chains, flt = upstream(codes, lens)
            ext = extend_all(fm, pac_dev, codes, lens, seeds, chains, flt, mat,
                             match_score=opt.match_score,
                             mismatch_penalty=opt.mismatch_penalty,
                             o_del=opt.o_del, e_del=opt.e_del, o_ins=opt.o_ins,
                             e_ins=opt.e_ins, bandwidth=opt.bandwidth,
                             zdrop=opt.zdrop, pen_clip5=opt.pen_clip5,
                             pen_clip3=opt.pen_clip3, use_pallas_sw=use_pallas,
                             max_rounds=mr)
            return (jnp.sum(ext["n_regs"]), jnp.sum(ext["overflow"]),
                    jnp.sum(ext["regs"]["score"]))
        jfn = jax.jit(fn)
        r = jax.device_get(jfn(codes, lens))
        t0 = time.time()
        reps = 3
        for _ in range(reps):
            r = jax.device_get(jfn(codes, lens))
        dt = (time.time() - t0) / reps
        log(f"max_rounds={mr}: {dt*1e3:7.0f} ms  n_regs={int(r[0])} "
            f"ovf={int(r[1])} score_sum={int(r[2])}")
        return dt

    # baseline: upstream only
    jup = jax.jit(lambda c, l: sum(jnp.sum(x.astype(jnp.int32))
                                   for x in jax.tree.leaves(upstream(c, l))))
    jax.device_get(jup(codes, lens))
    t0 = time.time()
    for _ in range(3):
        jax.device_get(jup(codes, lens))
    log(f"upstream only: {(time.time()-t0)/3*1e3:7.0f} ms")

    for mr in (1, 2, 3, 6):
        run(mr)


if __name__ == "__main__":
    main()
