"""A/B: classic seeding at B reads vs dual-slot seeding at 2B reads
(same rows/iteration, half the rows per read).

    PYTHONPATH=. python tools/ab_seed_dual.py [B=16384]
"""
import sys; sys.path.insert(0, __file__.rsplit("/", 2)[0])  # noqa: E702
import time


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      __file__.rsplit("/", 2)[0] + "/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bioseqdb_tpu.align.options import AlignOptions
    from bioseqdb_tpu.index.builder import build_index
    from bioseqdb_tpu.io.batch import pack_reads
    from bioseqdb_tpu.kernels import fm as kfm
    from bioseqdb_tpu.kernels.seed import build_r3_jump, collect_seeds_device
    from bioseqdb_tpu.utils.sim import simulate_genome, simulate_reads

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    opt = AlignOptions()
    genome = simulate_genome(4_600_000, seed=1)
    idx = build_index([("ecoli", genome)])
    fm = kfm.FMDevice.from_host(idx)
    fm, jb, jd = build_r3_jump(fm)
    sim = simulate_reads(genome, 2 * B, read_len=150, sub_rate=0.01, seed=7)
    rb = pack_reads(sim.reads, sim.names)
    codes = jnp.asarray(rb.codes, jnp.int32)
    lens = jnp.asarray(rb.lens, jnp.int32)
    split_len = int(opt.min_seed_len * opt.reseed_factor + 0.499)
    kw = dict(min_seed_len=opt.min_seed_len, split_len=split_len,
              split_width=opt.split_width, max_mem_intv=opt.max_mem_intv,
              jump_base=jb, jump_depth=jd, max_cand=16, max_mem=16)

    for name, n, dual in (("classic", B, False), ("dual", 2 * B, True),
                          ("dual-same-B", B, True)):
        f = jax.jit(lambda c, l, dual=dual: collect_seeds_device(
            fm, c, l, dual=dual, **kw)["n_mem"].sum())
        c, l = codes[:n], lens[:n]
        r = jax.device_get(f(c, l))
        t0 = time.time()
        reps = 3
        for _ in range(reps):
            r = jax.device_get(f(c, l))
        dt = (time.time() - t0) / reps
        print(f"{name:12s} B={n:6d}: {dt*1e3:7.1f} ms "
              f"({n/dt:9.0f} reads/s) n_mem_sum={int(r)}", flush=True)


if __name__ == "__main__":
    main()
