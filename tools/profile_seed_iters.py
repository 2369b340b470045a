import sys; sys.path.insert(0, "/root/repo")
import sys, time
import numpy as np
def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from bioseqdb_tpu.align.options import AlignOptions
    from bioseqdb_tpu.index.builder import build_index
    from bioseqdb_tpu.io.batch import pack_reads
    from bioseqdb_tpu.kernels import fm as kfm
    from bioseqdb_tpu.kernels.seed import collect_seeds_device, build_r3_jump
    from bioseqdb_tpu.utils.sim import simulate_genome, simulate_reads
    B = 8192
    opt = AlignOptions()
    genome = simulate_genome(4_600_000, seed=1)
    idx = build_index([("ecoli", genome)])
    fm = kfm.FMDevice.from_host(idx)
    fm, jb, jd = build_r3_jump(fm)
    print("jump base/depth:", jb, jd, file=sys.stderr)
    sim = simulate_reads(genome, B, read_len=150, sub_rate=0.01, seed=7)
    rb = pack_reads(sim.reads, sim.names)
    codes = jnp.asarray(rb.codes, jnp.int32)
    lens = jnp.asarray(rb.lens, jnp.int32)
    split_len = int(opt.min_seed_len * opt.reseed_factor + 0.499)
    kw = dict(min_seed_len=opt.min_seed_len, split_len=split_len,
              split_width=opt.split_width, max_mem_intv=opt.max_mem_intv,
              jump_base=jb, jump_depth=jd)
    f = jax.jit(lambda c, l: {k: v for k, v in collect_seeds_device(fm, c, l, **kw).items()})
    out = jax.device_get(f(codes, lens))
    it = out["iters"]
    print("iters mean %.1f p50 %d p90 %d max %d" % (it.mean(), np.percentile(it,50), np.percentile(it,90), it.max()), file=sys.stderr)
    # scalar-only timing
    g = jax.jit(lambda c, l: collect_seeds_device(fm, c, l, **kw)["n_mem"].sum())
    jax.device_get(g(codes, lens))
    for _ in range(3):
        t0 = time.time(); jax.device_get(g(codes, lens)); print("seed %.1f ms" % (1000*(time.time()-t0)), file=sys.stderr)
main()
