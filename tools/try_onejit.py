import sys; sys.path.insert(0, "/root/repo")
import functools, time
import numpy as np
def main():
    import jax, jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from bioseqdb_tpu.align.options import AlignOptions
    from bioseqdb_tpu.align.pipeline import full_align_step, _pack_out
    from bioseqdb_tpu.cpu.ksw import fill_scmat
    from bioseqdb_tpu.index.builder import build_index
    from bioseqdb_tpu.io.batch import pack_reads
    from bioseqdb_tpu.kernels import fm as kfm
    from bioseqdb_tpu.kernels.extend import pack_doubled_rows
    from bioseqdb_tpu.kernels.seed import build_r3_jump
    from bioseqdb_tpu.utils.sim import simulate_genome, simulate_reads
    B = 8192
    opt = AlignOptions()
    genome = simulate_genome(4_600_000, seed=1)
    idx = build_index([("ecoli", genome)])
    fm = kfm.FMDevice.from_host(idx)
    fm, jb, jd = build_r3_jump(fm)
    pac_dev = jnp.asarray(pack_doubled_rows(np.asarray(idx.pac)))
    mat = jnp.asarray(fill_scmat(1, 4).astype(np.int32))
    kw = dict(min_seed_len=opt.min_seed_len,
              split_len=int(opt.min_seed_len * opt.reseed_factor + 0.499),
              split_width=opt.split_width, max_mem_intv=opt.max_mem_intv,
              max_occ=opt.resolve_max_occ(1), max_seeds=64, max_chains=16,
              match_score=1, mismatch_penalty=4, o_del=6, e_del=1, o_ins=6,
              e_ins=1, bandwidth=opt.bandwidth, zdrop=opt.zdrop,
              pen_clip5=5, pen_clip3=5,
              min_chain_weight=opt.min_chain_weight,
              max_chain_gap=opt.max_chain_gap, mask_level=opt.mask_level,
              chain_drop_ratio=opt.chain_drop_ratio,
              sa_interval=idx.sa_interval, use_pallas_sw=True,
              jump_base=jb, jump_depth=jd)

    @functools.partial(jax.jit, static_argnames=tuple(kw.keys()))
    def one(fm, pac_dev, codes, lens, mat, **kws):
        out = full_align_step(fm, pac_dev, codes, lens, mat, **kws)
        return _pack_out(out, cap=2 * codes.shape[0], narrow=True)

    sims = [simulate_reads(genome, B, 150, sub_rate=0.01, seed=100 + k) for k in range(3)]
    rbs = [pack_reads(s.reads, s.names) for s in sims]
    cl = [(jnp.asarray(r.codes, jnp.int32), jnp.asarray(r.lens, jnp.int32)) for r in rbs]
    t0 = time.time()
    o = jax.device_get(one(fm, pac_dev, *cl[0], mat, **kw))
    print("one-jit compile+run %.1fs" % (time.time()-t0), file=sys.stderr)
    # same-shape re-executions (the old JAX 0.9 cache bug fired here)
    for k in (1, 2, 0, 1):
        t0 = time.time()
        o = jax.device_get(one(fm, pac_dev, *cl[k], mat, **kw))
        print("re-exec batch %d: %.1f ms (n_regs sum %d)" % (k, 1000*(time.time()-t0), o["n_regs"].sum()), file=sys.stderr)
main()
