"""A/B the r3 prefix-jump seeding path vs stepwise, on chip."""
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      __file__.rsplit("/", 2)[0] + "/.jax_cache")
    from bioseqdb_tpu.align.options import AlignOptions
    from bioseqdb_tpu.index.builder import build_index
    from bioseqdb_tpu.io.batch import pack_reads
    from bioseqdb_tpu.kernels import fm as kfm
    from bioseqdb_tpu.kernels.seed import build_r3_jump, collect_seeds_device
    from bioseqdb_tpu.utils.sim import simulate_genome, simulate_reads

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    opt = AlignOptions()
    genome = simulate_genome(4_600_000, seed=1)
    idx = build_index([("ecoli", genome)])
    fm = kfm.FMDevice.from_host(idx)
    depth = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    fm_j, base, depth = build_r3_jump(fm, depth=depth)
    sim = simulate_reads(genome, B, read_len=150, sub_rate=0.01, seed=7)
    rb = pack_reads(sim.reads, sim.names)
    codes = jnp.asarray(rb.codes, jnp.int32)
    lens = jnp.asarray(rb.lens, jnp.int32)
    split_len = int(opt.min_seed_len * opt.reseed_factor + 0.499)
    kw = dict(min_seed_len=opt.min_seed_len, split_len=split_len,
              split_width=opt.split_width, max_mem_intv=opt.max_mem_intv)

    cases = (("stepwise", fm, 0), (f"jump-d{depth}", fm_j, base))
    for name, f, jb in cases:
        out = jax.device_get(collect_seeds_device(f, codes, lens,
                                                  jump_base=jb,
                                                  jump_depth=depth, **kw))
        t0 = time.time()
        for _ in range(3):
            out = jax.device_get(collect_seeds_device(f, codes, lens,
                                                      jump_base=jb,
                                                      jump_depth=depth, **kw))
        dt = (time.time() - t0) / 3
        it = np.asarray(out["iters"])
        print(f"{name}: {dt*1e3:6.0f} ms  iters mean={it.mean():.0f} "
              f"max={it.max()}  ovf={np.asarray(out['overflow']).sum()}",
              flush=True)


if __name__ == "__main__":
    main()
