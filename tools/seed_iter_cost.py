"""Per-iteration cost of the seeding loop at full width: run with small
max_iters caps and difference the times. Separates the fused-gather
cost (known from microbench_gather_dual) from the vector body.

    PYTHONPATH=. python tools/seed_iter_cost.py [batch]
"""
import sys; sys.path.insert(0, __file__.rsplit("/", 2)[0])  # noqa: E702
import time

import numpy as np


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
    sim = simulate_reads(genome, B, read_len=150, sub_rate=0.01, seed=7)
    rb = pack_reads(sim.reads, sim.names)
    codes = jnp.asarray(rb.codes, jnp.int32)
    lens = jnp.asarray(rb.lens, jnp.int32)
    split_len = int(opt.min_seed_len * opt.reseed_factor + 0.499)
    kw = dict(min_seed_len=opt.min_seed_len, split_len=split_len,
              split_width=opt.split_width, max_mem_intv=opt.max_mem_intv,
              jump_base=jb, jump_depth=jd, max_cand=16, max_mem=16)

    prev_t, prev_cap = 0.0, 0
    for cap in (64, 192, 320):
        f = jax.jit(lambda c, l, cap=cap: collect_seeds_device(
            fm, c, l, max_iters=cap, **kw)["n_mem"].sum())
        jax.device_get(f(codes, lens))
        t0 = time.time()
        reps = 5
        for _ in range(reps):
            jax.device_get(f(codes, lens))
        dt = (time.time() - t0) / reps
        msg = f"cap {cap:4d}: {dt*1e3:7.1f} ms"
        if prev_cap:
            msg += (f"   -> {1e6*(dt-prev_t)/(cap-prev_cap):7.1f} us/iter"
                    f" at full width")
        print(msg, flush=True)
        prev_t, prev_cap = dt, cap


if __name__ == "__main__":
    main()
