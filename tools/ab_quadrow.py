"""A/B: seeding-loop shared fetch on octo rows (128 int32) vs quad rows
(48 int32, kfm.quad_table) — marginal cost per full-width step via the
capped-iteration differencing method, both variants in ONE process.

    PYTHONPATH=. python tools/ab_quadrow.py [batch]
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
    from bioseqdb_tpu.kernels.seed import build_seed_table, collect_seeds_device
    from bioseqdb_tpu.utils.sim import simulate_genome, simulate_reads

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    opt = AlignOptions()
    genome = simulate_genome(4_600_000, seed=1)
    idx = build_index([("ecoli", genome)])
    fm, tbl = build_seed_table(kfm.FMDevice.from_host(idx), idx)
    quad = kfm.quad_table(fm.blocks)
    print(f"[ab] octo {fm.blocks.shape} {fm.blocks.nbytes/1e6:.1f} MB logical; "
          f"quad {quad.shape}", file=sys.stderr, flush=True)
    sim = simulate_reads(genome, B, read_len=150, sub_rate=0.01, seed=7)
    rb = pack_reads(sim.reads, sim.names)
    codes = jnp.asarray(rb.codes, jnp.int32)
    lens = jnp.asarray(rb.lens, jnp.int32)
    split_len = int(opt.min_seed_len * opt.reseed_factor + 0.499)
    kw = dict(min_seed_len=opt.min_seed_len, split_len=split_len,
              split_width=opt.split_width, max_mem_intv=opt.max_mem_intv,
              jump_base=tbl.jump_base, jump_depth=tbl.jump_depth,
              max_cand=16, max_mem=16, sa_interval=idx.sa_interval)

    # exactness: full uncapped run, quad == octo bit-for-bit
    a = jax.device_get(collect_seeds_device(fm, codes[:2048], lens[:2048], **kw))
    b = jax.device_get(collect_seeds_device(fm, codes[:2048], lens[:2048],
                                            quad_rows=quad, **kw))
    for k in ("mems", "n_mem", "overflow"):
        assert (np.asarray(a[k]) == np.asarray(b[k])).all(), k
    print("[ab] exactness: quad == octo on 2048 reads", flush=True)

    fns = {}
    for name, qr in (("octo", None), ("quad", quad)):
        for cap in (64, 320):
            fns[(name, cap)] = jax.jit(
                lambda c, l, cap=cap, qr=qr: collect_seeds_device(
                    fm, c, l, max_iters=cap, quad_rows=qr, **kw)["n_mem"].sum())
            jax.device_get(fns[(name, cap)](codes, lens))  # compile+warm

    # interleave reps (tunnel noise defense)
    reps = 5
    t = {k: 0.0 for k in fns}
    for _ in range(reps):
        for k, f in fns.items():
            t0 = time.time()
            jax.device_get(f(codes, lens))
            t[k] += time.time() - t0
    for name in ("octo", "quad"):
        d = (t[(name, 320)] - t[(name, 64)]) / reps / 256
        print(f"[ab] {name}: cap64 {t[(name, 64)]/reps*1e3:6.1f} ms  "
              f"cap320 {t[(name, 320)]/reps*1e3:6.1f} ms  "
              f"marginal {d*1e6:6.1f} us/step", flush=True)


if __name__ == "__main__":
    main()
