"""A/B: seeding with shared single-row fetch (share_fetch) vs classic
two-row fetch — total uncapped seed time, interleaved reps in ONE
process (share changes iteration counts, so wall time is the metric).

    PYTHONPATH=. python tools/ab_fetchshare.py [batch]
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
    sim = simulate_reads(genome, B, read_len=150, sub_rate=0.01, seed=7)
    rb = pack_reads(sim.reads, sim.names)
    codes = jnp.asarray(rb.codes, jnp.int32)
    lens = jnp.asarray(rb.lens, jnp.int32)
    split_len = int(opt.min_seed_len * opt.reseed_factor + 0.499)
    kw = dict(min_seed_len=opt.min_seed_len, split_len=split_len,
              split_width=opt.split_width, max_mem_intv=opt.max_mem_intv,
              jump_base=tbl.jump_base, jump_depth=tbl.jump_depth,
              max_cand=16, max_mem=16, sa_interval=idx.sa_interval)

    # exactness across the flag
    a = jax.device_get(collect_seeds_device(
        fm, codes[:2048], lens[:2048], share_fetch=False, **kw))
    b = jax.device_get(collect_seeds_device(
        fm, codes[:2048], lens[:2048], share_fetch=True, **kw))
    for k in ("mems", "n_mem", "overflow"):
        assert (np.asarray(a[k]) == np.asarray(b[k])).all(), k
    print("[ab] exactness: share == classic on 2048 reads", flush=True)
    print(f"[ab] iters/read classic {np.asarray(a['iters']).mean():.1f} "
          f"share {np.asarray(b['iters']).mean():.1f}", flush=True)

    fns = {}
    for name, sf in (("classic", False), ("share", True)):
        fns[name] = jax.jit(lambda c, l, sf=sf: collect_seeds_device(
            fm, c, l, share_fetch=sf, **kw)["n_mem"].sum())
        jax.device_get(fns[name](codes, lens))  # compile+warm

    reps = 8
    t = {k: [] for k in fns}
    for _ in range(reps):
        for k, f in fns.items():
            t0 = time.time()
            jax.device_get(f(codes, lens))
            t[k].append(time.time() - t0)
    import statistics
    for name in fns:
        v = t[name]
        print(f"[ab] {name:8s} median {statistics.median(v)*1e3:7.1f} ms  "
              f"min {min(v)*1e3:7.1f}  max {max(v)*1e3:7.1f}", flush=True)


if __name__ == "__main__":
    main()
