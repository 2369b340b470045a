"""Does the seeding loop's gather cost depend on TABLE SIZE or on hot
FOOTPRINT? The mega-table rework (fold pac text / SA samples / ISA
rows into the blocks table so fast-forward rides the shared gather)
appends ~20 MB of rarely-touched rows; if the v5e "gather cliff"
(BENCH_NOTES: ~2x per-row past ~5-6 MB on the real loop) is keyed on
total table bytes, the rework loses before it starts. This A/B runs
the REAL seeding loop with junk rows appended (never addressed — the
hot row set is identical) at several inflation sizes, interleaved
rep-by-rep against control in one process (relay noise defense).

    PYTHONPATH=. python tools/ab_table_size.py [batch]
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
    fm0 = kfm.FMDevice.from_host(idx)
    fm0, jb, jd = build_r3_jump(fm0, host_blocks=np.asarray(idx.blocks))
    base_rows = fm0.blocks.shape[0]
    base_mb = base_rows * fm0.blocks.shape[1] * 4 / 1e6
    print(f"[ab] base table: {base_rows} rows x {fm0.blocks.shape[1]} "
          f"int32 = {base_mb:.1f} MB (jump_base={jb} depth={jd})",
          file=sys.stderr, flush=True)

    sim = simulate_reads(genome, B, read_len=150, sub_rate=0.01, seed=7)
    rb = pack_reads(sim.reads, sim.names)
    codes = jnp.asarray(rb.codes, jnp.int32)
    lens = jnp.asarray(rb.lens, jnp.int32)
    split_len = int(opt.min_seed_len * opt.reseed_factor + 0.499)
    kw = dict(min_seed_len=opt.min_seed_len, split_len=split_len,
              split_width=opt.split_width, max_mem_intv=opt.max_mem_intv,
              jump_base=jb, jump_depth=jd, max_cand=16, max_mem=16)

    # variants: junk rows appended after the jump rows (never gathered)
    sizes_mb = [0, 8, 24, 48]
    fms = []
    for mb in sizes_mb:
        if mb == 0:
            fms.append(fm0)
            continue
        junk = jnp.zeros((int(mb * 1e6 / (96 * 4)), 96), jnp.int32)
        fms.append(fm0._replace(blocks=jnp.concatenate([fm0.blocks, junk])))

    def run(fm):
        return collect_seeds_device(fm, codes, lens, **kw)["iters"].sum()

    fns = [jax.jit(lambda c, l, fm=fm: collect_seeds_device(
        fm, c, l, **kw)["iters"].sum()) for fm in fms]
    outs = [int(jax.device_get(f(codes, lens))) for f in fns]  # compile+check
    assert len(set(outs)) == 1, f"outputs differ: {outs}"

    REPS = 6
    times = [[] for _ in fms]
    for rep in range(REPS):
        for i, f in enumerate(fns):
            t0 = time.time()
            jax.device_get(f(codes, lens))
            times[i].append(time.time() - t0)
    for mb, ts in zip(sizes_mb, times):
        med = sorted(ts)[len(ts) // 2]
        tot = base_mb + mb
        print(f"[ab] +{mb:3d} MB junk (total ~{tot:5.1f} MB): "
              f"median {med * 1e3:7.1f} ms  (reps: "
              + " ".join(f"{t * 1e3:.0f}" for t in ts) + ")",
              file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
