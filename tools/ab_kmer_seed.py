"""A/B the seeding stage on chip with scalar-output fused programs
(cumulative-prefix method — isolated stage timings pay ~25 ms/MB of
relay transfer and overstate wildly, BENCH_NOTES):

  fm_collect | fm_collect+resolve | kmer_collect | kmer_collect+r2 |
  kmer full (collect+r2+assemble+resolve)

    python tools/ab_kmer_seed.py [B] [reps]
"""
import sys; sys.path.insert(0, __file__.rsplit("/", 2)[0])  # noqa: E702
import functools
import time

import numpy as np


def log(*a):
    print("[ab]", *a, file=sys.stderr, flush=True)


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
    from bioseqdb_tpu.kernels import kmer as kkm
    from bioseqdb_tpu.kernels.chain import resolve_seeds
    from bioseqdb_tpu.kernels.extend import pack_doubled_rows
    from bioseqdb_tpu.kernels.seed import build_seed_table, collect_seeds_device
    from bioseqdb_tpu.utils.sim import simulate_genome, simulate_reads

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    glen = int(sys.argv[3]) if len(sys.argv) > 3 else 4_600_000

    t0 = time.time()
    g = simulate_genome(glen, seed=1)
    idx = build_index([("ecoli", g)])
    log(f"index built {time.time()-t0:.0f}s")
    opt = AlignOptions()
    sim = simulate_reads(g, B, read_len=150, sub_rate=0.01, seed=100)
    rb = pack_reads(sim.reads, sim.names)
    codes = jnp.asarray(rb.codes, jnp.int32)
    lens = jnp.asarray(rb.lens, jnp.int32)

    fm0 = kfm.FMDevice.from_host(idx)
    fm, table = build_seed_table(fm0, idx)
    host, meta = idx.kmer_table_arrays(kkm.build_kmer_table)
    kt = kkm.KmerTable(bmeta=jnp.asarray(host["bmeta"]),
                       entries=jnp.asarray(host["entries"]))
    pac_dev = jnp.asarray(idx.packed_doubled_rows(pack_doubled_rows))
    split_len = int(opt.min_seed_len * opt.reseed_factor + 0.499)
    max_occ = opt.resolve_max_occ(idx.n_refs)
    smax = kkm.smax_for(opt.max_mem_intv)

    def fm_collect(fm, codes, lens):
        return collect_seeds_device(
            fm, codes, lens, min_seed_len=opt.min_seed_len,
            split_len=split_len, split_width=opt.split_width,
            max_mem_intv=opt.max_mem_intv, jump_base=table.jump_base,
            jump_depth=table.jump_depth, max_cand=16, max_mem=16)

    # tables ride as jit ARGS — closed-over arrays are baked into the
    # compile payload as constants (HTTP 413 at chr20 scale)

    nmz = kkm.nmz_for(int(codes.shape[1]))
    dmax = kkm.dmax_for(meta, nmz)
    log(f"nmz={nmz} dmax={dmax} smax={smax} bb={meta.bb} "
        f"entries={meta.n_entries}")

    def kmer_collect(kt, pac_dev, fm, codes, lens):
        return kkm.collect_seeds_kmer(
            kt, pac_dev, fm.seq_len, codes, lens, bb=meta.bb,
            min_seed_len=opt.min_seed_len, split_len=split_len,
            split_width=opt.split_width, max_mem_intv=opt.max_mem_intv,
            smax=smax, dmax=dmax, nmz=nmz, max_mem=16)

    def r2_machine(fm0, ko, codes, lens):
        return collect_seeds_device(
            fm0, codes, lens, min_seed_len=opt.min_seed_len,
            split_len=split_len, split_width=opt.split_width,
            max_mem_intv=0, jump_base=0, jump_depth=0, max_cand=16,
            max_mem=24, entry_reseed=True,
            reseed_entry=dict(mem_s=ko["mem_s"], mem_b=ko["mem_b"],
                              mem_e=ko["mem_e"], n_mem=ko["n_mem"],
                              active=ko["needs_r2"]))

    def assemble(ko, r2m):
        M_tot = 24
        m5 = r2m["mems"]
        isk = (jnp.arange(M_tot, dtype=jnp.int32)[None, :]
               < ko["n_mem"][:, None])
        posk = jnp.pad(ko["mem_pos"].astype(m5.dtype),
                       ((0, 0), (0, M_tot - 16)))
        return jnp.stack(
            [jnp.where(isk, posk, m5[:, :, 0]), isk.astype(m5.dtype),
             m5[:, :, 2], m5[:, :, 3], m5[:, :, 4]], axis=2)

    csum = lambda tree: sum(jnp.sum(x.astype(jnp.int32)) for x in
                            jax.tree_util.tree_leaves(tree))

    @jax.jit
    def J_fm1(fm, codes, lens):
        return csum(fm_collect(fm, codes, lens))

    @jax.jit
    def J_fm2(fm, codes, lens):
        m = fm_collect(fm, codes, lens)
        s = resolve_seeds(fm, m["mems"], m["n_mem"], max_occ=max_occ,
                          max_seeds=64)
        return csum(s)

    @jax.jit
    def J_k1(kt, pac_dev, fm, codes, lens):
        return csum(kmer_collect(kt, pac_dev, fm, codes, lens))

    @jax.jit
    def J_k2(kt, pac_dev, fm0, codes, lens):
        ko = kmer_collect(kt, pac_dev, fm0, codes, lens)
        return csum(r2_machine(fm0, ko, codes, lens))

    @jax.jit
    def J_k3(kt, pac_dev, fm0, codes, lens):
        ko = kmer_collect(kt, pac_dev, fm0, codes, lens)
        r2m = r2_machine(fm0, ko, codes, lens)
        mems5 = assemble(ko, r2m)
        s = resolve_seeds(fm0, mems5, r2m["n_mem"], max_occ=max_occ,
                          max_seeds=64)
        return csum(s)

    def timeit(name, fn, *args):
        jax.device_get(fn(*args, codes, lens))  # compile+warm
        ts = []
        for _ in range(reps):
            t0 = time.time()
            jax.device_get(fn(*args, codes, lens))
            ts.append(time.time() - t0)
        log(f"{name}: median {1e3*sorted(ts)[len(ts)//2]:.1f} ms  "
            f"({' '.join(f'{1e3*t:.0f}' for t in ts)})")

    # internal cut points of the kmer kernel (cumulative)
    def k_stage(st):
        @jax.jit
        def f(kt, pac_dev, fm, codes, lens):
            return csum(kkm.collect_seeds_kmer(
                kt, pac_dev, fm.seq_len, codes, lens, bb=meta.bb,
                min_seed_len=opt.min_seed_len, split_len=split_len,
                split_width=opt.split_width,
                max_mem_intv=opt.max_mem_intv, smax=smax, dmax=dmax,
                nmz=nmz, max_mem=16, stage=st))
        return f

    for st in ("hash", "select", "mzcompact", "lookup", "dedup", "reach",
               "r1"):
        timeit(f"kmer..{st:<16}", k_stage(st), kt, pac_dev, fm0)
    timeit("fm collect            ", J_fm1, fm)
    timeit("fm collect+resolve    ", J_fm2, fm)
    timeit("kmer collect          ", J_k1, kt, pac_dev, fm0)
    timeit("kmer collect+r2       ", J_k2, kt, pac_dev, fm0)
    timeit("kmer full (c+r2+res)  ", J_k3, kt, pac_dev, fm0)


if __name__ == "__main__":
    main()
