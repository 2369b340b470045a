"""Cumulative-prefix on-chip profiler of the KMER-seeded pipeline:
seed -> +r2 machine -> +resolve(capped) -> +chain -> +filter ->
+extend -> +pack. Each prefix is a scalar-output jit with all tables
passed as ARGS (closures bake them into the compile payload — HTTP 413
at chr20 scale).

    python tools/profile_cum_kmer.py [B] [reps] [genome_len]
"""
import sys; sys.path.insert(0, __file__.rsplit("/", 2)[0])  # noqa: E702
import time

import numpy as np


def log(*a):
    print("[cumk]", *a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      __file__.rsplit("/", 2)[0] + "/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bioseqdb_tpu.align.options import AlignOptions
    from bioseqdb_tpu.cpu.ksw import fill_scmat
    from bioseqdb_tpu.index.builder import build_index
    from bioseqdb_tpu.io.batch import pack_reads
    from bioseqdb_tpu.kernels import fm as kfm
    from bioseqdb_tpu.kernels import kmer as kkm
    from bioseqdb_tpu.kernels.chain import (chain_seeds, filter_chains,
                                            l_rep_device, resolve_seeds)
    from bioseqdb_tpu.kernels.extend import extend_all, pack_doubled_rows
    from bioseqdb_tpu.kernels.seed import collect_seeds_device
    from bioseqdb_tpu.align.pipeline import _pack_out
    from bioseqdb_tpu.utils.sim import simulate_genome, simulate_reads

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    glen = int(sys.argv[3]) if len(sys.argv) > 3 else 4_600_000

    t0 = time.time()
    g = simulate_genome(glen, seed=1)
    idx = build_index([("g", g)])
    log(f"index built {time.time()-t0:.0f}s sa_interval={idx.sa_interval}")
    opt = AlignOptions()
    sim = simulate_reads(g, B, read_len=150, sub_rate=0.01, seed=100)
    rb = pack_reads(sim.reads, sim.names)
    codes = jnp.asarray(rb.codes, jnp.int32)
    lens = jnp.asarray(rb.lens, jnp.int32)
    mat = jnp.asarray(fill_scmat(opt.match_score,
                                 opt.mismatch_penalty).astype(np.int32))

    fm0 = kfm.FMDevice.from_host(idx)
    host, meta = idx.kmer_table_arrays(kkm.build_kmer_table)
    kt = kkm.KmerTable(bmeta=jnp.asarray(host["bmeta"]),
                       entries=jnp.asarray(host["entries"]))
    pac_dev = jnp.asarray(idx.packed_doubled_rows(pack_doubled_rows))
    split_len = int(opt.min_seed_len * opt.reseed_factor + 0.499)
    max_occ = opt.resolve_max_occ(idx.n_refs)
    smax = kkm.smax_for(opt.max_mem_intv)
    nmz = kkm.nmz_for(int(codes.shape[1]))
    dmax = kkm.dmax_for(meta, nmz)
    W = int(codes.shape[1])
    narrowish = True

    def upto(stage):
        def f(kt, pac_dev, fm0, codes, lens, mat):
            ko = kkm.collect_seeds_kmer(
                kt, pac_dev, fm0.seq_len, codes, lens, bb=meta.bb,
                min_seed_len=opt.min_seed_len, split_len=split_len,
                split_width=opt.split_width,
                max_mem_intv=opt.max_mem_intv, smax=smax, dmax=dmax,
                nmz=nmz, max_mem=16)
            if stage == "seed":
                return ko
            r2m = collect_seeds_device(
                fm0, codes, lens, min_seed_len=opt.min_seed_len,
                split_len=split_len, split_width=opt.split_width,
                max_mem_intv=0, jump_base=0, jump_depth=0, max_cand=16,
                max_mem=24, entry_reseed=True,
                reseed_entry=dict(mem_s=ko["mem_s"], mem_b=ko["mem_b"],
                                  mem_e=ko["mem_e"], n_mem=ko["n_mem"],
                                  active=ko["needs_r2"]))
            if stage == "r2":
                return r2m
            M_tot = 24
            m5 = r2m["mems"]
            isk = (jnp.arange(M_tot, dtype=jnp.int32)[None, :]
                   < ko["n_mem"][:, None])
            posk = jnp.pad(ko["mem_pos"].astype(m5.dtype),
                           ((0, 0), (0, M_tot - 16)))
            mems5 = jnp.stack(
                [jnp.where(isk, posk, m5[:, :, 0]), isk.astype(m5.dtype),
                 m5[:, :, 2], m5[:, :, 3], m5[:, :, 4]], axis=2)
            seeds = resolve_seeds(fm0, mems5, r2m["n_mem"], max_occ=max_occ,
                                  max_seeds=64,
                                  sa_interval=idx.sa_interval,
                                  compact_cap=4096)
            if stage == "resolve":
                return seeds
            chains = chain_seeds(fm0, seeds, max_chains=16,
                                 bandwidth=opt.bandwidth,
                                 max_chain_gap=opt.max_chain_gap)
            if stage == "chain":
                return chains
            flt = filter_chains(chains, seeds, mask_level=opt.mask_level,
                                chain_drop_ratio=opt.chain_drop_ratio,
                                min_chain_weight=opt.min_chain_weight,
                                min_seed_len=opt.min_seed_len,
                                max_chain_gap=opt.max_chain_gap)
            if stage == "filter":
                return flt
            ext = extend_all(
                fm0, pac_dev, codes, lens, seeds, chains, flt, mat,
                match_score=opt.match_score,
                mismatch_penalty=opt.mismatch_penalty,
                o_del=opt.o_del, e_del=opt.e_del, o_ins=opt.o_ins,
                e_ins=opt.e_ins, bandwidth=opt.bandwidth, zdrop=opt.zdrop,
                pen_clip5=opt.pen_clip5, pen_clip3=opt.pen_clip3,
                use_pallas_sw=True, sw_sort=True)
            if stage == "extend":
                return ext
            overflow = (ko["overflow"] | r2m["overflow"]
                        | seeds["overflow"] | chains["overflow"]
                        | ext["overflow"])
            regs = dict(ext["regs"])
            regs.pop("cchain", None)
            out = dict(regs=regs, n_regs=ext["n_regs"], overflow=overflow,
                       l_rep=l_rep_device(mems5, r2m["n_mem"],
                                          max_occ=max_occ))
            return _pack_out(out, 2 * B, True)

        return jax.jit(lambda *a: sum(
            jnp.sum(x.astype(jnp.int32)) for x in
            jax.tree_util.tree_leaves(f(*a))))

    prev = None
    for st in ("seed", "r2", "resolve", "chain", "filter", "extend",
               "pack"):
        fn = upto(st)
        jax.device_get(fn(kt, pac_dev, fm0, codes, lens, mat))
        ts = []
        for _ in range(reps):
            t0 = time.time()
            jax.device_get(fn(kt, pac_dev, fm0, codes, lens, mat))
            ts.append(time.time() - t0)
        med = 1e3 * sorted(ts)[len(ts) // 2]
        d = "" if prev is None else f"  (+{med - prev:.1f})"
        log(f"upto {st:<8}: {med:7.1f} ms{d}")
        prev = med


if __name__ == "__main__":
    main()
