"""Which stage makes the PIPELINE's overflow differ from the stage-wise
census? Runs Aligner.device_regions on the same chr20-scale batch and
re-runs full_align_step unjitted (BST_NO_ONEJIT path, pack off) to
split the merged overflow mask by source.

Usage: python tools/overflow_diff.py [genome_mb] [batch]
"""

import sys
import time

import numpy as np


def log(*a):
    print("[diff]", *a, file=sys.stderr, flush=True)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      __file__.rsplit("/", 2)[0] + "/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from bioseqdb_tpu.align.finalize import maybe_unpack
    from bioseqdb_tpu.align.options import AlignOptions
    from bioseqdb_tpu.align.pipeline import Aligner, full_align_step
    from bioseqdb_tpu.cpu.ksw import fill_scmat
    from bioseqdb_tpu.index.builder import build_index
    from bioseqdb_tpu.io.batch import pack_reads
    from bioseqdb_tpu.utils.sim import simulate_genome, simulate_reads

    mb = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 16384
    t0 = time.time()
    genome = simulate_genome(mb * 1_000_000, seed=20)
    idx = build_index([("chr", genome)])
    log(f"{mb} Mb index built in {time.time() - t0:.1f}s")
    al = Aligner.build(idx, AlignOptions(), mode="full")
    sim = simulate_reads(genome, B, read_len=150, sub_rate=0.01, seed=900)
    rb = pack_reads(sim.reads, sim.names)

    out = maybe_unpack(jax.device_get(al.device_regions(rb)))
    ovf_pipe = np.asarray(out["overflow"])
    log(f"pipeline overflow: {int(ovf_pipe.sum())}/{B}")

    # unjitted composition, stage masks kept separate
    import bioseqdb_tpu.align.pipeline as P

    codes, lens = al._put_batch(rb)
    mat = jnp.asarray(fill_scmat(
        al.options.match_score, al.options.mismatch_penalty).astype(np.int32))
    W = int(codes.shape[1])
    common, _ = al._step_kwargs(W)

    from bioseqdb_tpu.kernels.chain import chain_seeds, filter_chains, \
        resolve_seeds
    from bioseqdb_tpu.kernels.seed import collect_seeds_device
    from bioseqdb_tpu.kernels.extend import extend_all

    caps = dict(max_cand=16, max_mem=16)
    mems = collect_seeds_device(
        al.fm, codes.astype(jnp.int32), lens,
        min_seed_len=common["min_seed_len"], split_len=common["split_len"],
        split_width=common["split_width"],
        max_mem_intv=common["max_mem_intv"],
        jump_base=al.table.jump_base, jump_depth=al.table.jump_depth,
        sa_interval=common["sa_interval"], kcand=common["kcand"], **caps)
    seeds = resolve_seeds(al.fm, mems["mems"], mems["n_mem"],
                          max_occ=common["max_occ"],
                          max_seeds=common["max_seeds"],
                          sa_interval=common["sa_interval"])
    chains = chain_seeds(al.fm, seeds, max_chains=common["max_chains"],
                         bandwidth=common["bandwidth"],
                         max_chain_gap=common["max_chain_gap"])
    flt = filter_chains(chains, seeds, mask_level=common["mask_level"],
                        chain_drop_ratio=common["chain_drop_ratio"],
                        min_chain_weight=common["min_chain_weight"],
                        min_seed_len=common["min_seed_len"],
                        max_chain_gap=common["max_chain_gap"])
    ext = extend_all(
        al.fm, al.pac_dev, codes.astype(jnp.int32), lens, seeds, chains,
        flt, mat,
        match_score=common["match_score"],
        mismatch_penalty=common["mismatch_penalty"],
        o_del=common["o_del"], e_del=common["e_del"],
        o_ins=common["o_ins"], e_ins=common["e_ins"],
        bandwidth=common["bandwidth"], zdrop=common["zdrop"],
        pen_clip5=common["pen_clip5"], pen_clip3=common["pen_clip3"],
        use_pallas_sw=common["use_pallas_sw"], sw_sort=common["sw_sort"])
    o_mem = np.asarray(jax.device_get(mems["overflow"]))
    o_seed = np.asarray(jax.device_get(seeds["overflow"]))
    o_chain = np.asarray(jax.device_get(chains["overflow"]))
    o_ext = np.asarray(jax.device_get(ext["overflow"]))
    log(f"stagewise: mems {o_mem.sum()}  seeds {o_seed.sum()}  "
        f"chains {o_chain.sum()}  ext {o_ext.sum()}  "
        f"union {(o_mem | o_seed | o_chain | o_ext).sum()}")
    extra = ovf_pipe & ~(o_mem | o_seed | o_chain | o_ext)
    log(f"pipeline-only overflow (pack loss?): {int(extra.sum())}")


if __name__ == "__main__":
    main()
