"""A/B on the real chip: stepwise seeding vs the in-loop s==1
fast-forward (SeedTable phases), interleaved rep-by-rep in ONE process
(relay noise defense). Seeding only — the stage the fast-forward
targets.

    PYTHONPATH=. python tools/ab_ff.py [batch]
"""
import sys; sys.path.insert(0, __file__.rsplit("/", 2)[0])  # noqa: E702
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import os as _os
    jax.config.update("jax_compilation_cache_dir",
                      _os.environ.get("BST_CACHE_DIR",
                                      __file__.rsplit("/", 2)[0]
                                      + "/.jax_cache"))
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
    fm0 = kfm.FMDevice.from_host(idx)
    fm, tbl = build_seed_table(fm0, idx)
    print(f"[ab] table rows {fm.blocks.shape[0]} "
          f"({fm.blocks.nbytes / 1e6:.1f} MB); {tbl}", file=sys.stderr,
          flush=True)

    sim = simulate_reads(genome, B, read_len=150, sub_rate=0.01, seed=7)
    rb = pack_reads(sim.reads, sim.names)
    codes = jnp.asarray(rb.codes, jnp.int32)
    lens = jnp.asarray(rb.lens, jnp.int32)
    split_len = int(opt.min_seed_len * opt.reseed_factor + 0.499)
    kw = dict(min_seed_len=opt.min_seed_len, split_len=split_len,
              split_width=opt.split_width, max_mem_intv=opt.max_mem_intv,
              jump_base=tbl.jump_base, jump_depth=tbl.jump_depth,
              max_cand=16, max_mem=16, sa_interval=idx.sa_interval)

    import bioseqdb_tpu.kernels.seed as kseed

    # "machinery": the ff=True trace with every entry suppressed — the
    # static per-iteration cost of the fast-forward code paths alone,
    # separating it from the fast-forward phase dynamics. L0/L1 bisect
    # the machinery itself: L0 = entry+state only, L1 = +light decode.
    allof = {"fwd", "bwd", "r3"}
    import os

    mode = os.environ.get("BST_AB_MODE", "std")
    if mode == "cls":
        # dynamics per origin class: which fast-forward flow is slow?
        variants = [
            ("stepwise", None, set(), True, "half", set()),
            ("ff-fwd", tbl, {"bwd", "r3"}, True, "half", set()),
            ("ff-bwd", tbl, {"fwd", "r3"}, True, "half", set()),
            ("ff-r3", tbl, {"fwd", "bwd"}, True, "half", set()),
            ("ff-all", tbl, set(), True, "half", set()),
        ]
    elif mode == "l0":
        # drill into mach-L0: which part of the inert ff trace costs 11x?
        variants = [
            ("stepwise", None, set(), True, "half", set()),
            ("L0", tbl, allof, False, "never", set()),
            ("L0-min", tbl, allof, False, "never",
             {"entry", "addr", "land", "cols"}),
            ("L0-noaddr", tbl, allof, False, "never", {"addr"}),
            ("L0-noland", tbl, allof, False, "never", {"land"}),
        ]
    else:
        variants = [("stepwise", None, set(), True, "half", set()),
                    ("mach-L0", tbl, allof, False, "never", set()),
                    ("mach-L1", tbl, allof, True, "never", set()),
                    ("machinery", tbl, allof, True, "half", set()),
                    ("inloop-ff", tbl, set(), True, "half", set())]
    # each variant is compiled AND timed under its own module flags,
    # sequentially: the flags are trace-time, and clear_caches between
    # variants would otherwise make later executions silently RE-TRACE
    # under whatever flags are current (the round-3 measurement bug that
    # produced identical times for every variant)
    REPS = 8
    outs = []
    rows = []
    for name, t, disable, light, hv, skip in variants:
        kseed.FF_DISABLE = disable
        kseed.FF_LIGHT = light
        kseed.FF_HEAVY = hv
        kseed.FF_SKIP = skip
        jax.clear_caches()
        f = jax.jit(lambda c, l, t=t: collect_seeds_device(
            fm, c, l, table=t, **kw)["n_mem"].sum())
        t0 = time.time()
        outs.append(int(jax.device_get(f(codes, lens))))
        print(f"[ab] compile+run {name}: {time.time() - t0:.1f}s",
              file=sys.stderr, flush=True)
        ts = []
        for _ in range(REPS):
            t0 = time.time()
            jax.device_get(f(codes, lens))
            ts.append(time.time() - t0)
        rows.append((name, ts))
    kseed.FF_DISABLE = set()
    kseed.FF_LIGHT, kseed.FF_HEAVY, kseed.FF_SKIP = True, "half", set()
    assert len(set(outs)) == 1, f"outputs differ: {outs}"
    base = None
    for name, ts in rows:
        med = sorted(ts)[len(ts) // 2]
        if base is None:
            base = med
        print(f"[ab] {name:10s} median {med * 1e3:7.1f} ms "
              f"({med / base:5.2f}x)  reps: "
              + " ".join(f"{t * 1e3:.0f}" for t in ts),
              file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
