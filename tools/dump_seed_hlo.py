"""Compare optimized TPU HLO between stepwise seeding and the ff-trace
variants — op histograms + fusion counts, hunting the ~11x lowering
regression (tools/ab_ff.py round 3).

    PYTHONPATH=. python tools/dump_seed_hlo.py [batch]
"""
import sys; sys.path.insert(0, __file__.rsplit("/", 2)[0])  # noqa: E702
import collections
import re


def histo(txt):
    ops = collections.Counter()
    for m in re.finditer(r"^\s*(?:ROOT\s+)?%?[\w.-]+\s*=\s*[\w\[\]{},/ ]+\s+"
                         r"([a-z][\w-]+)\(", txt, re.M):
        ops[m.group(1)] += 1
    return ops


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
    import bioseqdb_tpu.kernels.seed as kseed
    from bioseqdb_tpu.kernels.seed import build_seed_table, collect_seeds_device
    from bioseqdb_tpu.utils.sim import simulate_genome, simulate_reads

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    opt = AlignOptions()
    genome = simulate_genome(4_600_000, seed=1)
    idx = build_index([("ecoli", genome)])
    fm0 = kfm.FMDevice.from_host(idx)
    fm, tbl = build_seed_table(fm0, idx)
    sim = simulate_reads(genome, B, read_len=150, sub_rate=0.01, seed=7)
    rb = pack_reads(sim.reads, sim.names)
    codes = jnp.asarray(rb.codes, jnp.int32)
    lens = jnp.asarray(rb.lens, jnp.int32)
    split_len = int(opt.min_seed_len * opt.reseed_factor + 0.499)
    kw = dict(min_seed_len=opt.min_seed_len, split_len=split_len,
              split_width=opt.split_width, max_mem_intv=opt.max_mem_intv,
              jump_base=tbl.jump_base, jump_depth=tbl.jump_depth,
              max_cand=16, max_mem=16, sa_interval=idx.sa_interval)

    texts = {}
    for name, t, disable, light, hv in (
            ("machinery", tbl, {"fwd", "bwd", "r3"}, True, "half"),
            ("inloop", tbl, set(), True, "half")):
        kseed.FF_DISABLE = disable
        kseed.FF_LIGHT = light
        kseed.FF_HEAVY = hv
        jax.clear_caches()
        f = jax.jit(lambda c, l, t=t: collect_seeds_device(
            fm, c, l, table=t, **kw)["n_mem"].sum())
        comp = f.lower(codes, lens).compile()
        txt = comp.as_text()
        texts[name] = txt
        open(f"/tmp/hlo_{name}.txt", "w").write(txt)
        h = histo(txt)
        print(f"== {name}: {len(txt.splitlines())} HLO lines", flush=True)
        for op, n in h.most_common(30):
            print(f"   {op:28s} {n}")
    kseed.FF_DISABLE, kseed.FF_LIGHT, kseed.FF_HEAVY = set(), True, "half"
    ha, hb = histo(texts["machinery"]), histo(texts["inloop"])
    print("== diff (inloop minus machinery):")
    for op in sorted(set(ha) | set(hb)):
        d = hb.get(op, 0) - ha.get(op, 0)
        if d:
            print(f"   {op:28s} {d:+d}  ({ha.get(op,0)} -> {hb.get(op,0)})")


if __name__ == "__main__":
    main()
