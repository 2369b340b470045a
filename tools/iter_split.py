"""Where do seeding iterations go? Per-round split on the CPU backend
(iteration counts are algorithm-determined; any backend agrees)."""
import sys; sys.path.insert(0, "/root/repo")  # noqa: E702
import os

os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np


def main():
    import jax.numpy as jnp

    from bioseqdb_tpu.align.options import AlignOptions
    from bioseqdb_tpu.index.builder import build_index
    from bioseqdb_tpu.io.batch import pack_reads
    from bioseqdb_tpu.kernels import fm as kfm
    from bioseqdb_tpu.kernels import seed as kseed
    from bioseqdb_tpu.kernels.seed import build_r3_jump, collect_seeds_device
    from bioseqdb_tpu.utils.sim import simulate_genome, simulate_reads

    kseed.DEBUG_CENSUS = True

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    opt = AlignOptions()
    genome = simulate_genome(4_600_000, seed=1)
    idx = build_index([("ecoli", genome)])
    fm = kfm.FMDevice.from_host(idx)
    fm, jb, jd = build_r3_jump(fm)
    print("jump base/depth:", jb, jd)
    sim = simulate_reads(genome, B, read_len=150, sub_rate=0.01, seed=7)
    rb = pack_reads(sim.reads, sim.names)
    codes = jnp.asarray(rb.codes, jnp.int32)
    lens = jnp.asarray(rb.lens, jnp.int32)
    split_len = int(opt.min_seed_len * opt.reseed_factor + 0.499)
    out = collect_seeds_device(
        fm, codes, lens, min_seed_len=opt.min_seed_len, split_len=split_len,
        split_width=opt.split_width, max_mem_intv=opt.max_mem_intv,
        jump_base=jb, jump_depth=jd, sa_interval=idx.sa_interval)
    it = np.asarray(out["iters"])[: rb.n]
    r1 = np.asarray(out["it_r1"])[: rb.n]
    r2 = np.asarray(out["it_r2"])[: rb.n]
    for name, v in [("r1 (smem)", r1), ("r2 (reseed)", r2 - r1),
                    ("r3 (last)", it - r2), ("total", it)]:
        print(f"{name:12s} mean {v.mean():7.1f}  p50 {np.percentile(v, 50):6.0f}"
              f"  p90 {np.percentile(v, 90):6.0f}  max {v.max():6d}")
    print("n_mem mean", np.asarray(out["n_mem"])[: rb.n].mean(),
          "overflow", int(np.asarray(out["overflow"]).sum()))
    census = np.asarray(out["ph_census"])[: rb.n]
    names = ["PIVOT(stall)", "FWD", "BWD", "R3", "DONE", "R3J",
             "FF-RES", "FF-CNT", "FF-SMP", "FF-CMP", "FF-ISA", "FF-WLK"]
    for p, nm in enumerate(names[: census.shape[1]]):
        print(f"phase {nm:12s} mean {census[:, p].mean():7.1f}")
    print(f"bwd dead-col  mean {np.asarray(out['bwd_dead'])[: rb.n].mean():7.1f}")
    np1 = np.asarray(out["bwd_np1"])[: rb.n]
    cols = np.asarray(out["bwd_cols"])[: rb.n]
    print(f"bwd: iters/read {census[:, 2].mean():.1f}  n_prev==1 iters "
          f"{np1.mean():.1f}  columns {cols.mean():.1f}")
    if "sr_same" in out:
        sr = np.asarray(out["sr_same"])[: rb.n]
        print(f"fetch-pair same octo row: {sr.mean():.1f}/read "
              f"({100 * sr.sum() / max(it.sum(), 1):.1f}% of iterations)")
    if "ff_events" in out:
        ev = np.asarray(out["ff_events"])[: rb.n]
        sk = np.asarray(out["ff_skip"])[: rb.n]
        print(f"ff events/read fwd {ev[:, 0].mean():.2f} bwd "
              f"{ev[:, 1].mean():.2f} r3 {ev[:, 2].mean():.2f}; "
              f"heavy-wait iters {sk.mean():.1f}")


main()
