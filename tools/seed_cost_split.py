"""Split the seeding loop's per-step cost: gather vs state traffic.

Round-4 question: is the ~100 us/step "op/latency floor" (BENCH_NOTES
round 3) really per-op dispatch cost, or HBM *bandwidth* spent
rewriting the loop state every iteration (cand/prev/curr tables, mems
columns, the (B, W) codes reads behind every dense.pick)?

Method: compile the stepwise loop at B, pull XLA's cost_analysis
(bytes accessed / flops for the whole program), time a capped-iteration
run on chip, and difference two caps to get marginal bytes+time per
step. Implied GB/s ~= HBM peak => bandwidth-bound (attack bytes);
implied GB/s << peak => latency/dispatch-bound (attack op count).

Also parses the optimized HLO while-body for the largest-output ops so
the byte budget can be itemized.

    PYTHONPATH=. python tools/seed_cost_split.py [batch]
"""
import sys; sys.path.insert(0, __file__.rsplit("/", 2)[0])  # noqa: E702
import re
import time

import numpy as np


def buf_bytes(shape_str: str) -> int:
    """Bytes of an HLO shape string like 's32[16384,16,3]{...}'."""
    total = 0
    for m in re.finditer(r"(pred|s8|u8|s16|u16|bf16|f16|s32|u32|f32|s64|u64|f64)\[([\d,]*)\]",
                         shape_str):
        dt, dims = m.groups()
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        sz = dict(pred=1, s8=1, u8=1, s16=2, u16=2, bf16=2, f16=2,
                  s32=4, u32=4, f32=4, s64=8, u64=8, f64=8)[dt]
        total += n * sz
    return total


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
    fm0 = kfm.FMDevice.from_host(idx)
    fm, tbl = build_seed_table(fm0, idx)
    print(f"[split] device={jax.devices()[0]} table rows={fm.blocks.shape}",
          file=sys.stderr, flush=True)
    sim = simulate_reads(genome, B, read_len=150, sub_rate=0.01, seed=7)
    rb = pack_reads(sim.reads, sim.names)
    codes = jnp.asarray(rb.codes, jnp.int32)
    lens = jnp.asarray(rb.lens, jnp.int32)
    split_len = int(opt.min_seed_len * opt.reseed_factor + 0.499)
    kw = dict(min_seed_len=opt.min_seed_len, split_len=split_len,
              split_width=opt.split_width, max_mem_intv=opt.max_mem_intv,
              jump_base=tbl.jump_base, jump_depth=tbl.jump_depth,
              max_cand=16, max_mem=16, sa_interval=idx.sa_interval)

    caps = (64, 320)
    stats = {}
    for cap in caps:
        f = jax.jit(lambda c, l, cap=cap: collect_seeds_device(
            fm, c, l, max_iters=cap, **kw)["n_mem"].sum())
        comp = f.lower(codes, lens).compile()
        ca = comp.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        jax.device_get(f(codes, lens))  # warm
        t0 = time.time()
        reps = 3
        for _ in range(reps):
            jax.device_get(f(codes, lens))
        dt = (time.time() - t0) / reps
        stats[cap] = (dt, ca.get("bytes accessed", 0.0), ca.get("flops", 0.0))
        print(f"[split] cap={cap}: {dt*1e3:7.1f} ms  "
              f"bytes={ca.get('bytes accessed', 0)/1e9:.2f} GB  "
              f"flops={ca.get('flops', 0)/1e9:.2f} G", flush=True)
        if cap == caps[-1]:
            txt = comp.as_text()
            open("/tmp/hlo_seed_split.txt", "w").write(txt)

    (t1, b1, f1), (t2, b2, f2) = stats[caps[0]], stats[caps[1]]
    dsteps = caps[1] - caps[0]
    dt, db = (t2 - t1) / dsteps, (b2 - b1) / dsteps
    print(f"[split] marginal per full-width step: {dt*1e6:.1f} us, "
          f"{db/1e6:.3f} MB accessed -> implied {db/dt/1e9:.0f} GB/s "
          f"(v5e HBM peak ~819)", flush=True)

    # itemize: largest-output ops in the hottest while-body
    txt = open("/tmp/hlo_seed_split.txt").read()
    bodies = re.findall(
        r"^%?[\w.-]*body[\w.-]*[^\n]*\{(.*?)^\}", txt, re.M | re.S)
    body = max(bodies, key=len) if bodies else txt
    sizes = []
    for line in body.splitlines():
        m = re.match(r"\s*(?:ROOT\s+)?%?([\w.-]+)\s*=\s*(\([^)]*\)|[^ ]+)\s+"
                     r"([a-z][\w-]*)\(", line)
        if not m:
            continue
        name, shape, op = m.groups()
        if op in ("parameter", "constant", "get-tuple-element", "tuple"):
            continue
        sizes.append((buf_bytes(shape), op, name))
    sizes.sort(reverse=True)
    tot = sum(s for s, _, _ in sizes)
    print(f"[split] while-body op output bytes total: {tot/1e6:.1f} MB "
          f"({len(sizes)} ops)", flush=True)
    for s, op, name in sizes[:25]:
        print(f"   {s/1e6:8.3f} MB  {op:18s} {name[:70]}")
    by_op = {}
    for s, op, _ in sizes:
        by_op[op] = by_op.get(op, 0) + s
    print("[split] by op kind:")
    for op, s in sorted(by_op.items(), key=lambda kv: -kv[1]):
        print(f"   {s/1e6:8.2f} MB  {op}")


if __name__ == "__main__":
    main()
