"""Data-parallel scaling-efficiency benchmark (SURVEY.md §2b).

Measures end-to-end reads/s of the full pipeline at increasing device
counts on a 1-D data mesh with the index replicated, and reports
efficiency relative to linear scaling from 1 device — the harness for
the north star's ">=85% efficiency 1 -> 2 hosts" gate.

On this environment only one real chip exists, so by default the
harness runs on virtual CPU devices (set
XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu)
to validate the harness + sharding; on a real pod slice run it as-is
(and with jax.distributed for multi-host).

Usage:
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python tools/scaling_bench.py --devices 1 2 4 8
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    p.add_argument("--genome", type=int, default=1_000_000)
    p.add_argument("--reads-per-device", type=int, default=512)
    p.add_argument("--read-len", type=int, default=150)
    args = p.parse_args(argv)

    import os

    import jax

    # the environment's sitecustomize overrides jax_platforms to the TPU
    # plugin; honor an explicit JAX_PLATFORMS=cpu request (cf. conftest)
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from bioseqdb_tpu.align.options import AlignOptions
    from bioseqdb_tpu.align.pipeline import Aligner
    from bioseqdb_tpu.dist.mesh import make_mesh
    from bioseqdb_tpu.io.batch import pack_reads
    from bioseqdb_tpu.utils.sim import simulate_genome, simulate_reads
    from bioseqdb_tpu.index.builder import build_index

    genome = simulate_genome(args.genome, seed=1)
    idx = build_index([("ref", genome)])
    avail = len(jax.devices())
    counts = [d for d in args.devices if d <= avail]
    print(f"[scaling] devices available: {avail}; measuring {counts}",
          file=sys.stderr)

    base_rps = None
    rows = []
    for n_dev in counts:
        mesh = make_mesh(n_dev)
        aligner = Aligner.build(idx, AlignOptions(), mode="full", mesh=mesh)
        n_reads = args.reads_per_device * n_dev
        sim = simulate_reads(genome, n_reads, read_len=args.read_len,
                             sub_rate=0.01, seed=2)
        batch = pack_reads(sim.reads, sim.names, pad_reads_to=n_dev)
        # warm up (compile per mesh shape)
        jax.device_get(aligner.device_regions(batch))
        t0 = time.time()
        out = jax.device_get(aligner.device_regions(batch))
        dt = time.time() - t0
        rps = n_reads / dt
        if base_rps is None:
            base_rps = rps
        eff = rps / (base_rps * n_dev)
        rows.append({"devices": n_dev, "reads_per_s": round(rps),
                     "efficiency": round(eff, 3)})
        print(f"[scaling] {n_dev} device(s): {rps:,.0f} reads/s "
              f"(efficiency {eff:.1%})", file=sys.stderr)
    print(json.dumps({"scaling": rows}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
