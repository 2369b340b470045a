"""A/B the Pallas banded-SW kernel vs the XLA one, on chip.

Random extension cases shaped like the pipeline's (150bp reads,
max_tlen targets). Checks exact agreement, then times both.
"""

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      __file__.rsplit("/", 2)[0] + "/.jax_cache")
    from bioseqdb_tpu.cpu.ksw import fill_scmat
    from bioseqdb_tpu.kernels.sw import sw_extend_batch
    from bioseqdb_tpu.kernels.sw_pallas import sw_extend_batch_pallas

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    WQ, WT = 152, 614
    rng = np.random.default_rng(0)
    # targets = mutated copies of queries (realistic extension shapes)
    q = rng.integers(0, 4, (B, WQ)).astype(np.int32)
    t = np.full((B, WT), 4, np.int32)
    qlen = rng.integers(20, WQ, B).astype(np.int32)
    tlen = np.minimum(qlen + rng.integers(0, 120, B), WT).astype(np.int32)
    for b in range(B):
        seg = q[b, :tlen[b] - 0].copy()
        m = rng.random(len(seg)) < 0.04
        seg[m] = rng.integers(0, 4, m.sum())
        t[b, :len(seg)] = seg[:WT]
        q[b, qlen[b]:] = 4
        t[b, tlen[b]:] = 4
    h0 = rng.integers(1, 100, B).astype(np.int32)
    w0 = np.full(B, 100, np.int32)
    mat = jnp.asarray(fill_scmat(1, 4).astype(np.int32))
    qj, tj = jnp.asarray(q), jnp.asarray(t)
    qlj, tlj = jnp.asarray(qlen), jnp.asarray(tlen)
    wj, h0j = jnp.asarray(w0), jnp.asarray(h0)

    def run_xla():
        return sw_extend_batch(qj, qlj, tj, tlj, mat, 6, 1, 6, 1, wj, 5, 100,
                               h0j, WQ)

    BL = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    def run_pallas():
        return sw_extend_batch_pallas(
            qj, qlj, tj, tlj, wj, h0j, match_score=1, mismatch_penalty=4,
            o_del=6, e_del=1, o_ins=6, e_ins=1, end_bonus=5, zdrop=100,
            max_qlen=WQ, block_lanes=BL)

    a = jax.device_get(run_xla())
    b = jax.device_get(run_pallas())
    for k in a:
        if not (np.asarray(a[k]) == np.asarray(b[k])).all():
            bad = np.flatnonzero(np.asarray(a[k]) != np.asarray(b[k]))
            print(f"MISMATCH {k}: {len(bad)} lanes, first {bad[:5]}")
            print(" xla   ", np.asarray(a[k])[bad[:5]])
            print(" pallas", np.asarray(b[k])[bad[:5]])
            return 1
    print("outputs identical", flush=True)

    for name, fn in (("xla", run_xla), ("pallas", run_pallas)):
        jax.device_get(fn())
        t0 = time.time()
        for _ in range(5):
            out = jax.device_get(fn())
        dt = (time.time() - t0) / 5
        print(f"{name}: {dt*1e3:8.2f} ms/batch-of-{B}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
