"""Does the v5e row gather slow down when a FRACTION of addresses hit
cold appended regions (pac/value rows) instead of the hot Occ rows?
The in-loop fast-forward redirects a few percent of lanes' gather
addresses at appended regions each iteration; tools/ab_ff.py measured
the full loop ~11x slower with fast-forward dynamics on while per-lane
iteration counts IMPROVED — this isolates the gather.

    PYTHONPATH=. python tools/microbench_gather_regions.py
"""
import sys; sys.path.insert(0, __file__.rsplit("/", 2)[0])  # noqa: E702
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/fresh_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    ROWS, HOT, COLD0 = 69666, 28672, 65172  # ab_ff table geometry
    table = jnp.asarray(
        np.random.default_rng(0).integers(0, 1 << 20, (ROWS, 128), np.int32))
    B = 16384
    rng = np.random.default_rng(1)
    hot = rng.integers(0, HOT, (B,)).astype(np.int32)
    cold = rng.integers(COLD0, ROWS, (B,)).astype(np.int32)

    def run(frac_pct):
        mask = jnp.asarray(rng.random(B) * 100 < frac_pct)
        idx0 = jnp.where(mask, jnp.asarray(cold), jnp.asarray(hot))

        @jax.jit
        def f(idx):
            def body(_, ix):
                rows = table[ix]
                # dependent next address, mostly hot, cold lanes stay
                # in their region (mod region size)
                nxt = (ix + rows[:, 0]) % HOT
                nxtc = COLD0 + (ix + rows[:, 1]) % (ROWS - COLD0)
                return jnp.where(ix >= HOT, nxtc, nxt).astype(jnp.int32)

            ix = jax.lax.fori_loop(0, 512, body, idx)
            return ix.sum()

        jax.device_get(f(idx0))
        ts = []
        for _ in range(5):
            t0 = time.time()
            jax.device_get(f(idx0))
            ts.append(time.time() - t0)
        med = sorted(ts)[len(ts) // 2]
        print(f"[gr] {frac_pct:5.1f}% cold: median {med * 1e3:7.1f} ms "
              f"({med * 1e6 / 512:.1f} us/iter)", file=sys.stderr, flush=True)

    for pct in (0.0, 1.0, 5.0, 25.0, 100.0):
        run(pct)


if __name__ == "__main__":
    main()
