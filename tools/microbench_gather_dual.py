"""Dependent-chain quad-row (48 int32) gather: us/step vs rows/step.

Decides the dual-read seeding design: at fixed reads-in-flight R the
current kernel gathers 2R rows/step; dual-read gathers R. The win is
real only if us/step at R rows is meaningfully below us/step at 2R.
Table sized like the E. coli bench index (+r3 jump extension).
"""
import time


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      __file__.rsplit("/", 2)[0] + "/.jax_cache")
    NQ = 21056  # quad rows: ~4 MB table, bench-index scale
    key = jax.random.PRNGKey(0)
    tab = jax.random.randint(key, (NQ, 48), 0, 1 << 20, jnp.int32)
    for B in (4096, 8192, 16384, 32768, 65536):
        idx0 = jax.random.randint(key, (B,), 0, NQ, jnp.int32)

        @jax.jit
        def chain(idx, tab=tab):
            def body(_, idx):
                row = tab[idx]
                return (idx * 48271 + row[:, 0] + row[:, 47] + 11) % NQ
            return jax.lax.fori_loop(0, 300, body, idx)

        r = jax.device_get(chain(idx0))
        t0 = time.time()
        reps = 3
        for _ in range(reps):
            r = jax.device_get(chain(idx0))
        dt = (time.time() - t0) / reps / 300
        print(f"rows {B:6d}: {dt*1e6:9.1f} us/step ({dt/B*1e9:6.2f} ns/row)",
              flush=True)


if __name__ == "__main__":
    main()
