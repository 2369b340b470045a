"""XLA gather ns/row vs rows-per-step (dependent chain, FM-loop shape).

Seeding is gather-bound (~27 ns/row measured at 16K rows/step). If the
cost is issue/latency-bound rather than bandwidth-bound, larger batches
should amortize it — this decides whether raising the pipeline batch
size is a free seeding win.
"""
import time

def main():
    import jax, jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      __file__.rsplit("/", 2)[0] + "/.jax_cache")
    N = 72064
    width = 16
    key = jax.random.PRNGKey(0)
    tab = jax.random.randint(key, (N, width), 0, 1 << 20, jnp.int32)
    for B in (8192, 32768, 65536, 131072):
        idx0 = jax.random.randint(key, (B,), 0, N, jnp.int32)

        @jax.jit
        def chain(idx, tab=tab):
            def body(_, idx):
                row = tab[idx]
                return (idx * 48271 + row[:, 0] + 11) % N
            return jax.lax.fori_loop(0, 1000, body, idx)

        r = jax.device_get(chain(idx0))
        t0 = time.time()
        reps = 3
        for _ in range(reps):
            r = jax.device_get(chain(idx0))
        dt = (time.time() - t0) / reps / 1000
        print(f"B {B:7d}: {dt*1e6:9.1f} us/step ({dt/B*1e9:6.2f} ns/row)",
              flush=True)

if __name__ == "__main__":
    main()
