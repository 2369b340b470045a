"""XLA gather ns/row vs table row width/alignment (FM blocks layout)."""
import sys, time
import numpy as np

def main():
    import jax, jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      __file__.rsplit("/", 2)[0] + "/.jax_cache")
    B = 16384
    N = 72064
    key = jax.random.PRNGKey(0)
    idx0 = jax.random.randint(key, (B,), 0, N, jnp.int32)
    for width in (8, 12, 16, 24, 32):
        tab = jax.random.randint(key, (N, width), 0, 1 << 20, jnp.int32)

        @jax.jit
        def chain(idx, tab=tab):
            def body(_, idx):
                row = tab[idx]
                return (idx * 48271 + row[:, 0] + 11) % N
            return jax.lax.fori_loop(0, 100, body, idx)

        r = jax.device_get(chain(idx0))
        t0 = time.time()
        for _ in range(3):
            r = jax.device_get(chain(idx0))
        dt = (time.time() - t0) / 3 / 100
        print(f"width {width:3d}: {dt*1e6:8.1f} us/gather-of-{B} "
              f"({dt/B*1e9:6.2f} ns/row)", flush=True)

if __name__ == "__main__":
    main()
