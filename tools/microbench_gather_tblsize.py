"""XLA gather ns/row vs TABLE size (dependent chain, fixed batch).

Tests whether the ~12 ns/row gather rate depends on the table fitting
an on-chip cache tier — decides how much appending prefix-jump rows to
the blocks table costs every other rank query.
"""
import time

def main():
    import jax, jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      __file__.rsplit("/", 2)[0] + "/.jax_cache")
    width = 12
    B = 16384
    key = jax.random.PRNGKey(0)
    idx0 = jax.random.randint(key, (B,), 0, 65536, jnp.int32)
    for N in (65536, 131072, 262144, 1 << 20, 1 << 22):
        tab = jax.random.randint(key, (N, width), 0, 1 << 20, jnp.int32)

        @jax.jit
        def chain(idx, tab=tab, N=N):
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
        print(f"N {N:8d} ({N*width*4/1e6:6.1f} MB): {dt*1e6:7.1f} us/step "
              f"({dt/B*1e9:6.2f} ns/row)", flush=True)

if __name__ == "__main__":
    main()
