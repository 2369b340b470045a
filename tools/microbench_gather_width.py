"""Gather cost vs row width at the seeding loop's shape (dependent
chain): does one 24-int32-row gather of B rows beat 2B rows of 12?

Tables sized like the E. coli blocks table (~3.5 MB) so the tier
matches the real loop.
"""
import sys; sys.path.insert(0, "/root/repo")
import time

def main():
    import jax, jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    N = 72064  # rows in the E.coli-scale blocks table
    B = 8192
    key = jax.random.PRNGKey(0)
    for width, rows in ((12, 2 * B), (24, B), (12, B), (20, B), (32, B), (48, B), (16, 2 * B)):
        tab = jax.random.randint(key, (N * 12 // width, width), 0, 1 << 20, jnp.int32)
        M = tab.shape[0]
        idx0 = jax.random.randint(key, (rows,), 0, M, jnp.int32)

        @jax.jit
        def chain(idx, tab=tab, M=M):
            def body(_, idx):
                row = tab[idx]
                return (idx * 48271 + row[:, 0] + row[:, -1] + 11) % M
            return jax.lax.fori_loop(0, 600, body, idx)

        r = jax.device_get(chain(idx0))
        t0 = time.time()
        reps = 3
        for _ in range(reps):
            r = jax.device_get(chain(idx0))
        dt = (time.time() - t0) / reps / 600
        print(f"width {width:2d} x {rows:6d} rows ({width*rows*4/1024:6.0f} KB/step):"
              f" {dt*1e6:8.1f} us/step ({dt/rows*1e9:6.2f} ns/row)", flush=True)

main()
