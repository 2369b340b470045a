import sys; sys.path.insert(0, "/root/repo")
import time
def main():
    import jax, jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    N = 72064
    key = jax.random.PRNGKey(0)
    for width, rows in ((48, 16384), (96, 8192), (64, 8192), (28, 8192), (40, 8192), (24, 16384), (32, 16384), (48, 4096), (48, 2048), (12, 4096), (192, 8192)):
        tab = jax.random.randint(key, (max(N * 12 // width, 256), width), 0, 1 << 20, jnp.int32)
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
        print(f"width {width:3d} x {rows:6d} rows ({width*rows*4/1024:6.0f} KB/step, tab {M*width*4>>20} MB):"
              f" {dt*1e6:8.1f} us/step ({dt/rows*1e9:6.2f} ns/row)", flush=True)
main()
