"""Is the ~77us/step fixed cost of the dependent-chain gather hideable?

Runs K INDEPENDENT dependent chains inside one loop body (separate
gather ops, no cross-chain deps). If TPU overlaps them, us/step grows
sublinearly with K -> software-pipelining the seeding loop pays; if it
grows ~linearly, the fixed cost is serial execution, and halving
rows/read (dual-slot seeding) only pays at large widths.
"""
import time


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      __file__.rsplit("/", 2)[0] + "/.jax_cache")
    NQ = 21056
    key = jax.random.PRNGKey(0)
    tab = jax.random.randint(key, (NQ, 48), 0, 1 << 20, jnp.int32)
    for K in (1, 2, 4):
        for B in (8192, 16384):
            idx0 = jax.random.randint(key, (K, B), 0, NQ, jnp.int32)

            @jax.jit
            def chain(idx, tab=tab):
                def body(_, carry):
                    outs = []
                    for k in range(carry.shape[0]):
                        row = tab[carry[k]]
                        outs.append(
                            (carry[k] * 48271 + row[:, 0] + row[:, 47] + 11)
                            % NQ)
                    return jnp.stack(outs)
                return jax.lax.fori_loop(0, 300, body, idx)

            r = jax.device_get(chain(idx0))
            t0 = time.time()
            for _ in range(3):
                r = jax.device_get(chain(idx0))
            dt = (time.time() - t0) / 3 / 300
            print(f"K={K} rows/chain {B:6d}: {dt*1e6:8.1f} us/step "
                  f"({dt/(K*B)*1e9:5.2f} ns/row)", flush=True)


if __name__ == "__main__":
    main()
