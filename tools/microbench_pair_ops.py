"""Cost of pair-level vector ops at (16384,) width inside a fori_loop on
TPU — which construct makes dual-slot seeding slow?"""
import time


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      __file__.rsplit("/", 2)[0] + "/.jax_cache")
    N = 16384
    key = jax.random.PRNGKey(0)
    v = jax.random.randint(key, (N,), 0, 1 << 20, jnp.int32)
    tab = jax.random.randint(key, (21056, 48), 0, 1 << 20, jnp.int32)

    def run(name, body):
        @jax.jit
        def loop(v):
            return jax.lax.fori_loop(
                0, 300, lambda _, x: body(x) % (1 << 20), v)
        r = jax.device_get(loop(v))
        t0 = time.time()
        for _ in range(3):
            r = jax.device_get(loop(v))
        dt = (time.time() - t0) / 3 / 300
        print(f"{name:28s}: {dt*1e6:7.1f} us/step", flush=True)

    run("baseline add", lambda x: x + 1)
    run("strided [0::2] + interleave", lambda x: jnp.stack(
        [x[0::2] + 1, x[1::2] + 2], axis=1).reshape(-1))
    run("pair swap reshape flip", lambda x: (
        x.reshape(-1, 2)[:, ::-1].reshape(-1) + x))
    run("repeat pairs[:,0]", lambda x: jnp.repeat(
        x.reshape(-1, 2)[:, 0], 2, axis=0) + x)
    run("gather N rows + reduce", lambda x: tab[
        jnp.clip(x, 0, 21055)][:, 0] + tab[jnp.clip(x + 1, 0, 21055)][:, 47])
    run("gather N rows (one)", lambda x: tab[jnp.clip(x, 0, 21055)][:, 0] + x)
    run("rowsel 48-wide where", lambda x: (
        jnp.where((x > 0)[:, None], tab[jnp.clip(x, 0, 21055)],
                  tab[jnp.clip(x + 3, 0, 21055)])[:, 0] + x))


if __name__ == "__main__":
    import os
    if os.environ.get("BST_UNROLL_TEST"):
        pass
    else:
        main()


def unroll_test():
    import jax
    import jax.numpy as jnp
    import time
    jax.config.update("jax_compilation_cache_dir",
                      __file__.rsplit("/", 2)[0] + "/.jax_cache")
    N = 16384
    key = jax.random.PRNGKey(0)
    v = jax.random.randint(key, (N,), 0, 21056, jnp.int32)
    tab = jax.random.randint(key, (21056, 48), 0, 1 << 20, jnp.int32)

    def step(x):
        row = tab[x]
        return (x * 48271 + row[:, 0] + row[:, 47] + 11) % 21056

    for U in (1, 4, 8, 16):
        def bodyU(_, x):
            for _ in range(U):
                x = step(x)
            return x

        @jax.jit
        def loop(x):
            return jax.lax.fori_loop(0, 320 // U, bodyU, x)
        r = jax.device_get(loop(v))
        t0 = time.time()
        for _ in range(3):
            r = jax.device_get(loop(v))
        dt = (time.time() - t0) / 3 / 320
        print(f"unroll {U:2d}: {dt*1e6:7.1f} us per dependent-gather step",
              flush=True)


if __name__ == "__main__":
    pass
