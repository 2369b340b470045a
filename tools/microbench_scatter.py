"""On-chip microbenchmarks of the primitive patterns in the hot loops.

Times, per iteration at the pipeline's shapes:
  1. row scatter     buf.at[arange(B), slot].set(val)
  2. one-hot select  jnp.where(onehot, val, buf)
  3. row gather      take_along_axis(buf, j) (axis=1)
  4. one-hot gather  (buf * onehot).sum(1)
  5. table row gather (the FM-index pattern, for reference)
  6. int8 element gather (the pac fetch pattern) vs packed-word gather

Run alone (the chip is serialized).
"""

import sys
import time

import numpy as np


def bench(jax, fn, state, iters=200, reps=3):
    import jax.numpy as jnp

    @jax.jit
    def run(state):
        return jax.lax.fori_loop(0, iters, lambda i, s: fn(i, s), state)

    out = jax.device_get(jax.tree.map(lambda x: x[0] if hasattr(x, 'shape') and x.ndim else x, run(state)))  # warm
    t0 = time.time()
    for _ in range(reps):
        out = run(state)
        jax.tree.map(lambda x: x.block_until_ready(), out)
        out = jax.device_get(jax.tree.map(lambda x: jnp.sum(x) if hasattr(x, 'ndim') and x.ndim else x, out))
    return (time.time() - t0) / (reps * iters)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      __file__.rsplit("/", 2)[0] + "/.jax_cache")
    B, P, Pc = 2048, 24, 4
    key = jax.random.PRNGKey(0)
    buf = jax.random.randint(key, (B, P, Pc), 0, 100, jnp.int32)
    val = jax.random.randint(key, (B, Pc), 0, 100, jnp.int32)
    slot0 = jax.random.randint(key, (B,), 0, P, jnp.int32)
    rows = jnp.arange(B)
    pp = jnp.arange(P, dtype=jnp.int32)[None, :]

    def f_scatter(i, st):
        buf, = st
        slot = (slot0 + i) % P
        return (buf.at[rows, slot].set(val + i),)

    def f_onehot(i, st):
        buf, = st
        slot = (slot0 + i) % P
        oh = (pp == slot[:, None])[:, :, None]
        return (jnp.where(oh, (val + i)[:, None, :], buf),)

    def f_gather_rows(i, st):
        buf, acc = st
        slot = (slot0 + i) % P
        row = buf[rows, slot]
        return (buf, acc + row)

    def f_gather_onehot(i, st):
        buf, acc = st
        slot = (slot0 + i) % P
        oh = (pp == slot[:, None])[:, :, None]
        row = jnp.where(oh, buf, 0).sum(axis=1)
        return (buf, acc + row)

    t = bench(jax, f_scatter, (buf,))
    print(f"scatter  (B={B},P={P}): {t*1e6:8.1f} us/iter", flush=True)
    t = bench(jax, f_onehot, (buf,))
    print(f"one-hot  (B={B},P={P}): {t*1e6:8.1f} us/iter", flush=True)
    t = bench(jax, f_gather_rows, (buf, val))
    print(f"rowgath  (B={B},P={P}): {t*1e6:8.1f} us/iter", flush=True)
    t = bench(jax, f_gather_onehot, (buf, val))
    print(f"ohgath   (B={B},P={P}): {t*1e6:8.1f} us/iter", flush=True)

    # FM table row gather (dependent): (N, 12) rows
    N = 72000
    table = jax.random.randint(key, (N, 12), 0, 1000, jnp.int32)
    idx0 = jax.random.randint(key, (2 * B,), 0, N, jnp.int32)

    def f_table(i, st):
        idx, acc = st
        row = table[idx]
        s = row.sum(axis=1)
        return ((idx * 1103515245 + s + 12345) % N, acc + s)

    t = bench(jax, f_table, (idx0, jnp.zeros(2 * B, jnp.int32)))
    print(f"FM row gather (2B={2*B} rows of 12): {t*1e6:8.1f} us/iter "
          f"({t/(2*B)*1e9:.1f} ns/row)", flush=True)

    # pac fetch pattern: per-element int8 gather (B, T) consecutive spans
    Lpac = 4_600_000
    pac8 = jax.random.randint(key, (Lpac,), 0, 4, jnp.int8)
    T = 614
    starts0 = jax.random.randint(key, (B,), 0, Lpac - T - 64, jnp.int32)
    tcols = jnp.arange(T, dtype=jnp.int32)[None, :]

    def f_pac8(i, st):
        starts, acc = st
        posm = starts[:, None] + tcols
        v = pac8[posm].astype(jnp.int32)
        return ((starts * 48271 + 11) % (Lpac - T - 64), acc + v.sum(1))

    t = bench(jax, f_pac8, (starts0, jnp.zeros(B, jnp.int32)), iters=50)
    print(f"pac int8 elem gather (B={B}xT={T}): {t*1e6:8.1f} us/iter "
          f"({t/(B*T)*1e9:.2f} ns/elem)", flush=True)

    # packed-word alternative: gather W32 consecutive int32 words per lane
    pac32 = jax.random.randint(key, ((Lpac + 15) // 16 + 8, ), 0, 2**30, jnp.int32)
    W32 = (T + 15) // 16 + 1  # 40 words

    def f_pacword(i, st):
        starts, acc = st
        w0 = starts >> 4
        widx = w0[:, None] + jnp.arange(W32, dtype=jnp.int32)[None, :]
        words = pac32[widx]
        return ((starts * 48271 + 11) % (Lpac - T - 64), acc + words.sum(1))

    t = bench(jax, f_pacword, (starts0, jnp.zeros(B, jnp.int32)), iters=50)
    print(f"pac word gather (B={B}x{W32} words): {t*1e6:8.1f} us/iter", flush=True)

    # fixed per-iteration floor: trivial body
    def f_nop(i, st):
        (x,) = st
        return (x + 1,)

    t = bench(jax, f_nop, (jnp.zeros(B, jnp.int32),))
    print(f"trivial body floor: {t*1e6:8.1f} us/iter", flush=True)


if __name__ == "__main__":
    main()
