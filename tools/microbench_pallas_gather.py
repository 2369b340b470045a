"""Pallas VMEM row-gather microbenchmark vs XLA's HBM gather.

The FM-index hot loop is a dependent chain of row gathers; XLA's TPU
gather measures ~90-185 ns/row in-loop. This kernel keeps the Occ
table VMEM-resident and walks lanes with unrolled dynamic slices.

Also measures pallas_call launch overhead inside a lax.fori_loop, since
the seeding loop would invoke the kernel once per iteration.
"""

import sys
import time
import functools

import numpy as np

NEGI = -(1 << 31)  # python int (traced constants are rejected)


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir",
                      __file__.rsplit("/", 2)[0] + "/.jax_cache")

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    N = 20480  # shrunk so table (10MB) + out (4MB) fit the 16MB VMEM
    key = jax.random.PRNGKey(0)
    # physical layout: (N, 128) int32 — row j holds the 16 payload words
    # in lanes 0..15 (lane padding; VMEM minor dim must be 128)
    # NOTE VMEM is ~16MB so we keep the payload in lanes of (N/8, 8, 128)
    # tiles; a logical row is one SUBLANE of a tile: dynamic sublane
    # offsets must be multiples of 8, so we load the whole tile and
    # select the sublane with vector ops.
    tab = jax.random.randint(key, (N, 16), 0, 1 << 20, jnp.int32)
    idx0 = jax.random.randint(key, (B,), 0, N, jnp.int32)
    # pack 8 logical rows of 16 words into one (8,128) tile row-block:
    # tile g, sublane s, lanes 16*u..16*u+15 = row (g*64 + u*8 + s)?? —
    # keep it SIMPLE: tile g holds rows 8g..8g+7 in sublanes, payload in
    # lanes 0..15. 87.5% lane waste but only sublane selection needed.
    tabp = jnp.zeros((N, 128), jnp.int32).at[:, :16].set(tab)

    UNROLL = 8

    def gather_kernel(idx_ref, tab_ref, out_ref):
        si = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)

        def body(i, _):
            base = i * UNROLL
            for u in range(UNROLL):  # manual unroll (Mosaic: unroll=1 only)
                j = idx_ref[base + u]
                g = pl.multiple_of((j >> 3) * 8, 8)
                tile = tab_ref[pl.ds(g, 8), :]          # (8, 128)
                row = jnp.max(jnp.where(si == (j & 7), tile, NEGI), axis=0,
                              keepdims=True)            # (1, 128)
                out_ref[pl.ds(base + u, 1), :] = row
            return 0

        jax.lax.fori_loop(0, idx_ref.shape[0] // UNROLL, body, 0)

    @jax.jit
    def pallas_gather(idx, tabp):
        return pl.pallas_call(
            gather_kernel,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, 128), jnp.int32),
        )(idx, tabp)

    # correctness
    out = np.asarray(pallas_gather(idx0, tabp))[:, :16]
    ref = np.asarray(tab)[np.asarray(idx0)]
    assert (out == ref).all(), "pallas gather wrong"
    print("correct", flush=True)

    # dependent-loop timing: chain 100 gathers, next indices from output
    @jax.jit
    def chain_pallas(idx, tabp):
        def body(_, idx):
            rows = pallas_gather(idx, tabp)
            return (idx * 48271 + rows[:, 0] + 11) % N

        return jax.lax.fori_loop(0, 100, body, idx)

    @jax.jit
    def chain_xla(idx, tab):
        def body(_, idx):
            row = tab[idx]
            return (idx * 48271 + row[:, 0] + 11) % N

        return jax.lax.fori_loop(0, 100, body, idx)

    for name, fn, arg in (("pallas", chain_pallas, tabp),
                          ("xla", chain_xla, tab)):
        r = jax.device_get(fn(idx0, arg))  # warm
        t0 = time.time()
        for _ in range(3):
            r = jax.device_get(fn(idx0, arg))
        dt = (time.time() - t0) / 3 / 100
        print(f"{name}: {dt*1e6:9.1f} us/gather-of-{B}  "
              f"({dt/B*1e9:6.2f} ns/row)", flush=True)

    # launch overhead: trivial pallas kernel chained 100x
    def nop_kernel(x_ref, o_ref):
        o_ref[:] = x_ref[:] + 1

    @jax.jit
    def chain_nop(x):
        def body(_, x):
            return pl.pallas_call(
                nop_kernel,
                out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
            )(x)

        return jax.lax.fori_loop(0, 100, body, x)

    x = jnp.zeros((8, 128), jnp.int32)
    r = jax.device_get(chain_nop(x))
    t0 = time.time()
    for _ in range(3):
        r = jax.device_get(chain_nop(x))
    print(f"pallas launch overhead: {(time.time()-t0)/3/100*1e6:.1f} us/call",
          flush=True)


if __name__ == "__main__":
    main()
