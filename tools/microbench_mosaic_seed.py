"""Mosaic (Pallas TPU) feasibility microbench for a seeding mega-kernel.

VERDICT r3 item 1 asks whether the whole SMEM state machine can live in
ONE Pallas kernel (state in VMEM, per-block early exit) to delete the
XLA while_loop per-iteration floor. The binding question is the table
gather: the loop needs 2 random table rows per lane per iteration in a
dependent chain (the next index derives from this row's decode). XLA's
HBM gather does ~2.9 ns/row marginal at 32K rows/step (BENCH_NOTES
cost model). Whatever Mosaic achieves from a VMEM-resident table sets
the mega-kernel's ceiling.

Method: every timing is the MARGINAL between two in-kernel iteration
counts (per-call dispatch through the axon relay is ~25 ms and must
difference out — the first version of this tool was swamped by it).

Strategies (dependent chains; per-lane index is a kernel scalar):
  A. aligned (8,128) tile load + sublane select via masked max
  B. tile load + dynamic pltpu.roll, rows packed 8-per-vreg-group
  C. dynamic single-sublane slice tab[pl.ds(j, 1), :]
  D. loop floor: same scalar carry, no table load
  E. pure vector loop floor: one vreg op per iteration, no scalars

    PYTHONPATH=. python tools/microbench_mosaic_seed.py
"""
import sys; sys.path.insert(0, __file__.rsplit("/", 2)[0])  # noqa: E702
import time

import numpy as np

NEGI = -(1 << 31)


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir",
                      __file__.rsplit("/", 2)[0] + "/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    N = 16384          # table rows (8 MB at 128 int32/row) — VMEM-resident
    BL = 128           # lanes per block (rows/iter = BL when K=1)
    TS = (1024, 16384) # in-kernel iteration counts (marginal differencing)
    key = jax.random.PRNGKey(0)
    tab = jax.random.randint(key, (N, 128), 0, 1 << 20, jnp.int32)
    idx0 = jax.random.randint(key, (BL,), 0, N, jnp.int32)

    def run(name, make_kernel, check=True):
        times = {}
        ok = "?"
        for T in TS:
            kernel_fn = make_kernel(T)

            @jax.jit
            def call(idx, tab, kernel_fn=kernel_fn):
                return pl.pallas_call(
                    kernel_fn,
                    in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                              pl.BlockSpec(memory_space=pltpu.VMEM)],
                    out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
                    out_shape=jax.ShapeDtypeStruct((BL,), jnp.int32),
                )(idx, tab)

            try:
                out = jax.device_get(call(idx0, tab))
            except Exception as e:
                print(f"{name:26s} FAILED: {type(e).__name__}: "
                      f"{str(e).splitlines()[0][:90]}", flush=True)
                return
            if check:
                t_np = np.asarray(tab)
                i_np = np.asarray(idx0).astype(np.int64)
                for _ in range(T):
                    rows = t_np[i_np]
                    i_np = (i_np * 48271 + rows[:, 0] + 11) & (N - 1)
                ok = bool((out == i_np.astype(np.int32)).all())
            t0 = time.time()
            reps = 10
            for _ in range(reps):
                out = jax.device_get(call(idx0, tab))
            times[T] = (time.time() - t0) / reps
        t1, t2 = times[TS[0]], times[TS[1]]
        per_iter = (t2 - t1) / (TS[1] - TS[0])
        per_row = per_iter / BL
        print(f"{name:26s} ok={ok}  call {t1*1e3:6.2f}/{t2*1e3:7.2f} ms  "
              f"marginal {per_iter*1e6:8.3f} us/iter "
              f"({per_row*1e9:7.2f} ns/row at {BL} rows/iter)", flush=True)

    def make_a(T):
        def kern(idx_ref, tab_ref, out_ref):
            si = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)

            def step(_, carry):
                new = []
                for u in range(BL):
                    j = carry[u]
                    g = pl.multiple_of((j >> 3) * 8, 8)
                    tile = tab_ref[pl.ds(g, 8), :]
                    r0 = jnp.max(jnp.where(si == (j & 7), tile[:, 0:1], NEGI))
                    new.append((j * 48271 + r0 + 11) & (N - 1))
                return new

            carry = [idx_ref[u] for u in range(BL)]
            carry = jax.lax.fori_loop(0, T, step, carry)
            for u in range(BL):
                out_ref[u] = carry[u]
        return kern

    def make_b(T):
        def kern(idx_ref, tab_ref, out_ref):
            si = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)

            def step(_, carry):
                new = []
                for base in range(0, BL, 8):
                    acc = jnp.zeros((8, 128), jnp.int32)
                    for u in range(8):
                        j = carry[base + u]
                        g = pl.multiple_of((j >> 3) * 8, 8)
                        tile = tab_ref[pl.ds(g, 8), :]
                        rolled = pltpu.roll(tile, shift=u - (j & 7), axis=0)
                        acc = acc | jnp.where(si == u, rolled, 0)
                    col0 = acc[:, 0:1]  # (8,1)
                    for u in range(8):
                        r0 = jnp.max(jnp.where(
                            jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0) == u,
                            col0, NEGI))
                        new.append((carry[base + u] * 48271 + r0 + 11) & (N - 1))
                return new

            carry = [idx_ref[u] for u in range(BL)]
            carry = jax.lax.fori_loop(0, T, step, carry)
            for u in range(BL):
                out_ref[u] = carry[u]
        return kern

    def make_c(T):
        def kern(idx_ref, tab_ref, out_ref):
            def step(_, carry):
                new = []
                for u in range(BL):
                    j = carry[u]
                    row = tab_ref[pl.ds(j, 1), :]          # (1, 128)
                    r0 = row[0, 0]
                    new.append((j * 48271 + r0 + 11) & (N - 1))
                return new

            carry = [idx_ref[u] for u in range(BL)]
            carry = jax.lax.fori_loop(0, T, step, carry)
            for u in range(BL):
                out_ref[u] = carry[u]
        return kern

    def make_d(T):
        def kern(idx_ref, tab_ref, out_ref):
            def step(_, carry):
                return [(j * 48271 + 7 + 11) & (N - 1) for j in carry]

            carry = [idx_ref[u] for u in range(BL)]
            carry = jax.lax.fori_loop(0, T, step, carry)
            for u in range(BL):
                out_ref[u] = carry[u]
        return kern

    def make_e(T):
        def kern(idx_ref, tab_ref, out_ref):
            v0 = jnp.full((8, 128), idx_ref[0], jnp.int32)

            def step(_, v):
                return (v * 48271 + 11) & (N - 1)

            v = jax.lax.fori_loop(0, T, step, v0)
            out_ref[0] = v[0, 0]
            for u in range(1, BL):
                out_ref[u] = idx_ref[u]
        return kern

    def make_a2(T):
        # two dependent rows per lane per iteration (the real fetch
        # shape: occ4 at k and k+s), full-row select feeding the index
        def kern(idx_ref, tab_ref, out_ref):
            si = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)

            def step(_, carry):
                new = []
                for u in range(BL):
                    j = carry[u]
                    g = pl.multiple_of((j >> 3) * 8, 8)
                    tile = tab_ref[pl.ds(g, 8), :]
                    row = jnp.max(jnp.where(si == (j & 7), tile, NEGI),
                                  axis=0, keepdims=True)      # (1, 128)
                    j2 = (j * 40503 + 7) & (N - 1)
                    g2 = pl.multiple_of((j2 >> 3) * 8, 8)
                    tile2 = tab_ref[pl.ds(g2, 8), :]
                    row2 = jnp.max(jnp.where(si == (j2 & 7), tile2, NEGI),
                                   axis=0, keepdims=True)
                    comb = row + row2                          # (1, 128)
                    r0 = jnp.max(jnp.where(
                        jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1) == 0,
                        comb, NEGI))
                    new.append((j * 48271 + r0 + 11) & (N - 1))
                return new

            carry = [idx_ref[u] for u in range(BL)]
            carry = jax.lax.fori_loop(0, T, step, carry)
            for u in range(BL):
                out_ref[u] = carry[u]
        return kern

    run("A tile+maskmax scalar", make_a)
    run("A2 two rows + row math", make_a2, check=False)
    run("B tile+roll grouped", make_b)
    run("D loop floor (no load)", make_d, check=False)
    run("E vector floor", make_e, check=False)


if __name__ == "__main__":
    main()
