"""Loop helpers for SPMD-friendly device control flow."""

from __future__ import annotations

import jax


def chunked_while(cond, body, state, chunk: int = 32):
    """``while_loop`` that evaluates ``cond`` only every ``chunk``
    iterations of ``body``.

    Under SPMD partitioning a data-dependent ``cond`` (e.g.
    ``jnp.any(active)``) lowers to a cross-device collective per
    iteration; checking it at chunk boundaries cuts that sync cost by
    ``chunk``x. ``body`` must be a no-op for lanes that already finished
    (true of all the masked per-lane state machines here), so the up to
    ``chunk - 1`` extra iterations are harmless.
    """

    def outer(st):
        return jax.lax.fori_loop(0, chunk, lambda _, s: body(s), st)

    return jax.lax.while_loop(cond, outer, state)
