"""Collective matmul: ring reduce-scatter interleaved with the matmul.

The north-star overlap (BASELINE: "all-gather/reduce-scatter overlapped with
layer compute").  A row-sharded projection ``Y = sum_s x_s @ W_s`` computed
as one psum serializes compute -> all-reduce.  Here the output columns split
into tp chunks that accumulate around the ring: at every step each shard
computes its partial for the circulating chunk while the previous chunk's
``ppermute`` is in flight — the sends have no data dependency on the next
chunk's matmul, so XLA's latency-hiding scheduler overlaps them on ICI.
A final tiled all-gather replicates the reduced chunks.

Numerically identical to the psum path (same partial-sum bracketing per
chunk); used by ``tp_forward_decode(overlap=True)`` for the wo/w2
projections on dense weights.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def collective_matmul_rowsharded(
    x: jax.Array,  # [B, K_local] — this shard's slice of the contraction
    w: jax.Array,  # [K_local, N] — this shard's weight rows
    axis: str,
    tp: int,
    precision=None,
) -> jax.Array:
    """Ring-overlapped ``psum_s(x_s @ w_s)`` -> [B, N] replicated."""
    N = w.shape[-1]
    assert N % tp == 0, (N, tp)
    chunk = N // tp
    idx = jax.lax.axis_index(axis)
    perm = [(s, (s + 1) % tp) for s in range(tp)]

    def partial_for(c):
        wc = jax.lax.dynamic_slice_in_dim(w, c * chunk, chunk, axis=1)
        return jnp.dot(x, wc, precision=precision)

    # chunk c starts at shard (c+1) % tp and accumulates along the ring,
    # ending fully reduced at shard c after tp-1 hops.
    acc = partial_for(jnp.mod(idx - 1, tp))
    for t in range(1, tp):
        acc = jax.lax.ppermute(acc, axis, perm)
        acc = acc + partial_for(jnp.mod(idx - 1 - t, tp))
    # shard s now owns reduced chunk s; tiled all-gather rebuilds [B, N]
    return jax.lax.all_gather(acc, axis, axis=1, tiled=True)
