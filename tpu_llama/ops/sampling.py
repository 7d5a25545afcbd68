"""On-device sampling (the performance path).

The compat path (tpu_llama.compat.sampling) replicates the reference's host
f64 semantics bit-for-bit, including its top-p quirks.  This module is the
TPU-native fast path: batched, jittable, works on sharded logits.

* ``greedy`` — argmax with the same tie rule as the reference (lowest index,
  llama2.ts:364-366), so temp-0 generation is token-identical on both paths.
* ``sample`` — temperature + optional top-p nucleus sampling using
  ``jax.random`` (documented divergence: the RNG stream is NOT xorshift64*;
  use the compat path when reference-identical sampled streams are required).
  Top-p here uses the *fixed* llama2.c-style semantics (smallest prefix with
  cumsum > p, inclusive), not the reference's exclusive-walk quirk.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@jax.jit
def greedy(logits: jax.Array) -> jax.Array:
    """[..., V] -> [...] int32 argmax (ties -> lowest index)."""
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)


@partial(jax.jit, static_argnames=())
def sample(
    logits: jax.Array,  # [B, V] f32
    key: jax.Array,
    temperature: jax.Array | float = 1.0,  # scalar or [B]
    topp: jax.Array | float = 1.0,  # scalar or [B]
    topk: jax.Array | int = 0,  # scalar or [B]; 0 disables
) -> jax.Array:
    """Batched temperature / top-p / top-k sampling -> [B] int32; per-row
    params.

    temperature <= 0 degenerates to greedy for that row.  topp outside
    (0, 1) disables the nucleus filter (llama2.ts:487 semantics); topk <= 0
    disables the top-k filter (a serving extension beyond the reference).
    """
    B, V = logits.shape
    temperature = jnp.broadcast_to(
        jnp.asarray(temperature, jnp.float32), (B,))
    topp = jnp.broadcast_to(jnp.asarray(topp, jnp.float32), (B,))
    topk = jnp.broadcast_to(jnp.asarray(topk, jnp.int32), (B,))

    scaled = logits / jnp.maximum(temperature, 1e-6)[:, None]
    probs = jax.nn.softmax(scaled, axis=-1)

    # nucleus mask in sorted space
    sort_idx = jnp.argsort(-probs, axis=-1, stable=True)
    sorted_p = jnp.take_along_axis(probs, sort_idx, axis=-1)
    csum = jnp.cumsum(sorted_p, axis=-1)
    # keep the smallest prefix whose cumsum exceeds topp (inclusive)
    keep_sorted = (csum - sorted_p) < topp[:, None]
    use_topp = (topp > 0) & (topp < 1)
    keep_sorted = keep_sorted | jnp.logical_not(use_topp)[:, None]
    # top-k: keep the k highest-probability entries
    rank = jnp.broadcast_to(jnp.arange(V)[None, :], (B, V))
    keep_k = (rank < topk[:, None]) | (topk <= 0)[:, None]
    keep_sorted = keep_sorted & keep_k
    filtered_sorted = jnp.where(keep_sorted, sorted_p, 0.0)
    if getattr(key, "ndim", 0) == 1 and key.shape[0] == B and jnp.issubdtype(
            key.dtype, jax.dtypes.prng_key):
        # per-row typed keys -> independent per-request streams
        u = jax.vmap(
            lambda k: jax.random.uniform(k, (V,), minval=1e-20, maxval=1.0)
        )(key)
    else:
        u = jax.random.uniform(key, (B, V), minval=1e-20, maxval=1.0)
    gumbel = -jnp.log(-jnp.log(u))
    choice_sorted = jnp.argmax(
        jnp.log(jnp.maximum(filtered_sorted, 1e-38)) + gumbel, axis=-1)
    sampled_tok = jnp.take_along_axis(
        sort_idx, choice_sorted[:, None], axis=-1)[:, 0].astype(jnp.int32)

    return jnp.where(temperature <= 0.0, greedy(logits), sampled_tok)
