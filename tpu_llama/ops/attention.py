"""Flash decode-attention Pallas kernel (fp and INT8 KV).

The reference's attention is a per-head scalar loop over the cache
(llama2.ts:243-267).  Here each (batch, kv-head) grid cell streams its
contiguous [S, hd] K/V rows from the head-major cache once, does the
score matmul + masked softmax + value matmul entirely in VMEM, and writes
[G, hd] (G = GQA queries per kv head).  Decode attention is HBM-bound; this
kernel's traffic is exactly one pass over the KV cache.

INT8 KV trick: per-(token, head) scales fold into the *score columns*
(``scores *= ks``) and the *probability columns* (``p *= vs``) instead of
dequantizing K/V element-wise — two [·, S] broadcasts replace a [S, hd]
dequant, and the matmuls run on the raw int8-as-bf16 values (exact for
|q| <= 127), halving (f32: quartering) cache bandwidth.

The causal bound is the reference's ``t <= pos`` (llama2.ts:249); padding
slots beyond ``pos`` are masked, so garbage K/V there is never read.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


_NEG_INF = -1e30  # python literal — jnp constants would be captured as kernel consts


def _flash_decode_kernel(pos_ref, q_ref, k_ref, v_ref, o_ref, *, S: int, int8: bool,
                         ks_ref=None, vs_ref=None):
    b = pl.program_id(0)
    pos = pos_ref[b]

    q = q_ref[0, 0]  # [G8, hd] (pre-scaled by 1/sqrt(hd))
    k = k_ref[0, 0]  # [S, hd]
    scores = jax.lax.dot_general(
        q.astype(jnp.bfloat16) if int8 else q.astype(jnp.float32),
        k.astype(jnp.bfloat16) if int8 else k.astype(jnp.float32),
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [G8, S]
    if int8:
        scores = scores * ks_ref[0, 0]  # [1, S] per-token K scales

    s_idx = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    scores = jnp.where(s_idx <= pos, scores, _NEG_INF)

    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    l = jnp.sum(e, axis=-1, keepdims=True)
    p = e / l
    if int8:
        p = p * vs_ref[0, 0]  # [1, S] per-token V scales fold into probs
        p = p.astype(jnp.bfloat16)
        v = v_ref[0, 0].astype(jnp.bfloat16)
    else:
        p = p.astype(jnp.float32)
        v = v_ref[0, 0].astype(jnp.float32)
    o_ref[0, 0] = jnp.dot(p, v, preferred_element_type=jnp.float32).astype(
        o_ref.dtype
    )


def _pad_g(G: int) -> int:
    return max(8, -(-G // 8) * 8)


@functools.partial(jax.jit, static_argnames=())
def flash_decode_attention(
    q: jax.Array,  # [B, KVH, G, hd] — raw (unscaled) queries
    k_cache: jax.Array,  # [B, KVH, S, hd] fp or int8
    v_cache: jax.Array,  # [B, KVH, S, hd]
    pos: jax.Array,  # [B] int32
    k_scale: jax.Array | None = None,  # [B, KVH, S] f32 (int8 caches)
    v_scale: jax.Array | None = None,
) -> jax.Array:
    """Returns [B, KVH, G, hd] f32 attention output."""
    B, KVH, G, hd = q.shape
    S = k_cache.shape[2]
    int8 = k_cache.dtype == jnp.int8
    G8 = _pad_g(G)

    qs = (q.astype(jnp.float32) / jnp.sqrt(jnp.float32(hd)))
    if G8 != G:
        qs = jnp.pad(qs, ((0, 0), (0, 0), (0, G8 - G), (0, 0)))

    grid = (B, KVH)
    qspec = pl.BlockSpec((1, 1, G8, hd), lambda b, k, *_: (b, k, 0, 0),
                         memory_space=pltpu.VMEM)
    kvspec = pl.BlockSpec((1, 1, S, hd), lambda b, k, *_: (b, k, 0, 0),
                          memory_space=pltpu.VMEM)
    # scales as [B, KVH, 1, S]: unit sublane dim satisfies Mosaic's block
    # divisibility (1 == full dim) with S on lanes
    sspec = pl.BlockSpec((1, 1, 1, S), lambda b, k, *_: (b, k, 0, 0),
                         memory_space=pltpu.VMEM)

    if int8:
        def kernel_int8(pos_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref, o_ref):
            _flash_decode_kernel(pos_ref, q_ref, k_ref, v_ref, o_ref,
                                 S=S, int8=True, ks_ref=ks_ref, vs_ref=vs_ref)

        out = pl.pallas_call(
            kernel_int8,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=grid,
                in_specs=[qspec, kvspec, kvspec, sspec, sspec],
                out_specs=pl.BlockSpec((1, 1, G8, hd), lambda b, k, *_: (b, k, 0, 0),
                                       memory_space=pltpu.VMEM),
            ),
            out_shape=jax.ShapeDtypeStruct((B, KVH, G8, hd), jnp.float32),
            interpret=_interpret(),
        )(pos.astype(jnp.int32), qs, k_cache, v_cache,
          k_scale[:, :, None, :], v_scale[:, :, None, :])
    else:
        def kernel_fp(pos_ref, q_ref, k_ref, v_ref, o_ref):
            _flash_decode_kernel(pos_ref, q_ref, k_ref, v_ref, o_ref,
                                 S=S, int8=False)

        out = pl.pallas_call(
            kernel_fp,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=grid,
                in_specs=[qspec, kvspec, kvspec],
                out_specs=pl.BlockSpec((1, 1, G8, hd), lambda b, k, *_: (b, k, 0, 0),
                                       memory_space=pltpu.VMEM),
            ),
            out_shape=jax.ShapeDtypeStruct((B, KVH, G8, hd), jnp.float32),
            interpret=_interpret(),
        )(pos.astype(jnp.int32), qs, k_cache, v_cache)

    return out[:, :, :G, :]


def quantize_kv(x: jax.Array):
    """Per-(…, token/row) symmetric INT8 over the last (hd) axis.

    x: [..., hd] -> (int8 values [..., hd], f32 scales [...]).
    """
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    s = absmax / 127.0
    inv = jnp.where(s > 0, 1.0 / jnp.where(s > 0, s, 1.0), 0.0)
    q = jnp.clip(jnp.rint(x.astype(jnp.float32) * inv[..., None]), -127, 127)
    return q.astype(jnp.int8), s
