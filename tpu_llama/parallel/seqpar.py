"""Sequence-parallel (context-parallel) decode — the long-context escape
hatch (SURVEY §5.7).

The reference hard-caps context at ``seq_len`` because its KV cache is one
host buffer (llama2.ts:160-161, clamp :439).  Here the cache's SEQUENCE axis
is sharded over the ``model`` mesh axis: each chip owns a contiguous chunk of
positions, so aggregate context scales with chip count.

Decode attention over a sequence-sharded cache needs no ring: each shard
computes flash-style partials (running max ``m``, normalizer ``l``,
weighted-value accumulator ``acc``) over its local chunk, and the partials
merge with one pmax + two psums — the distributed log-sum-exp trick.  The
K/V write lands only on the owning shard (out-of-range scatter indices are
dropped).

Weights are replicated in this mode (pure SP); combining SP with TP is a 3-D
mesh composition left for the multi-host round.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh
from jax.sharding import PartitionSpec as P

from tpu_llama.config import ModelConfig
from tpu_llama.models.llama import (
    KVCache,
    LlamaParams,
    QuantKVCache,
    apply_rope,
    matmul_any,
    rmsnorm,
)
from tpu_llama.ops.attention import quantize_kv
from tpu_llama.parallel.mesh import DATA_AXIS, MODEL_AXIS

_SEQ_SPEC = P(None, DATA_AXIS, None, MODEL_AXIS, None)
_SEQ_SSPEC = P(None, DATA_AXIS, None, MODEL_AXIS)  # scales: S is dim 3


def seq_cache_pspec(cache):
    """Sequence-sharded cache PartitionSpecs; int8 scales shard with the
    sequence axis (VERDICT r2 #5)."""
    if isinstance(cache, QuantKVCache):
        return QuantKVCache(k=_SEQ_SPEC, v=_SEQ_SPEC,
                            ks=_SEQ_SSPEC, vs=_SEQ_SSPEC)
    return KVCache(k=_SEQ_SPEC, v=_SEQ_SPEC)


def _partial_attention(q, k_chunk, v_chunk, pos, offset, config, prec):
    """Flash-style partials over one local chunk.

    q: [B, KVH, G, hd]; k/v_chunk: [B, KVH, Sc, hd]; mask: global index
    (offset + s) <= pos.  Returns (m [B,KVH,G], l [B,KVH,G], acc [B,KVH,G,hd]).
    """
    B, kvh, g, hd = q.shape
    Sc = k_chunk.shape[2]
    kf = k_chunk.astype(jnp.float32)
    vf = v_chunk.astype(jnp.float32)
    scores = jnp.einsum("bkgh,bksh->bkgs", q.astype(jnp.float32), kf,
                        precision=prec) / jnp.sqrt(jnp.float32(hd))
    s_idx = offset + jnp.arange(Sc)[None, None, None, :]
    mask = s_idx <= pos[:, None, None, None]
    scores = jnp.where(mask, scores, -1e30)
    m = jnp.max(scores, axis=-1)  # [B,KVH,G]
    e = jnp.exp(scores - m[..., None])
    e = jnp.where(mask, e, 0.0)  # all-masked chunks contribute exact zeros
    l = jnp.sum(e, axis=-1)
    acc = jnp.einsum("bkgs,bksh->bkgh", e, vf, precision=prec)
    return m, l, acc


@partial(jax.jit, static_argnames=("config", "mesh", "precision"))
def sp_forward_decode(
    params: LlamaParams,  # replicated
    cache: KVCache,  # sequence-sharded: P(None, data, None, MODEL, None)
    tokens: jax.Array,  # [B]
    pos: jax.Array,  # [B] — may exceed config.seq_len / n_shards per chip
    config: ModelConfig,
    mesh: Mesh,
    precision: str = "default",
):
    """Sequence-parallel decode step. Returns (logits [B, V], cache)."""
    prec = jax.lax.Precision(precision) if isinstance(precision, str) else precision
    sp = mesh.shape[MODEL_AXIS]
    S_global = cache.seq_len
    assert S_global % sp == 0

    def mm(a, w):
        return matmul_any(a, w, prec)

    def step(params, cache, tokens, pos):
        shard = jax.lax.axis_index(MODEL_AXIS)
        Sc = cache.k.shape[3]  # local chunk
        offset = shard * Sc
        B = tokens.shape[0]
        x = params.tok_emb[tokens]
        cos = params.rope_cos[pos]
        sin = params.rope_sin[pos]
        b_ix = jnp.arange(B)[:, None]
        h_ix = jnp.arange(config.n_kv_heads)[None, :]

        def layer_step(x, scanned):
            lp, cache_l = scanned
            h = rmsnorm(x, lp.rms_att)
            q = mm(h, lp.wq).reshape(B, config.n_heads, config.head_dim)
            k = mm(h, lp.wk).reshape(B, config.n_kv_heads, config.head_dim)
            v = mm(h, lp.wv).reshape(B, config.n_kv_heads, config.head_dim)
            q = apply_rope(q, cos, sin)
            k = apply_rope(k, cos, sin)
            # write only on the owning shard: OOB indices are dropped
            local_pos = pos - offset
            write_idx = jnp.where(
                (local_pos >= 0) & (local_pos < Sc), local_pos, Sc)
            w_ix = write_idx[:, None]
            if isinstance(cache_l, QuantKVCache):
                # int8 KV under SP (VERDICT r2 #5): the scale rides the
                # sequence axis, so it shards and writes exactly like the
                # values; partials dequant the LOCAL chunk only
                kq, ks = quantize_kv(k)
                vq, vs = quantize_kv(v)
                cache_l = QuantKVCache(
                    k=cache_l.k.at[b_ix, h_ix, w_ix].set(kq, mode="drop"),
                    v=cache_l.v.at[b_ix, h_ix, w_ix].set(vq, mode="drop"),
                    ks=cache_l.ks.at[b_ix, h_ix, w_ix].set(ks, mode="drop"),
                    vs=cache_l.vs.at[b_ix, h_ix, w_ix].set(vs, mode="drop"),
                )
                kc = cache_l.k.astype(jnp.float32) * cache_l.ks[..., None]
                vc = cache_l.v.astype(jnp.float32) * cache_l.vs[..., None]
            else:
                kc = cache_l.k.at[b_ix, h_ix, w_ix].set(
                    k.astype(cache_l.k.dtype), mode="drop")
                vc = cache_l.v.at[b_ix, h_ix, w_ix].set(
                    v.astype(cache_l.v.dtype), mode="drop")
                cache_l = KVCache(k=kc, v=vc)

            qg = q.reshape(B, config.n_kv_heads, config.group_size,
                           config.head_dim)
            m, l, acc = _partial_attention(qg, kc, vc, pos, offset, config, prec)
            # distributed log-sum-exp merge: one pmax + two psums
            m_g = jax.lax.pmax(m, MODEL_AXIS)
            scale = jnp.exp(m - m_g)
            l_g = jax.lax.psum(l * scale, MODEL_AXIS)
            acc_g = jax.lax.psum(acc * scale[..., None], MODEL_AXIS)
            att = (acc_g / jnp.maximum(l_g, 1e-30)[..., None]).reshape(
                B, config.dim).astype(x.dtype)
            x = x + mm(att, lp.wo)
            h = rmsnorm(x, lp.rms_ffn)
            x = x + mm(jax.nn.silu(mm(h, lp.w1)) * mm(h, lp.w3), lp.w2)
            return x, cache_l

        x, new_cache = jax.lax.scan(layer_step, x, (params.layers, cache))
        x = rmsnorm(x, params.rms_final)
        logits = mm(x, params.wcls)
        return logits.astype(jnp.float32), new_cache

    cspec = seq_cache_pspec(cache)
    pspec = jax.tree.map(lambda _: P(), params)
    return jax.shard_map(
        step,
        mesh=mesh,
        in_specs=(pspec, cspec, P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=(P(DATA_AXIS, None), cspec),
        check_vma=False,
    )(params, cache, tokens, pos)


def shard_cache_seq(cache, mesh: Mesh):
    from jax.sharding import NamedSharding

    return jax.tree.map(
        lambda a, s: jax.device_put(a, NamedSharding(mesh, s)),
        cache, seq_cache_pspec(cache))


def sp_grow_cache(small, mesh: Mesh, seq_len: int):
    """Grow a ring-prefill cache (capacity == T) into a ``seq_len``-capacity
    sequence-sharded cache ON DEVICE.

    Ring prefill v1 requires ``cache.seq_len == T``; continuing decode past T
    needs a bigger cache.  Round 1 bounced the cache through host numpy
    (VERDICT r1 weak #8); here the reshard is one jitted
    dynamic-update-slice with sharded output — XLA inserts the ppermutes.
    """
    from jax.sharding import NamedSharding

    assert seq_len >= small.seq_len
    specs = seq_cache_pspec(small)
    shardings = jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                             is_leaf=lambda x: isinstance(x, P))
    L, B, KVH, T, hd = small.k.shape

    @partial(jax.jit, static_argnames=("S",), out_shardings=shardings)
    def grow(s, S: int):
        def g(a):
            shape = (list(a.shape[:3]) + [S] + list(a.shape[4:]))
            zeros = jnp.zeros(shape, a.dtype)
            return jax.lax.dynamic_update_slice(
                zeros, a, (0,) * a.ndim)

        return jax.tree.map(g, s)

    return grow(small, seq_len)


# ---------------------------------------------------------------------------
# ring-attention prefill: queries AND K/V sequence-sharded; K/V chunks rotate
# around the ring (ppermute) while each shard's queries accumulate online
# softmax partials — prefill memory is O(chunk), not O(seq) (SURVEY §5.7).
# ---------------------------------------------------------------------------


def _ring_attention(q, k_loc, v_loc, my_shard, sp, q_offset, config, prec):
    """q: [B, Tc, KVH, G, hd]; k/v_loc: [B, KVH, Tc, hd] (this shard's chunk).

    Returns [B, Tc, dim].  Causality via global indices: key position
    (chunk_offset + s) attends iff <= query position (q_offset + t).
    """
    B, Tc = q.shape[0], q.shape[1]
    hd = config.head_dim
    kvh, g = config.n_kv_heads, config.group_size
    qf = q.astype(jnp.float32) / jnp.sqrt(jnp.float32(hd))
    int8 = len(k_loc) == 2 if isinstance(k_loc, tuple) else False

    m = jnp.full((B, Tc, kvh, g), -1e30, jnp.float32)
    l = jnp.zeros((B, Tc, kvh, g), jnp.float32)
    acc = jnp.zeros((B, Tc, kvh, g, hd), jnp.float32)
    # int8 chunks rotate AS int8 (+f32 scales): the ring's ICI bytes drop
    # ~4x vs f32 chunks — the int8-KV thesis applied to the collective
    # (VERDICT r2 #5); dequant happens on arrival, per ring step
    k_cur, v_cur = k_loc, v_loc

    def deq(kv):
        if int8:
            vals, scales = kv
            return vals.astype(jnp.float32) * scales[..., None]
        return kv.astype(jnp.float32)

    t_idx = q_offset + jnp.arange(Tc)  # [Tc] global query positions

    for i in range(sp):
        src_shard = jnp.mod(my_shard - i, sp)  # whose chunk we hold now
        k_off = src_shard * Tc
        scores = jnp.einsum("btkgh,bksh->btkgs", qf, deq(k_cur),
                            precision=prec)
        s_idx = k_off + jnp.arange(Tc)  # [Tc] global key positions
        mask = s_idx[None, None, None, None, :] <= t_idx[None, :, None, None, None]
        scores = jnp.where(mask, scores, -1e30)
        m_new = jnp.maximum(m, jnp.max(scores, axis=-1))
        e = jnp.where(mask, jnp.exp(scores - m_new[..., None]), 0.0)
        correction = jnp.exp(m - m_new)
        l = l * correction + jnp.sum(e, axis=-1)
        acc = acc * correction[..., None] + jnp.einsum(
            "btkgs,bksh->btkgh", e, deq(v_cur), precision=prec)
        m = m_new
        if i + 1 < sp:
            perm = [(j, (j + 1) % sp) for j in range(sp)]
            rot = lambda a: jax.lax.ppermute(a, MODEL_AXIS, perm)
            k_cur = jax.tree.map(rot, k_cur)
            v_cur = jax.tree.map(rot, v_cur)

    out = acc / jnp.maximum(l, 1e-30)[..., None]
    return out.reshape(B, Tc, config.dim)


@partial(jax.jit, static_argnames=("config", "mesh", "precision"))
def sp_forward_prefill(
    params: LlamaParams,  # replicated
    cache: KVCache,  # sequence-sharded, seq_len == T (or larger, T-aligned)
    tokens: jax.Array,  # [B, T] — T divisible by the model-axis size
    config: ModelConfig,
    mesh: Mesh,
    precision: str = "default",
):
    """Ring-attention prefill from position 0.  Returns (logits [B,T,V], cache).

    Each shard embeds and projects only its sequence chunk; K/V chunks rotate
    over ICI while queries stay resident — per-chip memory is O(T / n_chips).
    """
    prec = jax.lax.Precision(precision) if isinstance(precision, str) else precision
    sp = mesh.shape[MODEL_AXIS]
    B, T = tokens.shape
    assert T % sp == 0 and cache.seq_len == T, "v1: cache sized exactly to T"

    def mm(a, w):
        return matmul_any(a, w, prec)

    def step(params, cache, tokens):
        shard = jax.lax.axis_index(MODEL_AXIS)
        Bl, Tc = tokens.shape  # data-local batch, sequence-local chunk
        q_offset = shard * Tc
        x = params.tok_emb[tokens]  # [Bl, Tc, D]
        q_pos = q_offset + jnp.arange(Tc)[None, :]  # [1, Tc] -> broadcast Bl
        cos = params.rope_cos[q_pos]
        sin = params.rope_sin[q_pos]
        b_ix = jnp.arange(Bl)[:, None, None]
        h_ix = jnp.arange(config.n_kv_heads)[None, :, None]

        def layer_step(x, scanned):
            lp, cache_l = scanned
            h = rmsnorm(x, lp.rms_att)
            q = mm(h, lp.wq).reshape(Bl, Tc, config.n_heads, config.head_dim)
            k = mm(h, lp.wk).reshape(Bl, Tc, config.n_kv_heads, config.head_dim)
            v = mm(h, lp.wv).reshape(Bl, Tc, config.n_kv_heads, config.head_dim)
            q = apply_rope(q, cos, sin)
            k = apply_rope(k, cos, sin)
            kt = k.transpose(0, 2, 1, 3)  # [B, KVH, Tc, hd]
            vt = v.transpose(0, 2, 1, 3)
            t_ix = jnp.arange(Tc)[None, None, :]
            # this shard's chunk of the cache starts at local index 0
            if isinstance(cache_l, QuantKVCache):
                kq, ks = quantize_kv(kt)
                vq, vs = quantize_kv(vt)
                cache_l = QuantKVCache(
                    k=cache_l.k.at[b_ix, h_ix, t_ix].set(kq),
                    v=cache_l.v.at[b_ix, h_ix, t_ix].set(vq),
                    ks=cache_l.ks.at[b_ix, h_ix, t_ix].set(ks),
                    vs=cache_l.vs.at[b_ix, h_ix, t_ix].set(vs),
                )
                ring_k, ring_v = (kq, ks), (vq, vs)  # int8 rides the ring
            else:
                cache_l = KVCache(
                    k=cache_l.k.at[b_ix, h_ix, t_ix].set(
                        kt.astype(cache_l.k.dtype)),
                    v=cache_l.v.at[b_ix, h_ix, t_ix].set(
                        vt.astype(cache_l.v.dtype)))
                ring_k, ring_v = kt, vt
            qg = q.reshape(Bl, Tc, config.n_kv_heads, config.group_size,
                           config.head_dim)
            att = _ring_attention(qg, ring_k, ring_v, shard, sp, q_offset,
                                  config, prec).astype(x.dtype)
            x = x + mm(att, lp.wo)
            h = rmsnorm(x, lp.rms_ffn)
            x = x + mm(jax.nn.silu(mm(h, lp.w1)) * mm(h, lp.w3), lp.w2)
            return x, cache_l

        x, new_cache = jax.lax.scan(layer_step, x, (params.layers, cache))
        x = rmsnorm(x, params.rms_final)
        logits = mm(x, params.wcls)
        return logits.astype(jnp.float32), new_cache

    cspec = seq_cache_pspec(cache)
    pspec = jax.tree.map(lambda _: P(), params)
    return jax.shard_map(
        step,
        mesh=mesh,
        in_specs=(pspec, cspec, P(DATA_AXIS, MODEL_AXIS)),
        out_specs=(P(DATA_AXIS, MODEL_AXIS, None), cspec),
        check_vma=False,
    )(params, cache, tokens)
