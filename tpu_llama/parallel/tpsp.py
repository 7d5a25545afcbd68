"""Composed TP x SP decode on a 3-D mesh ('data', 'model', 'seq').

Round 1's sequence-parallel decode replicated the weights (parallel/seqpar.py
"pure SP") — unusable for 70B long-context, where weights need TP *and* the
KV cache needs sequence sharding (VERDICT r1 missing #5; SURVEY §2.4, §5.7).
This module composes both:

* weights shard over ``model`` exactly as parallel/tp.py (column-sharded
  wq/wk/wv/w1/w3, row-sharded wo/w2 with one psum each, vocab-sharded
  embedding/classifier) and are REPLICATED over ``seq``;
* the KV cache shards over BOTH: heads over ``model``, sequence over ``seq``
  ([L, B, KVH/model, S/seq, hd]);
* decode attention computes flash-style partials on the local
  (heads_local x seq-chunk) tile and merges with the distributed
  log-sum-exp (pmax + two psums) over ``seq`` only;
* projections/FFN are computed redundantly across ``seq`` shards (decode
  activations are tiny; the win is cache capacity and attention bandwidth).

Collectives per layer: 2 psums over ``model`` (Megatron) + 3 small LSE
collectives over ``seq``.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding
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
from tpu_llama.parallel.seqpar import _partial_attention
from tpu_llama.parallel.sharding import params_pspecs
from tpu_llama.parallel.tp import _local_config

SEQ_AXIS = "seq"


@dataclasses.dataclass(frozen=True)
class MeshConfig3:
    data: int = 1
    model: int = 1
    seq: int = 1

    @property
    def n_devices(self) -> int:
        return self.data * self.model * self.seq


def make_mesh3(cfg: MeshConfig3, devices: list | None = None) -> Mesh:
    devs = devices if devices is not None else jax.devices()
    n = cfg.n_devices
    if n > len(devs):
        raise ValueError(f"mesh needs {n} devices, have {len(devs)}")
    grid = np.asarray(devs[:n]).reshape(cfg.data, cfg.model, cfg.seq)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS, SEQ_AXIS))


def _cache_pspec3(cache=None):
    # [L, B, KVH, S, hd]: heads over model, sequence over seq; int8 scales
    # [L, B, KVH, S] shard on both too (VERDICT r2 #5)
    spec = P(None, DATA_AXIS, MODEL_AXIS, SEQ_AXIS, None)
    if isinstance(cache, QuantKVCache):
        sspec = P(None, DATA_AXIS, MODEL_AXIS, SEQ_AXIS)
        return QuantKVCache(k=spec, v=spec, ks=sspec, vs=sspec)
    return KVCache(k=spec, v=spec)


def shard_cache_tpsp(cache, mesh: Mesh):
    return jax.tree.map(
        lambda a, s: jax.device_put(a, NamedSharding(mesh, s)),
        cache, _cache_pspec3(cache))


@partial(jax.jit, static_argnames=("config", "mesh", "precision"))
def tpsp_forward_decode(
    params: LlamaParams,  # sharded per parallel.sharding.params_pspecs (model)
    cache: KVCache,  # sharded per _cache_pspec3
    tokens: jax.Array,  # [B] int32
    pos: jax.Array,  # [B] int32 — global positions
    config: ModelConfig,
    mesh: Mesh,
    precision: str = "default",
):
    """TP x SP decode step.  Returns (logits [B, V] vocab-sharded on model,
    cache)."""
    prec = jax.lax.Precision(precision) if isinstance(precision, str) else precision
    tp = mesh.shape[MODEL_AXIS]
    sp = mesh.shape[SEQ_AXIS]
    assert config.n_kv_heads % tp == 0 and config.hidden_dim % tp == 0
    assert config.vocab_size % tp == 0 and cache.seq_len % sp == 0
    local = _local_config(config, tp)
    vocab_local = config.vocab_size // tp

    def mm(a, w):
        return matmul_any(a, w, prec)

    def step(params, cache, tokens, pos):
        # ---- embedding: vocab-sharded gather + psum over model ----
        shard = jax.lax.axis_index(MODEL_AXIS)
        v_start = shard * vocab_local
        local_ids = tokens - v_start
        in_shard = (local_ids >= 0) & (local_ids < vocab_local)
        safe_ids = jnp.clip(local_ids, 0, vocab_local - 1)
        x_part = jnp.where(in_shard[:, None], params.tok_emb[safe_ids], 0.0)
        x = jax.lax.psum(x_part, MODEL_AXIS)  # [B, D]

        B = tokens.shape[0]
        cos = params.rope_cos[pos]
        sin = params.rope_sin[pos]
        seq_shard = jax.lax.axis_index(SEQ_AXIS)
        b_ix = jnp.arange(B)[:, None]
        h_ix = jnp.arange(local.n_kv_heads)[None, :]

        def layer_step(x, scanned):
            lp, cache_l = scanned  # cache_l: [B, KVH/tp, Sc, hd] local tile
            Sc = cache_l.k.shape[2]
            offset = seq_shard * Sc
            h = rmsnorm(x, lp.rms_att)
            q = mm(h, lp.wq).reshape(B, local.n_heads, local.head_dim)
            k = mm(h, lp.wk).reshape(B, local.n_kv_heads, local.head_dim)
            v = mm(h, lp.wv).reshape(B, local.n_kv_heads, local.head_dim)
            q = apply_rope(q, cos, sin)
            k = apply_rope(k, cos, sin)
            # K/V write lands only on the owning seq shard (OOB drops)
            local_pos = pos - offset
            write_idx = jnp.where(
                (local_pos >= 0) & (local_pos < Sc), local_pos, Sc)
            w_ix = write_idx[:, None]
            if isinstance(cache_l, QuantKVCache):
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

            qg = q.reshape(B, local.n_kv_heads, local.group_size,
                           local.head_dim)
            m, l, acc = _partial_attention(qg, kc, vc, pos, offset, local,
                                           prec)
            # distributed log-sum-exp merge over the seq axis only
            m_g = jax.lax.pmax(m, SEQ_AXIS)
            scale = jnp.exp(m - m_g)
            l_g = jax.lax.psum(l * scale, SEQ_AXIS)
            acc_g = jax.lax.psum(acc * scale[..., None], SEQ_AXIS)
            att = (acc_g / jnp.maximum(l_g, 1e-30)[..., None]).reshape(
                B, local.dim).astype(x.dtype)
            # row-sharded wo/w2: Megatron psums over model
            x = x + jax.lax.psum(mm(att, lp.wo), MODEL_AXIS)
            h2 = rmsnorm(x, lp.rms_ffn)
            x = x + jax.lax.psum(
                mm(jax.nn.silu(mm(h2, lp.w1)) * mm(h2, lp.w3), lp.w2),
                MODEL_AXIS)
            return x, cache_l

        x, new_cache = jax.lax.scan(layer_step, x, (params.layers, cache))
        x = rmsnorm(x, params.rms_final)
        logits_local = mm(x, params.wcls)  # [B, V/tp], vocab-sharded
        return logits_local.astype(jnp.float32), new_cache

    cspec = _cache_pspec3(cache)
    out = jax.shard_map(
        step,
        mesh=mesh,
        in_specs=(params_pspecs(params), cspec, P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=(P(DATA_AXIS, MODEL_AXIS), cspec),
        check_vma=False,
    )(params, cache, tokens, pos)
    return out
