"""PartitionSpecs for the Llama parameter families and KV cache.

Tensor-parallel layout for the seven matmul families (SURVEY §2.4):

* ``wq/wk/wv``  [L, D, out]  — column-sharded: attention heads split over
  ``model`` (out = heads*hd).
* ``wo``        [L, D, D]    — row-sharded on the heads (input) dim; the
  matmul's partial sums reduce over ``model`` (XLA inserts the psum /
  reduce-scatter under GSPMD).
* ``w1/w3``     [L, D, H]    — column-sharded over the FFN hidden dim.
* ``w2``        [L, H, D]    — row-sharded over the FFN hidden dim.
* ``wcls``      [D, V]       — vocab-sharded logits (sharded argmax/top-k
  composes; all-gather only when full logits are pulled to host).
* ``tok_emb``   [V, D]       — vocab-sharded (gather inserts collectives).
* norms / RoPE tables        — replicated (tiny).
* KV cache [L, B, KVH, S, hd] — batch over ``data``, kv heads over ``model``
  (the reference's single fp32 cache, llama2.ts:160-161, generalized).

These specs feed plain ``jax.jit`` via ``NamedSharding`` (GSPMD chooses the
collectives); `tpu_llama.parallel.tp_decode` hand-schedules the overlap
variant with ``shard_map`` where needed.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from tpu_llama.models.llama import KVCache, LayerParams, LlamaParams, QuantKVCache
from tpu_llama.ops.quant import ChannelQuantTensor, QuantTensor
from tpu_llama.parallel.mesh import DATA_AXIS, MODEL_AXIS


def params_pspecs(params: LlamaParams | None = None) -> LlamaParams:
    """A LlamaParams-shaped pytree of PartitionSpecs.

    When ``params`` is given, weight fields that are INT8 ``QuantTensor``s get
    matching specs for values AND scales — both shard on the same axes (the
    scale tensor's in/g and out dims follow the value tensor's in and out).
    """
    specs = LlamaParams(
        tok_emb=P(MODEL_AXIS, None),
        layers=LayerParams(
            rms_att=P(),
            wq=P(None, None, MODEL_AXIS),
            wk=P(None, None, MODEL_AXIS),
            wv=P(None, None, MODEL_AXIS),
            wo=P(None, MODEL_AXIS, None),
            rms_ffn=P(),
            w1=P(None, None, MODEL_AXIS),
            w2=P(None, MODEL_AXIS, None),
            w3=P(None, None, MODEL_AXIS),
        ),
        rms_final=P(),
        wcls=P(None, MODEL_AXIS),
        rope_cos=P(),
        rope_sin=P(),
    )
    if params is None:
        return specs

    def expand(spec, value):
        if isinstance(value, jax.Array) and value.ndim == 3 \
                and value.shape[-1] == 1 and value.shape[-2] == 1:
            return P()  # fuse_projections stub — too small to shard
        if isinstance(value, jax.Array) and value.ndim == 2 \
                and value.shape == (1, 1):
            return P()  # pipeline split_stages stub (non-first/last stage)
        if isinstance(value, QuantTensor):
            return QuantTensor(q=spec, s=spec,
                               logical_in=value.logical_in,
                               logical_out=value.logical_out)
        if isinstance(value, ChannelQuantTensor):
            # s is [..., out]: sharded iff the value's OUT axis is sharded
            s_spec = P(*spec[:-2], spec[-1]) if len(spec) >= 2 else spec
            return ChannelQuantTensor(q=spec, s=s_spec,
                                      logical_in=value.logical_in,
                                      logical_out=value.logical_out)
        return spec

    return jax.tree.map(
        expand, specs, params,
        is_leaf=lambda x: isinstance(x, P),
    )


def cache_pspec(cache=None):
    spec = P(None, DATA_AXIS, MODEL_AXIS, None, None)
    if isinstance(cache, QuantKVCache):
        sspec = P(None, DATA_AXIS, MODEL_AXIS, None)
        return QuantKVCache(k=spec, v=spec, ks=sspec, vs=sspec)
    return KVCache(k=spec, v=spec)


def _put(tree, specs, mesh: Mesh):
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), tree, specs
    )


def shard_params(params: LlamaParams, mesh: Mesh) -> LlamaParams:
    return _put(params, params_pspecs(params), mesh)


def shard_cache(cache, mesh: Mesh):
    return _put(cache, cache_pspec(cache), mesh)


def logits_pspec() -> P:
    return P(DATA_AXIS, MODEL_AXIS)
