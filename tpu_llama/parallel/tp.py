"""Explicit tensor-parallel decode step via shard_map.

GSPMD (plain jit + NamedSharding) auto-partitions the einsum model, but for
the production TP path we hand-place the collectives (SURVEY §2.4, §5.8):

* every matmul runs on the LOCAL weight shard — including the Pallas
  INT8 dequant+matmul and flash-attention kernels, which under shard_map are
  guaranteed to execute per-shard on local data (no hidden all-gathers);
* the two row-sharded projections (wo, w2) produce partial sums reduced with
  one ``psum`` each over the ``model`` axis — exactly two collectives per
  layer, the textbook Megatron schedule;
* the embedding gather and classifier run vocab-sharded with one psum /
  sharded-logits output.

This function is the substrate for collective-compute overlap: replacing the
psum with reduce-scatter + all-gather interleaved into the matmul is a local
change here (not possible when GSPMD owns the schedule).

Requires: n_kv_heads, hidden_dim, vocab_size divisible by the model-axis
size; batch divisible by the data-axis size.
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
    _attend_decode,
    _write_decode,
    apply_rope,
    matmul_any,
    rmsnorm,
)
from tpu_llama.ops.quant import ChannelQuantTensor


def _local_width(w) -> int:
    """Physical trailing width of a (possibly sharded) weight leaf — inside
    shard_map this is the PER-SHARD width, unlike QuantTensor.logical_out
    which is static global metadata."""
    if isinstance(w, (QuantTensor, ChannelQuantTensor)):
        return w.q.shape[-1]
    return w.shape[-1]
from tpu_llama.ops.quant import QuantTensor
from tpu_llama.parallel.overlap import collective_matmul_rowsharded
from tpu_llama.parallel.mesh import DATA_AXIS, MODEL_AXIS
from tpu_llama.parallel.sharding import cache_pspec, params_pspecs


def _local_config(config: ModelConfig, tp: int) -> ModelConfig:
    """Per-shard view for the attention shapes: heads (and the head-width
    ``dim`` they span) divided by tp; ``head_dim`` is invariant."""
    return ModelConfig(
        dim=config.dim // tp,  # = n_heads_local * head_dim
        hidden_dim=config.hidden_dim // tp,
        n_layers=config.n_layers,
        n_heads=config.n_heads // tp,
        n_kv_heads=config.n_kv_heads // tp,
        vocab_size=config.vocab_size,  # classifier handled separately
        seq_len=config.seq_len,
        shared_weights=config.shared_weights,
    )


@partial(jax.jit, static_argnames=("config", "mesh", "precision", "attn",
                                   "overlap"))
def tp_forward_decode(
    params: LlamaParams,  # sharded per parallel.sharding.params_pspecs
    cache,  # KVCache or QuantKVCache, sharded per cache_pspec
    tokens: jax.Array,  # [B] int32
    pos: jax.Array,  # [B] int32
    config: ModelConfig,
    mesh: Mesh,
    precision: str = "default",
    attn: str = "auto",
    overlap: bool = False,  # ring-overlapped collective matmul for wo/w2
):
    """Explicit-TP decode step. Returns (logits [B, V] sharded on vocab, cache)."""
    prec = jax.lax.Precision(precision) if isinstance(precision, str) else precision
    if attn == "auto":
        attn = "flash" if jax.default_backend() == "tpu" else "xla"
    tp = mesh.shape[MODEL_AXIS]
    assert config.n_kv_heads % tp == 0, (config.n_kv_heads, tp)
    assert config.hidden_dim % tp == 0 and config.vocab_size % tp == 0
    # Quantization padding would be split across shards (the pad columns all
    # land on the last shard), corrupting the local logical view.  Real Llama
    # dims are kernel-aligned and never pad; reject odd synthetic configs.
    for leaf in jax.tree.leaves(
        params, is_leaf=lambda x: isinstance(x, QuantTensor)
    ):
        if isinstance(leaf, QuantTensor) and (
            leaf.padded_in != leaf.logical_in
            or leaf.padded_out != leaf.logical_out
        ):
            raise ValueError(
                "tp_forward_decode requires padding-free QuantTensors "
                f"(got padded {leaf.padded_in}x{leaf.padded_out} vs logical "
                f"{leaf.logical_in}x{leaf.logical_out}); use kernel-aligned "
                "model dims or a smaller quant group"
            )
    local = _local_config(config, tp)
    vocab_local = config.vocab_size // tp

    def mm(a, w):
        return matmul_any(a, w, prec)

    def step(params, cache, tokens, pos):
        # ---- embedding: vocab-sharded gather + psum ----
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

        def layer_step(x, scanned):
            lp, cache_l = scanned
            h = rmsnorm(x, lp.rms_att)
            # local head slices — no communication.  The shard-interleaved
            # fused wqkv layout (fuse_projections(tp=...)) hands each shard
            # [q_i | k_i | v_i]; detect it by the PHYSICAL local width (a
            # sharded QuantTensor's logical_out metadata stays global).
            Dl, KVDl = local.dim, local.kv_dim
            if _local_width(lp.wq) == Dl + 2 * KVDl:
                qkv = mm(h, lp.wq)
                q, k, v = (qkv[..., :Dl], qkv[..., Dl:Dl + KVDl],
                           qkv[..., Dl + KVDl:])
            else:
                q, k, v = mm(h, lp.wq), mm(h, lp.wk), mm(h, lp.wv)
            q = q.reshape(B, local.n_heads, local.head_dim)
            k = k.reshape(B, local.n_kv_heads, local.head_dim)
            v = v.reshape(B, local.n_kv_heads, local.head_dim)
            q = apply_rope(q, cos, sin)
            k = apply_rope(k, cos, sin)
            cache_l = _write_decode(cache_l, k, v, pos, local)
            att = _attend_decode(cache_l, q, pos, local, prec, attn)
            if overlap and isinstance(lp.wo, jax.Array):
                # ring-overlapped reduce-scatter interleaved with the matmul
                x = x + collective_matmul_rowsharded(
                    att, lp.wo, MODEL_AXIS, tp, precision=prec)
            else:
                # row-sharded wo: partial sum -> ONE psum (collective #1)
                x = x + jax.lax.psum(mm(att, lp.wo), MODEL_AXIS)
            h = rmsnorm(x, lp.rms_ffn)
            Hl = local.hidden_dim
            if _local_width(lp.w1) == 2 * Hl:  # fused [w1_i | w3_i]
                gu = mm(h, lp.w1)
                gate, up = gu[..., :Hl], gu[..., Hl:]
            else:
                gate, up = mm(h, lp.w1), mm(h, lp.w3)
            hidden = jax.nn.silu(gate) * up
            if overlap and isinstance(lp.w2, jax.Array):
                x = x + collective_matmul_rowsharded(
                    hidden, lp.w2, MODEL_AXIS, tp, precision=prec)
            else:
                # row-sharded w2: partial sum -> ONE psum (collective #2)
                x = x + jax.lax.psum(mm(hidden, lp.w2), MODEL_AXIS)
            return x, cache_l

        x, new_cache = jax.lax.scan(layer_step, x, (params.layers, cache))
        x = rmsnorm(x, params.rms_final)
        logits_local = mm(x, params.wcls)  # [B, V/tp], stays sharded
        return logits_local.astype(jnp.float32), new_cache

    cspec = cache_pspec(cache)
    out = jax.shard_map(
        step,
        mesh=mesh,
        in_specs=(params_pspecs(params), cspec, P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=(P(DATA_AXIS, MODEL_AXIS), cspec),
        check_vma=False,
    )(params, cache, tokens, pos)
    return out
