"""Pipeline parallelism: layer stages across device groups (SURVEY §2.4 PP).

The reference's layer loop (llama2.ts:215) becomes contiguous layer *stages*
placed on different devices/hosts — the 70B-across-hosts configuration where
tensor parallelism alone runs out of ICI (each stage can still be TP'd over
its own submesh; v1 places one stage per device).

Host-driven schedule: JAX's async dispatch pipelines the stages naturally —
submitting microbatch j+1 to stage 0 does not wait for microbatch j to clear
stage n-1, so prefill microbatches overlap across stages (1F inference
schedule; no bubbles beyond fill/drain).

Stage 0 owns the embedding; the last stage owns the final norm + classifier;
every stage owns the KV cache slice for its own layers.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from tpu_llama.config import ModelConfig
from tpu_llama.models.llama import (
    KVCache,
    LayerParams,
    LlamaParams,
    apply_rope,
    make_kv_cache,
    matmul_any,
    rmsnorm,
)


def _slice_layers(lp: LayerParams, lo: int, hi: int) -> LayerParams:
    return jax.tree.map(lambda x: x[lo:hi], lp)


@dataclasses.dataclass
class StageSpec:
    first: bool
    last: bool
    n_layers: int


def split_stages(params: LlamaParams, n_stages: int):
    """Split stacked params into per-stage LlamaParams-like pytrees."""
    L = params.layers.rms_att.shape[0]
    bounds = np.linspace(0, L, n_stages + 1).astype(int)
    stub = jnp.zeros((1, 1), jnp.float32)  # placeholder for unused tensors
    stages = []
    for i in range(n_stages):
        lo, hi = int(bounds[i]), int(bounds[i + 1])
        stages.append((
            StageSpec(first=(i == 0), last=(i == n_stages - 1),
                      n_layers=hi - lo),
            LlamaParams(
                # only stage 0 embeds; only the last stage classifies —
                # other stages carry stubs (works for quantized wcls too)
                tok_emb=params.tok_emb if i == 0 else stub,
                layers=_slice_layers(params.layers, lo, hi),
                rms_final=params.rms_final,
                wcls=params.wcls if i == n_stages - 1 else stub,
                rope_cos=params.rope_cos,
                rope_sin=params.rope_sin,
            ),
        ))
    return stages


@partial(jax.jit, static_argnames=("config", "first", "last", "precision",
                                   "attn", "fused"), donate_argnums=(1,))
def _stage_decode(
    params: LlamaParams,
    cache,  # this stage's KV cache (n_layers_stage deep)
    x_or_tokens: jax.Array,  # [B] int32 if first else [B, D] activations
    pos: jax.Array,
    config: ModelConfig,
    first: bool,
    last: bool,
    precision: str = "default",
    attn: str = "xla",  # "flash" | "flash_dma" | "xla"
    fused: bool = False,  # fused W8A8 two-launch path (dense INT8 cache)
):
    """One PP stage's decode step, running the SAME perf stack as the
    single-chip engine (VERDICT r2 #4): deferred-flush flash kernels over
    int8/fp stacked caches (models.llama.decode_stack), or the fused
    one-linear-launch-per-layer path (fused_decode_stack) when the stage
    params carry fused W8A8 layouts.  "xla" stays as the debug path."""
    from tpu_llama.models.llama import decode_stack, fused_decode_stack

    prec = jax.lax.Precision(precision) if isinstance(precision, str) else precision
    x = params.tok_emb[x_or_tokens] if first else x_or_tokens
    cos = params.rope_cos[pos]
    sin = params.rope_sin[pos]
    if fused:
        x, new_cache = fused_decode_stack(
            params.layers, cache, x, pos, cos, sin, config,
            attn if attn in ("flash", "flash_dma") else "flash", 1)
        x = x.astype(jnp.float32)
    else:
        x, new_cache = decode_stack(params.layers, cache, x, pos, cos, sin,
                                    config, prec, attn, 1)
    if last:
        x = rmsnorm(x, params.rms_final)
        out = matmul_any(x, params.wcls, prec).astype(jnp.float32)
    else:
        out = x
    return out, new_cache


@partial(jax.jit, static_argnames=("config", "first", "last", "precision",
                                   "micro_offset", "attn"),
         donate_argnums=(1,))
def _stage_prefill(
    params: LlamaParams,
    cache,  # stage cache, full batch rows (KVCache or QuantKVCache)
    x_or_tokens: jax.Array,  # [mb, T] ids if first else [mb, T, D]
    lengths: jax.Array,  # [mb]
    config: ModelConfig,
    first: bool,
    last: bool,
    precision: str = "default",
    micro_offset: int = 0,
    attn: str = "xla",  # "flash" | "xla"
):
    """One PP stage's prefill of a microbatch.

    The microbatch's K/V accumulate in a COMPACT [Ls, mb, KVH, T, hd]
    block (scan ys) and land in the stage cache with ONE aliased Pallas
    slot-scatter — the previous per-layer ``cache.at[rows].set`` was an
    XLA full-batch-operand scatter per layer per microbatch, the exact
    pattern the decode side banned (VERDICT r2 weak #8).  Supports int8
    stage caches and the flash prefill kernel (same stack as single-chip).
    """
    from tpu_llama.models.llama import QuantKVCache, _attention_prefill
    from tpu_llama.ops.attention import (
        flash_prefill_attention,
        kv_cache_scatter_slots,
        quantize_kv,
    )

    prec = jax.lax.Precision(precision) if isinstance(precision, str) else precision
    x = params.tok_emb[x_or_tokens] if first else x_or_tokens
    mb, T = x.shape[0], x.shape[1]
    S = cache.seq_len
    quant = isinstance(cache, QuantKVCache)
    q_pos = jnp.broadcast_to(jnp.arange(T)[None, :], (mb, T))
    write_pos = jnp.clip(q_pos, 0, S - 1)
    cos = params.rope_cos[write_pos]
    sin = params.rope_sin[write_pos]
    rows = micro_offset + jnp.arange(mb)
    start0 = jnp.zeros((mb,), jnp.int32)

    def mm(a, w):
        return matmul_any(a, w, prec)

    from tpu_llama.models.llama import _project_gate_up, _project_qkv

    def layer_step(x, lp):
        h = rmsnorm(x, lp.rms_att)
        q, k, v = _project_qkv(h, lp, config, mm)  # fused-layout aware
        q = q.reshape(mb, T, config.n_heads, config.head_dim)
        k = k.reshape(mb, T, config.n_kv_heads, config.head_dim)
        v = v.reshape(mb, T, config.n_kv_heads, config.head_dim)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        kt = k.transpose(0, 2, 1, 3)  # [mb, KVH, T, hd]
        vt = v.transpose(0, 2, 1, 3)
        if quant:
            kq, ks = quantize_kv(kt)
            vq, vs = quantize_kv(vt)
            if attn == "flash":
                att = flash_prefill_attention(
                    q, kq, vq, start0, ks, vs, max_keys=T).reshape(
                        mb, T, config.dim).astype(x.dtype)
            else:
                kf = kq.astype(jnp.float32) * ks[..., None]
                vf = vq.astype(jnp.float32) * vs[..., None]
                att = _attention_prefill(q, kf, vf, q_pos, config, prec)
            small = (kq, vq, ks, vs)
        else:
            kc = kt.astype(cache.k.dtype)
            vc = vt.astype(cache.v.dtype)
            if attn == "flash":
                att = flash_prefill_attention(
                    q, kc, vc, start0, max_keys=T).reshape(
                        mb, T, config.dim).astype(x.dtype)
            else:
                att = _attention_prefill(q, kc, vc, q_pos, config, prec)
            small = (kc, vc)
        x = x + mm(att, lp.wo)
        h = rmsnorm(x, lp.rms_ffn)
        gate, up = _project_gate_up(h, lp, config, mm)
        x = x + mm(jax.nn.silu(gate) * up, lp.w2)
        return x, small

    x, small = jax.lax.scan(layer_step, x, params.layers)
    use_kernel = T % 128 == 0 and T <= S
    if quant:
        kq, vq, ks, vs = small  # each stacked [Ls, mb, ...]
        if use_kernel:
            ck, cv, cks, cvs = kv_cache_scatter_slots(
                kq, vq, rows, cache.k, cache.v, ks, vs, cache.ks, cache.vs)
        else:
            ck = cache.k.at[:, rows, :, :T].set(kq)
            cv = cache.v.at[:, rows, :, :T].set(vq)
            cks = cache.ks.at[:, rows, :, :T].set(ks)
            cvs = cache.vs.at[:, rows, :, :T].set(vs)
        new_cache = QuantKVCache(k=ck, v=cv, ks=cks, vs=cvs)
    else:
        kc, vc = small
        if use_kernel:
            ck, cv = kv_cache_scatter_slots(kc, vc, rows, cache.k, cache.v)
        else:
            ck = cache.k.at[:, rows, :, :T].set(kc)
            cv = cache.v.at[:, rows, :, :T].set(vc)
        new_cache = KVCache(k=ck, v=cv)
    if last:
        # classifier only at each row's final valid position: [mb, V] leaves
        # the device instead of [mb, T, V] (32k*T floats/microbatch, VERDICT
        # r1 weak #5)
        x = jnp.take_along_axis(
            x, jnp.clip(lengths - 1, 0, T - 1)[:, None, None], axis=1)[:, 0]
        x = rmsnorm(x, params.rms_final)
        out = matmul_any(x, params.wcls, prec).astype(jnp.float32)
    else:
        out = x
    return out, new_cache


class PipelineRunner:
    """Host-orchestrated inference pipeline over explicit device placements.

    ``tp > 1`` composes PP x TP: each stage owns a ``tp``-device submesh
    (axes ``('data', 'model')`` with data=1); its layer weights and KV-cache
    heads shard over ``model`` per parallel/sharding.py and GSPMD inserts
    the per-stage collectives.  Activations crossing stage boundaries are
    replicated within the receiving submesh — the 70B-across-hosts layout
    (SURVEY §2.4: "each stage can still be TP'd over its own submesh")."""

    def __init__(self, params: LlamaParams, config: ModelConfig,
                 n_stages: int, batch: int, devices=None,
                 kv_dtype="float32", precision: str = "default",
                 seq_len: int | None = None, tp: int = 1,
                 attn: str = "auto", fused: str | bool = "auto"):
        devices = devices or jax.devices()[:n_stages * tp]
        assert len(devices) >= n_stages * tp, (len(devices), n_stages, tp)
        self.config = config
        self.precision = precision
        if attn == "auto":
            # same policy as forward_decode: flash kernels when the cache
            # is int8 or we're on real TPU; einsum for CPU fp tests
            attn = ("flash" if (kv_dtype == "int8"
                                or jax.default_backend() == "tpu")
                    else "xla")
        self.attn = attn
        self.stages = []
        if fused == "auto":
            from tpu_llama.models.llama import _fused_path_ok

            fused = (tp == 1 and kv_dtype == "int8"
                     and attn in ("flash", "flash_dma")
                     and _fused_path_ok(params, config))
        self.fused = bool(fused)
        for i, (spec, sparams) in enumerate(split_stages(params, n_stages)):
            scfg = dataclasses.replace(config, n_layers=spec.n_layers)
            cache = make_kv_cache(scfg, batch, kv_dtype=kv_dtype,
                                  seq_len=seq_len)
            if tp > 1:
                from jax.sharding import Mesh, NamedSharding
                from jax.sharding import PartitionSpec as P

                from tpu_llama.parallel.mesh import DATA_AXIS, MODEL_AXIS
                from tpu_llama.parallel.sharding import (
                    shard_cache,
                    shard_params,
                )

                group = np.array(devices[i * tp:(i + 1) * tp]).reshape(1, tp)
                mesh = Mesh(group, (DATA_AXIS, MODEL_AXIS))
                sparams = shard_params(sparams, mesh)
                cache = shard_cache(cache, mesh)
                put = NamedSharding(mesh, P())  # replicated within the stage
            else:
                sparams = jax.device_put(sparams, devices[i])
                cache = jax.device_put(cache, devices[i])
                put = devices[i]
            self.stages.append({"spec": spec, "params": sparams,
                                "cache": cache, "device": put, "config": scfg})

    def decode(self, tokens: np.ndarray, pos: np.ndarray) -> np.ndarray:
        """One decode step through all stages. [B] -> logits [B, V]."""
        x = jnp.asarray(tokens, jnp.int32)
        posd = jnp.asarray(pos, jnp.int32)
        for st in self.stages:
            x = jax.device_put(x, st["device"])
            p = jax.device_put(posd, st["device"])
            x, st["cache"] = _stage_decode(
                st["params"], st["cache"], x, p, st["config"],
                st["spec"].first, st["spec"].last, self.precision,
                attn=self.attn, fused=self.fused)
        return np.asarray(x)

    def prefill(self, tokens: np.ndarray, lengths: np.ndarray,
                n_micro: int = 1) -> np.ndarray:
        """Pipelined prefill: the batch splits into ``n_micro`` microbatches;
        JAX async dispatch overlaps microbatch j on stage i with j-1 on
        stage i+1 (fill/drain bubbles only).  Returns last-position logits
        [B, V]."""
        B, T = tokens.shape
        assert B % n_micro == 0
        mb = B // n_micro
        pending = []
        for j in range(n_micro):
            sl = slice(j * mb, (j + 1) * mb)
            x = jnp.asarray(tokens[sl], jnp.int32)
            ln = jnp.asarray(lengths[sl], jnp.int32)
            for st in self.stages:
                xd = jax.device_put(x, st["device"])
                lnd = jax.device_put(ln, st["device"])
                xd, st["cache"] = _stage_prefill(
                    st["params"], st["cache"], xd, lnd, st["config"],
                    st["spec"].first, st["spec"].last, self.precision,
                    micro_offset=j * mb,
                    attn="flash" if self.attn != "xla" else "xla")
                x = xd  # flows to next stage; dispatch is async
            pending.append(x)
        # last stage already reduced to last-position logits [mb, V]
        return np.concatenate([np.asarray(x) for x in pending], axis=0)
