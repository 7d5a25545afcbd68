"""Batched, jitted, shardable Llama-2 forward pass — the TPU-native core.

This is NOT a translation of the reference's scalar loop (llama2.ts:205-303).
The reference's formulation — one token, one position, jagged per-layer
``Float32Array[]``, per-head Python-style loops — becomes:

* weights as stacked ``[n_layers, ...]`` arrays in ``(in, out)`` orientation
  so every projection is ``x @ W`` on the MXU,
* one ``jax.lax.scan`` over layers inside a single jitted function,
* a batched head-major ``[L, B, KVH, S, hd]`` KV cache updated functionally (donated by
  the caller for in-place XLA buffers),
* attention as masked batched einsums (a Pallas flash kernel slots in via
  ``tpu_llama.ops``),
* GQA-native shapes (``n_kv_heads`` real; v0 checkpoints degenerate to MHA).

Numerical contract: computations are f32 with ``precision=HIGHEST`` in compat
mode, eps placement identical to the reference (1e-5 inside the rsqrt,
llama2.ts:176), RoPE driven by the checkpoint's precomputed tables
(llama2.ts:125-126, 224-235).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from tpu_llama.config import ModelConfig
from tpu_llama.io.checkpoint import RawWeights
from tpu_llama.ops.attention import (
    flash_decode_attention,
    flash_prefill_attention,
    quantize_kv,
)
from tpu_llama.ops.matmul import q8_matmul, w8a8_matmul
from tpu_llama.ops.quant import (
    ChannelQuantTensor,
    QuantTensor,
    pick_group_size,
    quantize_channel,
    quantize_q8,
)


def _dataclass_pytree(cls):
    fields = [f.name for f in dataclasses.fields(cls)]
    return jax.tree_util.register_dataclass(cls, data_fields=fields, meta_fields=[])


@_dataclass_pytree
@dataclasses.dataclass
class LayerParams:
    """Per-layer weights, stacked on axis 0 over layers, (in, out) layout."""

    rms_att: jax.Array  # [L, D]
    wq: jax.Array  # [L, D, D]
    wk: jax.Array  # [L, D, KVD]
    wv: jax.Array  # [L, D, KVD]
    wo: jax.Array  # [L, D, D]
    rms_ffn: jax.Array  # [L, D]
    w1: jax.Array  # [L, D, H]   (gate)
    w2: jax.Array  # [L, H, D]   (down)
    w3: jax.Array  # [L, D, H]   (up)


@_dataclass_pytree
@dataclasses.dataclass
class LlamaParams:
    tok_emb: jax.Array  # [V, D]
    layers: LayerParams
    rms_final: jax.Array  # [D]
    wcls: jax.Array  # [D, V]
    rope_cos: jax.Array  # [S, hd/2] — checkpoint's freq_cis_real
    rope_sin: jax.Array  # [S, hd/2] — checkpoint's freq_cis_imag


@_dataclass_pytree
@dataclasses.dataclass
class KVCache:
    """Dense KV cache, **head-major**: [L, B, KVH, S, hd].

    Generalizes the reference's fp32 ``key_cache/value_cache``
    (llama2.ts:160-161) to batched + GQA + arbitrary dtype.  Head-major
    layout keeps each (batch, head) slice a contiguous [S, hd] block — the
    shape the flash-decode Pallas kernel streams through the MXU — and puts
    the TP-sharded axis (heads) ahead of the sequence axis.
    """

    k: jax.Array
    v: jax.Array

    @classmethod
    def create(
        cls, config: ModelConfig, batch: int, dtype=jnp.float32, seq_len: int | None = None
    ) -> "KVCache":
        S = seq_len or config.seq_len
        shape = (config.n_layers, batch, config.n_kv_heads, S, config.head_dim)
        return cls(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype))

    @property
    def batch(self) -> int:
        return self.k.shape[1]

    @property
    def seq_len(self) -> int:
        return self.k.shape[3]


@_dataclass_pytree
@dataclasses.dataclass
class QuantKVCache:
    """INT8 KV cache: values [L, B, KVH, S, hd] + per-(token, head) scales
    [L, B, KVH, S] (symmetric absmax over hd).  Halves (vs bf16) or quarters
    (vs f32) the HBM traffic that bounds decode; dequant happens inside the
    flash-attention kernel via score/probability column scaling
    (tpu_llama.ops.attention)."""

    k: jax.Array  # int8
    v: jax.Array  # int8
    ks: jax.Array  # f32 [L, B, KVH, S]
    vs: jax.Array  # f32

    @classmethod
    def create(
        cls, config: ModelConfig, batch: int, seq_len: int | None = None, dtype=None
    ) -> "QuantKVCache":
        S = seq_len or config.seq_len
        shape = (config.n_layers, batch, config.n_kv_heads, S, config.head_dim)
        sshape = shape[:-1]
        return cls(
            k=jnp.zeros(shape, jnp.int8), v=jnp.zeros(shape, jnp.int8),
            ks=jnp.zeros(sshape, jnp.float32), vs=jnp.zeros(sshape, jnp.float32),
        )

    @property
    def batch(self) -> int:
        return self.k.shape[1]

    @property
    def seq_len(self) -> int:
        return self.k.shape[3]


@_dataclass_pytree
@dataclasses.dataclass
class PagedKVCache:
    """INT8 KV in a shared page pool + per-slot page table (VERDICT r1 #1).

    The dense caches allocate ``batch x seq_len`` up front — physically
    impossible for 7B at batch 64 (dense int8 KV at S=2048 is ~17 GB).  Here
    ``k``/``v`` are [L, P, KVH, page_size, hd] pools whose pages are handed
    out on demand (runtime.paged.PagePool), and ``page_table`` [B, MP] maps
    each slot's context block j to a pool page.  Memory scales with tokens in
    flight; attention DMA scales with each slot's context (the paged flash
    kernel clamps its page walk at ``pos``).  Generalizes llama2.ts:160-161.
    """

    k: jax.Array  # int8 [L, P, KVH, ps, hd]
    v: jax.Array
    ks: jax.Array  # f32 [L, P, KVH, ps]
    vs: jax.Array
    page_table: jax.Array  # int32 [B, MP]

    @classmethod
    def create(cls, config: ModelConfig, batch: int, num_pages: int,
               page_size: int = 512, seq_len: int | None = None
               ) -> "PagedKVCache":
        S = seq_len or config.seq_len
        mp = -(-S // page_size)
        shape = (config.n_layers, num_pages, config.n_kv_heads, page_size,
                 config.head_dim)
        return cls(
            k=jnp.zeros(shape, jnp.int8), v=jnp.zeros(shape, jnp.int8),
            ks=jnp.zeros(shape[:-1], jnp.float32),
            vs=jnp.zeros(shape[:-1], jnp.float32),
            page_table=jnp.zeros((batch, mp), jnp.int32),
        )

    @property
    def batch(self) -> int:
        return self.page_table.shape[0]

    @property
    def page_size(self) -> int:
        return self.k.shape[3]

    @property
    def num_pages(self) -> int:
        return self.k.shape[1]

    @property
    def seq_len(self) -> int:
        return self.page_table.shape[1] * self.page_size


def make_kv_cache(config: ModelConfig, batch: int, kv_dtype="float32",
                  seq_len: int | None = None, paged: bool = False,
                  num_pages: int | None = None, page_size: int = 512):
    """kv_dtype: 'float32' | 'bfloat16' | 'int8'; paged requires int8."""
    if paged:
        if kv_dtype not in ("int8", jnp.int8):
            raise ValueError("paged KV cache requires kv_dtype='int8'")
        S = seq_len or config.seq_len
        np_ = num_pages or batch * (-(-S // page_size))  # dense-equivalent
        return PagedKVCache.create(config, batch, np_, page_size=page_size,
                                   seq_len=S)
    if kv_dtype in ("int8", jnp.int8):
        return QuantKVCache.create(config, batch, seq_len=seq_len)
    return KVCache.create(config, batch, dtype=jnp.dtype(kv_dtype), seq_len=seq_len)


def params_from_raw(raw: RawWeights, dtype=jnp.float32, device_put=True) -> LlamaParams:
    """Convert on-disk (out, in) fp32 tensors to the stacked (in, out) layout."""
    c = raw.config

    def t(x, transpose_axes=None):
        arr = np.asarray(x)
        if transpose_axes is not None:
            arr = arr.transpose(transpose_axes)
        out = jnp.asarray(arr, dtype=dtype)
        return out

    layers = LayerParams(
        rms_att=t(raw.rms_att),
        wq=t(raw.wq, (0, 2, 1)),
        wk=t(raw.wk, (0, 2, 1)),
        wv=t(raw.wv, (0, 2, 1)),
        wo=t(raw.wo, (0, 2, 1)),
        rms_ffn=t(raw.rms_ffn),
        w1=t(raw.w1, (0, 2, 1)),
        w2=t(raw.w2, (0, 2, 1)),
        w3=t(raw.w3, (0, 2, 1)),
    )
    return LlamaParams(
        tok_emb=t(raw.token_embedding),
        layers=layers,
        rms_final=t(raw.rms_final),
        wcls=t(raw.wcls, (1, 0)),
        # RoPE tables stay f32 regardless of weight dtype (tiny, precision-critical)
        rope_cos=jnp.asarray(np.asarray(raw.freq_cis_real), jnp.float32),
        rope_sin=jnp.asarray(np.asarray(raw.freq_cis_imag), jnp.float32),
    )


def random_params(
    config: ModelConfig, dtype=jnp.bfloat16, seed: int = 0, scale: float = 0.02
) -> LlamaParams:
    """Device-side random parameters (for benchmarks / synthetic models).

    Generates directly on the default device in the target dtype — no host
    roundtrip, so a 7B model materializes in seconds within HBM limits.
    """
    c = config
    keys = iter(jax.random.split(jax.random.PRNGKey(seed), 16))

    def t(*shape):
        return jax.random.normal(next(keys), shape, dtype=dtype) * scale

    hd2 = c.head_dim // 2
    inv_freq = 1.0 / (
        10000.0 ** (np.arange(0, hd2, dtype=np.float64) * 2 / c.head_dim)
    )
    angles = np.arange(c.seq_len, dtype=np.float64)[:, None] * inv_freq[None, :]
    L, D, H, KVD, V = c.n_layers, c.dim, c.hidden_dim, c.kv_dim, c.vocab_size
    return LlamaParams(
        tok_emb=t(V, D),
        layers=LayerParams(
            rms_att=jnp.ones((L, D), dtype),
            wq=t(L, D, D),
            wk=t(L, D, KVD),
            wv=t(L, D, KVD),
            wo=t(L, D, D),
            rms_ffn=jnp.ones((L, D), dtype),
            w1=t(L, D, H),
            w2=t(L, H, D),
            w3=t(L, D, H),
        ),
        rms_final=jnp.ones((D,), dtype),
        wcls=t(D, V),
        rope_cos=jnp.asarray(np.cos(angles), jnp.float32),
        rope_sin=jnp.asarray(np.sin(angles), jnp.float32),
    )


def random_quant_params(
    config: ModelConfig, mode: str = "w8a8", seed: int = 0,
    norm_dtype=jnp.bfloat16, fuse: bool = False,
) -> LlamaParams:
    """Random parameters generated DIRECTLY in INT8 on device — benchmarking
    models whose floating-point form would not fit HBM (13B+ on one chip)."""
    c = config
    key = jax.random.PRNGKey(seed)
    counter = [0]

    @partial(jax.jit, static_argnames=("shape",))
    def rand_i8(k, shape):
        # jax.random.bits(uint8) keeps the generation transient at 1 B/elem
        # (randint materializes uint32 bits — 4x); jitted so the conversion
        # chain fuses instead of materializing int16 intermediates eagerly
        bits = jax.random.bits(k, shape, dtype=jnp.uint8)
        return (bits.astype(jnp.int16) - 128).clip(-127, 127).astype(jnp.int8)

    def qt(in_f, out_f, lead=()):
        counter[0] += 1
        k = jax.random.fold_in(key, counter[0])
        if mode == "w4a8":
            # random PACKED bytes: each holds two int4 columns; the -8
            # nibble (outside quantize_channel4's ±7 range) is harmless
            # for synthetic benching weights
            assert out_f % 256 == 0, out_f
            q = rand_i8(k, (*lead, in_f, out_f // 2))
            s = jnp.full((*lead, out_f), 3.6e-3, jnp.float32)
            return ChannelQuantTensor(q=q, s=s, logical_in=in_f,
                                      logical_out=out_f, packed4=True)
        if mode == "w8a8":
            q = rand_i8(k, (*lead, in_f, out_f))
            s = jnp.full((*lead, out_f), 2e-4, jnp.float32)
            return ChannelQuantTensor(q=q, s=s, logical_in=in_f,
                                      logical_out=out_f)
        g = pick_group_size(in_f)
        from tpu_llama.ops.quant import kernel_alignment

        align = kernel_alignment(g)
        pin = -(-in_f // align) * align
        pout = -(-out_f // 128) * 128
        q = rand_i8(k, (*lead, pin, pout))
        s = jnp.full((*lead, pin // g, pout), 2e-4, jnp.float32)
        return QuantTensor(q=q, s=s, logical_in=in_f, logical_out=out_f)

    L, D, H, KVD, V = c.n_layers, c.dim, c.hidden_dim, c.kv_dim, c.vocab_size
    hd2 = c.head_dim // 2
    inv_freq = 1.0 / (10000.0 ** (np.arange(0, hd2, dtype=np.float64) * 2 / c.head_dim))
    angles = np.arange(c.seq_len, dtype=np.float64)[:, None] * inv_freq[None, :]
    if fuse:  # fused wqkv / w13 layouts (see fuse_projections)
        stub = jnp.zeros((L, 1, 1), norm_dtype)
        wq, wk, wv = qt(D, D + 2 * KVD, (L,)), stub, stub
        w1, w3 = qt(D, 2 * H, (L,)), stub
    else:
        wq, wk, wv = qt(D, D, (L,)), qt(D, KVD, (L,)), qt(D, KVD, (L,))
        w1, w3 = qt(D, H, (L,)), qt(D, H, (L,))
    return LlamaParams(
        tok_emb=jax.random.normal(jax.random.fold_in(key, 999), (V, D),
                                  norm_dtype) * 0.02,
        layers=LayerParams(
            rms_att=jnp.ones((L, D), norm_dtype),
            wq=wq, wk=wk, wv=wv,
            wo=qt(D, D, (L,)),
            rms_ffn=jnp.ones((L, D), norm_dtype),
            w1=w1, w2=qt(H, D, (L,)), w3=w3,
        ),
        rms_final=jnp.ones((D,), norm_dtype),
        wcls=qt(D, V),
        rope_cos=jnp.asarray(np.cos(angles), jnp.float32),
        rope_sin=jnp.asarray(np.sin(angles), jnp.float32),
    )


def extend_rope(params: LlamaParams, new_len: int) -> LlamaParams:
    """Extend the RoPE tables beyond the checkpoint's seq_len.

    The checkpoint tables (llama2.ts:125-126) are the bit-exact source up to
    seq_len; positions beyond use the same llama2.c formula
    (theta = 10000^(-2i/hd)).  Required for sequence-parallel caches larger
    than the checkpoint horizon (parallel/seqpar.py, SURVEY §5.7)."""
    old = np.asarray(params.rope_cos)
    cur, hd2 = old.shape
    if new_len <= cur:
        return params
    inv_freq = 1.0 / (10000.0 ** (np.arange(0, hd2, dtype=np.float64) / hd2))
    angles = np.arange(cur, new_len, dtype=np.float64)[:, None] * inv_freq[None, :]
    return dataclasses.replace(
        params,
        rope_cos=jnp.concatenate(
            [params.rope_cos, jnp.asarray(np.cos(angles), jnp.float32)]),
        rope_sin=jnp.concatenate(
            [params.rope_sin, jnp.asarray(np.sin(angles), jnp.float32)]),
    )


def quantize_params(
    params: LlamaParams, group_size: int | None = None,
    quantize_wcls: bool = True, mode: str = "q8_0",
) -> LlamaParams:
    """INT8 conversion of the seven matmul families (+ classifier).

    mode="q8_0": group-wise weight-only (llama2.c-compatible accuracy;
    dequant in VMEM).  mode="w8a8": per-channel weights + dynamic per-token
    activation quant on the int8 MXU (the throughput path).  mode="w4a8":
    per-channel INT4 weights stored PACKED (two columns/byte).  CAUTION —
    measured r5 (W4A8_PROBE.json r5_runtime_reinvestigation): on the
    current TPU toolchain this is a CHECKPOINT/ARTIFACT density format,
    not a runtime mode — no in-kernel unpack compiles and XLA
    materializes byte-expanded copies of every weight at program scale
    (9.5x slower decode AND more HBM than int8).  Use w8a8 at runtime;
    w4a8 halves on-disk artifacts (io/internal.py round-trips packed4).
    Norm weights, embeddings, and RoPE tables stay floating point."""

    if mode == "w8a8":
        def qz(w):
            return quantize_channel(w)
    elif mode == "w4a8":
        from tpu_llama.ops.quant import quantize_channel4

        def qz(w):
            return quantize_channel4(w)
    elif mode == "q8_0":
        def qz(w):
            return quantize_q8(w, group_size)
    else:
        raise ValueError(f"unknown quant mode {mode!r}")

    def q(w):
        # fuse_projections stubs ([L, 1, 1] placeholders for wk/wv/w3) stay
        # dense: quantizing them only adds padded QuantTensors that trip the
        # explicit-TP path's padding-free check (parallel/tp.py) and they
        # are never multiplied
        if w.ndim == 3 and w.shape[-1] == 1 and w.shape[-2] == 1:
            return w
        return qz(w)

    lp = params.layers
    return LlamaParams(
        tok_emb=params.tok_emb,
        layers=LayerParams(
            rms_att=lp.rms_att,
            wq=q(lp.wq), wk=q(lp.wk), wv=q(lp.wv), wo=q(lp.wo),
            rms_ffn=lp.rms_ffn,
            w1=q(lp.w1), w2=q(lp.w2), w3=q(lp.w3),
        ),
        rms_final=params.rms_final,
        wcls=q(params.wcls) if quantize_wcls else params.wcls,
        rope_cos=params.rope_cos,
        rope_sin=params.rope_sin,
    )


def fuse_projections(params: LlamaParams, tp: int = 1) -> LlamaParams:
    """Fuse per-layer [wq|wk|wv] -> one wqkv and [w1|w3] -> one w13 matmul.

    Decode at small batch is bounded by per-op latency, not FLOPs — fusing
    cuts the 7 projections per layer (SURVEY §3.3) to 4.  Fusion is detected
    by output width at trace time, so all forward paths work unchanged.
    Apply BEFORE quantize_params.

    ``tp > 1`` produces the SHARD-INTERLEAVED column order for the explicit
    tensor-parallel path (parallel/tp.py): columns are grouped per model
    shard as [q_i | k_i | v_i] so that column-sharding the fused axis over
    ``tp`` devices hands every shard its own local fused layout — the
    shard-local ``_project_qkv`` split stays a pair of static slices with
    zero communication.  A tp-interleaved tensor is NOT valid for the
    single-device / GSPMD forward paths (the global [:D] split would mix
    shards); feed it only to ``tp_forward_decode``.
    """
    lp = params.layers
    if not isinstance(lp.wq, jax.Array):
        raise ValueError("fuse_projections must run before quantization")
    L = lp.rms_att.shape[0]
    stub = jnp.zeros((L, 1, 1), lp.wq.dtype)

    def interleave(parts, widths):
        if tp == 1:
            return jnp.concatenate(parts, axis=-1)
        blocks = []
        for i in range(tp):
            for p, w in zip(parts, widths):
                assert w % tp == 0, (w, tp)
                blocks.append(p[..., i * (w // tp):(i + 1) * (w // tp)])
        return jnp.concatenate(blocks, axis=-1)

    D = lp.wq.shape[-1]
    KVD = lp.wk.shape[-1]
    H = lp.w1.shape[-1]
    return dataclasses.replace(
        params,
        layers=dataclasses.replace(
            lp,
            wq=interleave([lp.wq, lp.wk, lp.wv], [D, KVD, KVD]),
            wk=stub, wv=stub,
            w1=interleave([lp.w1, lp.w3], [H, H]),
            w3=stub,
        ),
    )


def _out_features(w) -> int:
    if isinstance(w, (QuantTensor, ChannelQuantTensor)):
        return w.logical_out
    return w.shape[-1]


def _project_qkv(h, lp, config: ModelConfig, mm):
    """q/k/v projections, transparently handling the fused wqkv layout."""
    D, KVD = config.dim, config.kv_dim
    if _out_features(lp.wq) == D + 2 * KVD:
        qkv = mm(h, lp.wq)
        return qkv[..., :D], qkv[..., D : D + KVD], qkv[..., D + KVD :]
    return mm(h, lp.wq), mm(h, lp.wk), mm(h, lp.wv)


def _project_gate_up(h, lp, config: ModelConfig, mm):
    H = config.hidden_dim
    if _out_features(lp.w1) == 2 * H:
        gu = mm(h, lp.w1)
        return gu[..., :H], gu[..., H:]
    return mm(h, lp.w1), mm(h, lp.w3)


# ---------------------------------------------------------------------------
# building blocks
# ---------------------------------------------------------------------------

_NEG_INF = jnp.float32(-1e30)


def matmul_any(a: jax.Array, w, precision) -> jax.Array:
    """x @ W dispatching on weight type: dense jax.Array, groupwise-INT8
    QuantTensor (fused dequant+matmul), or per-channel ChannelQuantTensor
    (full W8A8 on the int8 MXU)."""
    if isinstance(w, QuantTensor):
        return q8_matmul(a, w, out_dtype=a.dtype)
    if isinstance(w, ChannelQuantTensor):
        # Pallas kernel: ~23% slower per matmul than XLA's int8 dot on the
        # round-1 chip, but XLA's path inserts full-weight relayout copies
        # that OOM 7B/13B — the kernel is the memory-feasible default
        return w8a8_matmul(a, w, out_dtype=a.dtype)
    return jnp.dot(a, w, precision=precision)


def rmsnorm(x: jax.Array, weight: jax.Array) -> jax.Array:
    """RMS norm with the reference's eps placement: w * x / sqrt(1e-5 + mean(x²))
    (llama2.ts:172-179)."""
    x32 = x.astype(jnp.float32)
    ms = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    return (x32 * jax.lax.rsqrt(1e-5 + ms)).astype(x.dtype) * weight


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Rotate interleaved (even, odd) pairs.

    x: [..., n_heads, hd]; cos/sin: broadcastable to [..., hd/2].  Matches the
    reference's full-dim interleaved rotation (llama2.ts:224-235): pair
    (2j, 2j+1) of every head rotates by angle index j.
    """
    shape = x.shape
    dtype = x.dtype
    x = x.reshape(*shape[:-1], shape[-1] // 2, 2)
    x0, x1 = x[..., 0], x[..., 1]
    cos = cos[..., None, :]  # broadcast over heads axis
    sin = sin[..., None, :]
    r0 = x0 * cos - x1 * sin  # promotes to f32 (tables are f32)
    r1 = x0 * sin + x1 * cos
    return jnp.stack([r0, r1], axis=-1).reshape(shape).astype(dtype)


def _attention_decode(
    q: jax.Array,  # [B, NH, hd]
    k_cache: jax.Array,  # [B, KVH, S, hd]
    v_cache: jax.Array,  # [B, KVH, S, hd]
    pos: jax.Array,  # [B] current position (attends to cache[0..pos])
    config: ModelConfig,
    precision,
) -> jax.Array:
    B, S = k_cache.shape[0], k_cache.shape[2]
    hd, kvh, g = config.head_dim, config.n_kv_heads, config.group_size
    qg = q.reshape(B, kvh, g, hd)
    kf = k_cache.astype(jnp.float32)
    vf = v_cache.astype(jnp.float32)
    # scores [B, KVH, G, S]
    scores = jnp.einsum("bkgh,bksh->bkgs", qg.astype(jnp.float32), kf,
                        precision=precision) / jnp.sqrt(jnp.float32(hd))
    s_idx = jnp.arange(S)[None, None, None, :]
    mask = s_idx <= pos[:, None, None, None]
    scores = jnp.where(mask, scores, _NEG_INF)
    att = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bkgs,bksh->bkgh", att, vf, precision=precision)
    return out.reshape(B, config.dim).astype(q.dtype)


def _attention_prefill(
    q: jax.Array,  # [B, T, NH, hd]
    k_cache: jax.Array,  # [B, KVH, S, hd] (already containing this chunk)
    v_cache: jax.Array,
    q_pos: jax.Array,  # [B, T] absolute position of each query
    config: ModelConfig,
    precision,
) -> jax.Array:
    B, T = q.shape[0], q.shape[1]
    S = k_cache.shape[2]
    hd, kvh, g = config.head_dim, config.n_kv_heads, config.group_size
    qg = q.reshape(B, T, kvh, g, hd)
    kf = k_cache.astype(jnp.float32)
    vf = v_cache.astype(jnp.float32)
    scores = jnp.einsum("btkgh,bksh->bkgts", qg.astype(jnp.float32), kf,
                        precision=precision) / jnp.sqrt(jnp.float32(hd))
    s_idx = jnp.arange(S)[None, None, None, None, :]  # [1,1,1,1,S]
    mask = s_idx <= q_pos[:, None, None, :, None]  # causal vs absolute positions
    scores = jnp.where(mask, scores, _NEG_INF)
    att = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bkgts,bksh->btkgh", att, vf, precision=precision)
    return out.reshape(B, T, config.dim).astype(q.dtype)


# ---------------------------------------------------------------------------
# forward passes
# ---------------------------------------------------------------------------


def _write_decode(cache_l, k, v, pos, config: ModelConfig):
    """Write one decoded token's K/V into a per-layer cache slice.

    cache_l: KVCache or QuantKVCache with per-layer arrays [B, KVH, S, hd].
    k/v: [B, KVH, hd] fp.
    """
    B = k.shape[0]
    b_ix = jnp.arange(B)[:, None]
    h_ix = jnp.arange(config.n_kv_heads)[None, :]
    p_ix = pos[:, None]
    if isinstance(cache_l, QuantKVCache):
        kq, ks = quantize_kv(k)
        vq, vs = quantize_kv(v)
        return QuantKVCache(
            k=cache_l.k.at[b_ix, h_ix, p_ix].set(kq),
            v=cache_l.v.at[b_ix, h_ix, p_ix].set(vq),
            ks=cache_l.ks.at[b_ix, h_ix, p_ix].set(ks),
            vs=cache_l.vs.at[b_ix, h_ix, p_ix].set(vs),
        )
    return KVCache(
        k=cache_l.k.at[b_ix, h_ix, p_ix].set(k.astype(cache_l.k.dtype)),
        v=cache_l.v.at[b_ix, h_ix, p_ix].set(v.astype(cache_l.v.dtype)),
    )


def _attend_decode(cache_l, q, pos, config: ModelConfig, prec, attn: str):
    """Dispatch decode attention: flash Pallas kernel or XLA einsum."""
    B = q.shape[0]
    qg = q.reshape(B, config.n_kv_heads, config.group_size, config.head_dim)
    if isinstance(cache_l, QuantKVCache):
        if attn == "xla":
            # dequantize then einsum (XLA fuses the scale into the reads);
            # the flash path keeps dequant in-kernel
            kf = cache_l.k.astype(jnp.float32) * cache_l.ks[..., None]
            vf = cache_l.v.astype(jnp.float32) * cache_l.vs[..., None]
            return _attention_decode(q, kf, vf, pos, config, prec)
        out = flash_decode_attention(
            qg, cache_l.k, cache_l.v, pos, cache_l.ks, cache_l.vs
        )
        return out.reshape(B, config.dim).astype(q.dtype)
    if attn == "flash":
        out = flash_decode_attention(qg, cache_l.k, cache_l.v, pos)
        return out.reshape(B, config.dim).astype(q.dtype)
    return _attention_decode(q, cache_l.k, cache_l.v, pos, config, prec)


def _fused_path_ok(params: LlamaParams, config: ModelConfig) -> bool:
    """True when the one-Pallas-call-per-layer decode path applies: W8A8
    weights in the fused qkv/w13 layouts with 128-aligned dims (see
    ops/fused_layer.py — each Pallas launch costs ~75 us on this chip, so
    collapsing the four per-layer matmul calls into one is worth ~9 ms on
    the 7B b8 step)."""
    lp = params.layers
    D, KVD, H = config.dim, config.kv_dim, config.hidden_dim
    QO = D + 2 * KVD
    if not all(isinstance(w, ChannelQuantTensor)
               for w in (lp.wq, lp.wo, lp.w1, lp.w2)):
        return False
    if lp.wq.padded_out != QO or lp.w1.padded_out != 2 * H:
        return False  # requires fuse_projections layouts
    if any(w.padded_out != w.logical_out or w.q.shape[-2] != w.logical_in
           for w in (lp.wq, lp.wo, lp.w1, lp.w2)):
        return False  # padded quant dims — block maps assume exact shapes
    # W4 storage (packed4) rides the same kernels: the drivers unpack to
    # S4 stacked arrays in-jit and the kernels upcast blocks (_i8w)
    if D % 128 or H % 128 or QO % 128:
        return False
    from tpu_llama.ops.fused_layer import _pick_fused_blocks

    return _pick_fused_blocks(32, D, H, QO) is not None


def _mega2_path_ok(params, config: ModelConfig, cache, B: int) -> bool:
    """True when the trailing-attention one-launch kernel applies
    (ops/fused_step2.py): fused W8A8 layouts + dense INT8 stacked cache +
    128-aligned head_dim + a VMEM-feasible tiling whose phase-D block width
    tiles the q/k/v boundaries.

    TOOLCHAIN-FAULT HISTORY (keep re-probing every round): on the r4
    toolchain both in-kernel-attention kernels (mega and mega2) kernel-
    faulted the real chip at exactly B=2 with pos > 0 (bisect in
    b2_probe_r4*.log) and B==2 was hard-blocked here.  The r5 toolchain
    update RESOLVED it — `tools/b2_fault_probe.py mega2 2` green on both
    the cached r4 binary and a fresh r5 compile (r5_probe.log), so the
    fault was runtime-side, and the block is lifted.  If a future
    toolchain drift faults any batch again, re-add the block and record
    the probe log."""
    if not isinstance(cache, QuantKVCache) or isinstance(cache, PagedKVCache):
        return False
    if config.head_dim % 128 != 0:
        return False
    from tpu_llama.ops.fused_step2 import step2_plan

    Bp = max(32, -(-B // 32) * 32)
    S = cache.k.shape[-2]
    return step2_plan(
        Bp, config.dim, config.hidden_dim,
        config.dim + 2 * config.kv_dim, config.n_kv_heads,
        config.group_size, config.head_dim, S) is not None


def _forward_decode_mega2(params, cache, tokens, pos, config: ModelConfig,
                          unroll: int):
    """Decode step with ONE trailing-attention Pallas launch per layer
    (ops/fused_step2.py): launch ``l`` runs layer ``l``'s linear phases and
    layer ``l+1``'s attention cells, whose cache DMAs are issued from the
    first grid steps so they stream behind the weight phases.  Layer 0's
    attention (no preceding launch) runs in an XLA prologue through the
    standalone DMA kernel; the per-layer fresh K/V rows come back as scan
    ys and flush once per step, exactly like the other fused paths."""
    from tpu_llama.ops.attention import (
        flash_decode_attention_dma,
        kv_cache_flush_rows,
    )
    from tpu_llama.ops.fused_layer import w8a8_matmul_stacked
    from tpu_llama.ops.fused_step2 import (
        decode_dma_descs,
        fused_step2_layer,
        rope_tables,
        step2_plan,
    )
    from tpu_llama.ops.quant import quantize_activations

    lp = params.layers
    B = tokens.shape[0]
    D, KVD = config.dim, config.kv_dim
    L = lp.rms_att.shape[0]
    Bp = max(32, -(-B // 32) * 32)
    S = cache.k.shape[-2]
    cos = params.rope_cos[pos]  # [B, hd/2]
    sin = params.rope_sin[pos]

    # prologue: layer 0's qkv projection + attention in XLA
    x0 = params.tok_emb[tokens].astype(jnp.float32)
    if Bp != B:
        x0 = jnp.pad(x0, ((0, Bp - B), (0, 0)))
    h0 = rmsnorm(x0, lp.rms_att[0])
    xq0, sx0 = quantize_activations(h0)
    wqq, woq, w13q, w2q = (_stacked_q(lp.wq), _stacked_q(lp.wo),
                           _stacked_q(lp.w1), _stacked_q(lp.w2))
    qkv0 = w8a8_matmul_stacked(xq0, sx0, wqq, lp.wq.s, 0)
    qb = qkv0[:B]
    q0 = apply_rope(
        qb[:, :D].reshape(B, config.n_heads, config.head_dim), cos, sin)
    k0 = apply_rope(
        qb[:, D:D + KVD].reshape(B, config.n_kv_heads, config.head_dim),
        cos, sin)
    v0 = qb[:, D + KVD:].reshape(B, config.n_kv_heads, config.head_dim)
    qg0 = q0.reshape(B, config.n_kv_heads, config.group_size,
                     config.head_dim)
    kq0, ks0 = quantize_kv(k0)
    vq0, vs0 = quantize_kv(v0)
    att0 = flash_decode_attention_dma(
        qg0, cache.k, cache.v, pos, kq0, vq0,
        cache.ks, cache.vs, ks0, vs0, layer=jnp.int32(0))
    att0 = att0.reshape(B, D).astype(jnp.float32)
    if Bp != B:
        att0 = jnp.pad(att0, ((0, Bp - B), (0, 0)))
    attq0, satt0 = quantize_activations(att0)

    # the descriptor chain's TS must match the kernel's resolved plan
    # (TS=128 at the 7B shape under the 14 MB budget; only 128-multiples
    # or the full S are Mosaic-legal — see step2_plan)
    TS, _ = step2_plan(Bp, D, config.hidden_dim, D + 2 * KVD,
                       config.n_kv_heads, config.group_size,
                       config.head_dim, S)
    base, dcell, doff, total = decode_dma_descs(pos, B, S, TS)
    rc, rsa, rsb = rope_tables(cos, sin, Bp)
    layer_ix = jnp.arange(L, dtype=jnp.int32)

    def layer_step(carry, l):
        x, attq, satt = carry
        x_n, attq_n, satt_n, kqr, ksr, vqr, vsr = fused_step2_layer(
            x, attq, satt, cache.k, cache.v, cache.ks, cache.vs, pos,
            rc, rsa, rsb, base, dcell, doff, total,
            woq, lp.wo.s, w13q, lp.w1.s, w2q, lp.w2.s,
            wqq, lp.wq.s, lp.rms_ffn, lp.rms_att, l, L, config.n_heads,
            block_s=TS)
        return (x_n, attq_n, satt_n), (kqr, ksr, vqr, vsr)

    (xp, _, _), rows = jax.lax.scan(layer_step, (x0, attq0, satt0),
                                    layer_ix, unroll=unroll)
    kqs, kss, vqs, vss = rows  # launch l emits layer l+1's fresh rows
    full_kq = jnp.concatenate([kq0[None], kqs[:L - 1]])
    full_ks = jnp.concatenate([ks0[None], kss[:L - 1]])
    full_vq = jnp.concatenate([vq0[None], vqs[:L - 1]])
    full_vs = jnp.concatenate([vs0[None], vss[:L - 1]])
    ck, cv, cks, cvs = kv_cache_flush_rows(
        full_kq, full_vq, pos, cache.k, cache.v,
        full_ks, full_vs, cache.ks, cache.vs)
    new_cache = QuantKVCache(ck, cv, cks, cvs)

    x = rmsnorm(xp[:B], params.rms_final)
    logits = matmul_any(x, params.wcls, jax.lax.Precision("default"))
    return logits.astype(jnp.float32), new_cache


def _mega3_path_ok(params, config: ModelConfig, cache, B: int) -> bool:
    """True when the two-layers-per-launch pair kernel applies
    (ops/fused_step3.py): mega2's conditions + an even layer count + a
    VMEM-feasible pair tiling (the pair's seam scratches cost ~0.9 MB)."""
    if not isinstance(cache, QuantKVCache) or isinstance(cache, PagedKVCache):
        return False
    if config.head_dim % 128 != 0 or config.n_layers % 2 != 0:
        return False
    from tpu_llama.ops.fused_step3 import step3_plan

    Bp = max(32, -(-B // 32) * 32)
    S = cache.k.shape[-2]
    return step3_plan(
        Bp, config.dim, config.hidden_dim,
        config.dim + 2 * config.kv_dim, config.n_kv_heads,
        config.group_size, config.head_dim, S) is not None


def _forward_decode_mega3(params, cache, tokens, pos, config: ModelConfig,
                          unroll: int):
    """Decode step with ONE Pallas launch per LAYER PAIR
    (ops/fused_step3.py): launch i runs layers 2i and 2i+1's linear phases,
    layer 2i+1's attention (merged at the in-kernel seam), and layer 2i+2's
    attention cells.  Same prologue (layer 0's attention in XLA) and same
    one-flush-per-step row collection as mega2; the scan is L/2 long, so
    the ~75-80 us fixed launch cost is paid 16x instead of 32x at 7B."""
    from tpu_llama.ops.attention import (
        flash_decode_attention_dma,
        kv_cache_flush_rows,
    )
    from tpu_llama.ops.fused_layer import w8a8_matmul_stacked
    from tpu_llama.ops.fused_step3 import (
        decode_dma_descs,
        fused_step3_pair,
        rope_tables,
        step3_plan,
    )
    from tpu_llama.ops.quant import quantize_activations

    lp = params.layers
    B = tokens.shape[0]
    D, KVD = config.dim, config.kv_dim
    L = lp.rms_att.shape[0]
    Bp = max(32, -(-B // 32) * 32)
    S = cache.k.shape[-2]
    cos = params.rope_cos[pos]  # [B, hd/2]
    sin = params.rope_sin[pos]

    # prologue: layer 0's qkv projection + attention in XLA (as mega2)
    x0 = params.tok_emb[tokens].astype(jnp.float32)
    if Bp != B:
        x0 = jnp.pad(x0, ((0, Bp - B), (0, 0)))
    h0 = rmsnorm(x0, lp.rms_att[0])
    xq0, sx0 = quantize_activations(h0)
    wqq, woq, w13q, w2q = (_stacked_q(lp.wq), _stacked_q(lp.wo),
                           _stacked_q(lp.w1), _stacked_q(lp.w2))
    qkv0 = w8a8_matmul_stacked(xq0, sx0, wqq, lp.wq.s, 0)
    qb = qkv0[:B]
    q0 = apply_rope(
        qb[:, :D].reshape(B, config.n_heads, config.head_dim), cos, sin)
    k0 = apply_rope(
        qb[:, D:D + KVD].reshape(B, config.n_kv_heads, config.head_dim),
        cos, sin)
    v0 = qb[:, D + KVD:].reshape(B, config.n_kv_heads, config.head_dim)
    qg0 = q0.reshape(B, config.n_kv_heads, config.group_size,
                     config.head_dim)
    kq0, ks0 = quantize_kv(k0)
    vq0, vs0 = quantize_kv(v0)
    att0 = flash_decode_attention_dma(
        qg0, cache.k, cache.v, pos, kq0, vq0,
        cache.ks, cache.vs, ks0, vs0, layer=jnp.int32(0))
    att0 = att0.reshape(B, D).astype(jnp.float32)
    if Bp != B:
        att0 = jnp.pad(att0, ((0, Bp - B), (0, 0)))
    attq0, satt0 = quantize_activations(att0)

    TS, _ = step3_plan(Bp, D, config.hidden_dim, D + 2 * KVD,
                       config.n_kv_heads, config.group_size,
                       config.head_dim, S)
    base, dcell, doff, total = decode_dma_descs(pos, B, S, TS)
    rc, rsa, rsb = rope_tables(cos, sin, Bp)
    pair_ix = jnp.arange(0, L, 2, dtype=jnp.int32)

    def pair_step(carry, l0):
        x, attq, satt = carry
        x_n, attq_n, satt_n, rows = fused_step3_pair(
            x, attq, satt, cache.k, cache.v, cache.ks, cache.vs, pos,
            rc, rsa, rsb, base, dcell, doff, total,
            woq, lp.wo.s, w13q, lp.w1.s, w2q, lp.w2.s,
            wqq, lp.wq.s, lp.rms_ffn, lp.rms_att, l0, L, config.n_heads,
            block_s=TS)
        return (x_n, attq_n, satt_n), rows

    (xp, _, _), rows = jax.lax.scan(pair_step, (x0, attq0, satt0), pair_ix,
                                    unroll=unroll)
    # ys: [L/2, 2, B, ...] in layer order (1, 2), (3, 4), ... -> [L, B, ...]
    kqs, kss, vqs, vss = (r.reshape(L, *r.shape[2:]) for r in rows)
    full_kq = jnp.concatenate([kq0[None], kqs[:L - 1]])
    full_ks = jnp.concatenate([ks0[None], kss[:L - 1]])
    full_vq = jnp.concatenate([vq0[None], vqs[:L - 1]])
    full_vs = jnp.concatenate([vs0[None], vss[:L - 1]])
    ck, cv, cks, cvs = kv_cache_flush_rows(
        full_kq, full_vq, pos, cache.k, cache.v,
        full_ks, full_vs, cache.ks, cache.vs)
    new_cache = QuantKVCache(ck, cv, cks, cvs)

    x = rmsnorm(xp[:B], params.rms_final)
    logits = matmul_any(x, params.wcls, jax.lax.Precision("default"))
    return logits.astype(jnp.float32), new_cache


def _mega_path_ok(params, config: ModelConfig, cache, B: int) -> bool:
    """True when the ONE-launch-per-layer merged kernel applies: the fused
    linear layouts (see _fused_path_ok) + a dense INT8 stacked cache +
    128-aligned head_dim (per-head lane writes + DMA ring slices) + a
    VMEM-feasible merged tiling (ops/fused_step.py).

    TPU-BLOCKED (r4, re-confirmed r5): mega kernel-faulted the chip at
    every batch on the r4 toolchain (b1_freshcache.log).  The r5
    toolchain partially recovered it — `tools/b2_fault_probe.py mega 1`
    (L=2 model, full 7B layer shape) is GREEN on both the cached r4
    binary and a fresh r5 compile (r5_probe.log) — but the FULL 32-layer
    7B b1 decode still crashes the worker (ab_r5_b1.log), so the trigger
    is depth/program-size dependent and the L=2 probe is NOT sufficient
    evidence for this kernel.  The block stays; b1 auto uses mega2
    (re-measured r5).  Re-open only with a green full-depth run."""
    if not isinstance(cache, QuantKVCache) or isinstance(cache, PagedKVCache):
        return False
    if config.head_dim % 128 != 0:
        return False
    if jax.default_backend() == "tpu":
        return False  # full-depth kernel fault persists on r5 (see above)
    from tpu_llama.ops.fused_step import _pick_step_tiling

    Bp = max(32, -(-B // 32) * 32)
    S = cache.k.shape[-2]
    return _pick_step_tiling(
        Bp, config.dim, config.hidden_dim,
        config.dim + 2 * config.kv_dim, config.n_kv_heads,
        config.group_size, config.head_dim, S) is not None


def _stacked_q(w):
    """Stacked weight array for the fused decode kernels: int8, or the
    in-jit S4 unpack of W4 packed storage (bitcast — layout-free; the
    kernels upcast per block, measured parity with the int8 stream)."""
    from tpu_llama.ops.quant import unpack_channel4

    return unpack_channel4(w) if w.packed4 else w.q


def _forward_decode_fused(params, cache, tokens, pos, config: ModelConfig,
                          attn: str, unroll: int, mega: bool = False):
    """Decode step with ONE fused linear Pallas call per layer (plus
    attention): see ops/fused_layer.py.  The scan carry holds the residual
    stream AND the next layer's qkv projection, which the fused kernel
    emits as its final phase.

    ``mega=True`` (dense INT8 caches): attention itself is folded into the
    fused kernel (ops/fused_step.py) — ONE Pallas launch per layer total."""
    x0 = params.tok_emb[tokens].astype(jnp.float32)  # [B, D]
    xp, new_cache = fused_decode_stack(params.layers, cache, x0, pos,
                                       params.rope_cos[pos],
                                       params.rope_sin[pos], config, attn,
                                       unroll, mega)
    x = rmsnorm(xp, params.rms_final)
    logits = matmul_any(x, params.wcls, jax.lax.Precision("default"))
    return logits.astype(jnp.float32), new_cache


def fused_decode_stack(lp, cache, x0, pos, cos, sin, config: ModelConfig,
                       attn: str, unroll: int, mega: bool = False):
    """The fused decode LAYER STACK alone: x0 [B, D] residual in ->
    (x [B, D], new cache).  No embedding, no classifier — callable from
    forward_decode AND from a pipeline stage (parallel/pipeline.py), so PP
    stages run the exact same perf path as the single-chip engine
    (VERDICT r2 #4)."""
    from tpu_llama.ops.fused_layer import fused_layer_linear, w8a8_matmul_stacked
    from tpu_llama.ops.quant import quantize_activations

    B = x0.shape[0]
    D, KVD = config.dim, config.kv_dim
    L = lp.rms_att.shape[0]
    Bp = max(32, -(-B // 32) * 32)
    layer_ix = jnp.arange(L, dtype=jnp.int32)
    paged = isinstance(cache, PagedKVCache)
    quant = isinstance(cache, QuantKVCache)

    x0 = x0.astype(jnp.float32)
    if Bp != B:
        x0 = jnp.pad(x0, ((0, Bp - B), (0, 0)))
    h0 = rmsnorm(x0, lp.rms_att[0])
    xq0, sx0 = quantize_activations(h0)
    # stacked weight arrays once per step (S4 unpack is a free bitcast)
    wqq, woq, w13q, w2q = (_stacked_q(lp.wq), _stacked_q(lp.wo),
                           _stacked_q(lp.w1), _stacked_q(lp.w2))
    qkv0 = w8a8_matmul_stacked(xq0, sx0, wqq, lp.wq.s, 0)

    if mega:
        from tpu_llama.ops.attention import kv_cache_flush_rows
        from tpu_llama.ops.fused_step import fused_step_layer
    elif paged:
        from tpu_llama.ops.attention import (
            kv_pool_flush_rows,
            paged_flash_decode_attention_dma,
            paged_flash_decode_attention_fresh,
        )

        attend_paged = (paged_flash_decode_attention_fresh
                        if attn == "flash" else
                        paged_flash_decode_attention_dma)
    else:
        from tpu_llama.ops.attention import (
            flash_decode_attention_dma,
            flash_decode_attention_fresh,
            kv_cache_flush_rows,
        )

        attend = (flash_decode_attention_dma if attn == "flash_dma"
                  else flash_decode_attention_fresh)

    def layer_step(carry, l):
        xp, qkv = carry  # [Bp, D] f32, [Bp, QO] f32
        qb = qkv[:B]
        q = apply_rope(
            qb[:, :D].reshape(B, config.n_heads, config.head_dim), cos, sin)
        k = apply_rope(
            qb[:, D:D + KVD].reshape(B, config.n_kv_heads, config.head_dim),
            cos, sin)
        v = qb[:, D + KVD:].reshape(B, config.n_kv_heads, config.head_dim)
        qg = q.reshape(B, config.n_kv_heads, config.group_size,
                       config.head_dim)
        if mega:
            kq, ks_ = quantize_kv(k)
            vq, vs_ = quantize_kv(v)
            x_next, qkv_next = fused_step_layer(
                xp, qg, kq, vq, ks_, vs_,
                cache.k, cache.v, cache.ks, cache.vs, pos,
                woq, lp.wo.s, w13q, lp.w1.s, w2q, lp.w2.s,
                wqq, lp.wq.s, lp.rms_ffn, lp.rms_att, l, L)
            return (x_next, qkv_next), (kq, ks_, vq, vs_)
        if paged:
            kq, ks_ = quantize_kv(k)
            vq, vs_ = quantize_kv(v)
            att = attend_paged(
                qg, cache.k, cache.v, cache.ks, cache.vs,
                cache.page_table, pos, kq, vq, ks_, vs_, layer=l)
            rows = (kq, ks_, vq, vs_)
        elif quant:
            kq, ks_ = quantize_kv(k)
            vq, vs_ = quantize_kv(v)
            att = attend(qg, cache.k, cache.v, pos, kq, vq,
                         cache.ks, cache.vs, ks_, vs_, layer=l)
            rows = (kq, ks_, vq, vs_)
        else:
            kc = k.astype(cache.k.dtype)
            vc = v.astype(cache.v.dtype)
            att = attend(qg, cache.k, cache.v, pos, kc, vc, layer=l)
            rows = (kc, vc)
        att2 = att.reshape(B, D).astype(jnp.float32)
        if Bp != B:
            att2 = jnp.pad(att2, ((0, Bp - B), (0, 0)))
        attq, satt = quantize_activations(att2)
        x_next, qkv_next = fused_layer_linear(
            xp, attq, satt,
            woq, lp.wo.s, w13q, lp.w1.s, w2q, lp.w2.s,
            wqq, lp.wq.s, lp.rms_ffn, lp.rms_att, l, L)
        return (x_next, qkv_next), rows

    (xp, _), rows = jax.lax.scan(layer_step, (x0, qkv0), layer_ix,
                                 unroll=unroll)
    if paged:
        kq, ks_, vq, vs_ = rows
        ck, cv, cks, cvs = kv_pool_flush_rows(
            kq, vq, ks_, vs_, pos, cache.page_table,
            cache.k, cache.v, cache.ks, cache.vs)
        new_cache = PagedKVCache(ck, cv, cks, cvs,
                                 page_table=cache.page_table)
    elif quant:
        kq, ks_, vq, vs_ = rows
        ck, cv, cks, cvs = kv_cache_flush_rows(
            kq, vq, pos, cache.k, cache.v, ks_, vs_, cache.ks, cache.vs)
        new_cache = QuantKVCache(ck, cv, cks, cvs)
    else:
        ck, cv = kv_cache_flush_rows(rows[0], rows[1], pos,
                                     cache.k, cache.v)
        new_cache = KVCache(ck, cv)

    return xp[:B], new_cache


@partial(jax.jit, static_argnames=("config", "precision", "attn", "unroll",
                                   "fused"))
def forward_decode(
    params: LlamaParams,
    cache: KVCache,
    tokens: jax.Array,  # [B] int32
    pos: jax.Array,  # [B] int32 — per-sequence positions (continuous batching)
    config: ModelConfig,
    precision: str = "highest",
    attn: str = "auto",  # "auto" | "flash" | "xla" (int8 caches always flash)
    unroll: int = 1,  # layer-scan unroll factor (latency-bound decode lever)
    fused: str | bool = "auto",  # one-Pallas-call-per-layer linear path
):
    """One decode step for a batch. Returns (logits [B, V], new cache)."""
    prec = jax.lax.Precision(precision) if isinstance(precision, str) else precision
    B = tokens.shape[0]
    if attn == "auto":
        # Measured policy (TPU r2, tools/kernel_bench.py --dyn/--fresh/--paged
        # + BENCH_sweep.jsonl): the manual-DMA kernel wins every paged config
        # and every dense batch except B=1, where the single grid cell gets
        # no cross-cell DMA overlap and the full-S index-map kernel's
        # pipelining wins (69.8 vs 57.2 tok/s at 7B).
        # The DMA kernels' VMEM ring slices need a 128-aligned head_dim
        # (Mosaic rejects sub-tile lane slices); small-head models (stories
        # checkpoints, hd 12-64) take the index-map kernels instead.
        dma_ok = config.head_dim % 128 == 0
        if isinstance(cache, PagedKVCache):
            attn = "flash_dma" if dma_ok else "flash"
        elif jax.default_backend() == "tpu":
            attn = "flash_dma" if (B > 1 and dma_ok) else "flash"
        else:
            attn = "xla"
    if fused == "auto":
        fused = (attn in ("flash", "flash_dma")
                 and jax.default_backend() == "tpu"
                 and _fused_path_ok(params, config))
        # One-launch-per-layer kernels, measured end-to-end by bench.py
        # --ab (INTERLEAVED round-robin reps — the only method that
        # resolves <5% deltas on this time-shared chip; VERDICT r2 weak #2):
        #   B>=2: mega2 (trailing attention + in-kernel rope,
        #         ops/fused_step2.py) b8 653.3 vs two-launch 591.0 vs
        #         unfused 397.7 tok/s, spreads <=0.006 (r3, TOD=256 plan).
        #         (mega loses at b>=2: its leading cells' HBM reads
        #         serialize in front of the weight streams.)
        #         Measured points: b4 mega2 364.7 vs two-launch 321.1
        #         (r4 A/B, spreads 0.002/0.013), b8 653.3 vs 591.0, b16;
        #         13B b4 mega2-depth1 181.2 vs 177.9 (r4).  b3/b5-b7
        #         interpolate (verified to RUN, b3/b6 probes green).
        #         B==2: r4 hard-blocked it (both in-kernel-attention
        #         kernels faulted the chip at exactly b2); the r5
        #         toolchain resolved the fault (r5_probe.log) and the
        #         full-7B A/B now measures mega2 193.4 vs two-launch
        #         169.4 tok/s (+14%, 7 interleaved reps, spreads <=0.01,
        #         ab_r5_b2_confirm.log) — mega2 is the b2 path.
        #   B=1:  mega2 since r5 — 100.1 vs two-launch 93.4 tok/s
        #         (+7.2%, spreads <=0.004, ab_r5_b1_mega2.log), beating
        #         even r3's mega record (94.99).  mega itself (leading
        #         attention, ops/fused_step.py) remains TPU-blocked: its
        #         L=2 probe passes on r5 but the full 32-layer b1 decode
        #         still crashes the worker (ab_r5_b1.log).
        #   mega3 (two layers per launch, ops/fused_step3.py) measured
        #         PARITY-MINUS at b8: 654.0 vs mega2 656.4 (7 interleaved
        #         reps, spreads 0.001) — halving the launch count (~16 x
        #         78 us/step) was fully repaid by the seam state's VMEM
        #         (A256 -> A128 in the plan).  Stays opt-in via
        #         fused="mega3"; do not auto-select without a new plan
        #         that keeps A256 alongside the seam scratches.
        if fused and B == 1 and _mega_path_ok(params, config, cache, B):
            fused = "mega"  # CPU/interpret only — TPU-blocked in the gate
        elif fused and _mega2_path_ok(params, config, cache, B):
            fused = "mega2"
    if fused == "mega":
        if not (_fused_path_ok(params, config)
                and _mega_path_ok(params, config, cache, B)):
            raise ValueError("mega decode requires fused W8A8 layouts, a "
                             "dense INT8 cache, and 128-aligned head_dim")
        return _forward_decode_fused(params, cache, tokens, pos, config,
                                     attn, unroll, mega=True)
    if fused == "mega2":
        if not (_fused_path_ok(params, config)
                and _mega2_path_ok(params, config, cache, B)):
            raise ValueError("mega2 decode requires fused W8A8 layouts, a "
                             "dense INT8 cache, and 128-aligned head_dim")
        return _forward_decode_mega2(params, cache, tokens, pos, config,
                                     unroll)
    if fused == "mega3":
        if not (_fused_path_ok(params, config)
                and _mega3_path_ok(params, config, cache, B)):
            raise ValueError("mega3 decode requires fused W8A8 layouts, a "
                             "dense INT8 cache, 128-aligned head_dim, and "
                             "an even layer count")
        return _forward_decode_mega3(params, cache, tokens, pos, config,
                                     unroll)
    if fused:
        if attn not in ("flash", "flash_dma"):
            raise ValueError("fused decode requires a flash attention impl")
        return _forward_decode_fused(params, cache, tokens, pos, config,
                                     attn, unroll)
    x = params.tok_emb[tokens]  # [B, D]
    x, new_cache = decode_stack(params.layers, cache, x, pos,
                                params.rope_cos[pos], params.rope_sin[pos],
                                config, prec, attn, unroll)
    x = rmsnorm(x, params.rms_final)
    logits = matmul_any(x, params.wcls, prec)
    return logits.astype(jnp.float32), new_cache


def decode_stack(layers, cache, x, pos, cos, sin, config: ModelConfig,
                 prec, attn: str, unroll: int = 1):
    """The UNFUSED decode layer stack alone: x [B, D] in -> (x, new cache).
    No embedding, no classifier — shared by forward_decode and pipeline
    stages (parallel/pipeline.py) so PP runs the same deferred-flush flash
    paths as the single-chip engine (VERDICT r2 #4)."""
    B = x.shape[0]
    paged = isinstance(cache, PagedKVCache)
    quant = isinstance(cache, QuantKVCache)

    def mm(a, w):
        return matmul_any(a, w, prec)

    def project(x, lp):
        h = rmsnorm(x, lp.rms_att)
        q, k, v = _project_qkv(h, lp, config, mm)
        q = apply_rope(q.reshape(B, config.n_heads, config.head_dim), cos, sin)
        k = apply_rope(k.reshape(B, config.n_kv_heads, config.head_dim),
                       cos, sin)
        v = v.reshape(B, config.n_kv_heads, config.head_dim)
        return q, k, v

    def ffn_out(x, att, lp):
        x = x + mm(att, lp.wo)
        h = rmsnorm(x, lp.rms_ffn)
        gate, up = _project_gate_up(h, lp, config, mm)
        return x + mm(jax.nn.silu(gate) * up, lp.w2)

    L = layers.rms_att.shape[0]
    layer_ix = jnp.arange(L, dtype=jnp.int32)

    if paged:
        # DEFERRED FLUSH, paged: the pool is read-only during the layer scan
        # (fresh rows join the softmax at the final page block); one
        # kv_pool_flush_rows call per step blends every layer's row into its
        # slot's page.  Same rationale as the dense path below.
        # The manual-DMA kernel (walks only the pages below each slot's pos
        # with async copies) is the DEFAULT: it beats the index-map-clamped
        # grid at every pos on TPU — 5.2x at pos 64, 1.7x at full context
        # (tools/kernel_bench.py --paged, b64/L4/S2048/ps512 round 2).
        from tpu_llama.ops.attention import (
            kv_pool_flush_rows,
            paged_flash_decode_attention_dma,
            paged_flash_decode_attention_fresh,
        )

        attend_paged = (paged_flash_decode_attention_fresh
                        if attn == "flash" else
                        paged_flash_decode_attention_dma)

        def layer_step(x, scanned):
            lp, l = scanned
            q, k, v = project(x, lp)
            qg = q.reshape(B, config.n_kv_heads, config.group_size,
                           config.head_dim)
            kq, ks_ = quantize_kv(k)
            vq, vs_ = quantize_kv(v)
            att = attend_paged(
                qg, cache.k, cache.v, cache.ks, cache.vs,
                cache.page_table, pos, kq, vq, ks_, vs_, layer=l)
            att = att.reshape(B, config.dim).astype(x.dtype)
            return ffn_out(x, att, lp), (kq, ks_, vq, vs_)

        x, rows = jax.lax.scan(layer_step, x, (layers, layer_ix),
                               unroll=unroll)
        kq, ks_, vq, vs_ = rows
        ck, cv, cks, cvs = kv_pool_flush_rows(
            kq, vq, ks_, vs_, pos, cache.page_table,
            cache.k, cache.v, cache.ks, cache.vs)
        new_cache = PagedKVCache(ck, cv, cks, cvs,
                                 page_table=cache.page_table)
    elif attn in ("flash", "flash_dma"):
        # DEFERRED FLUSH (the dense perf path): the cache is read-only during
        # the layer scan — each layer's fresh K/V row joins the softmax as an
        # explicit extra column (flash_decode_attention_fresh) and the rows
        # collect as scan ys.  ONE flush call then blends every layer's row
        # into the cache: per-layer aliased writes cost ~0.45 ms each in
        # dynamic-index-map overhead on this chip; the flush amortizes it
        # across all layers (tools/kernel_bench.py --alias).
        # "flash_dma" swaps in the manual-DMA kernel whose HBM reads are
        # proportional to each slot's pos, not the allocated seq_len.
        from tpu_llama.ops.attention import (
            flash_decode_attention_dma,
            flash_decode_attention_fresh,
            kv_cache_flush_rows,
        )

        attend = (flash_decode_attention_dma if attn == "flash_dma"
                  else flash_decode_attention_fresh)

        def layer_step(x, scanned):
            lp, l = scanned
            q, k, v = project(x, lp)
            qg = q.reshape(B, config.n_kv_heads, config.group_size,
                           config.head_dim)
            if quant:
                kq, ks_ = quantize_kv(k)
                vq, vs_ = quantize_kv(v)
                att = attend(
                    qg, cache.k, cache.v, pos, kq, vq,
                    cache.ks, cache.vs, ks_, vs_, layer=l)
                rows = (kq, ks_, vq, vs_)
            else:
                kc = k.astype(cache.k.dtype)
                vc = v.astype(cache.v.dtype)
                att = attend(
                    qg, cache.k, cache.v, pos, kc, vc, layer=l)
                rows = (kc, vc)
            att = att.reshape(B, config.dim).astype(x.dtype)
            return ffn_out(x, att, lp), rows

        x, rows = jax.lax.scan(layer_step, x, (layers, layer_ix),
                               unroll=unroll)
        if quant:
            kq, ks_, vq, vs_ = rows  # each stacked [L, B, ...]
            ck, cv, cks, cvs = kv_cache_flush_rows(
                kq, vq, pos, cache.k, cache.v, ks_, vs_, cache.ks, cache.vs)
            new_cache = QuantKVCache(ck, cv, cks, cvs)
        else:
            ck, cv = kv_cache_flush_rows(rows[0], rows[1], pos,
                                         cache.k, cache.v)
            new_cache = KVCache(ck, cv)
    else:
        # XLA einsum fallback (CPU tests, debugging): per-layer slices via
        # scan xs/ys — numerically the reference path, not the fast one.
        def layer_step_xla(x, scanned):
            lp, cache_l = scanned
            q, k, v = project(x, lp)
            cache_l = _write_decode(cache_l, k, v, pos, config)
            att = _attend_decode(cache_l, q, pos, config, prec, attn)
            return ffn_out(x, att, lp), cache_l

        x, new_cache = jax.lax.scan(layer_step_xla, x, (layers, cache),
                                    unroll=unroll)

    return x, new_cache


def _prefill_w8a8_fast_ok(params, config: ModelConfig, B: int, T: int) -> bool:
    """Gate for the fused one-pass W8A8 prefill stages: fused qkv/gate-up
    ChannelQuant layouts with zero padding (the prequant kernels slice
    nothing) and lane/sublane-aligned shapes.

    TPU_LLAMA_FUSED_PREFILL=0 disables the fused bodies everywhere — the
    escape hatch for remote-compile-helper failures that are SHAPE
    specific (r4: b32 chunk=128 crashes the helper while b16 chunk=256
    and every one-shot M<=4096 shape compile fine)."""
    import os

    if os.environ.get("TPU_LLAMA_FUSED_PREFILL", "1") == "0":
        return False
    D, KVD, H = config.dim, config.kv_dim, config.hidden_dim
    lp = params.layers
    return (
        isinstance(lp.wq, ChannelQuantTensor)
        and isinstance(lp.w1, ChannelQuantTensor)
        and isinstance(lp.wo, ChannelQuantTensor)
        and isinstance(lp.w2, ChannelQuantTensor)
        and lp.wq.logical_out == D + 2 * KVD  # fused qkv
        and lp.w1.logical_out == 2 * H        # fused gate/up
        and lp.wq.q.shape[-2:] == (D, D + 2 * KVD)
        and lp.w1.q.shape[-2:] == (D, 2 * H)
        and lp.wo.q.shape[-2:] == (D, D)
        and lp.w2.q.shape[-2:] == (H, D)
        and (B * T) % 32 == 0 and D % 128 == 0 and H % 128 == 0
        # fused one-pass programs at M=8192 rows reproducibly crash the
        # remote compile helper (HTTP 500, multiple service ports — r4
        # sweep) while every M<=4096 shape compiles and runs; callers
        # above this split into chunks/waves (bench_ttft, engine waves)
        and B * T <= 4096)


def _forward_prefill_fresh(params, cache, tokens, lengths,
                           config: ModelConfig, precision, logits_mode,
                           attn):
    """Prefill-from-zero with the cache OUT of the layer loop.

    Round-2 prefill passed the cache through scan xs/ys and scattered each
    layer's [B, KVH, T, hd] block with an advanced-index set — full
    per-layer copies of multi-GB arrays, the decode side's banned pattern
    (CLAUDE.md).  At start_pos == 0 nothing previously cached is attended,
    so: attention runs over the layer's COMPACT fresh K/V (S == T, one
    S-block), the fresh blocks collect as scan ys, and the cache
    materializes ONCE at the end — stacked directly when the cache is
    T-sized (the admission path), or via one aliased Pallas slot-scatter
    into a larger cache.  Measured r3: the scatter/copy chain was ~140 ms
    of the 7B b8 T512 TTFT.
    """
    prec = (jax.lax.Precision(precision) if isinstance(precision, str)
            else precision)
    if attn == "auto":
        attn = "flash" if jax.default_backend() == "tpu" else "xla"
    B, T = tokens.shape
    S = cache.seq_len
    assert T <= S, (T, S)
    quant = isinstance(cache, QuantKVCache)
    x = params.tok_emb[tokens]  # [B, T, D]
    q_pos = jnp.broadcast_to(jnp.arange(T)[None, :], (B, T))
    cos = params.rope_cos[q_pos]
    sin = params.rope_sin[q_pos]
    start0 = jnp.zeros((B,), jnp.int32)

    def mm(a, w):
        return matmul_any(a, w, prec)

    # One-pass fused activation stages for the W8A8 fused-projection layout
    # (the TTFT headline path): rmsnorm+quant and silu*up+quant each become
    # a single Pallas pass feeding w8a8_matmul_prequant, and the residual
    # adds ride the matmul epilogue — the unfused chain's XLA rmsnorm,
    # silu-mul and add passes each round-tripped [B*T, D]-scale activations
    # through HBM plus their own op-chain overhead (~1.3 ms/layer at 7B b8
    # T512, tools/prefill_probe.py).  Numerics: f32 rmsnorm/silu without
    # the unfused path's intermediate bf16 rounding (ops/quant.py).
    D, KVD, H = config.dim, config.kv_dim, config.hidden_dim
    w8a8_fast = _prefill_w8a8_fast_ok(params, config, B, T)

    def layer_step_w8a8(x, lp):
        from tpu_llama.ops.matmul import w8a8_matmul_prequant
        from tpu_llama.ops.quant import (
            rmsnorm_quantize_pallas,
            silu_mul_quantize_pallas,
        )

        M = B * T
        x2 = x.reshape(M, D)
        xq_, sx_ = rmsnorm_quantize_pallas(x2, lp.rms_att)
        qkv = w8a8_matmul_prequant(xq_, sx_, lp.wq, out_dtype=x.dtype)[:M]
        if quant and attn == "flash" and config.head_dim % 128 == 0:
            # one-pass rope + k/v per-head INT8 quant over the qkv rows —
            # replaces 4 XLA chains/layer (apply_rope x2, quantize_kv x2;
            # quantize_kv alone was 49.6 ms/prefill, prefill_probe r4)
            att, fresh = attend_prequant(qkv)
        else:
            q, k, v = (qkv[:, :D], qkv[:, D:D + KVD], qkv[:, D + KVD:])
            att, fresh = attend(q, k, v)
        x2 = w8a8_matmul(att.reshape(M, D), lp.wo, out_dtype=x.dtype,
                         residual=x2)
        hq, hs = rmsnorm_quantize_pallas(x2, lp.rms_ffn)
        gu = w8a8_matmul_prequant(hq, hs, lp.w1, out_dtype=x.dtype)[:M]
        fq, fs = silu_mul_quantize_pallas(gu[:, :H], gu[:, H:])
        x2 = w8a8_matmul_prequant(fq, fs, lp.w2, out_dtype=x.dtype,
                                  residual=x2)[:M]
        return x2.reshape(B, T, D), fresh

    def attend_prequant(qkv):
        """Fused-epilogue fresh attention: rope_split_quantize_pallas turns
        the [M, D+2*KVD] qkv rows into roped q + per-head-quantized int8
        k/v in ONE pass; only the int8 tensors (4x fewer bytes) cross the
        head-major transpose.  Same math as attend()'s int8-flash branch
        with the fused ops' f32 numerics (no bf16 round before quant)."""
        from tpu_llama.ops.quant import rope_split_quantize_pallas

        KVH, hd = config.n_kv_heads, config.head_dim
        qr, kq, ks, vq, vs = rope_split_quantize_pallas(
            qkv, cos, sin, D, KVH, hd)
        q = qr.reshape(B, T, config.n_heads, hd)
        kq = kq.reshape(B, T, KVH, hd).transpose(0, 2, 1, 3)
        vq = vq.reshape(B, T, KVH, hd).transpose(0, 2, 1, 3)
        ks = ks.reshape(B, T, KVH).transpose(0, 2, 1)
        vs = vs.reshape(B, T, KVH).transpose(0, 2, 1)
        att = flash_prefill_attention(
            q, kq, vq, start0, ks, vs, out_dtype=x.dtype,
            assume_fresh=True).reshape(B, T, config.dim)
        return att, (kq, vq, ks, vs)

    def attend(q, k, v):
        """RoPE + KV quant + fresh attention; q/k/v [B*T or B,T, heads*hd]."""
        q = q.reshape(B, T, config.n_heads, config.head_dim)
        k = k.reshape(B, T, config.n_kv_heads, config.head_dim)
        v = v.reshape(B, T, config.n_kv_heads, config.head_dim)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        if quant:
            # quantize BEFORE the head-major transpose: the hd reduce reads
            # contiguous lanes, and the transpose then moves int8 (4x fewer
            # bytes) — quantize-after-transpose fused the strided reads into
            # both passes (~0.77 ms/call measured, tools/prefill_probe r3)
            kq, ks = quantize_kv(k)  # [B, T, KVH, hd] / [B, T, KVH]
            vq, vs = quantize_kv(v)
            kq = kq.transpose(0, 2, 1, 3)  # [B, KVH, T, hd]
            vq = vq.transpose(0, 2, 1, 3)
            ks = ks.transpose(0, 2, 1)
            vs = vs.transpose(0, 2, 1)
            if attn == "flash":
                att = flash_prefill_attention(
                    q, kq, vq, start0, ks, vs, out_dtype=x.dtype,
                    assume_fresh=True).reshape(B, T, config.dim)
            else:
                kf = kq.astype(jnp.float32) * ks[..., None]
                vf = vq.astype(jnp.float32) * vs[..., None]
                att = _attention_prefill(q, kf, vf, q_pos, config, prec)
            return att, (kq, vq, ks, vs)
        kt = k.transpose(0, 2, 1, 3)
        vt = v.transpose(0, 2, 1, 3)
        kc = kt.astype(cache.k.dtype)
        vc = vt.astype(cache.v.dtype)
        if attn == "flash":
            att = flash_prefill_attention(
                q, kc, vc, start0, out_dtype=x.dtype,
                assume_fresh=True).reshape(B, T, config.dim)
        else:
            att = _attention_prefill(q, kc, vc, q_pos, config, prec)
        return att, (kc, vc)

    def layer_step(x, lp):
        h = rmsnorm(x, lp.rms_att)
        q, k, v = _project_qkv(h, lp, config, mm)
        att, fresh = attend(q, k, v)
        x = x + mm(att, lp.wo)
        h = rmsnorm(x, lp.rms_ffn)
        gate, up = _project_gate_up(h, lp, config, mm)
        x = x + mm(jax.nn.silu(gate) * up, lp.w2)
        return x, fresh

    x, fresh = jax.lax.scan(layer_step_w8a8 if w8a8_fast else layer_step,
                            x, params.layers)

    from tpu_llama.ops.attention import kv_cache_scatter_slots

    rows = jnp.arange(B, dtype=jnp.int32)
    use_kernel = S > T and T % 128 == 0
    if quant:
        kq, vq, ks, vs = fresh  # stacked [L, B, KVH, T(, hd)]
        if S == T:
            new_cache = QuantKVCache(k=kq, v=vq, ks=ks, vs=vs)
        elif use_kernel:
            ck, cv, cks, cvs = kv_cache_scatter_slots(
                kq, vq, rows, cache.k, cache.v, ks, vs, cache.ks, cache.vs)
            new_cache = QuantKVCache(k=ck, v=cv, ks=cks, vs=cvs)
        else:
            new_cache = QuantKVCache(
                k=cache.k.at[:, :, :, :T].set(kq),
                v=cache.v.at[:, :, :, :T].set(vq),
                ks=cache.ks.at[:, :, :, :T].set(ks),
                vs=cache.vs.at[:, :, :, :T].set(vs))
    else:
        kc, vc = fresh
        if S == T:
            new_cache = KVCache(k=kc, v=vc)
        elif use_kernel:
            ck, cv = kv_cache_scatter_slots(kc, vc, rows, cache.k, cache.v)
            new_cache = KVCache(k=ck, v=cv)
        else:
            new_cache = KVCache(k=cache.k.at[:, :, :, :T].set(kc),
                                v=cache.v.at[:, :, :, :T].set(vc))

    if logits_mode == "last":
        x = jnp.take_along_axis(
            x, jnp.clip(lengths - 1, 0, T - 1)[:, None, None], axis=1)[:, 0]
    x = rmsnorm(x, params.rms_final)
    logits = matmul_any(x, params.wcls, prec)
    return logits.astype(jnp.float32), new_cache


@partial(jax.jit, static_argnames=("config", "precision", "chunk"),
         donate_argnums=(1,))
def forward_prefill_chunked(
    params: LlamaParams,
    cache,  # batch-matched cache, seq_len >= T
    tokens: jax.Array,  # [B, T], T divisible by chunk
    lengths: jax.Array,  # [B]
    config: ModelConfig,
    precision: str = "highest",
    chunk: int = 256,
):
    """Prefill in sequence chunks: peak attention memory is O(chunk * S)
    instead of O(T * S) — long prompts stop OOMing the scores tensor.
    Returns (next-token logits [B, V], cache); numerically identical to
    one-shot prefill (each chunk attends to all previously written cache).
    """
    B, T = tokens.shape
    assert T % chunk == 0, (T, chunk)
    n = T // chunk

    def body(cache, i):
        tok_c = jax.lax.dynamic_slice(tokens, (0, i * chunk), (B, chunk))
        start = jnp.full((B,), i * chunk, jnp.int32)
        # last valid position within this chunk per row (>=1 keeps gather sane)
        len_c = jnp.clip(lengths - i * chunk, 1, chunk)
        logits_c, cache = forward_prefill(
            params, cache, tok_c, start, len_c, config,
            precision=precision, logits_mode="last",
            max_keys=T)  # every chunk's start+chunk <= T (prefill from 0)
        return cache, logits_c  # [B, V] per chunk

    cache, per_chunk = jax.lax.scan(body, cache, jnp.arange(n))
    # pick the chunk containing each row's final valid token
    owner = jnp.clip((lengths - 1) // chunk, 0, n - 1)  # [B]
    last = jnp.take_along_axis(
        per_chunk, owner[None, :, None], axis=0)[0]  # [B, V]
    return last, cache


@partial(jax.jit, static_argnames=("config", "precision", "chunk"),
         donate_argnums=(1,))
def forward_prefill_chunked_unrolled(
    params: LlamaParams,
    cache,  # batch-matched cache, seq_len >= T
    tokens: jax.Array,  # [B, T], T divisible by chunk
    lengths: jax.Array,  # [B]
    config: ModelConfig,
    precision: str = "highest",
    chunk: int = 256,
):
    """:func:`forward_prefill_chunked` with the chunk loop UNROLLED inside
    one jit — no ``lax.scan`` over chunks.

    Exists because the r5 remote toolchain broke the scan form at every
    fresh geometry (probed tools/compile_probe.py, env_probe7.log): the
    while-loop body stops aliasing the loop-invariant params and clones
    all 6.7 GB into program space (b32: "program 6.69G", HBM OOM), and
    Mosaic's scoped-vmem stack need for the silu+quant kernel grows past
    its declared limit only inside the while context (b8: 9.48M vs 8.72M).
    Unrolled, the params are plain shared args and each chunk is ordinary
    straight-line code — same numerics, one dispatch, n x the program size
    (fine for n <= 8; compile ~n x the one-shot cost)."""
    B, T = tokens.shape
    assert T % chunk == 0, (T, chunk)
    n = T // chunk

    per_chunk = []
    for i in range(n):
        tok_c = jax.lax.slice_in_dim(tokens, i * chunk, (i + 1) * chunk,
                                     axis=1)
        start = jnp.full((B,), i * chunk, jnp.int32)
        len_c = jnp.clip(lengths - i * chunk, 1, chunk)
        logits_c, cache = forward_prefill(
            params, cache, tok_c, start, len_c, config,
            precision=precision, logits_mode="last", max_keys=T)
        per_chunk.append(logits_c)
    owner = jnp.clip((lengths - 1) // chunk, 0, n - 1)  # [B]
    last = jnp.take_along_axis(
        jnp.stack(per_chunk), owner[None, :, None], axis=0)[0]  # [B, V]
    return last, cache


@partial(jax.jit, static_argnames=("config", "precision", "chunk"),
         donate_argnums=(1,))
def forward_prefill_chunked_carry(
    params: LlamaParams,
    cache,  # QuantKVCache, seq_len >= T
    tokens: jax.Array,  # [B, T], T divisible by chunk
    lengths: jax.Array,  # [B]
    config: ModelConfig,
    precision: str = "default",
    chunk: int = 256,
):
    """Chunked prefill with the stacked cache in the layer-scan CARRY and
    aliased Pallas chunk writes — the decode loop's memory discipline
    (CLAUDE.md) applied to prefill.

    The scan-xs/ys prefill body charges two extra full-cache HBM temps on
    the r5 AOT compiler (ys staging no longer aliases the donated input),
    pushing every b32-dense chunked/continuation compile to 19.3 G > 15.75
    (b32_full_err.log, env_probe9.log).  Here the cache never leaves the
    carry: :func:`tpu_llama.ops.attention.kv_cache_write_chunk` lands each
    chunk's rows in place (start is uniform and 128-aligned by
    construction), and attention reads a per-layer dynamic slice — an
    O(cache/L) temp instead of O(cache).

    Requires the fused-W8A8 layout, an int8 QuantKVCache, chunk % 128 == 0
    and B*chunk <= 4096 (the fused-stage compile envelope); callers gate
    via :func:`_prefill_chunked_carry_ok`.  Numerics match
    forward_prefill_chunked exactly (same stage kernels, same order).
    """
    from tpu_llama.ops.attention import kv_cache_write_chunk
    from tpu_llama.ops.matmul import w8a8_matmul, w8a8_matmul_prequant
    from tpu_llama.ops.quant import (
        rmsnorm_quantize_pallas,
        rope_split_quantize_pallas,
        silu_mul_quantize_pallas,
    )

    B, T = tokens.shape
    assert T % chunk == 0, (T, chunk)
    n = T // chunk
    D, KVD, H = config.dim, config.kv_dim, config.hidden_dim
    KVH, hd, NH = config.n_kv_heads, config.head_dim, config.n_heads
    M = B * chunk
    S = cache.seq_len
    prec = jax.lax.Precision(precision) if isinstance(precision, str) \
        else precision
    L = params.layers.rms_att.shape[0]
    layer_ix = jnp.arange(L)

    per_chunk = []
    carr = (cache.k, cache.v, cache.ks, cache.vs)
    for i in range(n):
        tok_c = jax.lax.slice_in_dim(tokens, i * chunk, (i + 1) * chunk,
                                     axis=1)
        start_vec = jnp.full((B,), i * chunk, jnp.int32)
        write_pos = jnp.clip(start_vec[:, None]
                             + jnp.arange(chunk)[None, :], 0, S - 1)
        cos = params.rope_cos[write_pos]  # [B, Tc, hd/2]
        sin = params.rope_sin[write_pos]
        x = params.tok_emb[tok_c]  # [B, Tc, D]

        def layer_step(carry, scanned, cos=cos, sin=sin,
                       start_vec=start_vec, i=i):
            x, ck_, cv_, cks_, cvs_ = carry
            lp, l = scanned
            x2 = x.reshape(M, D)
            xq_, sx_ = rmsnorm_quantize_pallas(x2, lp.rms_att)
            qkv = w8a8_matmul_prequant(xq_, sx_, lp.wq, out_dtype=x.dtype)[:M]
            qr, kq, ks, vq, vs = rope_split_quantize_pallas(
                qkv, cos, sin, D, KVH, hd)
            q = qr.reshape(B, chunk, NH, hd)
            kqt = kq.reshape(B, chunk, KVH, hd).transpose(0, 2, 1, 3)
            vqt = vq.reshape(B, chunk, KVH, hd).transpose(0, 2, 1, 3)
            kst = ks.reshape(B, chunk, KVH).transpose(0, 2, 1)
            vst = vs.reshape(B, chunk, KVH).transpose(0, 2, 1)
            ck_, cv_, cks_, cvs_ = kv_cache_write_chunk(
                kqt, vqt, kst, vst, jnp.int32(i * chunk), l,
                ck_, cv_, cks_, cvs_)
            k_l = jax.lax.dynamic_index_in_dim(ck_, l, 0, keepdims=False)
            v_l = jax.lax.dynamic_index_in_dim(cv_, l, 0, keepdims=False)
            ks_l = jax.lax.dynamic_index_in_dim(cks_, l, 0, keepdims=False)
            vs_l = jax.lax.dynamic_index_in_dim(cvs_, l, 0, keepdims=False)
            att = flash_prefill_attention(
                q, k_l, v_l, start_vec, ks_l, vs_l,
                max_keys=T, out_dtype=x.dtype).reshape(M, D)
            x2 = w8a8_matmul(att, lp.wo, out_dtype=x.dtype, residual=x2)
            hq, hs = rmsnorm_quantize_pallas(x2, lp.rms_ffn)
            gu = w8a8_matmul_prequant(hq, hs, lp.w1, out_dtype=x.dtype)[:M]
            fq, fs = silu_mul_quantize_pallas(gu[:, :H], gu[:, H:])
            x2 = w8a8_matmul_prequant(fq, fs, lp.w2, out_dtype=x.dtype,
                                      residual=x2)[:M]
            return (x2.reshape(B, chunk, D), ck_, cv_, cks_, cvs_), None

        (x, *carr), _ = jax.lax.scan(layer_step, (x, *carr),
                                     (params.layers, layer_ix))
        # this chunk's next-token logits at each row's final valid position
        len_c = jnp.clip(lengths - i * chunk, 1, chunk)
        xl = jnp.take_along_axis(
            x, jnp.clip(len_c - 1, 0, chunk - 1)[:, None, None], axis=1)[:, 0]
        xl = rmsnorm(xl, params.rms_final)
        per_chunk.append(matmul_any(xl, params.wcls, prec))

    owner = jnp.clip((lengths - 1) // chunk, 0, n - 1)  # [B]
    last = jnp.take_along_axis(
        jnp.stack(per_chunk), owner[None, :, None], axis=0)[0]  # [B, V]
    new_cache = QuantKVCache(k=carr[0], v=carr[1], ks=carr[2], vs=carr[3])
    return last.astype(jnp.float32), new_cache


def _prefill_chunked_carry_ok(params, config: ModelConfig, cache, B: int,
                              chunk: int) -> bool:
    """Gate for forward_prefill_chunked_carry: fused-W8A8 stage envelope +
    int8 dense cache + the write kernel's alignment contract."""
    return (isinstance(cache, QuantKVCache)
            and _prefill_w8a8_fast_ok(params, config, B, chunk)
            and config.head_dim % 128 == 0
            and chunk % 128 == 0
            and cache.k.shape[-2] % 128 == 0)


# Unroll bound for the pool-direct chunk loop: every serving geometry
# (T <= 4096 at chunk 256) stays unrolled; past it the program-size cost
# of unrolling outweighs compile-robustness and the scan form is used.
# Env-overridable (trace-time read, like the fused-prefill gates) so
# compile probes can map the unrolled envelope without code edits.
import os as _os  # noqa: E402

_PAGED_UNROLL_CHUNKS = int(_os.environ.get("TPU_LLAMA_PAGED_UNROLL", "16"))


def forward_prefill_paged_chunked(
    params: LlamaParams,
    cache: PagedKVCache,
    tokens: jax.Array,  # [B, T] int32 — this wave's prompt slice
    lengths: jax.Array,  # [B] ABSOLUTE prompt lengths (incl. earlier waves)
    slots: jax.Array,  # [B] slot ids (rows of the page table)
    config: ModelConfig,
    precision: str = "default",
    chunk: int = 256,
    start0: jax.Array | None = None,  # [] int32 — absolute position of
    # tokens[:, 0]; TRACED so every wave of a host-dispatched long prompt
    # reuses ONE compiled program.  Must be a multiple of chunk (the pool
    # write kernel's start % Tc == 0 contract); None = fresh (0).
    max_pos: int | None = None,  # static bound on start0 + T across all
    # waves (sizes the past-page walk); None = T (single-wave behavior)
):
    """Chunked prefill DIRECTLY INTO the page pool — no compact duplicate
    cache, no dense gather.  Returns (next-token logits [B, V], cache).

    Single-chip capacity is the reason this exists (NEXT r3 #4b): at 7B
    b64 x 512, params (6.7 GB) + pool (8.7 GB) leave ~0.35 GB of HBM, so
    the admission path cannot afford the compact [L, B, KVH, T, hd] block
    that ``_prefill_into_slots`` scatters (8.6 GB at b64) — the pool must
    be both the attention operand and the write target.  Per chunk, per
    layer: queries attend past keys in the pool via
    :func:`paged_flash_prefill_attention` (page-table index maps) plus the
    chunk's own fresh rows; the chunk's K/V then land with ONE aliased
    :func:`kv_pool_write_chunk` (the pool rides the scan CARRY, the
    established in-place pattern).  Temporaries are O(B x chunk).

    Numerically identical to the compact path: same quantize-before-
    transpose rows, same online-softmax attention over the same keys.
    Generalizes the reference's teacher-forced prompt loop
    (llama2.ts:471-474) to batched paged admission.

    Chunk-loop form (r5): the chunk loop is UNROLLED in Python for
    n <= _PAGED_UNROLL_CHUNKS — the r5 AOT compiler breaks the
    scan-over-chunks class at fresh geometries (loop-invariant params
    cloned into program space; silu+quant scoped-vmem growth inside while
    contexts — see forward_prefill_chunked_unrolled's docstring and
    env_probe7.log), so serving geometry changes must not depend on stale
    server-side compile-cache entries.  Each unrolled chunk is the proven
    carry shape: straight-line stages + ONE top-level layer scan with the
    pool in the carry.  Longer prompts fall back to the scan form (program
    size), which on TPU needs a geometry the compile service has already
    accepted."""
    from tpu_llama.ops.attention import (
        kv_pool_write_chunk,
        paged_flash_prefill_attention,
    )

    B, T = tokens.shape
    ps = cache.k.shape[3]
    assert T % chunk == 0 and ps % chunk == 0, (T, chunk, ps)
    mpos = max_pos if max_pos is not None else T
    assert mpos >= T, (mpos, T)
    if start0 is None:
        start0 = jnp.int32(0)
    # A prompt longer than per-slot capacity would make kv_pool_write_chunk's
    # scalar-prefetch read pt_ref[b, start//ps] PAST the table — an undefined
    # page id corrupting the pool (the compact path maps overflow to the
    # trash page; this path must refuse instead).  Static shapes, zero cost.
    assert -(-mpos // ps) <= cache.page_table.shape[1], (
        f"prompt buckets to {mpos} positions = {-(-mpos // ps)} pages/slot, "
        f"but the page table holds {cache.page_table.shape[1]} — raise "
        "seq_len or reject the request at admission")
    n = T // chunk
    prec = (jax.lax.Precision(precision) if isinstance(precision, str)
            else precision)
    # pages that can hold PAST keys (max absolute start = mpos - chunk);
    # >=1 column so the kernel's page-table prefetch stays well-formed
    past_pages = -(-(mpos - chunk) // ps)
    pt = cache.page_table[slots][:, :max(1, -(-mpos // ps))]
    L = config.n_layers
    layer_ix = jnp.arange(L, dtype=jnp.int32)
    H, KVH, hd = config.n_heads, config.n_kv_heads, config.head_dim
    # FFN row blocks of <= 2048 keep the gate-up output under ~90 MB — at
    # b64 the whole chunk working set must fit in the ~0.3 GB of HBM left
    # beside params + pool (XLA memory_analysis r3: 15.62 GB total was
    # still a runtime ResourceExhausted at the 15.75 limit)
    ffn_split = 1
    while (B * chunk) // ffn_split > 2048 and (B * chunk) % (
            2 * ffn_split) == 0:
        ffn_split *= 2

    def mm(a, w):
        return matmul_any(a, w, prec)

    # fused one-pass W8A8 stages (see _forward_prefill_fresh); the pool is
    # always INT8, so the only gates are the fused layout + aligned shapes.
    # ffn_split > 1 (the b64 admission waves) stays UNFUSED: the fused
    # paged body with the row-split lax.map crashed the remote compile
    # helper (HTTP 500, r4 sweep) where the 3f24db2 unfused wave program
    # is proven on-chip — re-gate only with a green compile probe.
    w8a8_fast = (_prefill_w8a8_fast_ok(params, config, B, chunk)
                 and hd % 128 == 0 and ffn_split == 1)

    def chunk_body(pool, i):
        ck, cv, cks, cvs = pool
        start_s = i * chunk  # wave-relative (indexes THIS wave's tokens)
        tok_c = jax.lax.dynamic_slice(
            tokens, (jnp.int32(0), start_s), (B, chunk))
        x = params.tok_emb[tok_c]  # [B, Tc, D]
        # absolute positions: rope phases, pool write offsets, and the
        # attention past-walk all live in start0 + wave-relative space
        poss = start0 + start_s + jnp.arange(chunk)  # [Tc]
        cos = jnp.broadcast_to(params.rope_cos[poss][None],
                               (B, chunk, hd // 2))
        sin = jnp.broadcast_to(params.rope_sin[poss][None],
                               (B, chunk, hd // 2))
        start_vec = jnp.full((B,), start_s, jnp.int32) + start0

        def layer_step_w8a8(carry, scanned):
            # fused one-pass stages (same ladder as _forward_prefill_fresh /
            # the non-fresh fused body): rmsnorm+quant, qkv rope/split/quant
            # epilogue, residual matmul epilogues, silu+quant — the b32/b64
            # admission pays these XLA chains PER CHUNK otherwise
            from tpu_llama.ops.matmul import w8a8_matmul, w8a8_matmul_prequant
            from tpu_llama.ops.quant import (
                rmsnorm_quantize_pallas,
                rope_split_quantize_pallas,
                silu_mul_quantize_pallas,
            )

            x, ck, cv, cks, cvs = carry
            lp, l = scanned
            D, HID = config.dim, config.hidden_dim
            M = B * chunk
            x2 = x.reshape(M, D)
            xq_, sx_ = rmsnorm_quantize_pallas(x2, lp.rms_att)
            qkv = w8a8_matmul_prequant(xq_, sx_, lp.wq,
                                       out_dtype=x.dtype)[:M]
            qr, kqr, ksr, vqr, vsr = rope_split_quantize_pallas(
                qkv, cos, sin, D, KVH, hd)
            q = qr.reshape(B, chunk, H, hd)
            kq = kqr.reshape(B, chunk, KVH, hd).transpose(0, 2, 1, 3)
            vq = vqr.reshape(B, chunk, KVH, hd).transpose(0, 2, 1, 3)
            ks = ksr.reshape(B, chunk, KVH).transpose(0, 2, 1)
            vs = vsr.reshape(B, chunk, KVH).transpose(0, 2, 1)
            att = paged_flash_prefill_attention(
                q, ck, cv, cks, cvs, pt, start_vec, kq, vq, ks, vs,
                layer=l, past_pages=past_pages).astype(x.dtype)
            ck, cv, cks, cvs = kv_pool_write_chunk(
                kq, vq, ks, vs, pt, start_vec, l, ck, cv, cks, cvs)
            x2 = w8a8_matmul(att.reshape(M, D), lp.wo, out_dtype=x.dtype,
                             residual=x2)
            hq, hs = rmsnorm_quantize_pallas(x2, lp.rms_ffn)
            if ffn_split > 1:
                # row-split the FFN (see layer_step) with the fused stages:
                # the [rows, 2H] gate-up block stays the peak — cap it
                def ff(args):
                    hqb, hsb, x2b = args
                    gu = w8a8_matmul_prequant(hqb, hsb, lp.w1,
                                              out_dtype=x.dtype)
                    fq, fs = silu_mul_quantize_pallas(gu[:, :HID],
                                                      gu[:, HID:])
                    return w8a8_matmul_prequant(fq, fs, lp.w2,
                                                out_dtype=x.dtype,
                                                residual=x2b)

                mb = M // ffn_split
                x2 = jax.lax.map(
                    ff, (hq.reshape(ffn_split, mb, D),
                         hs.reshape(ffn_split, mb),
                         x2.reshape(ffn_split, mb, D))).reshape(M, D)
            else:
                gu = w8a8_matmul_prequant(hq, hs, lp.w1,
                                          out_dtype=x.dtype)[:M]
                fq, fs = silu_mul_quantize_pallas(gu[:, :HID], gu[:, HID:])
                x2 = w8a8_matmul_prequant(fq, fs, lp.w2, out_dtype=x.dtype,
                                          residual=x2)[:M]
            return (x2.reshape(B, chunk, D), ck, cv, cks, cvs), None

        def layer_step(carry, scanned):
            x, ck, cv, cks, cvs = carry
            lp, l = scanned
            h = rmsnorm(x, lp.rms_att)
            q, k, v = _project_qkv(h, lp, config, mm)
            q = apply_rope(q.reshape(B, chunk, H, hd), cos, sin)
            k = apply_rope(k.reshape(B, chunk, KVH, hd), cos, sin)
            v = v.reshape(B, chunk, KVH, hd)
            # quantize BEFORE the head-major transpose (prefill_probe r3)
            kq, ks = quantize_kv(k)  # [B, Tc, KVH, hd] / [B, Tc, KVH]
            vq, vs = quantize_kv(v)
            kq = kq.transpose(0, 2, 1, 3)  # [B, KVH, Tc, hd]
            vq = vq.transpose(0, 2, 1, 3)
            ks = ks.transpose(0, 2, 1)
            vs = vs.transpose(0, 2, 1)
            att = paged_flash_prefill_attention(
                q, ck, cv, cks, cvs, pt, start_vec, kq, vq, ks, vs,
                layer=l, past_pages=past_pages).astype(x.dtype)
            ck, cv, cks, cvs = kv_pool_write_chunk(
                kq, vq, ks, vs, pt, start_vec, l, ck, cv, cks, cvs)
            x = x + mm(att, lp.wo)
            h = rmsnorm(x, lp.rms_ffn)
            if ffn_split > 1:
                # the gate-up output ([rows, 2H] bf16, 360 MB at 8k rows) is
                # the peak of the chunk working set — row-split it so the
                # b64 admission fits next to params + pool (runtime OOM
                # otherwise; rows are independent through the FFN)
                hr = h.reshape(ffn_split, (B * chunk) // ffn_split, -1)

                def ff(hs):
                    g_, u_ = _project_gate_up(hs, lp, config, mm)
                    return mm(jax.nn.silu(g_) * u_, lp.w2)

                x = x + jax.lax.map(ff, hr).reshape(x.shape)
            else:
                gate, up = _project_gate_up(h, lp, config, mm)
                x = x + mm(jax.nn.silu(gate) * up, lp.w2)
            return (x, ck, cv, cks, cvs), None

        (x, ck, cv, cks, cvs), _ = jax.lax.scan(
            layer_step_w8a8 if w8a8_fast else layer_step,
            (x, ck, cv, cks, cvs), (params.layers, layer_ix))
        # classifier at each row's last valid position within this chunk
        # (lengths are absolute; this chunk covers absolute positions
        # [start0 + start_s, start0 + start_s + chunk))
        own_t = jnp.clip(lengths - 1 - start0 - start_s, 0, chunk - 1)
        xl = jnp.take_along_axis(x, own_t[:, None, None], axis=1)[:, 0]
        xl = rmsnorm(xl, params.rms_final)
        logits_c = matmul_any(xl, params.wcls, prec)  # [B, V]
        return (ck, cv, cks, cvs), logits_c.astype(jnp.float32)

    pool = (cache.k, cache.v, cache.ks, cache.vs)
    if n <= _PAGED_UNROLL_CHUNKS:
        per_chunk = []
        for i in range(n):
            pool, logits_c = chunk_body(pool, i)
            per_chunk.append(logits_c)
        per_chunk = jnp.stack(per_chunk)  # [n, B, V]
    else:
        pool, per_chunk = jax.lax.scan(chunk_body, pool, jnp.arange(n))
    # which of THIS WAVE's chunks holds each row's final valid token
    # (clipped, so mid-prompt waves return well-formed junk logits that
    # the caller discards — only the wave containing lengths-1 matters)
    owner = jnp.clip((lengths - 1 - start0) // chunk, 0, n - 1)  # [B]
    last = jnp.take_along_axis(
        per_chunk, owner[None, :, None], axis=0)[0]  # [B, V]
    return last, PagedKVCache(*pool, page_table=cache.page_table)


@partial(jax.jit, static_argnames=("config", "steps", "precision", "attn",
                                   "unroll", "fused"), donate_argnums=(1,))
def greedy_decode_loop(
    params: LlamaParams,
    cache,
    tokens: jax.Array,  # [B] int32 — first token to feed
    pos: jax.Array,  # [B] int32 — position of that token
    steps: int,
    config: ModelConfig,
    precision: str = "default",
    attn: str = "auto",
    unroll: int = 1,
    fused: str | bool = "auto",
):
    """``steps`` greedy decode steps fused into one jitted lax.scan.

    The whole loop is a single XLA program: the sampled token feeds back on
    device, so per-step host dispatch (the dominant cost on remote/relay TPU
    setups and a real cost everywhere) is amortized away.  Returns
    (tokens [B, steps], final cache).
    """

    def body(carry, _):
        toks, cache, p = carry
        logits, cache = forward_decode(params, cache, toks, p, config,
                                       precision=precision, attn=attn,
                                       unroll=unroll, fused=fused)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return (nxt, cache, p + 1), nxt

    (_, cache, _), out = jax.lax.scan(
        body, (tokens, cache, pos), length=steps)
    return out.T, cache  # [B, steps]


@partial(jax.jit, static_argnames=("config", "precision", "logits_mode",
                                   "attn", "max_keys", "assume_fresh"),
         donate_argnums=(1,))
def forward_prefill(
    params: LlamaParams,
    cache: KVCache,
    tokens: jax.Array,  # [B, T] int32
    start_pos: jax.Array,  # [B] int32 — write offset into the cache
    lengths: jax.Array,  # [B] int32 — valid token count per row
    config: ModelConfig,
    precision: str = "highest",
    logits_mode: str = "all",  # "all": [B,T,V]; "last": [B,V] at lengths-1
    attn: str = "auto",  # "auto" | "flash" | "xla" (int8 caches use xla-dequant)
    max_keys: int | None = None,  # static bound on start_pos[b]+T (see
    # flash_prefill_attention) — prefill-from-zero callers pass T
    assume_fresh: bool = False,  # STATIC promise: start_pos == 0 everywhere
    # and the cache holds nothing this pass attends to — takes the
    # cache-out-of-the-loop fast path (see _forward_prefill_fresh)
):
    """Batched causal prefill. Returns (logits [B, T, V], new cache).

    The reference has no batched prefill — it teacher-forces prompt tokens
    through the sequential decode loop (llama2.ts:471-474, SURVEY §3.3).
    This runs the whole prompt in one jitted pass; positions beyond
    ``lengths`` are masked out of the cache via position clamping.
    """
    if assume_fresh:
        return _forward_prefill_fresh(params, cache, tokens, lengths,
                                      config, precision, logits_mode, attn)
    prec = jax.lax.Precision(precision) if isinstance(precision, str) else precision
    if attn == "auto":
        # the XLA einsum path materializes [B, KVH, T, S] f32 scores — tens
        # of GB at 7B serving shapes — so the O(block) flash kernel is the
        # TPU default; CPU (tests) keeps the einsum for speed under interpret
        attn = "flash" if jax.default_backend() == "tpu" else "xla"
    B, T = tokens.shape
    S = cache.seq_len
    x = params.tok_emb[tokens]  # [B, T, D]
    q_pos = start_pos[:, None] + jnp.arange(T)[None, :]  # [B, T]
    # Padding positions (t >= lengths[b]) write garbage k/v at their own
    # slots — harmless: no valid query in this pass attends past its own
    # position, and subsequent decode steps overwrite slot `pos` before
    # attending to it (decode mask is s <= pos).  Clamp only to stay in
    # bounds when a caller overflows the cache.
    write_pos = jnp.clip(q_pos, 0, S - 1)
    cos = params.rope_cos[write_pos]  # [B, T, hd/2]
    sin = params.rope_sin[write_pos]

    batch_idx = jnp.arange(B)

    def mm(a, w):
        return matmul_any(a, w, prec)

    # Fused one-pass stages for the W8A8 layout (same ladder as
    # _forward_prefill_fresh: rmsnorm+quant, qkv rope/split/quant epilogue,
    # residual matmul epilogues, silu+quant) — this body serves chunked
    # prefill (b16+ TTFT) and start_pos>0 continuations, which paid the
    # same per-layer XLA op chains the fresh path shed.
    D, KVD, H = config.dim, config.kv_dim, config.hidden_dim
    w8a8_fast = (_prefill_w8a8_fast_ok(params, config, B, T)
                 and isinstance(cache, QuantKVCache) and attn == "flash"
                 and config.head_dim % 128 == 0)

    def layer_step_w8a8(x, scanned):
        from tpu_llama.ops.matmul import w8a8_matmul, w8a8_matmul_prequant
        from tpu_llama.ops.quant import (
            rmsnorm_quantize_pallas,
            rope_split_quantize_pallas,
            silu_mul_quantize_pallas,
        )

        lp, cache_l = scanned
        KVH, hd = config.n_kv_heads, config.head_dim
        M = B * T
        x2 = x.reshape(M, D)
        xq_, sx_ = rmsnorm_quantize_pallas(x2, lp.rms_att)
        qkv = w8a8_matmul_prequant(xq_, sx_, lp.wq, out_dtype=x.dtype)[:M]
        qr, kq, ks, vq, vs = rope_split_quantize_pallas(
            qkv, cos, sin, D, KVH, hd)
        q = qr.reshape(B, T, config.n_heads, hd)
        kqt = kq.reshape(B, T, KVH, hd).transpose(0, 2, 1, 3)
        vqt = vq.reshape(B, T, KVH, hd).transpose(0, 2, 1, 3)
        kst = ks.reshape(B, T, KVH).transpose(0, 2, 1)
        vst = vs.reshape(B, T, KVH).transpose(0, 2, 1)
        b_ix = batch_idx[:, None, None]
        h_ix = jnp.arange(KVH)[None, :, None]
        p_ix = write_pos[:, None, :]
        cache_l = QuantKVCache(
            k=cache_l.k.at[b_ix, h_ix, p_ix].set(kqt),
            v=cache_l.v.at[b_ix, h_ix, p_ix].set(vqt),
            ks=cache_l.ks.at[b_ix, h_ix, p_ix].set(kst),
            vs=cache_l.vs.at[b_ix, h_ix, p_ix].set(vst),
        )
        att = flash_prefill_attention(
            q, cache_l.k, cache_l.v, start_pos, cache_l.ks, cache_l.vs,
            max_keys=max_keys, out_dtype=x.dtype).reshape(M, D)
        x2 = w8a8_matmul(att, lp.wo, out_dtype=x.dtype, residual=x2)
        hq, hs = rmsnorm_quantize_pallas(x2, lp.rms_ffn)
        gu = w8a8_matmul_prequant(hq, hs, lp.w1, out_dtype=x.dtype)[:M]
        fq, fs = silu_mul_quantize_pallas(gu[:, :H], gu[:, H:])
        x2 = w8a8_matmul_prequant(fq, fs, lp.w2, out_dtype=x.dtype,
                                  residual=x2)[:M]
        return x2.reshape(B, T, D), cache_l

    def layer_step(x, scanned):
        lp, cache_l = scanned
        h = rmsnorm(x, lp.rms_att)
        q, k, v = _project_qkv(h, lp, config, mm)
        q = q.reshape(B, T, config.n_heads, config.head_dim)
        k = k.reshape(B, T, config.n_kv_heads, config.head_dim)
        v = v.reshape(B, T, config.n_kv_heads, config.head_dim)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
        # [B, T, KVH, hd] -> head-major [B, KVH, T, hd], scatter at [B, 1, T]
        kt = k.transpose(0, 2, 1, 3)
        vt = v.transpose(0, 2, 1, 3)
        b_ix = batch_idx[:, None, None]  # [B,1,1]
        h_ix = jnp.arange(config.n_kv_heads)[None, :, None]  # [1,KVH,1]
        p_ix = write_pos[:, None, :]  # [B,1,T]
        if isinstance(cache_l, QuantKVCache):
            kq, ks = quantize_kv(kt)
            vq, vs = quantize_kv(vt)
            cache_l = QuantKVCache(
                k=cache_l.k.at[b_ix, h_ix, p_ix].set(kq),
                v=cache_l.v.at[b_ix, h_ix, p_ix].set(vq),
                ks=cache_l.ks.at[b_ix, h_ix, p_ix].set(ks),
                vs=cache_l.vs.at[b_ix, h_ix, p_ix].set(vs),
            )
            if attn == "flash":
                # scales stay in-kernel: no layer-wide f32 dequant temporary
                att = flash_prefill_attention(
                    q, cache_l.k, cache_l.v, start_pos, cache_l.ks,
                    cache_l.vs, max_keys=max_keys,
                    out_dtype=x.dtype).reshape(B, T, config.dim)
            else:
                kf = cache_l.k.astype(jnp.float32) * cache_l.ks[..., None]
                vf = cache_l.v.astype(jnp.float32) * cache_l.vs[..., None]
                att = _attention_prefill(q, kf, vf, q_pos, config, prec)
        else:
            cache_l = KVCache(
                k=cache_l.k.at[b_ix, h_ix, p_ix].set(kt.astype(cache_l.k.dtype)),
                v=cache_l.v.at[b_ix, h_ix, p_ix].set(vt.astype(cache_l.v.dtype)),
            )
            if attn == "flash":
                att = flash_prefill_attention(
                    q, cache_l.k, cache_l.v, start_pos,
                    max_keys=max_keys,
                    out_dtype=x.dtype).reshape(B, T, config.dim)
            else:
                att = _attention_prefill(q, cache_l.k, cache_l.v, q_pos,
                                         config, prec)
        x = x + mm(att, lp.wo)
        h = rmsnorm(x, lp.rms_ffn)
        gate, up = _project_gate_up(h, lp, config, mm)
        x = x + mm(jax.nn.silu(gate) * up, lp.w2)
        return x, cache_l

    x, new_cache = jax.lax.scan(layer_step_w8a8 if w8a8_fast else layer_step,
                                x, (params.layers, cache))
    if logits_mode == "last":
        # classifier only at each row's final valid position — the admission
        # path needs just the next-token logits; skips T x V matmul work
        x = jnp.take_along_axis(
            x, jnp.clip(lengths - 1, 0, T - 1)[:, None, None], axis=1)[:, 0]
    x = rmsnorm(x, params.rms_final)
    logits = matmul_any(x, params.wcls, prec)
    return logits.astype(jnp.float32), new_cache
