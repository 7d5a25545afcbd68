"""Group-wise weight-only INT8 quantization (Q8_0-style).

The reference is pure fp32 (llama2.ts has no quantization); INT8 weights are
the BASELINE.json north-star extension: per-group symmetric absmax scaling,
groups of ``g`` consecutive weights along the **contraction** dimension —
the same grouping llama2.c's Q8_0 uses along a row of W(d, n), transposed to
our ``(in, out)`` layout where the contraction is axis -2.

A ``QuantTensor`` is a pytree; model code treats it as a drop-in weight
(`tpu_llama.models` dispatches matmuls on its type).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


def _dataclass_pytree(cls, meta=()):
    fields = [f.name for f in dataclasses.fields(cls) if f.name not in meta]
    return jax.tree_util.register_dataclass(
        cls, data_fields=fields, meta_fields=list(meta)
    )


@dataclasses.dataclass
class QuantTensor:
    """INT8 values + per-group scales.

    ``q``: int8, shape [..., in, out] — both dims may be zero-padded to
    kernel-friendly multiples (in: max(8g, 128); out: 128); ``logical_in`` /
    ``logical_out`` are the un-padded sizes.
    ``s``: f32, shape [..., in // g, out] — symmetric absmax scale per group
    of ``g`` consecutive elements along the contraction (in) axis.  Padding
    groups/columns have scale 0 (contribute nothing).
    """

    q: jax.Array
    s: jax.Array
    logical_in: int  # static metadata (pytree aux)
    logical_out: int

    @property
    def group_size(self) -> int:
        return self.q.shape[-2] // self.s.shape[-2]

    @property
    def shape(self):
        return (*self.q.shape[:-2], self.logical_in, self.logical_out)

    @property
    def in_features(self) -> int:
        return self.logical_in

    @property
    def padded_in(self) -> int:
        return self.q.shape[-2]

    @property
    def out_features(self) -> int:
        return self.logical_out

    @property
    def padded_out(self) -> int:
        return self.q.shape[-1]


_dataclass_pytree(QuantTensor, meta=("logical_in", "logical_out"))


def kernel_alignment(g: int) -> int:
    """The fused kernel tiles scales in sublane chunks of >=8 rows and data in
    lane chunks of >=128 — the in-dim must be a multiple of max(8g, 128)."""
    return max(8 * g, 128)


def pick_group_size(in_features: int, preferred: int = 64) -> int:
    """Largest group <= preferred whose kernel alignment divides in_features
    (no padding); otherwise the group minimizing padding (ties -> larger g)."""
    candidates = [g for g in (64, 32, 16) if g <= max(preferred, 16)]
    for g in candidates:
        if in_features % kernel_alignment(g) == 0:
            return g

    def padding(g):
        a = kernel_alignment(g)
        return -(-in_features // a) * a - in_features

    return min(candidates, key=padding)


def quantize_q8(w, group_size: int | None = None) -> QuantTensor:
    """Quantize [..., in, out] fp weights to per-group symmetric INT8.

    scale = absmax / 127 per group; q = round(w / scale) clipped to ±127.
    Round-to-nearest-even (jnp.rint); zero-scale groups map to q=0, s=0.
    The in-dim is zero-padded to the kernel alignment when needed (whole
    zero groups; recorded in ``logical_in``).
    """
    w = jnp.asarray(w)
    in_f, out_f = w.shape[-2:]
    g = group_size or pick_group_size(in_f)
    align = kernel_alignment(g)
    padded_in = -(-in_f // align) * align
    padded_out = -(-out_f // 128) * 128
    if (padded_in, padded_out) != (in_f, out_f):
        pad = [(0, 0)] * (w.ndim - 2) + [
            (0, padded_in - in_f), (0, padded_out - out_f)]
        w = jnp.pad(w, pad)
    lead = w.shape[:-2]
    wg = w.astype(jnp.float32).reshape(*lead, padded_in // g, g, padded_out)
    absmax = jnp.max(jnp.abs(wg), axis=-2)  # [..., in/g, out]
    s = absmax / 127.0
    inv = jnp.where(s > 0, 1.0 / jnp.where(s > 0, s, 1.0), 0.0)
    q = jnp.clip(jnp.rint(wg * inv[..., None, :]), -127, 127).astype(jnp.int8)
    return QuantTensor(
        q=q.reshape(*lead, padded_in, padded_out), s=s,
        logical_in=in_f, logical_out=out_f,
    )


def dequantize(t: QuantTensor, dtype=jnp.float32) -> jax.Array:
    g = t.group_size
    lead = t.q.shape[:-2]
    in_f, out_f = t.q.shape[-2:]
    qg = t.q.reshape(*lead, in_f // g, g, out_f).astype(jnp.float32)
    w = qg * t.s[..., None, :]
    w = w.reshape(*lead, in_f, out_f)
    w = w[..., : t.logical_in, : t.logical_out]
    return w.astype(dtype)


@dataclasses.dataclass
class ChannelQuantTensor:
    """Per-output-channel symmetric INT8 weights (W8 of W8A8).

    ``q``: int8 [..., in, out]; ``s``: f32 [..., out] — one scale per output
    column.  Unlike the groupwise Q8_0 layout, no scale varies along the
    contraction, so matmuls run *entirely in int8 on the MXU* with one
    output-side rescale — no per-element VPU dequant (the groupwise
    kernel's bottleneck).  Pair with per-token dynamic activation quant
    (quantize_activations) for the full W8A8 path.
    """

    q: jax.Array
    s: jax.Array
    logical_in: int
    logical_out: int
    # W4 storage variant (VERDICT r4 #6 — the w4a8 probe's capacity
    # dividend): ``q`` holds int8 BYTES [..., in, out/2], each packing two
    # int4 columns (byte j: col 2j low nibble, col 2j+1 high).  Compute
    # stays int8-MXU: consumers call :func:`unpack_channel4` INSIDE their
    # jit (int4 cannot cross a jit boundary through this relay,
    # W4A8_PROBE.json) and the Pallas kernels upcast the S4 blocks — the
    # measured-parity "int4 native astype" route.  Halves resident weight
    # HBM (7B: 6.7 -> 3.4 GB); speed parity per the r4 probe.
    packed4: bool = False

    @property
    def shape(self):
        return (*self.q.shape[:-2], self.logical_in, self.logical_out)

    @property
    def in_features(self) -> int:
        return self.logical_in

    @property
    def out_features(self) -> int:
        return self.logical_out

    @property
    def padded_out(self) -> int:
        return self.q.shape[-1] * (2 if self.packed4 else 1)


_dataclass_pytree(ChannelQuantTensor,
                  meta=("logical_in", "logical_out", "packed4"))


def quantize_channel(w) -> ChannelQuantTensor:
    """Per-out-channel symmetric absmax INT8; pads in->mult of 32 (int8
    sublane), out->mult of 128 (lanes) with zeros."""
    w = jnp.asarray(w)
    in_f, out_f = w.shape[-2:]
    padded_in = -(-in_f // 32) * 32
    padded_out = -(-out_f // 128) * 128
    if (padded_in, padded_out) != (in_f, out_f):
        pad = [(0, 0)] * (w.ndim - 2) + [
            (0, padded_in - in_f), (0, padded_out - out_f)]
        w = jnp.pad(w, pad)
    wf = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(wf), axis=-2)  # [..., out]
    s = absmax / 127.0
    inv = jnp.where(s > 0, 1.0 / jnp.where(s > 0, s, 1.0), 0.0)
    q = jnp.clip(jnp.rint(wf * inv[..., None, :]), -127, 127).astype(jnp.int8)
    return ChannelQuantTensor(q=q, s=s, logical_in=in_f, logical_out=out_f)


def pack_channel4(q4: jax.Array) -> jax.Array:
    """int4-valued int8 [..., in, out] -> packed bytes [..., in, out/2] in
    bitcast pair order (byte j = col 2j | col 2j+1 << 4) so
    :func:`unpack_channel4`'s bitcast+reshape recovers column order."""
    lo = q4[..., 0::2]
    hi = q4[..., 1::2]
    return (jnp.bitwise_and(lo, 0xF)
            | (jnp.bitwise_and(hi, 0xF) << 4)).astype(jnp.int8)


def unpack_channel4(t: ChannelQuantTensor) -> jax.Array:
    """Packed byte storage -> int4 array [..., in, out], INSIDE a jit.

    The bitcast is metadata-only and the trailing [out/2, 2] -> [out]
    reshape collapses minor-most dims of an S4 layout (layout-free); the
    result feeds the Pallas kernels, which upcast S4 blocks in-VMEM
    (tools/w4a8_probe.py int4/int4packed: measured wall-time parity with
    the int8 stream at every probed shape)."""
    assert t.packed4, "unpack_channel4 on a non-packed tensor"
    i4 = jax.lax.bitcast_convert_type(t.q, jnp.int4)  # [..., in, out/2, 2]
    return i4.reshape(*t.q.shape[:-1], t.q.shape[-1] * 2)


def quantize_channel4(w) -> ChannelQuantTensor:
    """Per-out-channel symmetric absmax INT4 (range ±7), packed two columns
    per byte; pads in->mult of 32, out->mult of 256 (so out/2 stays
    lane-aligned to 128)."""
    w = jnp.asarray(w)
    in_f, out_f = w.shape[-2:]
    padded_in = -(-in_f // 32) * 32
    padded_out = -(-out_f // 256) * 256
    if (padded_in, padded_out) != (in_f, out_f):
        pad = [(0, 0)] * (w.ndim - 2) + [
            (0, padded_in - in_f), (0, padded_out - out_f)]
        w = jnp.pad(w, pad)
    wf = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(wf), axis=-2)  # [..., out]
    s = absmax / 7.0
    inv = jnp.where(s > 0, 1.0 / jnp.where(s > 0, s, 1.0), 0.0)
    q4 = jnp.clip(jnp.rint(wf * inv[..., None, :]), -7, 7).astype(jnp.int8)
    return ChannelQuantTensor(q=pack_channel4(q4), s=s, logical_in=in_f,
                              logical_out=out_f, packed4=True)


def dequantize_channel(t: ChannelQuantTensor, dtype=jnp.float32) -> jax.Array:
    if t.packed4:
        q = unpack_channel4(t).astype(jnp.float32)
    else:
        q = t.q.astype(jnp.float32)
    w = q * t.s[..., None, :]
    return w[..., : t.logical_in, : t.logical_out].astype(dtype)


def quantize_activations(x: jax.Array):
    """Per-token (last-axis) dynamic symmetric INT8: returns (q int8, s f32
    [...,]) with x ~= q * s[..., None]."""
    xf = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(xf), axis=-1)
    s = absmax / 127.0
    inv = jnp.where(s > 0, 1.0 / jnp.where(s > 0, s, 1.0), 0.0)
    q = jnp.clip(jnp.rint(xf * inv[..., None]), -127, 127).astype(jnp.int8)
    return q, s


def _quant_rows_kernel(x_ref, q_ref, s_ref):
    xf = x_ref[:].astype(jnp.float32)
    absmax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    s = absmax / 127.0
    inv = jnp.where(s > 0, 1.0 / jnp.where(s > 0, s, 1.0), 0.0)
    q_ref[:] = jnp.clip(jnp.rint(xf * inv), -127, 127).astype(jnp.int8)
    s_ref[:] = s


def quantize_activations_pallas(x: jax.Array, block_rows: int = 256):
    """One-pass Pallas twin of ``quantize_activations`` for LARGE row
    counts (prefill): x [M, IN] -> (q int8 [M, IN], s f32 [M]).

    The XLA form costs ~0.43 ms per [4096, 4096] call on this chip (the
    reduce and the apply run as separate passes plus op-chain overhead;
    measured r3, tools/prefill_probe.py --probe qact) — ~55 ms of the 7B
    b8 T512 prefill across 4 calls/layer.  One fused pass runs at the
    read bandwidth.  Exact same formula; M must be a multiple of 8."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M, IN = x.shape
    BM = min(block_rows, M)
    # Keep the footprint SMALL (<=4 MB of blocks): this kernel feeds a
    # Pallas matmul consumer whose own scoped-vmem stack runs ~14 MB at the
    # prefill shapes, so a fat quant stage cannot co-exist in the placer's
    # budget.  The pass is a pure stream — more grid steps cost ~1 us each
    # against a ~180 us M=4096 stream, so small blocks are nearly free.
    per_row = IN * (2 * x.dtype.itemsize + 2)
    while BM > 8 and (M % BM != 0 or BM * per_row > 4 << 20):
        BM //= 2
    # Declared footprint = blocks + 2 MB headroom (Mosaic's real stack need
    # runs above the buffer model; measured r3 on the w8a8 consumer).  The
    # declaration lets the scoped-vmem placer schedule this producer
    # against the matmul instead of assuming worst-case overlap — the
    # reason this one-pass quant sat unwired while the XLA chain cost
    # ~0.43 ms per [4096, 4096] call, ~55 ms/prefill.
    vmem_bytes = BM * per_row + BM * 8 + (3 << 20)  # +3 MB: see the
    # rmsnorm/silu fused stages — r5 Mosaic stack need runs past 2 MB
    # slack in marginal program contexts
    q, s = pl.pallas_call(
        _quant_rows_kernel,
        grid=(M // BM,),
        in_specs=[pl.BlockSpec((BM, IN), lambda m: (m, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((BM, IN), lambda m: (m, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((BM, 1), lambda m: (m, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((M, IN), jnp.int8),
                   jax.ShapeDtypeStruct((M, 1), jnp.float32)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(vmem_bytes)),
        interpret=jax.default_backend() != "tpu",
    )(x)
    return q, s[:, 0]


def _rmsnorm_quant_kernel(x_ref, w_ref, q_ref, s_ref):
    # rmsnorm in f32 (reference eps placement, llama2.ts:172-179) quantized
    # WITHOUT the unfused path's intermediate bf16 rounding: XLA folds
    # f32->bf16->f32 convert chains inside one program anyway (excess
    # precision), so an in-kernel bf16 round-trip is both unreliable and
    # strictly less accurate.  Consumers compare at int8-quant tolerance.
    x32 = x_ref[:].astype(jnp.float32)
    ms = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    xf = (x32 * jax.lax.rsqrt(1e-5 + ms)) * w_ref[:].astype(jnp.float32)
    absmax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    s = absmax / 127.0
    inv = jnp.where(s > 0, 1.0 / jnp.where(s > 0, s, 1.0), 0.0)
    q_ref[:] = jnp.clip(jnp.rint(xf * inv), -127, 127).astype(jnp.int8)
    s_ref[:] = s


def rmsnorm_quantize_pallas(x: jax.Array, w: jax.Array,
                            block_rows: int = 256):
    """Fused rmsnorm (llama2.ts:172-179 numerics) + per-row INT8 quant in ONE
    Pallas pass: x [M, IN], w [IN] -> (q int8 [M, IN], s f32 [M]).

    Prefill's unfused chain is an XLA rmsnorm (reduce + apply, its own
    op-chain overhead and a full bf16 round trip through HBM) followed by
    the Pallas row quant — at 7B b8 T512 that is 2 x 32 calls reading and
    writing [4096, 4096] activations twice.  Fusing them reads x once and
    writes only the int8 rows."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M, IN = x.shape
    assert w.shape == (IN,), (x.shape, w.shape)
    BM = min(block_rows, M)
    per_row = IN * (2 * x.dtype.itemsize + 2)
    while BM > 8 and (M % BM != 0 or BM * per_row > 4 << 20):
        BM //= 2
    # +3 MB headroom, same rationale as silu_mul_quantize_pallas: the r5
    # Mosaic stack need runs just past the old (2 << 20) slack in marginal
    # program contexts (this kernel tipped a 31-page-pool 15-chunk prefill
    # by 47K where the 17-page-pool twin compiled)
    vmem_bytes = BM * per_row + 2 * IN * w.dtype.itemsize + BM * 8 + (3 << 20)
    q, s = pl.pallas_call(
        _rmsnorm_quant_kernel,
        grid=(M // BM,),
        in_specs=[pl.BlockSpec((BM, IN), lambda m: (m, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, IN), lambda m: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((BM, IN), lambda m: (m, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((BM, 1), lambda m: (m, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((M, IN), jnp.int8),
                   jax.ShapeDtypeStruct((M, 1), jnp.float32)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(vmem_bytes)),
        interpret=jax.default_backend() != "tpu",
    )(x, w[None, :])
    return q, s[:, 0]


def _silu_mul_quant_kernel(g_ref, u_ref, q_ref, s_ref):
    # silu(gate) * up in f32 (see _rmsnorm_quant_kernel on why the fused
    # ops define their numerics in f32), then the exact row-quant formula.
    xf = (jax.nn.silu(g_ref[:].astype(jnp.float32))
          * u_ref[:].astype(jnp.float32))
    absmax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    s = absmax / 127.0
    inv = jnp.where(s > 0, 1.0 / jnp.where(s > 0, s, 1.0), 0.0)
    q_ref[:] = jnp.clip(jnp.rint(xf * inv), -127, 127).astype(jnp.int8)
    s_ref[:] = s


def silu_mul_quantize_pallas(gate: jax.Array, up: jax.Array,
                             block_rows: int = 256):
    """Fused SwiGLU gate (silu(gate) * up) + per-row INT8 quant in ONE pass:
    gate/up [M, H] -> (q int8 [M, H], s f32 [M]).

    The unfused chain writes the [M, H] bf16 product to HBM and the quant
    kernel reads it back (~180 MB/layer round trip at 7B b8 T512, H=11008)
    plus a separate launch; fused, the product never leaves VMEM."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M, H = gate.shape
    assert up.shape == (M, H), (gate.shape, up.shape)
    BM = min(block_rows, M)
    # two fp inputs + one int8 output per row, all double-buffered
    per_row = H * (4 * gate.dtype.itemsize + 2)
    while BM > 8 and (M % BM != 0 or BM * per_row > 8 << 20):
        BM //= 2
    # +3 MB headroom over the window model: the r5 Mosaic stack need for
    # this kernel runs ~0.8 MB past the old (2 << 20) slack in several
    # contexts (while-loop bodies, B=4 c512 paged prefill: "9.48M need vs
    # 8.72M declared"), and the budget model is known to run ~0.7 MB under
    # reality elsewhere (CLAUDE.md negative-results ledger)
    vmem_bytes = BM * per_row + BM * 8 + (3 << 20)
    q, s = pl.pallas_call(
        _silu_mul_quant_kernel,
        grid=(M // BM,),
        in_specs=[pl.BlockSpec((BM, H), lambda m: (m, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((BM, H), lambda m: (m, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((BM, H), lambda m: (m, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((BM, 1), lambda m: (m, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((M, H), jnp.int8),
                   jax.ShapeDtypeStruct((M, 1), jnp.float32)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(vmem_bytes)),
        interpret=jax.default_backend() != "tpu",
    )(gate, up)
    return q, s[:, 0]


def _rope_split_quant_kernel(cos_ref, sa_ref, sb_ref, qkv_ref,
                             qo_ref, kq_ref, ks_ref, vq_ref, vs_ref,
                             *, D: int, KVD: int, KVH: int, hd: int):
    # rope in f32 (roll-based interleaved rotation, the decode mega2
    # formula — ops/fused_step2._rope_block — applied per hd-lane head via
    # a [BM, W/hd, hd] view), then quantize_kv's exact per-(row, head)
    # absmax formula on the UNROUNDED f32 values (see _rmsnorm_quant_kernel
    # on why the fused ops skip the unfused chain's intermediate bf16).
    from jax.experimental.pallas import tpu as pltpu

    BM = qkv_ref.shape[0]
    c = cos_ref[:][:, None, :]
    sa = sa_ref[:][:, None, :]
    sb = sb_ref[:][:, None, :]

    def rope3(x3):
        left = pltpu.roll(x3, hd - 1, axis=2)  # y[i] = x[i+1]
        right = pltpu.roll(x3, 1, axis=2)  # y[i] = x[i-1]
        return x3 * c + left * sa + right * sb

    def quant3(x3, q_ref, s_ref, width):
        am = jnp.max(jnp.abs(x3), axis=-1, keepdims=True)  # [BM, KVH, 1]
        s = am / 127.0
        inv = jnp.where(s > 0, 1.0 / jnp.where(s > 0, s, 1.0), 0.0)
        q_ref[:] = jnp.clip(jnp.rint(x3 * inv), -127, 127
                            ).astype(jnp.int8).reshape(BM, width)
        s_ref[:] = s[:, :, 0]

    q3 = qkv_ref[:, :D].astype(jnp.float32).reshape(BM, D // hd, hd)
    qo_ref[:] = rope3(q3).reshape(BM, D).astype(qo_ref.dtype)
    k3 = qkv_ref[:, D:D + KVD].astype(jnp.float32).reshape(BM, KVH, hd)
    quant3(rope3(k3), kq_ref, ks_ref, KVD)
    v3 = qkv_ref[:, D + KVD:].astype(jnp.float32).reshape(BM, KVH, hd)
    quant3(v3, vq_ref, vs_ref, KVD)


def rope_split_quantize_pallas(qkv: jax.Array, cos: jax.Array,
                               sin: jax.Array, D: int, KVH: int, hd: int,
                               block_rows: int = 128):
    """Fused qkv epilogue for the W8A8 prefill fast path, ONE Pallas pass:
    qkv [M, D + 2*KVD] -> (q roped [M, D] in qkv.dtype,
    kq int8 [M, KVD], ks f32 [M, KVH], vq int8 [M, KVD], vs f32 [M, KVH]).

    Replaces four XLA op chains per layer (apply_rope on q and k,
    quantize_kv on k and v — quantize_kv alone measured 49.6 ms across the
    64 calls of a 7B b8 T512 prefill, tools/prefill_probe.py r4) with one
    read of the qkv matmul output.  RoPE matches ``apply_rope``
    (llama2.ts:224-235 interleaved pairs) via the roll identity the decode
    kernels use; cos/sin arrive as [M, hd/2] rows (position-gathered).

    Requires hd % 128 == 0 (lane-aligned head slices) and M % 8 == 0.
    Callers must keep M <= 4096: fused prefill programs containing this
    pass at M=8192 crash the remote compile helper (r4 sweep)."""
    import functools

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from tpu_llama.ops.fused_step2 import rope_tables

    M, QO = qkv.shape
    KVD = KVH * hd
    assert QO == D + 2 * KVD, (qkv.shape, D, KVD)
    assert hd % 128 == 0 and M % 8 == 0, (hd, M)
    rc, rsa, rsb = rope_tables(cos.reshape(M, hd // 2),
                               sin.reshape(M, hd // 2), M)
    BM = min(block_rows, M)
    # footprint: qkv in + q out + int8 outs, double-buffered, plus the
    # kernel's f32 temporaries (~3 head-view blocks); keep blocks lean
    per_row = QO * 2 * qkv.dtype.itemsize + D * 2 * qkv.dtype.itemsize \
        + 2 * 2 * KVD + 3 * hd * 4
    while BM > 8 and (M % BM != 0 or BM * per_row > 8 << 20):
        BM //= 2
    vmem_bytes = BM * per_row + BM * (D + 2 * KVD) * 4 + (4 << 20)
    outs = pl.pallas_call(
        functools.partial(_rope_split_quant_kernel, D=D, KVD=KVD, KVH=KVH,
                          hd=hd),
        grid=(M // BM,),
        in_specs=[pl.BlockSpec((BM, hd), lambda m: (m, 0),
                               memory_space=pltpu.VMEM)] * 3
        + [pl.BlockSpec((BM, QO), lambda m: (m, 0),
                        memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((BM, D), lambda m: (m, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((BM, KVD), lambda m: (m, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((BM, KVH), lambda m: (m, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((BM, KVD), lambda m: (m, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((BM, KVH), lambda m: (m, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((M, D), qkv.dtype),
                   jax.ShapeDtypeStruct((M, KVD), jnp.int8),
                   jax.ShapeDtypeStruct((M, KVH), jnp.float32),
                   jax.ShapeDtypeStruct((M, KVD), jnp.int8),
                   jax.ShapeDtypeStruct((M, KVH), jnp.float32)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(min(vmem_bytes, int(15.5 * (1 << 20))))),
        interpret=jax.default_backend() != "tpu",
    )(rc, rsa, rsb, qkv)
    return outs


def quantization_error(w, group_size: int | None = None) -> float:
    """Relative RMS error of a quantize->dequantize roundtrip (diagnostics)."""
    t = quantize_q8(w, group_size)
    back = dequantize(t)
    w = jnp.asarray(w, jnp.float32)
    return float(jnp.sqrt(jnp.mean((w - back) ** 2) / (jnp.mean(w**2) + 1e-20)))
