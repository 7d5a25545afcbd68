"""Fused INT8-dequant + matmul Pallas kernel — the hot op.

The reference's entire FLOP budget lives in one naive fp32 matvec
(llama2.ts:196-203, SURVEY §3.3: 7 call sites/layer + classifier).  The
TPU-native equivalent: weights stay INT8 in HBM (halving the bandwidth that
bounds decode), are dequantized to bf16 *in VMEM* per tile, and feed the MXU
with f32 accumulation.  No [in, out] fp intermediate ever exists in HBM —
that is the entire point vs. ``dequantize() @ x`` which XLA may materialize.

Layout: x [B, IN] fp, q int8 [IN, OUT], s f32 [IN/g, OUT] (see ops/quant.py).
Grid (out_tiles, in_tiles), in minor; f32 accumulator scratch persists across
in-steps; output written on the last in-step.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_llama.ops.quant import ChannelQuantTensor, QuantTensor, quantize_activations


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _pick_in_tile(IN: int, g: int) -> int:
    """In-tile: Mosaic needs lane blocks (x's TI) that are multiples of 128
    and scale sublane chunks (TI/g) that are multiples of 8 — i.e. TI a
    multiple of align = max(8g, 128).  quantize_q8 pads IN to that alignment.
    """
    from tpu_llama.ops.quant import kernel_alignment

    align = kernel_alignment(g)
    if IN % align != 0:
        raise ValueError(
            f"padded in_features {IN} not aligned to {align} for group {g}; "
            "quantize with tpu_llama.ops.quantize_q8 (it pads)"
        )
    for c in (512, 256):
        if c % align == 0 and IN % c == 0:
            return c
    return align


def _pick_out_tile(OUT: int) -> int:
    """Out-tile: multiple of 128 or full.  256 keeps double-buffered int8
    blocks comfortably inside VMEM even at IN up to ~12k."""
    for c in (256, 512, 128):
        if OUT % c == 0:
            return c
    return OUT


def _q8_matmul_kernel(x_ref, q_ref, s_ref, o_ref, acc_ref, *, g: int, n_in: int):
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # Element-wise per-group dequant: [TI, TO] -> [TI/g, g, TO] * s[:, None, :].
    # (NOT pltpu.repeat — that is tile-concat, not element repeat.)
    ti, to = q_ref.shape
    qg = q_ref[:].astype(jnp.bfloat16).reshape(ti // g, g, to)
    w = (qg * s_ref[:].astype(jnp.bfloat16)[:, None, :]).reshape(ti, to)
    acc_ref[:] += jnp.dot(
        x_ref[:].astype(jnp.bfloat16), w, preferred_element_type=jnp.float32
    )

    @pl.when(i == n_in - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype", "block_out", "block_in"))
def q8_matmul(
    x: jax.Array,
    w: QuantTensor,
    out_dtype=jnp.float32,
    block_out: int | None = None,
    block_in: int | None = None,
) -> jax.Array:
    """``x @ dequantize(w)`` with in-VMEM dequant.

    x: [..., logical_in]; w.q: [IN_padded, OUT]; returns [..., OUT].
    B is padded to a multiple of 8; x's in-dim is zero-padded to the
    quantizer's kernel alignment (zero scales make the padding inert).
    """
    lead = x.shape[:-1]
    IN, OUT = w.q.shape
    g = w.group_size
    xb = x.reshape(-1, x.shape[-1])
    if xb.shape[-1] != IN:
        xb = jnp.pad(xb, ((0, 0), (0, IN - xb.shape[-1])))
    B = xb.shape[0]
    Bp = max(8, -(-B // 8) * 8)
    if Bp != B:
        xb = jnp.pad(xb, ((0, Bp - B), (0, 0)))

    TO = block_out or _pick_out_tile(OUT)
    TI = block_in or _pick_in_tile(IN, g)
    n_in = IN // TI
    n_out = OUT // TO

    kernel = functools.partial(_q8_matmul_kernel, g=g, n_in=n_in)
    out = pl.pallas_call(
        kernel,
        grid=(n_out, n_in),
        in_specs=[
            pl.BlockSpec((Bp, TI), lambda o, i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((TI, TO), lambda o, i: (i, o), memory_space=pltpu.VMEM),
            pl.BlockSpec((TI // g, TO), lambda o, i: (i, o), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Bp, TO), lambda o, i: (0, o), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, OUT), out_dtype),
        scratch_shapes=[pltpu.VMEM((Bp, TO), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * Bp * IN * OUT,
            bytes_accessed=Bp * IN * 4 + IN * OUT + (IN // g) * OUT * 4 + Bp * OUT * 4,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(xb, w.q, w.s)
    # logical_out metadata is global; under shard_map the local shard of an
    # unpadded tensor is smaller than it — effective out is their min.
    eff_out = min(w.logical_out, OUT)
    return out[:B, :eff_out].reshape(*lead, eff_out)


# ---------------------------------------------------------------------------
# W8A8: per-channel int8 weights x per-token int8 activations on the int8 MXU
# ---------------------------------------------------------------------------


def _w8a8_kernel(x_ref, sx_ref, q_ref, sw_ref, o_ref, acc_ref, *, n_in: int):
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # pure int8 MXU matmul with int32 accumulation — zero VPU dequant work
    acc_ref[:] += jnp.dot(x_ref[:], q_ref[:], preferred_element_type=jnp.int32)

    @pl.when(i == n_in - 1)
    def _():
        # one output-side rescale: row activation scale x column weight scale
        o_ref[:] = (
            acc_ref[:].astype(jnp.float32) * sx_ref[:] * sw_ref[:]
        ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype",))
def w8a8_matmul_xla(
    x: jax.Array, w: ChannelQuantTensor, out_dtype=jnp.float32
) -> jax.Array:
    """XLA-native W8A8: dynamic per-token activation quant, int8 dot with
    int32 accumulation, one output rescale.

    Measured FASTER than the Pallas kernel on the round-1 chip (559 vs 726
    us for the 4096x11008 decode shape) BUT XLA inserts full-weight relayout
    copies for the int8 dot that OOM 7B+ models — so this stays opt-in for
    small models and the Pallas kernel is the default (NEXT.md #3)."""
    lead = x.shape[:-1]
    IN, OUT = w.q.shape
    xb = x.reshape(-1, x.shape[-1])
    if xb.shape[-1] != IN:
        xb = jnp.pad(xb, ((0, 0), (0, IN - xb.shape[-1])))
    xq, sx = quantize_activations(xb)
    acc = jnp.dot(xq, w.q, preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * sx[:, None] * w.s[None, :]
    eff_out = min(w.logical_out, OUT)
    return out[:, :eff_out].reshape(*lead, eff_out).astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype", "block_out", "block_in"))
def w8a8_matmul(
    x: jax.Array,
    w: ChannelQuantTensor,
    out_dtype=jnp.float32,
    block_out: int | None = None,
    block_in: int | None = None,
) -> jax.Array:
    """``x @ dequant(w)`` where x is dynamically quantized per token and the
    contraction runs on the int8 MXU (2x bf16 MACs, 2-4x less HBM traffic,
    no in-path dequant)."""
    lead = x.shape[:-1]
    IN, OUT = w.q.shape
    xb = x.reshape(-1, x.shape[-1])
    if xb.shape[-1] != IN:
        xb = jnp.pad(xb, ((0, 0), (0, IN - xb.shape[-1])))
    B = xb.shape[0]
    Bp = max(32, -(-B // 32) * 32)  # int8 sublane tile is 32
    if Bp != B:
        xb = jnp.pad(xb, ((0, Bp - B), (0, 0)))

    xq, sx = quantize_activations(xb)  # int8 [Bp, IN], f32 [Bp]

    TO = block_out or _pick_out_tile(OUT)
    TI = block_in or (512 if IN % 512 == 0 else (256 if IN % 256 == 0 else IN))
    n_in = IN // TI
    n_out = OUT // TO

    kernel = functools.partial(_w8a8_kernel, n_in=n_in)
    out = pl.pallas_call(
        kernel,
        grid=(n_out, n_in),
        in_specs=[
            pl.BlockSpec((Bp, TI), lambda o, i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((Bp, 1), lambda o, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TI, TO), lambda o, i: (i, o), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TO), lambda o, i: (0, o), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Bp, TO), lambda o, i: (0, o), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, OUT), out_dtype),
        scratch_shapes=[pltpu.VMEM((Bp, TO), jnp.int32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * Bp * IN * OUT,
            bytes_accessed=Bp * IN + IN * OUT + OUT * 4 + Bp * OUT * 4,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(xq, sx[:, None], w.q, w.s[None, :])
    eff_out = min(w.logical_out, OUT)
    return out[:B, :eff_out].reshape(*lead, eff_out)
