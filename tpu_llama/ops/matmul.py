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

from tpu_llama.ops.quant import (ChannelQuantTensor, QuantTensor,
                                 quantize_activations, unpack_channel4)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# Per-weight-block int8 byte budget.  Round-1 postmortem: (256, 256) tiles
# made 688 grid steps on the 11008x4096 decode matmul; at ~1 us fixed cost
# per grid step the kernel ran at 53 GB/s vs the 261 GB/s HBM roofline
# (tools/kernel_bench.py).  Decode is a pure weight stream — the right shape
# is ONE in-block (x stays VMEM-resident) and few, multi-MB out-tiles so DMA
# time dwarfs per-step overhead.  3 MB double-buffered plus x/scales/acc
# stays well under the ~16 MB VMEM.
_BLOCK_BUDGET = 3 * 1024 * 1024


# Prefill-scale row blocking.  At M=4096 rows (7B b8 T512 prefill) the
# decode tiling (BM=256) makes 16 row-blocks and RE-STREAMS the full weight
# set per block — ~3.2 GB/layer of redundant HBM traffic, ~140 ms of the
# round-2 500 ms TTFT.  The x BlockSpec index is (m, i): with TI == IN the
# x block stays VMEM-resident across the whole out-tile sweep, so weight
# traffic is n_m * W and x streams exactly once.  Bigger BM => fewer weight
# re-streams; the cost model below balances that against grid-step overhead
# (~1 us/cell, CLAUDE.md) and the int8-MXU compute floor.
# Mosaic's REAL scoped-vmem use runs well above this model at large
# blocks (13B IN=13824 @ model 10.9 MB compiled to 17.1 MB real, r3);
# 12 MB reproduces exactly the 7B picks that compiled and ran, and
# IN > 8192 falls back to the decode tiling (known-compiling everywhere).
_VMEM_ROWS_BUDGET = 12 * 1024 * 1024
_ROWS_MAX_IN = 8192
_HBM_GBPS = 750e9   # measured big-tile w8a8 stream rate (CLAUDE.md)
_CELL_US = 1e-6     # measured Pallas grid-step overhead
_INT8_TOPS = 394e12


def _pick_tiles_rows(M: int, IN: int, OUT: int, align: int,
                     out_bytes: int, acc_bytes: int = 4,
                     scale_frac: float = 0.0,
                     x_bytes: int = 1,
                     res_bytes: int = 0) -> tuple[int, int, int] | None:
    """(BM, TI, TO) for row-blocked (prefill) matmuls, or None when no
    full-IN row block fits VMEM (caller falls back to ``_pick_tiles``).

    TI is pinned to IN: with the grid order (m, o, i) and acc scratch
    requiring i innermost, any TI < IN re-fetches x once per OUT tile
    (n_out * M * IN bytes) — strictly worse than weight re-streaming for
    every Llama shape.  ``scale_frac`` adds the per-group scale bytes that
    ride with each weight tile (4/g for Q8_0; ~0 for per-channel W8A8)."""
    if IN % align or IN > _ROWS_MAX_IN:
        return None
    best = None
    for bm in (2048, 1024, 512, 256):
        xb_bytes = 2 * bm * IN * x_bytes  # double-buffered row block
        for to in (1024, 768, 512, 384, 256, 128):
            if OUT % to:
                continue
            w_bytes = int(2 * IN * to * (1 + scale_frac))
            o_bytes = (2 * bm * to * (out_bytes + res_bytes)
                       + bm * to * acc_bytes)
            if xb_bytes + w_bytes + o_bytes > _VMEM_ROWS_BUDGET:
                continue
            n_m = -(-M // bm)
            cells = n_m * (OUT // to)
            traffic = (n_m * IN * OUT * (1 + scale_frac)
                       + M * IN * x_bytes)
            cost = (traffic / _HBM_GBPS + cells * _CELL_US
                    + 2 * M * IN * OUT / _INT8_TOPS)
            if best is None or cost < best[0]:
                best = (cost, bm, to)
    if best is None:
        return None
    return best[1], IN, best[2]


def _pick_tiles(IN: int, OUT: int, align: int) -> tuple[int, int]:
    """(TI, TO) with TI | IN (multiple of ``align``), TO | OUT (multiple of
    128), TI*TO <= budget, preferring full-IN blocks then the largest TO."""
    to_cands = [c for c in range(1024, 127, -128) if OUT % c == 0]
    if IN % align != 0:
        raise ValueError(
            f"padded in_features {IN} not aligned to {align}; "
            "quantize with tpu_llama.ops (it pads)")
    for to in to_cands:
        if IN * to <= _BLOCK_BUDGET:
            return IN, to
    # IN too large for a single block even at TO=128: split the contraction
    to = next((c for c in to_cands if c <= 256), to_cands[-1])
    ti_cands = [t for t in range(IN, align - 1, -align)
                if IN % t == 0 and t * to <= _BLOCK_BUDGET]
    if not ti_cands:
        raise ValueError(f"no VMEM-feasible tiling for ({IN}, {OUT})")
    return ti_cands[0], to


def _q8_matmul_kernel(x_ref, q_ref, s_ref, o_ref, acc_ref, *, g: int, n_in: int):
    i = pl.program_id(2)

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

    from tpu_llama.ops.quant import kernel_alignment

    # row blocking: decode batches fit one block; prefill's [B*T] rows use
    # the rows-aware picker so weights aren't re-streamed per row-block
    BM = min(Bp, 256)
    if block_out or block_in:
        TO = block_out or 256
        TI = block_in or IN
    else:
        picked = (_pick_tiles_rows(Bp, IN, OUT, kernel_alignment(g),
                                   out_bytes=jnp.dtype(out_dtype).itemsize,
                                   scale_frac=4.0 / g,
                                   x_bytes=xb.dtype.itemsize)
                  if Bp > 256 else None)
        if picked is not None:
            BM, TI, TO = picked
        else:
            TI, TO = _pick_tiles(IN, OUT, kernel_alignment(g))
    if Bp % BM:
        pad = -(-Bp // BM) * BM - Bp
        xb = jnp.pad(xb, ((0, pad), (0, 0)))
        Bp += pad
    n_m = Bp // BM
    n_in = IN // TI
    n_out = OUT // TO

    kernel = functools.partial(_q8_matmul_kernel, g=g, n_in=n_in)
    out = pl.pallas_call(
        kernel,
        grid=(n_m, n_out, n_in),
        in_specs=[
            pl.BlockSpec((BM, TI), lambda m, o, i: (m, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((TI, TO), lambda m, o, i: (i, o), memory_space=pltpu.VMEM),
            pl.BlockSpec((TI // g, TO), lambda m, o, i: (i, o), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BM, TO), lambda m, o, i: (m, o), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, OUT), out_dtype),
        scratch_shapes=[pltpu.VMEM((BM, TO), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
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


def _rows_resident_enabled() -> bool:
    """Resident-x rows kernel gate — env-controlled while the TPU A/B is
    pending (TPU_LLAMA_ROWS_RESIDENT=1 to enable).

    Read at TRACE time (the callers are jitted): flipping the env var
    mid-process has no effect on already-traced shapes.  A/B harnesses must
    run each arm in a fresh process or clear the jit cache between arms
    (tools/rows_resident_probe.py does the latter)."""
    import os

    return os.environ.get("TPU_LLAMA_ROWS_RESIDENT", "0") == "1"


def _pick_rows_resident(M: int, IN: int, OUT: int, out_bytes: int,
                        res_bytes: int = 0,
                        budget: int = int(13.2 * (1 << 20))):
    """(BM, TO) for the RESIDENT-X rows kernel, or None.

    The double-buffered x row-block of `_pick_tiles_rows` caps BM at
    1024 (qkv/wo) or 256-512 (w2, IN=11008) under the 16 MB scoped-vmem
    limit, so the weight matrix re-streams n_m = M/BM times — at 7B b8
    T512 that is 4-16 restreams, ~60% of the measured 230 ms matmul-only
    prefill floor gap (tools/prefill_probe.py r4).  Holding x SINGLE-
    buffered in a scratch filled by one manual DMA per m-block lets BM
    double: weight traffic halves/quarters and grid cells shrink.  The
    o==0 DMA stall (~11 us per m-block at 8 MB) is amortized over the
    n_out cells of that block."""
    if IN % 128 or M % 32:
        return None
    best = None
    for n_m in (1, 2, 4, 8):
        if M % n_m:
            continue
        bm = M // n_m
        if bm % 32 or bm > 4096:
            continue
        xv = bm * IN  # int8, SINGLE-buffered scratch
        for to in (512, 384, 256, 128):
            if OUT % to:
                continue
            w_bytes = 2 * (IN * to + to * 4)
            o_bytes = 2 * bm * to * (out_bytes + res_bytes) + bm * 8
            if xv + w_bytes + o_bytes > budget:
                continue
            cells = n_m * (OUT // to)
            traffic = n_m * IN * OUT + M * IN
            cost = (traffic / _HBM_GBPS + cells * _CELL_US
                    + 2 * M * IN * OUT / _INT8_TOPS)
            if best is None or cost < best[0]:
                best = (cost, bm, to)
    if best is None:
        return None
    return best[1], best[2]


def _w8a8_rows_res_kernel(sx_ref, q_ref, sw_ref, x_hbm, o_ref, xv, sem,
                          *, BM: int):
    m = pl.program_id(0)
    o = pl.program_id(1)

    @pl.when(o == 0)
    def _():
        cp = pltpu.make_async_copy(
            x_hbm.at[pl.ds(m * BM, BM), :], xv, sem)
        cp.start()
        cp.wait()

    acc = jnp.dot(xv[:], q_ref[:], preferred_element_type=jnp.int32)
    o_ref[:] = (acc.astype(jnp.float32) * sx_ref[:] * sw_ref[:]
                ).astype(o_ref.dtype)


def _w8a8_rows_res_res_kernel(sx_ref, q_ref, sw_ref, r_ref, x_hbm, o_ref,
                              xv, sem, *, BM: int):
    m = pl.program_id(0)
    o = pl.program_id(1)

    @pl.when(o == 0)
    def _():
        cp = pltpu.make_async_copy(
            x_hbm.at[pl.ds(m * BM, BM), :], xv, sem)
        cp.start()
        cp.wait()

    acc = jnp.dot(xv[:], q_ref[:], preferred_element_type=jnp.int32)
    mm = (acc.astype(jnp.float32) * sx_ref[:] * sw_ref[:]
          ).astype(o_ref.dtype)
    o_ref[:] = r_ref[:].astype(o_ref.dtype) + mm


def _w8a8_rows_resident_call(xq, sx, w, out_dtype, BM, TO,
                             residual=None):
    """pallas_call plumbing for the resident-x rows kernel: grid
    (n_m, n_out), x in ANY memory (one manual DMA per m-block into a
    single-buffered scratch), each weight block streamed exactly once per
    m-block."""
    IN, OUT = w.q.shape
    Bp = xq.shape[0]
    n_m, n_out = Bp // BM, OUT // TO
    ob = jnp.dtype(out_dtype).itemsize
    rb = 0 if residual is None else residual.dtype.itemsize
    vmem_bytes = (BM * IN + 2 * (IN * TO + TO * 4)
                  + 2 * BM * TO * (ob + rb) + BM * 8 + (2 << 20))
    in_specs = [
        pl.BlockSpec((BM, 1), lambda m, o: (m, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((IN, TO), lambda m, o: (0, o), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, TO), lambda m, o: (0, o), memory_space=pltpu.VMEM),
    ]
    args = [sx[:, None], w.q, w.s[None, :]]
    if residual is not None:
        kernel = functools.partial(_w8a8_rows_res_res_kernel, BM=BM)
        in_specs.append(pl.BlockSpec((BM, TO), lambda m, o: (m, o),
                                     memory_space=pltpu.VMEM))
        args.append(residual)
    else:
        kernel = functools.partial(_w8a8_rows_res_kernel, BM=BM)
    in_specs.append(pl.BlockSpec(memory_space=pl.ANY))  # x rows (HBM)
    args.append(xq)
    return pl.pallas_call(
        kernel,
        grid=(n_m, n_out),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((BM, TO), lambda m, o: (m, o),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, OUT), out_dtype),
        scratch_shapes=[pltpu.VMEM((BM, IN), jnp.int8),
                        pltpu.SemaphoreType.DMA],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=int(min(vmem_bytes, int(15.75 * (1 << 20))))),
        cost_estimate=pl.CostEstimate(
            flops=2 * Bp * IN * OUT,
            bytes_accessed=(Bp * IN + (Bp // BM) * IN * OUT + OUT * 4
                            + Bp * OUT * (ob + rb)),
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(*args)


def _w8a8_kernel(x_ref, sx_ref, q_ref, sw_ref, o_ref, acc_ref, *, n_in: int):
    i = pl.program_id(2)

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # pure int8 MXU matmul with int32 accumulation — zero VPU dequant work.
    # W4 storage streams S4 blocks and upcasts in-VMEM (measured wall-time
    # parity with the int8 stream, W4A8_PROBE.json; mixed int8 x int4 dot
    # is Mosaic-NYI so the upcast is required)
    w = q_ref[:]
    if w.dtype != jnp.int8:
        w = w.astype(jnp.int8)
    acc_ref[:] += jnp.dot(x_ref[:], w, preferred_element_type=jnp.int32)

    @pl.when(i == n_in - 1)
    def _():
        # one output-side rescale: row activation scale x column weight scale
        o_ref[:] = (
            acc_ref[:].astype(jnp.float32) * sx_ref[:] * sw_ref[:]
        ).astype(o_ref.dtype)


def _w8a8_res_kernel(x_ref, sx_ref, q_ref, sw_ref, r_ref, o_ref, acc_ref,
                     *, n_in: int):
    i = pl.program_id(2)

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w = q_ref[:]
    if w.dtype != jnp.int8:
        w = w.astype(jnp.int8)  # S4 block upcast (see _w8a8_kernel)
    acc_ref[:] += jnp.dot(x_ref[:], w, preferred_element_type=jnp.int32)

    @pl.when(i == n_in - 1)
    def _():
        # residual epilogue: r + x@W without a separate XLA add pass (the
        # matmul output would otherwise round-trip HBM just to be added).
        # The add mirrors the unfused `x + mm(...)`: the matmul term is
        # rounded to the OUTPUT dtype first, then added in that dtype.
        mm = (acc_ref[:].astype(jnp.float32) * sx_ref[:] * sw_ref[:]
              ).astype(o_ref.dtype)
        o_ref[:] = r_ref[:].astype(o_ref.dtype) + mm


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
    IN, OUT = w.q.shape[-2], w.padded_out
    wq = unpack_channel4(w).astype(jnp.int8) if w.packed4 else w.q
    xb = x.reshape(-1, x.shape[-1])
    if xb.shape[-1] != IN:
        xb = jnp.pad(xb, ((0, 0), (0, IN - xb.shape[-1])))
    xq, sx = quantize_activations(xb)
    acc = jnp.dot(xq, wq, preferred_element_type=jnp.int32)
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
    residual: jax.Array | None = None,  # [..., logical_out]: res + x @ W
) -> jax.Array:
    """``x @ dequant(w)`` where x is dynamically quantized per token and the
    contraction runs on the int8 MXU (2x bf16 MACs, 2-4x less HBM traffic,
    no in-path dequant)."""
    lead = x.shape[:-1]
    IN, OUT = w.q.shape[-2], w.padded_out
    xb = x.reshape(-1, x.shape[-1])
    if xb.shape[-1] != IN:
        xb = jnp.pad(xb, ((0, 0), (0, IN - xb.shape[-1])))
    B = xb.shape[0]
    Bp = max(32, -(-B // 32) * 32)  # int8 sublane tile is 32
    if Bp != B:
        xb = jnp.pad(xb, ((0, Bp - B), (0, 0)))
    if residual is not None:
        rb = residual.reshape(-1, residual.shape[-1])
        rb = jnp.pad(rb, ((0, Bp - B), (0, OUT - rb.shape[-1])))
        residual = rb

    # Prefill-scale rows take the one-pass Pallas row quant (~6x cheaper
    # than the XLA reduce+apply chain: 0.43 ms per [4096, 4096] call,
    # ~55 ms of the 7B b8 T512 prefill).  Wiring it originally blew XLA's
    # scoped-vmem placement; both kernels now DECLARE their true VMEM
    # footprints via vmem_limit_bytes so the placer stops assuming
    # worst-case overlap.  Decode-scale rows keep the XLA chain (measured
    # free at small B: kernel_bench w8a8_cast == w8a8).
    if Bp > 256 and IN % 128 == 0:
        from tpu_llama.ops.quant import quantize_activations_pallas

        xq, sx = quantize_activations_pallas(xb)
    else:
        xq, sx = quantize_activations(xb)  # int8 [Bp, IN], f32 [Bp]
    out = w8a8_matmul_prequant(xq, sx, w, out_dtype=out_dtype,
                               block_out=block_out, block_in=block_in,
                               residual=residual)
    eff_out = min(w.logical_out, OUT)
    return out[:B, :eff_out].reshape(*lead, eff_out)


@functools.partial(jax.jit, static_argnames=("out_dtype", "block_out", "block_in"))
def w8a8_matmul_prequant(
    xq: jax.Array,  # [Bp, IN] int8 — already padded to the 32-row tile
    sx: jax.Array,  # [Bp] f32 per-row activation scales
    w: ChannelQuantTensor,
    out_dtype=jnp.float32,
    block_out: int | None = None,
    block_in: int | None = None,
    residual: jax.Array | None = None,  # [Bp, OUT] added in the epilogue
) -> jax.Array:
    """The Pallas int8-MXU contraction alone (activations pre-quantized) —
    lets callers amortize one activation-quant chain over several matmuls
    that share the same input (qkv fused, gate/up fused) and gives the
    kernel bench a no-quant-chain probe.  Returns [Bp, OUT] (padded).

    ``residual`` streams a same-shape tensor into the last in-step and
    returns ``residual + xq @ w`` — the prefill residual adds otherwise
    cost a separate XLA pass per matmul (read mm out + read res + write)."""
    IN, OUT = w.q.shape[-2], w.padded_out
    # W4 storage: unpack to an in-jit S4 array (bitcast, layout-free) and
    # let the kernel upcast each block; tiles/grid are unchanged
    wq = unpack_channel4(w) if w.packed4 else w.q
    Bp = xq.shape[0]
    res_bytes = (0 if residual is None
                 else residual.dtype.itemsize)

    BM = min(Bp, 256)
    if block_out or block_in:
        TO = block_out or 256
        TI = block_in or IN
    else:
        if Bp > 256 and _rows_resident_enabled() and not w.packed4:
            pr = _pick_rows_resident(Bp, IN, OUT,
                                     jnp.dtype(out_dtype).itemsize,
                                     res_bytes)
            if pr is not None:
                return _w8a8_rows_resident_call(
                    xq, sx, w, out_dtype, pr[0], pr[1], residual=residual)
        picked = (_pick_tiles_rows(Bp, IN, OUT, 32,
                                   out_bytes=jnp.dtype(out_dtype).itemsize,
                                   res_bytes=res_bytes)
                  if Bp > 256 else None)
        if picked is not None:
            BM, TI, TO = picked
        else:
            TI, TO = _pick_tiles(IN, OUT, 32)  # int8 sublane alignment
    if Bp % BM:
        pad = -(-Bp // BM) * BM - Bp
        xq = jnp.pad(xq, ((0, pad), (0, 0)))
        sx = jnp.pad(sx, ((0, pad),))
        if residual is not None:
            residual = jnp.pad(residual, ((0, pad), (0, 0)))
        Bp += pad
    n_m = Bp // BM
    n_in = IN // TI
    n_out = OUT // TO

    if residual is not None:
        assert residual.shape == (Bp, OUT), (residual.shape, (Bp, OUT))
        kernel = functools.partial(_w8a8_res_kernel, n_in=n_in)
        vmem_bytes = (2 * (BM * TI + BM * 4 + TI * TO + TO * 4
                           + BM * TO * (jnp.dtype(out_dtype).itemsize
                                        + res_bytes))
                      + BM * TO * 4 + (4 << 20))
        return pl.pallas_call(
            kernel,
            grid=(n_m, n_out, n_in),
            in_specs=[
                pl.BlockSpec((BM, TI), lambda m, o, i: (m, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BM, 1), lambda m, o, i: (m, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TI, TO), lambda m, o, i: (i, o),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TO), lambda m, o, i: (0, o),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BM, TO), lambda m, o, i: (m, o),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BM, TO), lambda m, o, i: (m, o),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Bp, OUT), out_dtype),
            scratch_shapes=[pltpu.VMEM((BM, TO), jnp.int32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
                vmem_limit_bytes=int(min(vmem_bytes,
                                         int(15.75 * (1 << 20))))),
            cost_estimate=pl.CostEstimate(
                flops=2 * Bp * IN * OUT,
                bytes_accessed=(Bp * IN + IN * OUT + OUT * 4
                                + Bp * OUT * (4 + res_bytes)),
                transcendentals=0,
            ),
            interpret=_interpret(),
        )(xq, sx[:, None], wq, w.s[None, :], residual)

    kernel = functools.partial(_w8a8_kernel, n_in=n_in)
    # Declared footprint = buffer model + 4 MB headroom, capped just under
    # the 16 MB hard limit.  Mosaic's REAL stack need runs ~2 MB above the
    # buffer model (measured r3: the 11008x4096 prefill matmul needed
    # 13.64M against an 11.5M model), so the headroom must be generous;
    # the declaration's job is to let the scoped-vmem placer schedule this
    # kernel against the Pallas activation-quant producer instead of
    # assuming worst-case overlap.
    vmem_bytes = (2 * (BM * TI + BM * 4 + TI * TO + TO * 4
                       + BM * TO * jnp.dtype(out_dtype).itemsize)
                  + BM * TO * 4 + (4 << 20))
    return pl.pallas_call(
        kernel,
        grid=(n_m, n_out, n_in),
        in_specs=[
            pl.BlockSpec((BM, TI), lambda m, o, i: (m, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((BM, 1), lambda m, o, i: (m, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TI, TO), lambda m, o, i: (i, o), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TO), lambda m, o, i: (0, o), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BM, TO), lambda m, o, i: (m, o), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, OUT), out_dtype),
        scratch_shapes=[pltpu.VMEM((BM, TO), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=int(min(vmem_bytes, int(15.75 * (1 << 20))))),
        cost_estimate=pl.CostEstimate(
            flops=2 * Bp * IN * OUT,
            bytes_accessed=Bp * IN + IN * OUT + OUT * 4 + Bp * OUT * 4,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(xq, sx[:, None], wq, w.s[None, :])
