"""One Pallas call for ALL of a decode layer's linear work (W8A8).

Round-2 measurement (tools/kernel_bench.py, `tiny` shape): every Pallas call
on this chip has a ~75-80 us FIXED launch cost, and the activation-quant XLA
chain costs ~nothing (`w8a8_cast` == `w8a8`).  The per-layer decode step made
FOUR matmul launches (qkv, wo, w13, w2) -> ~300 us/layer of pure launch
overhead = ~9.3 ms of the 20.5 ms 7B b8 step.  This kernel collapses the
four into ONE call per layer:

    phase A: wo @ attq            + residual            -> x2
    (boundary) rmsnorm(x2) -> int8                      -> xq2
    phase B: [w1|w3] @ xq2, silu(g)*u                   -> h2
    (boundary) quantize h2                              -> xq3
    phase C: w2 @ xq3             + residual (in-place) -> x2 (= x_next)
    (boundary) rmsnorm(x2, rms_att[l+1]) -> int8        -> xq4
    phase D: wqkv[l+1] @ xq4                            -> qkv_next

so the scan body becomes  attention -> fused_linear  (2 launches/layer).
The NEXT layer's qkv projection rides along because it needs exactly the
state this kernel ends with; the first layer's qkv comes from
:func:`w8a8_matmul_stacked` once per step.

Stacked [L, ...] weights are read in place via scalar-prefetch layer index
maps (the same pattern ops/attention.py uses for the stacked KV cache) — no
per-layer weight slices ever materialize.  All dots are 2-D (a batched
dot_general hangs the remote Mosaic compile, CLAUDE.md) and every dynamic
slice offset is a multiple of a 128-aligned block width.

Numerics match the unfused path's semantics: f32 rmsnorm (eps inside the
sqrt, compat/oracle.py), f32 silu, and the exact quantize_activations
formula (absmax/127, rint, clip) — see tests/test_fused_layer.py.

Reference: the seven per-layer matmul call sites this fuses are
llama2.ts:196-203 (matmul) driven from llama2.ts:225-283 (forward).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _i8w(blk):
    """Weight block for the int8-MXU dot: W4 storage arrives as S4 blocks
    (unpacked-in-jit bitcast, ops/quant.unpack_channel4) and upcasts
    in-VMEM — measured wall-time parity with the int8 stream
    (W4A8_PROBE.json int4packed); mixed int8 x int4 dots are Mosaic-NYI."""
    return blk if blk.dtype == jnp.int8 else blk.astype(jnp.int8)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


_EPS = 1e-5  # rmsnorm eps, inside the sqrt (llama2.ts:172-179)


def _quant_rows(h):
    """In-kernel twin of ops.quant.quantize_activations: per-row symmetric
    int8.  Returns (q int8, s f32 [rows, 1])."""
    s = jnp.max(jnp.abs(h), axis=-1, keepdims=True) / 127.0
    inv = jnp.where(s > 0, 1.0 / jnp.where(s > 0, s, 1.0), 0.0)
    q = jnp.clip(jnp.rint(h * inv), -127, 127).astype(jnp.int8)
    return q, s


def _rms_rows(x, w_row):
    """f32 rmsnorm over the lane axis; w_row broadcasts [1, D]."""
    ms = jnp.mean(x * x, axis=-1, keepdims=True)
    return x * jax.lax.rsqrt(_EPS + ms) * w_row


def _fused_layer_kernel(
    s_ref,  # [3] int32: layer l, next-layer l2, qkv-skip flag
    xres_ref,  # [Bp, TOA] f32 — residual stream, phase-A column block
    attq_ref,  # [Bp, D] int8 — quantized attention output (whole, VMEM)
    satt_ref,  # [Bp, 1] f32
    rmsf_ref,  # [1, 1, D] f32 — rms_ffn[l]
    rmsa_ref,  # [1, 1, D] f32 — rms_att[l2]
    woq_ref, wos_ref,  # [1, D, TOA] int8, [1, 1, TOA] f32
    w13g_ref, w13gs_ref,  # [1, D, TOB] int8, [1, 1, TOB] f32 (gate cols)
    w13u_ref, w13us_ref,  # [1, D, TOB] int8, [1, 1, TOB] f32 (up cols)
    w2q_ref, w2s_ref,  # [1, H, TOC] int8, [1, 1, TOC] f32
    qkvq_ref, qkvs_ref,  # [1, D, TOD] int8, [1, 1, TOD] f32 (layer l2)
    xout_ref,  # [Bp, TOC] f32 output block (phase C)
    qkv_ref,  # [Bp, TOD] f32 output block (phase D)
    x2_ref,  # [Bp, D] f32 scratch — post-attention residual, then x_next
    h2_ref,  # [Bp, H] f32 scratch — silu(gate)*up
    xq_ref,  # [Bp, D] int8 scratch — xq2, then xq4
    xq3_ref,  # [Bp, H] int8 scratch
    sx_ref,  # [Bp, 1] f32 scratch — live scale for the current phase
    *, nA: int, nB: int, nC: int, nD: int,
    TOA: int, TOB: int, TOC: int, TOD: int,
):
    o = pl.program_id(0)

    @pl.when(o < nA)
    def _phase_a():
        j = o
        acc = jnp.dot(attq_ref[:], _i8w(woq_ref[0]),
                      preferred_element_type=jnp.int32)
        blk = xres_ref[:] + (acc.astype(jnp.float32)
                             * satt_ref[:] * wos_ref[0])
        x2_ref[:, pl.ds(j * TOA, TOA)] = blk

    @pl.when(o == nA - 1)
    def _boundary_a():
        h = _rms_rows(x2_ref[:], rmsf_ref[0])
        q, s = _quant_rows(h)
        xq_ref[:] = q
        sx_ref[:] = s

    @pl.when(jnp.logical_and(o >= nA, o < nA + nB))
    def _phase_b():
        j = o - nA
        g = jnp.dot(xq_ref[:], _i8w(w13g_ref[0]),
                    preferred_element_type=jnp.int32).astype(jnp.float32)
        u = jnp.dot(xq_ref[:], _i8w(w13u_ref[0]),
                    preferred_element_type=jnp.int32).astype(jnp.float32)
        g = g * sx_ref[:] * w13gs_ref[0]
        u = u * sx_ref[:] * w13us_ref[0]
        h2_ref[:, pl.ds(j * TOB, TOB)] = g * (1.0 / (1.0 + jnp.exp(-g))) * u

    @pl.when(o == nA + nB - 1)
    def _boundary_b():
        q, s = _quant_rows(h2_ref[:])
        xq3_ref[:] = q
        sx_ref[:] = s

    @pl.when(jnp.logical_and(o >= nA + nB, o < nA + nB + nC))
    def _phase_c():
        j = o - nA - nB
        acc = jnp.dot(xq3_ref[:], _i8w(w2q_ref[0]),
                      preferred_element_type=jnp.int32)
        blk = (x2_ref[:, pl.ds(j * TOC, TOC)]
               + acc.astype(jnp.float32) * sx_ref[:] * w2s_ref[0])
        x2_ref[:, pl.ds(j * TOC, TOC)] = blk
        xout_ref[:] = blk

    @pl.when(o == nA + nB + nC - 1)
    def _boundary_c():
        h = _rms_rows(x2_ref[:], rmsa_ref[0])
        q, s = _quant_rows(h)
        xq_ref[:] = q
        sx_ref[:] = s

    @pl.when(o >= nA + nB + nC)
    def _phase_d():
        acc = jnp.dot(xq_ref[:], _i8w(qkvq_ref[0]),
                      preferred_element_type=jnp.int32)
        qkv_ref[:] = acc.astype(jnp.float32) * sx_ref[:] * qkvs_ref[0]


def _block_candidates(OUT: int) -> list[int]:
    """Descending block widths: multiples of 128 dividing OUT, else full."""
    cands = [c for c in range(1024, 127, -128) if OUT % c == 0]
    return cands or [OUT]


@functools.lru_cache(maxsize=64)
def _pick_fused_blocks(Bp: int, D: int, H: int, QO: int,
                       # real VMEM limit is 16 MB; the compiler needs ~2 MB
                       # beyond what this model counts (measured: a 14 MB
                       # pick hit "16.09M > 16.00M" at Bp=64)
                       budget: int = 13 << 20):
    """(TOA, TOB, TOC, TOD) such that the double-buffered operand streams
    plus scratch fit the VMEM budget.  Greedy: grow the widest phase first
    (fewest grid steps for the same bytes)."""
    fixed = (Bp * D * 4  # x2
             + Bp * H * 4  # h2
             + Bp * D + Bp * H  # xq, xq3
             + 2 * (Bp * D))  # attq (double-buffered input)
    choices = {k: _block_candidates(n)[-1]
               for k, n in (("A", D), ("B", H), ("C", D), ("D", QO))}

    def operand_bytes(c):
        return 2 * (D * c["A"] + Bp * c["A"] * 4  # wo + xres blocks
                    + 2 * D * c["B"]  # gate + up
                    + H * c["C"] + Bp * c["C"] * 4  # w2 + xout
                    + D * c["D"] + Bp * c["D"] * 4)  # qkv + qkv out

    # grow greedily, largest phase-bytes-per-step gain first
    improved = True
    while improved:
        improved = False
        for k, n in (("B", H), ("D", QO), ("A", D), ("C", D)):
            cands = [c for c in _block_candidates(n) if c > choices[k]]
            if not cands:
                continue
            trial = dict(choices)
            trial[k] = cands[-1]  # next size up
            if fixed + operand_bytes(trial) <= budget:
                choices = trial
                improved = True
    if fixed + operand_bytes(choices) > budget:
        return None
    return choices["A"], choices["B"], choices["C"], choices["D"]


def fused_layer_linear(
    x: jax.Array,  # [Bp, D] f32 — residual stream entering the layer
    attq: jax.Array,  # [Bp, D] int8 — quantized attention output
    satt: jax.Array,  # [Bp] f32
    wo_q, wo_s,  # [L, D, D] int8, [L, D] f32
    w13_q, w13_s,  # [L, D, 2H], [L, 2H]  (fused [w1|w3] layout)
    w2_q, w2_s,  # [L, H, D], [L, D]
    qkv_q, qkv_s,  # [L, D, QO], [L, QO]  (fused [wq|wk|wv] layout)
    rms_ffn: jax.Array,  # [L, D] f32
    rms_att: jax.Array,  # [L, D] f32
    layer: jax.Array,  # scalar int32
    n_layers: int,
) -> tuple[jax.Array, jax.Array]:
    """Returns (x_next [Bp, D] f32, qkv_next [Bp, QO] f32).

    ``qkv_next`` is layer ``layer+1``'s qkv projection of ``x_next`` (clamped
    at the last layer, where its phase is skipped via index-map pinning and
    the result is garbage the caller discards).
    """
    Bp, D = x.shape
    H = w2_q.shape[1]
    QO = qkv_q.shape[2]
    L = wo_q.shape[0]
    assert Bp % 32 == 0, "int8 sublane tile is 32"

    blocks = _pick_fused_blocks(Bp, D, H, QO)
    if blocks is None:
        raise ValueError(f"no VMEM-feasible fused tiling for Bp={Bp}")
    TOA, TOB, TOC, TOD = blocks
    nA, nB, nC, nD = D // TOA, H // TOB, D // TOC, QO // TOD
    grid = (nA + nB + nC + nD,)

    l = jnp.asarray(layer, jnp.int32)
    l2 = jnp.minimum(l + 1, n_layers - 1)
    skip_d = (l + 1 >= n_layers).astype(jnp.int32)
    scal = jnp.stack([l, l2, skip_d])

    def a_ix(o, s):
        return jnp.minimum(o, nA - 1)

    def b_ix(o, s):
        return jnp.clip(o - nA, 0, nB - 1)

    def c_ix(o, s):
        return jnp.clip(o - nA - nB, 0, nC - 1)

    def d_ix(o, s):
        # pinned to block 0 when the last layer skips its qkv phase
        return jnp.where(s[2] > 0, 0, jnp.clip(o - nA - nB - nC, 0, nD - 1))

    V = pltpu.VMEM
    in_specs = [
        pl.BlockSpec((Bp, TOA), lambda o, s: (0, a_ix(o, s)), memory_space=V),
        pl.BlockSpec((Bp, D), lambda o, s: (0, 0), memory_space=V),
        pl.BlockSpec((Bp, 1), lambda o, s: (0, 0), memory_space=V),
        pl.BlockSpec((1, 1, D), lambda o, s: (s[0], 0, 0), memory_space=V),
        pl.BlockSpec((1, 1, D), lambda o, s: (s[1], 0, 0), memory_space=V),
        pl.BlockSpec((1, D, TOA), lambda o, s: (s[0], 0, a_ix(o, s)),
                     memory_space=V),
        pl.BlockSpec((1, 1, TOA), lambda o, s: (s[0], 0, a_ix(o, s)),
                     memory_space=V),
        pl.BlockSpec((1, D, TOB), lambda o, s: (s[0], 0, b_ix(o, s)),
                     memory_space=V),
        pl.BlockSpec((1, 1, TOB), lambda o, s: (s[0], 0, b_ix(o, s)),
                     memory_space=V),
        pl.BlockSpec((1, D, TOB), lambda o, s: (s[0], 0, nB + b_ix(o, s)),
                     memory_space=V),
        pl.BlockSpec((1, 1, TOB), lambda o, s: (s[0], 0, nB + b_ix(o, s)),
                     memory_space=V),
        pl.BlockSpec((1, H, TOC), lambda o, s: (s[0], 0, c_ix(o, s)),
                     memory_space=V),
        pl.BlockSpec((1, 1, TOC), lambda o, s: (s[0], 0, c_ix(o, s)),
                     memory_space=V),
        pl.BlockSpec((1, D, TOD), lambda o, s: (s[1], 0, d_ix(o, s)),
                     memory_space=V),
        pl.BlockSpec((1, 1, TOD), lambda o, s: (s[1], 0, d_ix(o, s)),
                     memory_space=V),
    ]
    out_specs = (
        pl.BlockSpec((Bp, TOC), lambda o, s: (0, c_ix(o, s)), memory_space=V),
        pl.BlockSpec((Bp, TOD), lambda o, s: (0, d_ix(o, s)), memory_space=V),
    )
    scratch = [
        pltpu.VMEM((Bp, D), jnp.float32),
        pltpu.VMEM((Bp, H), jnp.float32),
        pltpu.VMEM((Bp, D), jnp.int8),
        pltpu.VMEM((Bp, H), jnp.int8),
        pltpu.VMEM((Bp, 1), jnp.float32),
    ]

    kernel = functools.partial(
        _fused_layer_kernel, nA=nA, nB=nB, nC=nC, nD=nD,
        TOA=TOA, TOB=TOB, TOC=TOC, TOD=TOD)

    x_next, qkv_next = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=scratch,
        ),
        out_shape=(jax.ShapeDtypeStruct((Bp, D), jnp.float32),
                   jax.ShapeDtypeStruct((Bp, QO), jnp.float32)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=_interpret(),
    )(scal, x, attq, satt[:, None],
      rms_ffn[:, None, :], rms_att[:, None, :],
      wo_q, wo_s[:, None, :],
      w13_q, w13_s[:, None, :], w13_q, w13_s[:, None, :],
      w2_q, w2_s[:, None, :],
      qkv_q, qkv_s[:, None, :])
    return x_next, qkv_next


# ---------------------------------------------------------------------------
# TP sub-span kernels.  Megatron TP needs a psum after wo and after w2, so
# the whole-layer fusion above cannot run under tensor parallelism — the
# collective-free spans CAN: rms -> quant -> w13 -> silu -> w2 (one launch)
# and rms -> quant -> qkv (one launch).  Each shard runs these on its LOCAL
# column slices (fuse_projections(tp=...) interleaved layouts); the wrapper
# (parallel/tp.py) places the two psums between launches.  3 launches +
# 2 psums per layer instead of 4 matmul launches + 4 XLA quant chains.
# ---------------------------------------------------------------------------


def _fused_ffn_kernel(
    s_ref,  # [1] int32: layer l
    x_ref,  # [Bp, D] f32 — FULL residual stream (replicated under TP)
    rmsf_ref,  # [1, 1, D] f32
    w13g_ref, w13gs_ref,  # [1, D, TOB] int8 / [1, 1, TOB] f32 (local gate)
    w13u_ref, w13us_ref,  # (local up)
    w2q_ref, w2s_ref,  # [1, Hl, TOC] int8, [1, 1, TOC] f32
    xout_ref,  # [Bp, TOC] f32 output block — w2 PARTIAL (no residual)
    h2_ref, xq_ref, xq3_ref, sx_ref,
    *, nB: int, nC: int, TOB: int, TOC: int,
):
    o = pl.program_id(0)

    @pl.when(o == 0)
    def _boundary_in():
        h = _rms_rows(x_ref[:], rmsf_ref[0])
        q, s = _quant_rows(h)
        xq_ref[:] = q
        sx_ref[:] = s

    @pl.when(o < nB)
    def _phase_b():
        j = o
        g = jnp.dot(xq_ref[:], _i8w(w13g_ref[0]),
                    preferred_element_type=jnp.int32).astype(jnp.float32)
        u = jnp.dot(xq_ref[:], _i8w(w13u_ref[0]),
                    preferred_element_type=jnp.int32).astype(jnp.float32)
        g = g * sx_ref[:] * w13gs_ref[0]
        u = u * sx_ref[:] * w13us_ref[0]
        h2_ref[:, pl.ds(j * TOB, TOB)] = g * (1.0 / (1.0 + jnp.exp(-g))) * u

    @pl.when(o == nB - 1)
    def _boundary_b():
        q, s = _quant_rows(h2_ref[:])
        xq3_ref[:] = q
        sx_ref[:] = s

    @pl.when(o >= nB)
    def _phase_c():
        acc = jnp.dot(xq3_ref[:], _i8w(w2q_ref[0]),
                      preferred_element_type=jnp.int32)
        xout_ref[:] = acc.astype(jnp.float32) * sx_ref[:] * w2s_ref[0]


def fused_ffn_stacked(
    x: jax.Array,  # [Bp, D] f32 — full residual (post-psum)
    w13_q, w13_s,  # [L, D, 2Hl] int8, [L, 2Hl] f32 — LOCAL fused [w1|w3]
    w2_q, w2_s,  # [L, Hl, D] int8, [L, D] f32 — LOCAL rows
    rms_ffn: jax.Array,  # [L, D] f32
    layer: jax.Array | int,
) -> jax.Array:
    """rms -> quant -> w13 -> silu -> w2 in ONE launch on the local shard.
    Returns the w2 PARTIAL [Bp, D] f32 — the caller psums and adds the
    residual.  Single-device callers may use it too (tp=1)."""
    Bp, D = x.shape
    L, _, H2 = w13_q.shape
    Hl = w2_q.shape[1]
    assert H2 == 2 * Hl, (H2, Hl)
    assert Bp % 32 == 0, "int8 sublane tile is 32"
    blocks = _pick_ffn_blocks(Bp, D, Hl)
    if blocks is None:
        raise ValueError(f"no VMEM-feasible fused-ffn tiling for Bp={Bp}")
    TOB, TOC = blocks
    nB, nC = Hl // TOB, D // TOC
    V = pltpu.VMEM

    def b_ix(o, s):
        return jnp.clip(o, 0, nB - 1)

    def c_ix(o, s):
        return jnp.clip(o - nB, 0, nC - 1)

    kernel = functools.partial(_fused_ffn_kernel, nB=nB, nC=nC,
                               TOB=TOB, TOC=TOC)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nB + nC,),
            in_specs=[
                pl.BlockSpec((Bp, D), lambda o, s: (0, 0), memory_space=V),
                pl.BlockSpec((1, 1, D), lambda o, s: (s[0], 0, 0),
                             memory_space=V),
                pl.BlockSpec((1, D, TOB), lambda o, s: (s[0], 0, b_ix(o, s)),
                             memory_space=V),
                pl.BlockSpec((1, 1, TOB), lambda o, s: (s[0], 0, b_ix(o, s)),
                             memory_space=V),
                pl.BlockSpec((1, D, TOB),
                             lambda o, s: (s[0], 0, nB + b_ix(o, s)),
                             memory_space=V),
                pl.BlockSpec((1, 1, TOB),
                             lambda o, s: (s[0], 0, nB + b_ix(o, s)),
                             memory_space=V),
                pl.BlockSpec((1, Hl, TOC), lambda o, s: (s[0], 0, c_ix(o, s)),
                             memory_space=V),
                pl.BlockSpec((1, 1, TOC), lambda o, s: (s[0], 0, c_ix(o, s)),
                             memory_space=V),
            ],
            out_specs=pl.BlockSpec((Bp, TOC), lambda o, s: (0, c_ix(o, s)),
                                   memory_space=V),
            scratch_shapes=[
                pltpu.VMEM((Bp, Hl), jnp.float32),  # h2
                pltpu.VMEM((Bp, D), jnp.int8),  # xq
                pltpu.VMEM((Bp, Hl), jnp.int8),  # xq3
                pltpu.VMEM((Bp, 1), jnp.float32),  # sx
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((Bp, D), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=_interpret(),
    )(jnp.asarray(layer, jnp.int32)[None], x,
      rms_ffn[:, None, :],
      w13_q, w13_s[:, None, :], w13_q, w13_s[:, None, :],
      w2_q, w2_s[:, None, :])
    return out


@functools.lru_cache(maxsize=64)
def _pick_ffn_blocks(Bp: int, D: int, Hl: int, budget: int = 13 << 20):
    """(TOB, TOC) for the TP ffn span under the VMEM budget."""
    fixed = (Bp * D * 4  # x input
             + Bp * Hl * 4 + Bp * D + Bp * Hl + Bp * 4)  # scratches
    choices = {"B": _block_candidates(Hl)[-1], "C": _block_candidates(D)[-1]}

    def operand(c):
        return 2 * (2 * D * c["B"] + Hl * c["C"] + Bp * c["C"] * 4)

    improved = True
    while improved:
        improved = False
        for k, n in (("B", Hl), ("C", D)):
            ups = [c for c in _block_candidates(n) if c > choices[k]]
            if ups and fixed + operand({**choices, k: ups[-1]}) <= budget:
                choices[k] = ups[-1]
                improved = True
    if fixed + operand(choices) > budget:
        return None
    return choices["B"], choices["C"]


def _rms_qkv_kernel(s_ref, x_ref, rmsa_ref, qkvq_ref, qkvs_ref, o_ref,
                    xq_ref, sx_ref):
    o = pl.program_id(0)

    @pl.when(o == 0)
    def _boundary():
        h = _rms_rows(x_ref[:], rmsa_ref[0])
        q, s = _quant_rows(h)
        xq_ref[:] = q
        sx_ref[:] = s

    acc = jnp.dot(xq_ref[:], _i8w(qkvq_ref[0]), preferred_element_type=jnp.int32)
    o_ref[:] = acc.astype(jnp.float32) * sx_ref[:] * qkvs_ref[0]


def fused_rms_qkv_stacked(
    x: jax.Array,  # [Bp, D] f32 — full residual (post-psum)
    qkv_q, qkv_s,  # [L, D, QOl] int8, [L, QOl] f32 — LOCAL fused [q|k|v]
    rms_att: jax.Array,  # [L, D] f32
    layer: jax.Array | int,
) -> jax.Array:
    """rms -> quant -> qkv in ONE launch on the local shard.  Returns
    [Bp, QOl] f32 (shard-local [q_i | k_i | v_i] columns)."""
    Bp, D = x.shape
    L, _, QOl = qkv_q.shape
    assert Bp % 32 == 0
    TO = _block_candidates(QOl)[-1]
    for cand in _block_candidates(QOl):
        if D * cand <= (3 << 20):
            TO = cand
            break
    n_out = QOl // TO
    V = pltpu.VMEM
    out = pl.pallas_call(
        _rms_qkv_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_out,),
            in_specs=[
                pl.BlockSpec((Bp, D), lambda o, s: (0, 0), memory_space=V),
                pl.BlockSpec((1, 1, D), lambda o, s: (s[0], 0, 0),
                             memory_space=V),
                pl.BlockSpec((1, D, TO), lambda o, s: (s[0], 0, o),
                             memory_space=V),
                pl.BlockSpec((1, 1, TO), lambda o, s: (s[0], 0, o),
                             memory_space=V),
            ],
            out_specs=pl.BlockSpec((Bp, TO), lambda o, s: (0, o),
                                   memory_space=V),
            scratch_shapes=[
                pltpu.VMEM((Bp, D), jnp.int8),
                pltpu.VMEM((Bp, 1), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((Bp, QOl), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=_interpret(),
    )(jnp.asarray(layer, jnp.int32)[None], x, rms_att[:, None, :],
      qkv_q, qkv_s[:, None, :])
    return out


def _stacked_matmul_kernel(s_ref, xq_ref, sx_ref, q_ref, ws_ref, o_ref):
    acc = jnp.dot(xq_ref[:], _i8w(q_ref[0]), preferred_element_type=jnp.int32)
    o_ref[:] = acc.astype(jnp.float32) * sx_ref[:] * ws_ref[0]


def w8a8_matmul_stacked(
    xq: jax.Array,  # [Bp, D] int8
    sx: jax.Array,  # [Bp] f32
    wq: jax.Array,  # [L, D, OUT] int8 — stacked per-layer weights
    ws: jax.Array,  # [L, OUT] f32
    layer: jax.Array | int,
) -> jax.Array:
    """One layer's W8A8 matmul against stacked weights, selected by a
    scalar-prefetch index map — no [D, OUT] slice ever materializes.  Used
    for the step prologue (layer 0's qkv, which has no preceding fused call
    to ride on).  Returns [Bp, OUT] f32."""
    Bp, D = xq.shape
    L, _, OUT = wq.shape
    TO = _block_candidates(OUT)[-1]
    for cand in _block_candidates(OUT):
        if D * cand <= (3 << 20):
            TO = cand
            break
    n_out = OUT // TO

    out = pl.pallas_call(
        _stacked_matmul_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_out,),
            in_specs=[
                pl.BlockSpec((Bp, D), lambda o, s: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Bp, 1), lambda o, s: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, D, TO), lambda o, s: (s[0], 0, o),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, TO), lambda o, s: (s[0], 0, o),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((Bp, TO), lambda o, s: (0, o),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((Bp, OUT), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=_interpret(),
    )(jnp.asarray(layer, jnp.int32)[None], xq, sx[:, None], wq,
      ws[:, None, :])
    return out
