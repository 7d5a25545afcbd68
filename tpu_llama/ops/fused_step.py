"""One Pallas call for an ENTIRE decode layer: attention + all linear work.

ops/fused_layer.py collapsed the four per-layer matmul launches into one,
leaving TWO Pallas calls per decode layer (attention + fused linear) — at the
measured ~75-80 us fixed launch cost per call that is still ~2.6 ms of the
7B b8 step (NEXT.md #1).  This kernel folds decode attention INTO the fused
linear grid, so the scan body becomes ONE launch per layer:

    steps [0, B):        manual-DMA attention cell per slot (pos-proportional
                         HBM reads, cross-cell block-0 prefetch, in-cell
                         fresh-row merge) -> att_sc [KVH, G, Bp, hd]
    step B (prologue):   per-row absmax quant of att_sc -> attq [Bp, D] int8
                         (per-head 128-aligned lane writes flatten the head
                         layout; head (h, g) -> lanes [(h*G+g)*hd, ...))
    steps B+[0, nA):     phase A: wo @ attq + residual
    ... phases B/C/D exactly as ops/fused_layer.py ...

The attention math is the stacked-softmax manual-DMA kernel's
(ops/attention.py `_dma_decode_kernel`), with the XLA tail merge moved
in-cell as ONE stacked op chain (the ~35 us/cell cost it avoided came from
per-head chains, not lane work).  RoPE and the fresh-row KV quantization stay
in XLA between launches: the layer boundary sits at the qkv projection
output, so the carry is (residual, next layer's raw qkv).

Numerics are the unfused path's: f32 softmax, the exact
quantize_activations formula for the attention output, and the fused-layer
phases bit-for-bit (tests/test_fused_step.py).

Reference: this fuses llama2.ts:243-267 (attention) + the per-layer matmul
call sites llama2.ts:196-203 into the single hot launch of the decode step.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_llama.ops.fused_layer import _block_candidates, _quant_rows, _rms_rows


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


_NEG_INF = -1e30


def _fused_step_kernel(
    meta_ref,  # [3] int32: layer l, next-layer l2, qkv-skip flag
    pos_ref,  # [B] int32 per-slot positions
    q_ref,  # [1, KVH, G8, hd] f32 — scaled queries, one cell's block
    nk_ref, nv_ref,  # [1, KVH, 1, hd] int8 — fresh K/V row
    nks_ref, nvs_ref,  # [1, KVH, 1, 1] f32 — fresh-row scales
    k_hbm, v_hbm,  # [L*B, KVH, S, hd] int8 (ANY — manual DMA)
    ks_hbm, vs_hbm,  # [L*B, KVH, S] f32 (ANY)
    xres_ref,  # [Bp, TOA] f32 — residual stream, phase-A column block
    rmsf_ref,  # [1, 1, D] f32 — rms_ffn[l]
    rmsa_ref,  # [1, 1, D] f32 — rms_att[l2]
    woq_ref, wos_ref,  # [1, D, TOA] int8, [1, 1, TOA] f32
    w13g_ref, w13gs_ref,  # [1, D, TOB] int8, [1, 1, TOB] f32 (gate cols)
    w13u_ref, w13us_ref,  # [1, D, TOB] int8, [1, 1, TOB] f32 (up cols)
    w2q_ref, w2s_ref,  # [1, H, TOC] int8, [1, 1, TOC] f32
    qkvq_ref, qkvs_ref,  # [1, D, TOD] int8, [1, 1, TOD] f32 (layer l2)
    xout_ref,  # [Bp, TOC] f32 output block (phase C)
    qkv_ref,  # [Bp, TOD] f32 output block (phase D)
    att_sc,  # [KVH, G, Bp, hd] f32 scratch — per-slot attention output
    attq_ref,  # [Bp, D] int8 scratch — quantized attention output
    x2_ref,  # [Bp, D] f32 scratch
    h2_ref,  # [Bp, H] f32 scratch
    xq_ref,  # [Bp, D] int8 scratch
    xq3_ref,  # [Bp, H] int8 scratch
    sx_ref,  # [Bp, 1] f32 scratch
    sxa_ref,  # [Bp, 1] f32 scratch — attention-output quant scale
    kbuf, vbuf,  # [4, KVH, TS, hd] int8 DMA rings
    ksbuf, vsbuf,  # [4, KVH, TS] f32 scale rings
    sem,  # DMA semaphores [4, 4]
    *, B: int, G: int, TS: int, KVH: int, hd: int,
    nA: int, nB: int, nC: int, nD: int,
    TOA: int, TOB: int, TOC: int, TOD: int,
):
    o = pl.program_id(0)

    # ---- attention cells: steps [0, B) ------------------------------------
    @pl.when(o < B)
    def _attention_cell():
        b = o
        pos = pos_ref[b]
        nb = jax.lax.div(pos + TS - 1, TS)  # strict < pos: ceil(pos / TS)

        def copies(bb, j, slot):
            row = meta_ref[0] * B + bb  # layer*B + slot in the merged 4-D
            return [
                pltpu.make_async_copy(
                    k_hbm.at[row, :, pl.ds(j * TS, TS), :],
                    kbuf.at[slot], sem.at[slot, 0]),
                pltpu.make_async_copy(
                    v_hbm.at[row, :, pl.ds(j * TS, TS), :],
                    vbuf.at[slot], sem.at[slot, 1]),
                pltpu.make_async_copy(
                    ks_hbm.at[row, :, pl.ds(j * TS, TS)],
                    ksbuf.at[slot], sem.at[slot, 2]),
                pltpu.make_async_copy(
                    vs_hbm.at[row, :, pl.ds(j * TS, TS)],
                    vsbuf.at[slot], sem.at[slot, 3]),
            ]

        def start(bb, j, slot):
            for cp in copies(bb, j, slot):
                cp.start()

        def wait(bb, j, slot):
            for cp in copies(bb, j, slot):
                cp.wait()

        # Plain 2-slot double buffer.  The standalone DMA kernel adds two
        # cell-entry slots to hide the ~18 us block-0 stall, but at TS=128
        # (the minimum Mosaic-aligned int8 S-slice) four ring slots cost
        # 4.2 MB of VMEM that the weight streams need; the merged kernel
        # eats the entry stall instead (B cells x ~18 us << the saved
        # launch).
        @pl.when(nb > 0)
        def _():
            start(b, 0, 0)

        G8 = q_ref.shape[2]
        init = (jnp.full((KVH, G8, 1), _NEG_INF, jnp.float32),
                jnp.zeros((KVH, G8, 1), jnp.float32),
                jnp.zeros((KVH, G8, hd), jnp.float32))

        def body(j, carry):
            m, l, acc = carry
            slot = jax.lax.rem(j, 2)

            @pl.when(j + 1 < nb)
            def _():
                start(b, j + 1, jax.lax.rem(j + 1, 2))

            wait(b, j, slot)
            base = j * TS
            s = jnp.stack([
                jax.lax.dot_general(
                    q_ref[0, h].astype(jnp.bfloat16),
                    kbuf[slot, h].astype(jnp.bfloat16),
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                for h in range(KVH)])  # [KVH, G8, TS]
            s = s * ksbuf[slot][:, None, :]
            kpos = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2) + base
            mask = kpos < pos
            m_new = jnp.maximum(m, jnp.max(
                jnp.where(mask, s, _NEG_INF), axis=-1, keepdims=True))
            corr = jnp.exp(m - m_new)
            p = jnp.where(mask, jnp.exp(s - m_new), 0.0)
            l = l * corr + jnp.sum(p, axis=-1, keepdims=True)
            p = (p * vsbuf[slot][:, None, :]).astype(jnp.bfloat16)
            v = vbuf[slot].astype(jnp.bfloat16)
            pv = jnp.stack([
                jnp.dot(p[h], v[h], preferred_element_type=jnp.float32)
                for h in range(KVH)])  # [KVH, G8, hd]
            return m_new, l, acc * corr + pv

        m, l, acc = jax.lax.fori_loop(0, nb, body, init)

        # fresh-row merge — ONE stacked chain over all heads (the XLA
        # epilogue of the standalone DMA kernel, moved in-cell)
        q = q_ref[0]  # [KVH, G8, hd]
        nk = nk_ref[0, :, :, :].astype(jnp.float32)  # [KVH, 1, hd]
        s_new = jnp.sum(q * nk, axis=-1, keepdims=True)  # [KVH, G8, 1]
        s_new = s_new * nks_ref[0]
        m_fin = jnp.maximum(m, s_new)
        corr = jnp.exp(m - m_fin)
        e_new = jnp.exp(s_new - m_fin)
        l_fin = l * corr + e_new
        nv = nv_ref[0].astype(jnp.float32) * nvs_ref[0]  # [KVH, 1, hd]
        att = (acc * corr + e_new * nv) / jnp.maximum(l_fin, 1e-30)
        att_sc[:, :, pl.ds(b, 1), :] = att[:, :G, :].reshape(KVH, G, 1, hd)

    # ---- attention-output quantization (prologue of the first A step) -----
    @pl.when(o == B)
    def _att_quant():
        a = att_sc[:]  # [KVH, G, Bp, hd]
        am = jnp.max(jnp.max(jnp.abs(a), axis=(0, 1)), axis=-1,
                     keepdims=True)  # [Bp, 1] — absmax over the full D row
        s = am / 127.0
        inv = jnp.where(s > 0, 1.0 / jnp.where(s > 0, s, 1.0), 0.0)
        sxa_ref[:] = s
        q4 = jnp.clip(jnp.rint(a * inv.reshape(1, 1, -1, 1)),
                      -127, 127).astype(jnp.int8)
        for h in range(KVH):
            for g in range(G):
                qh = h * G + g
                attq_ref[:, qh * hd:(qh + 1) * hd] = q4[h, g]

    # ---- linear phases (ops/fused_layer.py, grid shifted by B) -------------
    @pl.when(jnp.logical_and(o >= B, o < B + nA))
    def _phase_a():
        j = o - B
        acc = jnp.dot(attq_ref[:], woq_ref[0],
                      preferred_element_type=jnp.int32)
        blk = xres_ref[:] + (acc.astype(jnp.float32)
                             * sxa_ref[:] * wos_ref[0])
        x2_ref[:, pl.ds(j * TOA, TOA)] = blk

    @pl.when(o == B + nA - 1)
    def _boundary_a():
        h = _rms_rows(x2_ref[:], rmsf_ref[0])
        q, s = _quant_rows(h)
        xq_ref[:] = q
        sx_ref[:] = s

    @pl.when(jnp.logical_and(o >= B + nA, o < B + nA + nB))
    def _phase_b():
        j = o - B - nA
        g = jnp.dot(xq_ref[:], w13g_ref[0],
                    preferred_element_type=jnp.int32).astype(jnp.float32)
        u = jnp.dot(xq_ref[:], w13u_ref[0],
                    preferred_element_type=jnp.int32).astype(jnp.float32)
        g = g * sx_ref[:] * w13gs_ref[0]
        u = u * sx_ref[:] * w13us_ref[0]
        h2_ref[:, pl.ds(j * TOB, TOB)] = g * (1.0 / (1.0 + jnp.exp(-g))) * u

    @pl.when(o == B + nA + nB - 1)
    def _boundary_b():
        q, s = _quant_rows(h2_ref[:])
        xq3_ref[:] = q
        sx_ref[:] = s

    @pl.when(jnp.logical_and(o >= B + nA + nB, o < B + nA + nB + nC))
    def _phase_c():
        j = o - B - nA - nB
        acc = jnp.dot(xq3_ref[:], w2q_ref[0],
                      preferred_element_type=jnp.int32)
        blk = (x2_ref[:, pl.ds(j * TOC, TOC)]
               + acc.astype(jnp.float32) * sx_ref[:] * w2s_ref[0])
        x2_ref[:, pl.ds(j * TOC, TOC)] = blk
        xout_ref[:] = blk

    @pl.when(o == B + nA + nB + nC - 1)
    def _boundary_c():
        h = _rms_rows(x2_ref[:], rmsa_ref[0])
        q, s = _quant_rows(h)
        xq_ref[:] = q
        sx_ref[:] = s

    @pl.when(o >= B + nA + nB + nC)
    def _phase_d():
        acc = jnp.dot(xq_ref[:], qkvq_ref[0],
                      preferred_element_type=jnp.int32)
        qkv_ref[:] = acc.astype(jnp.float32) * sx_ref[:] * qkvs_ref[0]


@functools.lru_cache(maxsize=64)
def _pick_step_blocks(Bp: int, D: int, H: int, QO: int, KVH: int, G: int,
                      hd: int, TS: int,
                      # same headroom rule as _pick_fused_blocks (16 MB VMEM,
                      # ~2-3 MB compiler margin)
                      budget: int = 13 << 20):
    """(TOA, TOB, TOC, TOD) for the merged kernel, or None if infeasible."""
    G8 = max(8, -(-G // 8) * 8)
    fixed = (KVH * G * Bp * hd * 4  # att_sc
             + Bp * D  # attq int8
             + Bp * D * 4 + Bp * H * 4  # x2, h2
             + Bp * D + Bp * H  # xq, xq3
             + 2 * 2 * KVH * TS * hd  # K/V DMA rings (int8, 2 slots)
             + 2 * 2 * KVH * TS * 4  # scale rings (f32)
             + 2 * KVH * G8 * hd * 4  # q input block (double-buffered)
             + 4 * KVH * hd)  # fresh K/V row blocks
    choices = {k: _block_candidates(n)[-1]
               for k, n in (("A", D), ("B", H), ("C", D), ("D", QO))}

    def operand_bytes(c):
        return 2 * (D * c["A"] + Bp * c["A"] * 4  # wo + xres blocks
                    + 2 * D * c["B"]  # gate + up
                    + H * c["C"] + Bp * c["C"] * 4  # w2 + xout
                    + D * c["D"] + Bp * c["D"] * 4)  # qkv + qkv out

    improved = True
    while improved:
        improved = False
        for k, n in (("B", H), ("D", QO), ("A", D), ("C", D)):
            cands = [c for c in _block_candidates(n) if c > choices[k]]
            if not cands:
                continue
            trial = dict(choices)
            trial[k] = cands[-1]
            if fixed + operand_bytes(trial) <= budget:
                choices = trial
                improved = True
    if fixed + operand_bytes(choices) > budget:
        return None
    return choices["A"], choices["B"], choices["C"], choices["D"]


def _pick_step_tiling(Bp: int, D: int, H: int, QO: int, KVH: int, G: int,
                      hd: int, S: int):
    """(TS, (TOA, TOB, TOC, TOD)) or None.  TS is pinned at 128: Mosaic
    requires int8 HBM slices on the S axis to be 128-aligned (measured:
    TS=64 fails to compile), and 256-row blocks double the ring VMEM for
    no measured win.  S < 128 (interpret-mode test shapes) uses S itself."""
    TS = 128 if S % 128 == 0 else min(128, S)
    while S % TS != 0:
        TS //= 2
    blocks = _pick_step_blocks(Bp, D, H, QO, KVH, G, hd, TS)
    if blocks is None:
        return None
    return TS, blocks


def fused_step_layer(
    x: jax.Array,  # [Bp, D] f32 — residual stream entering the layer
    q: jax.Array,  # [B, KVH, G, hd] f32 — RoPE'd, UNscaled queries
    new_k: jax.Array,  # [B, KVH, hd] int8 — fresh row (quantized)
    new_v: jax.Array,
    new_ks: jax.Array,  # [B, KVH] f32
    new_vs: jax.Array,
    k_cache: jax.Array,  # [L, B, KVH, S, hd] int8 — stacked dense cache
    v_cache: jax.Array,
    k_scale: jax.Array,  # [L, B, KVH, S] f32
    v_scale: jax.Array,
    pos: jax.Array,  # [B] int32
    wo_q, wo_s,  # [L, D, D] int8, [L, D] f32
    w13_q, w13_s,  # [L, D, 2H], [L, 2H]
    w2_q, w2_s,  # [L, H, D], [L, D]
    qkv_q, qkv_s,  # [L, D, QO], [L, QO]
    rms_ffn: jax.Array,  # [L, D] f32
    rms_att: jax.Array,  # [L, D] f32
    layer: jax.Array,  # scalar int32
    n_layers: int,
    block_s: int | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Returns (x_next [Bp, D] f32, qkv_next [Bp, QO] f32) — one launch.

    Cache rows STRICTLY below ``pos`` participate; the fresh row joins the
    softmax in-cell (deferred-flush contract, same as
    flash_decode_attention_dma + fused_layer_linear composed).
    """
    Bp, D = x.shape
    B, KVH, G, hd = q.shape
    Lc = k_cache.shape[0]
    S = k_cache.shape[3]
    H = w2_q.shape[1]
    QO = qkv_q.shape[2]
    L = wo_q.shape[0]
    assert Bp % 32 == 0, "int8 sublane tile is 32"
    assert hd % 128 == 0, "per-head lane writes need 128-aligned head_dim"
    assert k_cache.dtype == jnp.int8, "merged step kernel is INT8-KV only"
    G8 = max(8, -(-G // 8) * 8)

    if block_s is not None:
        TS = min(block_s, S)
        while S % TS != 0:
            TS //= 2
        blocks = _pick_step_blocks(Bp, D, H, QO, KVH, G, hd, TS)
        tiling = (TS, blocks) if blocks is not None else None
    else:
        tiling = _pick_step_tiling(Bp, D, H, QO, KVH, G, hd, S)
    if tiling is None:
        raise ValueError(f"no VMEM-feasible merged tiling for Bp={Bp}")
    TS, (TOA, TOB, TOC, TOD) = tiling
    nA, nB, nC, nD = D // TOA, H // TOB, D // TOC, QO // TOD
    grid = (B + nA + nB + nC + nD,)

    l = jnp.asarray(layer, jnp.int32)
    l2 = jnp.minimum(l + 1, n_layers - 1)
    skip_d = (l + 1 >= n_layers).astype(jnp.int32)
    meta = jnp.stack([l, l2, skip_d])

    qs = q.astype(jnp.float32) / jnp.sqrt(jnp.float32(hd))
    if G8 != G:
        qs = jnp.pad(qs, ((0, 0), (0, 0), (0, G8 - G), (0, 0)))

    k4 = k_cache.reshape(Lc * B, KVH, S, hd)
    v4 = v_cache.reshape(Lc * B, KVH, S, hd)
    ks3 = k_scale.reshape(Lc * B, KVH, S)
    vs3 = v_scale.reshape(Lc * B, KVH, S)
    nk4 = new_k.reshape(B, KVH, 1, hd)
    nv4 = new_v.reshape(B, KVH, 1, hd)
    nks4 = new_ks.reshape(B, KVH, 1, 1)
    nvs4 = new_vs.reshape(B, KVH, 1, 1)

    def a_ix(o, m, p):
        return jnp.clip(o - B, 0, nA - 1)

    def b_ix(o, m, p):
        return jnp.clip(o - B - nA, 0, nB - 1)

    def c_ix(o, m, p):
        return jnp.clip(o - B - nA - nB, 0, nC - 1)

    def d_ix(o, m, p):
        # pinned to block 0 when the last layer skips its qkv phase
        return jnp.where(m[2] > 0, 0,
                         jnp.clip(o - B - nA - nB - nC, 0, nD - 1))

    def cell_ix(o, m, p):
        return jnp.minimum(o, B - 1)

    V = pltpu.VMEM
    A = pl.ANY
    in_specs = [
        pl.BlockSpec((1, KVH, G8, hd),
                     lambda o, m, p: (cell_ix(o, m, p), 0, 0, 0),
                     memory_space=V),
        pl.BlockSpec((1, KVH, 1, hd),
                     lambda o, m, p: (cell_ix(o, m, p), 0, 0, 0),
                     memory_space=V),
        pl.BlockSpec((1, KVH, 1, hd),
                     lambda o, m, p: (cell_ix(o, m, p), 0, 0, 0),
                     memory_space=V),
        pl.BlockSpec((1, KVH, 1, 1),
                     lambda o, m, p: (cell_ix(o, m, p), 0, 0, 0),
                     memory_space=V),
        pl.BlockSpec((1, KVH, 1, 1),
                     lambda o, m, p: (cell_ix(o, m, p), 0, 0, 0),
                     memory_space=V),
        pl.BlockSpec(memory_space=A),  # k_hbm
        pl.BlockSpec(memory_space=A),  # v_hbm
        pl.BlockSpec(memory_space=A),  # ks_hbm
        pl.BlockSpec(memory_space=A),  # vs_hbm
        pl.BlockSpec((Bp, TOA), lambda o, m, p: (0, a_ix(o, m, p)),
                     memory_space=V),
        pl.BlockSpec((1, 1, D), lambda o, m, p: (m[0], 0, 0),
                     memory_space=V),
        pl.BlockSpec((1, 1, D), lambda o, m, p: (m[1], 0, 0),
                     memory_space=V),
        pl.BlockSpec((1, D, TOA), lambda o, m, p: (m[0], 0, a_ix(o, m, p)),
                     memory_space=V),
        pl.BlockSpec((1, 1, TOA), lambda o, m, p: (m[0], 0, a_ix(o, m, p)),
                     memory_space=V),
        pl.BlockSpec((1, D, TOB), lambda o, m, p: (m[0], 0, b_ix(o, m, p)),
                     memory_space=V),
        pl.BlockSpec((1, 1, TOB), lambda o, m, p: (m[0], 0, b_ix(o, m, p)),
                     memory_space=V),
        pl.BlockSpec((1, D, TOB),
                     lambda o, m, p: (m[0], 0, nB + b_ix(o, m, p)),
                     memory_space=V),
        pl.BlockSpec((1, 1, TOB),
                     lambda o, m, p: (m[0], 0, nB + b_ix(o, m, p)),
                     memory_space=V),
        pl.BlockSpec((1, H, TOC), lambda o, m, p: (m[0], 0, c_ix(o, m, p)),
                     memory_space=V),
        pl.BlockSpec((1, 1, TOC), lambda o, m, p: (m[0], 0, c_ix(o, m, p)),
                     memory_space=V),
        pl.BlockSpec((1, D, TOD), lambda o, m, p: (m[1], 0, d_ix(o, m, p)),
                     memory_space=V),
        pl.BlockSpec((1, 1, TOD), lambda o, m, p: (m[1], 0, d_ix(o, m, p)),
                     memory_space=V),
    ]
    out_specs = (
        pl.BlockSpec((Bp, TOC), lambda o, m, p: (0, c_ix(o, m, p)),
                     memory_space=V),
        pl.BlockSpec((Bp, TOD), lambda o, m, p: (0, d_ix(o, m, p)),
                     memory_space=V),
    )
    scratch = [
        pltpu.VMEM((KVH, G, Bp, hd), jnp.float32),  # att_sc
        pltpu.VMEM((Bp, D), jnp.int8),  # attq
        pltpu.VMEM((Bp, D), jnp.float32),  # x2
        pltpu.VMEM((Bp, H), jnp.float32),  # h2
        pltpu.VMEM((Bp, D), jnp.int8),  # xq
        pltpu.VMEM((Bp, H), jnp.int8),  # xq3
        pltpu.VMEM((Bp, 1), jnp.float32),  # sx
        pltpu.VMEM((Bp, 1), jnp.float32),  # sxa
        pltpu.VMEM((2, KVH, TS, hd), jnp.int8),  # K ring
        pltpu.VMEM((2, KVH, TS, hd), jnp.int8),  # V ring
        pltpu.VMEM((2, KVH, TS), jnp.float32),  # K scale ring
        pltpu.VMEM((2, KVH, TS), jnp.float32),  # V scale ring
        pltpu.SemaphoreType.DMA((2, 4)),
    ]

    kernel = functools.partial(
        _fused_step_kernel, B=B, G=G, TS=TS, KVH=KVH, hd=hd,
        nA=nA, nB=nB, nC=nC, nD=nD, TOA=TOA, TOB=TOB, TOC=TOC, TOD=TOD)

    x_next, qkv_next = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
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
    )(meta, pos.astype(jnp.int32), qs, nk4, nv4, nks4, nvs4,
      k4, v4, ks3, vs3,
      x, rms_ffn[:, None, :], rms_att[:, None, :],
      wo_q, wo_s[:, None, :],
      w13_q, w13_s[:, None, :], w13_q, w13_s[:, None, :],
      w2_q, w2_s[:, None, :],
      qkv_q, qkv_s[:, None, :])
    return x_next, qkv_next
