"""mega2: ONE Pallas launch per decode layer with TRAILING attention.

ops/fused_step.py (the first merged kernel) put the attention cells at the
FRONT of the grid, which serializes their HBM reads in front of the weight
streams and stalls ~18 us per cell on the block-0 DMA (NEXT.md #1).  This
kernel flips the fusion boundary: launch ``l`` runs layer ``l``'s linear
phases (wo -> rmsnorm -> w13 -> silu -> w2 -> qkv of layer l+1, exactly
ops/fused_layer.py) and then layer ``l+1``'s attention cells at the END —
their KV DMAs are issued from grid step 0 onward via a precomputed global
(cell, block) descriptor chain, so the cache stream overlaps the weight
phases' MXU work and no cell ever stalls at entry.

Trailing attention needs the NEXT layer's q/k/v inside the same launch, so
phase D post-processes its own matmul blocks in-stream:

  * q blocks:  in-kernel RoPE (interleaved pairs via two ``pltpu.roll``
    lane shifts + signed sin tables), scaled by 1/sqrt(hd), staged f32;
  * k blocks:  RoPE + per-head symmetric INT8 quant (quantize_kv's exact
    formula), int8 values to an output ref, scales to a lane-packed scratch;
  * v blocks:  per-head quant only.

At the last phase-D step the staged q reshapes into a head-major [Bp, NH,
hd] scratch (cells index it by slot on the untiled leading dim — Mosaic
rejects dynamic *sublane* loads, tools/mega2_probe.py P3) and the fresh-row
scores s_raw = sum(q * dequant(k_new)) are reduced per head.

The fresh-row softmax merge and the attention-output quantization stay in
XLA (the wrapper), reusing the same math as ops/attention.py's
``_fresh_tail_merge`` — the kernel emits (acc, m, l, s_raw) exactly like
``flash_decode_attention_dma`` emits (acc, st).  The flush rows (int8 +
per-head scales) come straight from the kernel's outputs.

Numerics vs the two-launch path: identical formulas throughout; the only
divergence sources are instruction-level (fused-multiply-add rounding in
rope, multiply order in s_raw * scale) — ulp-level, covered by the same
tolerances as tests/test_fused_step.py.

Reference: fuses llama2.ts:243-267 (attention) + the 7 per-layer matmul
call sites of llama2.ts:196-203 into one launch, with the attention of
llama2.ts's NEXT loop iteration riding behind this iteration's matmuls.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_llama.ops.fused_layer import _block_candidates, _quant_rows, _rms_rows


def _i8w(blk):
    """Weight block for the int8-MXU dot: W4 storage arrives as S4 blocks
    (unpacked-in-jit bitcast, ops/quant.unpack_channel4) and upcasts
    in-VMEM — measured wall-time parity with the int8 stream
    (W4A8_PROBE.json int4packed); mixed int8 x int4 dots are Mosaic-NYI."""
    return blk if blk.dtype == jnp.int8 else blk.astype(jnp.int8)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


_NEG_INF = -1e30


def _rope_block(val, cos_t, sa_t, sb_t, width, hd):
    """Interleaved-pair rotation on a [Bp, width] lane block.

    r[2j]   = x[2j]  c_j - x[2j+1] s_j
    r[2j+1] = x[2j]  s_j + x[2j+1] c_j

    expressed roll-wise as  x*C + roll_left(x)*SA + roll_right(x)*SB  with
    SA zero at odd lanes and SB zero at even lanes, so the rolls' wraparound
    lanes are always masked by a zero table entry.  Tables arrive [Bp, hd]
    and tile to the block width (pairs never straddle a head boundary).
    """
    reps = width // hd
    if reps > 1:
        cos_t = jnp.concatenate([cos_t] * reps, axis=1)
        sa_t = jnp.concatenate([sa_t] * reps, axis=1)
        sb_t = jnp.concatenate([sb_t] * reps, axis=1)
    left = pltpu.roll(val, width - 1, axis=1)  # y[i] = x[i+1]
    right = pltpu.roll(val, 1, axis=1)  # y[i] = x[i-1]
    return val * cos_t + left * sa_t + right * sb_t


def _perhead_quant(val, nh_blk, hd):
    """quantize_kv's formula per hd-lane head group of a [Bp, width] block.

    Returns (int8 [Bp, width], absmax-scale [Bp, nh_blk, 1] f32).
    """
    Bp, width = val.shape
    g = val.reshape(Bp, nh_blk, hd)
    am = jnp.max(jnp.abs(g), axis=-1, keepdims=True)
    s = am / 127.0
    inv = jnp.where(s > 0, 1.0 / jnp.where(s > 0, s, 1.0), 0.0)
    q = jnp.clip(jnp.rint(g * inv), -127, 127).astype(jnp.int8)
    return q.reshape(Bp, width), s


def _lane0(x3, w):
    """[Bp, KVH, w] -> [Bp, KVH]: extract lane 0 of each w-lane group (the
    packed scale is replicated over the group) via mask-sum — dynamic or
    strided single-lane loads are not supported."""
    mask = (jax.lax.broadcasted_iota(jnp.int32, x3.shape, 2) == 0)
    return jnp.sum(jnp.where(mask, x3, 0.0), axis=-1)


def _fused_step2_kernel(
    meta_ref,  # [4] int32: layer l, next l2, skip flag, total DMA blocks
    pos_ref,  # [B] int32
    base_ref,  # [B] int32 — exclusive cumsum of per-slot block counts
    dcell_ref,  # [MAXG] int32 — global block g -> slot
    doff_ref,  # [MAXG] int32 — global block g -> S-block index
    # --- inputs -----------------------------------------------------------
    xres_ref,  # [Bp, TOA] f32 residual block
    attq_ref,  # [Bp, D] int8 — layer l's quantized attention output
    satt_ref,  # [Bp, 1] f32
    cos_ref, sa_ref, sb_ref,  # [Bp, hd] f32 rope tables (signed/expanded)
    rmsf_ref, rmsa_ref,  # [1, 1, D] f32
    woq_ref, wos_ref,
    w13g_ref, w13gs_ref, w13u_ref, w13us_ref,
    w2q_ref, w2s_ref,
    qkvq_ref, qkvs_ref,
    k_hbm, v_hbm, ks_hbm, vs_hbm,  # [L*B, KVH, S, hd] / [L*B, KVH, S] (ANY)
    # --- outputs ----------------------------------------------------------
    xout_ref,  # [Bp, TOC] f32 block (phase C)
    kq_ref, vq_ref,  # [Bp, KVD] int8 — fresh rows, layer l+1
    kso_ref, vso_ref,  # [Bp, KVH] f32 — fresh-row scales
    sraw_ref,  # [Bp, NH] f32 — unscaled fresh-row scores
    acc_ref,  # [Bp, NH, hd] f32 — attention accumulator (unnormalized)
    st_ref,  # [Bp, NH, 2] f32 — online-softmax (m, l)
    # --- scratch ----------------------------------------------------------
    x2_ref, h2_ref, xq_ref, xq3_ref, sx_ref,
    q_sc,  # [Bp, D] bf16 — roped, scaled q staging
    q3_sc,  # [Bp, NH, hd] bf16 — head-major q for the cells
    ksx_sc, vsx_sc,  # [Bp, KVH*w] f32 — lane-packed scales
    kbuf, vbuf,  # [DEPTH, KVH, TS, hd] int8 DMA rings
    ksbuf, vsbuf,  # [DEPTH, KVH, TS] f32
    sem,  # DMA semaphores [DEPTH, 4]
    *, B: int, G: int, TS: int, KVH: int, hd: int, w: int,
    nA: int, nB: int, nC: int, nD: int, nq: int, nkk: int,
    TOA: int, TOB: int, TOC: int, TOD: int, DEPTH: int = 2,
):
    o = pl.program_id(0)
    B0 = nA + nB + nC + nD
    NH = KVH * G
    isqrt_hd = 1.0 / jnp.sqrt(jnp.float32(hd))
    tot_eff = jnp.where(meta_ref[2] > 0, 0, meta_ref[3])

    # ---- KV DMA plumbing (global descriptor chain) -------------------------
    def copies(g, slot):
        bb = dcell_ref[g]
        off = doff_ref[g]
        row = meta_ref[1] * B + bb
        return [
            pltpu.make_async_copy(
                k_hbm.at[row, :, pl.ds(off * TS, TS), :],
                kbuf.at[slot], sem.at[slot, 0]),
            pltpu.make_async_copy(
                v_hbm.at[row, :, pl.ds(off * TS, TS), :],
                vbuf.at[slot], sem.at[slot, 1]),
            pltpu.make_async_copy(
                ks_hbm.at[row, :, pl.ds(off * TS, TS)],
                ksbuf.at[slot], sem.at[slot, 2]),
            pltpu.make_async_copy(
                vs_hbm.at[row, :, pl.ds(off * TS, TS)],
                vsbuf.at[slot], sem.at[slot, 3]),
        ]

    def start(g, slot):
        for cp in copies(g, slot):
            cp.start()

    def wait(g, slot):
        for cp in copies(g, slot):
            cp.wait()

    # The first DEPTH blocks issue during the FIRST linear steps, hundreds
    # of microseconds before the trailing cells consume them — the cache
    # stream rides behind the weight streams instead of in front of them.
    for _i in range(DEPTH):
        @pl.when(jnp.logical_and(o == _i, tot_eff > _i))
        def _(i=_i):
            start(i, i)

    # ---- linear phases (ops/fused_layer.py, unchanged) ---------------------
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
        h2_ref[:, pl.ds(j * TOB, TOB)] = (
            g * (1.0 / (1.0 + jnp.exp(-g))) * u).astype(h2_ref.dtype)

    @pl.when(o == nA + nB - 1)
    def _boundary_b():
        # bf16 staging: int8 quant granularity (1/254 relative) dwarfs the
        # bf16 rounding of the staged activations
        q, s = _quant_rows(h2_ref[:].astype(jnp.float32))
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

    # ---- phase D: qkv matmul + in-stream rope / fresh-row quant ------------
    @pl.when(jnp.logical_and(o >= nA + nB + nC, o < B0))
    def _phase_d():
        j = o - nA - nB - nC
        acc = jnp.dot(xq_ref[:], _i8w(qkvq_ref[0]),
                      preferred_element_type=jnp.int32)
        val = acc.astype(jnp.float32) * sx_ref[:] * qkvs_ref[0]  # [Bp, TOD]
        nh_blk = TOD // hd

        @pl.when(j < nq)
        def _q_block():
            r = _rope_block(val, cos_ref[:], sa_ref[:], sb_ref[:], TOD, hd)
            q_sc[:, pl.ds(j * TOD, TOD)] = (r * isqrt_hd).astype(q_sc.dtype)

        @pl.when(jnp.logical_and(j >= nq, j < nq + nkk))
        def _k_block():
            jj = j - nq
            r = _rope_block(val, cos_ref[:], sa_ref[:], sb_ref[:], TOD, hd)
            qv, am = _perhead_quant(r, nh_blk, hd)
            kq_ref[:, pl.ds(jj * TOD, TOD)] = qv
            packed = jnp.broadcast_to(am, am.shape[:-1] + (w,))
            ksx_sc[:, pl.ds(jj * nh_blk * w, nh_blk * w)] = packed.reshape(
                packed.shape[0], nh_blk * w)

        @pl.when(j >= nq + nkk)
        def _v_block():
            jj = j - nq - nkk
            qv, am = _perhead_quant(val, nh_blk, hd)
            vq_ref[:, pl.ds(jj * TOD, TOD)] = qv
            packed = jnp.broadcast_to(am, am.shape[:-1] + (w,))
            vsx_sc[:, pl.ds(jj * nh_blk * w, nh_blk * w)] = packed.reshape(
                packed.shape[0], nh_blk * w)

    @pl.when(o == B0 - 1)
    def _boundary_d():
        Bp, D = q_sc.shape
        KVD = KVH * hd
        q3_sc[:] = q_sc[:].reshape(Bp, NH, hd).astype(jnp.bfloat16)
        ks3 = ksx_sc[:].reshape(Bp, KVH, w)
        vs3 = vsx_sc[:].reshape(Bp, KVH, w)
        kso_ref[:] = _lane0(ks3, w)
        vso_ref[:] = _lane0(vs3, w)
        # fresh-row scores, UNSCALED: s_raw[b, h*G+g] = sum_d q * k_new_int8;
        # the wrapper multiplies by the per-head scale (same value as
        # _fresh_tail_merge's q . dequant(k_new), different multiply order)
        kqf = kq_ref[:].reshape(Bp, KVH, hd).astype(jnp.float32)
        if G > 1:
            kqf = jnp.broadcast_to(kqf[:, :, None, :], (Bp, KVH, G, hd))
        sraw_ref[:] = jnp.sum(
            (q_sc[:].astype(jnp.float32)
             * kqf.reshape(Bp, KVD * G)).reshape(Bp, NH, hd),
            axis=-1)

    # ---- trailing attention cells (layer l+1) ------------------------------
    @pl.when(o >= B0)
    def _cell():
        b = o - B0
        pos = pos_ref[b]
        nb = jnp.where(meta_ref[2] > 0, 0,
                       jax.lax.div(pos + TS - 1, TS))  # strict < pos
        g0 = base_ref[b]
        qv = q3_sc[b]  # [NH, hd] bf16 — dynamic untiled leading index

        init = (jnp.full((NH, 1), _NEG_INF, jnp.float32),
                jnp.zeros((NH, 1), jnp.float32),
                jnp.zeros((NH, hd), jnp.float32))

        def body(jj, carry):
            m, l, acc = carry
            g = g0 + jj
            slot = jax.lax.rem(g, DEPTH)
            wait(g, slot)
            s = jnp.concatenate([
                jax.lax.dot_general(
                    qv[h * G:(h + 1) * G],
                    kbuf[slot, h].astype(jnp.bfloat16),
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                for h in range(KVH)])  # [NH, TS]
            ksr = ksbuf[slot]  # [KVH, TS]
            vsr = vsbuf[slot]
            if G > 1:
                ksr = jnp.broadcast_to(
                    ksr[:, None, :], (KVH, G, TS)).reshape(NH, TS)
                vsr = jnp.broadcast_to(
                    vsr[:, None, :], (KVH, G, TS)).reshape(NH, TS)
            s = s * ksr
            kpos = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + jj * TS
            mask = kpos < pos
            m_new = jnp.maximum(m, jnp.max(
                jnp.where(mask, s, _NEG_INF), axis=-1, keepdims=True))
            corr = jnp.exp(m - m_new)
            p = jnp.where(mask, jnp.exp(s - m_new), 0.0)
            l = l * corr + jnp.sum(p, axis=-1, keepdims=True)
            p = (p * vsr).astype(jnp.bfloat16)
            pv = jnp.concatenate([
                jnp.dot(p[h * G:(h + 1) * G], vbuf[slot, h].astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
                for h in range(KVH)])  # [NH, hd]

            # slot(g) just freed; refill it with block g+DEPTH
            @pl.when(g + DEPTH < tot_eff)
            def _():
                start(g + DEPTH, slot)

            return m_new, l, acc * corr + pv

        m, l, acc = jax.lax.fori_loop(0, nb, body, init)
        acc_ref[pl.ds(b, 1)] = acc[None]
        st_ref[pl.ds(b, 1)] = jnp.concatenate([m, l], axis=1)[None]


def _scale_pack_width(TOD: int, hd: int) -> int:
    """Lane width per head for the packed scale scratch.

    Always a full 128-lane tile: the kernel collapses the per-head scale
    block [Bp, nh_blk, w] -> [Bp, nh_blk*w] with a vector reshape, and
    Mosaic only supports collapsing when the INNER dim is lane-tile
    aligned (a <32x2x64> -> <32x128> reshape is a hard compile error on
    the real chip; <32x2x128> -> <32x256> is the q3-style pattern that
    works)."""
    del TOD, hd
    return 128


@functools.lru_cache(maxsize=64)
def _pick_step2_blocks(Bp: int, D: int, H: int, QO: int, KVH: int, G: int,
                       hd: int, TS: int, budget: int = int(15.2 * (1 << 20))):
    """(TOA, TOB, TOC, TOD, DEPTH) for the trailing-attention kernel, or
    None.

    Phase D's block width is grown FIRST: its steps are grid-overhead-bound
    below 256 lanes (weights 4096xTOD int8 DMA ~0.7 us at 128 vs ~1 us step
    cost), while phase B stays DMA-bound even at 128 — see NEXT.md #1's
    phase model.  TOD must tile q/k/v boundaries (TOD | D and TOD | KVD) and
    whole heads (hd | TOD).  After block growth saturates, leftover budget
    funds a deeper KV DMA ring (DEPTH 2 -> 4): at depth 2 only two blocks
    per cell actually prefetch behind the weight phases; each extra slot
    hides ~12 us/layer of cache-stream latency (NEXT.md #1, r3 lever).
    The h2/q_sc scratches are bf16 (staging before int8 quant — the quant
    granularity dwarfs the rounding), freeing ~0.9 MB to fund this.
    """
    NH = KVH * G
    KVD = KVH * hd

    def fixed(tod, depth):
        w = _scale_pack_width(tod, hd)
        return (Bp * D * 4  # x2
                + Bp * H * 2  # h2 (bf16 staging)
                + Bp * D + Bp * H  # xq, xq3
                + Bp * D * 2  # q_sc (bf16 staging)
                + Bp * NH * hd * 2  # q3
                + 2 * Bp * KVH * w * 4  # ksx + vsx
                + depth * 2 * KVH * TS * hd  # K/V rings (int8)
                + depth * 2 * KVH * TS * 4  # scale rings
                + 2 * Bp * D  # attq input (double-buffered)
                + 6 * Bp * hd * 4  # rope tables (x2 buffering)
                + 2 * Bp * KVD  # kq/vq outputs
                + Bp * NH * hd * 4  # acc output
                + Bp * NH * 2 * 4 + Bp * NH * 4 + 2 * Bp * KVH * 4)

    def operand_bytes(c):
        return 2 * (D * c["A"] + Bp * c["A"] * 4  # wo + xres
                    + 2 * D * c["B"]  # gate + up
                    + H * c["C"] + Bp * c["C"] * 4  # w2 + xout
                    + D * c["D"])  # qkv (no output blocks)

    d_cands = [c for c in _block_candidates(QO)
               if c % hd == 0 and D % c == 0 and KVD % c == 0]
    if not d_cands:
        return None
    choices = {"A": _block_candidates(D)[-1], "B": _block_candidates(H)[-1],
               "C": _block_candidates(D)[-1], "D": d_cands[-1]}
    depth = 2

    def total(c, dep):
        return fixed(c["D"], dep) + operand_bytes(c)

    if total(choices, depth) > budget:
        # depth-1 fallback (13B: KVH=40 rings + D=5120 operands put the
        # minimal depth-2 plan at 16.3 MB model).  A single-slot ring loses
        # the cross-block DMA overlap (~12 us/layer, r3) but keeps the
        # launch-count win — worth it only when depth 2 cannot fit at all.
        depth = 1

    improved = True
    while improved:
        improved = False
        for k, cands in (("D", d_cands), ("A", _block_candidates(D)),
                         ("B", _block_candidates(H)),
                         ("C", _block_candidates(D))):
            ups = [c for c in cands if c > choices[k]]
            if not ups:
                continue
            trial = dict(choices)
            trial[k] = ups[-1]
            if total(trial, depth) <= budget:
                choices = trial
                improved = True
    while depth < 4 and total(choices, depth + 1) <= budget:
        depth += 1
    if total(choices, depth) > budget:
        return None
    return choices["A"], choices["B"], choices["C"], choices["D"], depth


def step2_block_s(S: int, block_s: int | None = None) -> int:
    """The kernel's S-block size: 128 rows unless S itself is smaller.

    The per-row SCALE arrays [L*B, KVH, S] put S in the LANE dim, and
    Mosaic requires lane-dim DMA slices to be 128-aligned (measured on the
    real chip: TS=64 is 'Slice shape along dimension 2 must be aligned to
    tiling (128)').  So TS must be a multiple of 128 — or the whole of S
    when S < 128 (a full-dim slice has no alignment constraint)."""
    TS = min(block_s or 128, S)
    while S % TS != 0:
        TS //= 2
    return TS


def step2_plan(Bp: int, D: int, H: int, QO: int, KVH: int, G: int, hd: int,
               S: int, budget: int | None = None,
               block_s: int | None = None):
    """Resolve ``(TS, (TOA, TOB, TOC, TOD))`` for the trailing-attention
    kernel, or ``None`` when no legal S-block size fits the VMEM budget.

    Mosaic lane-alignment (CLAUDE.md r3): DMA slices of the [L*B,KVH,S]
    scale arrays on the lane dim S must be 128-aligned, so the only legal
    TS values are multiples of 128 — or S itself (a full-dim slice is
    alignment-exempt).  Candidates are tried largest-first from the
    requested ``block_s`` (default 128, the measured 7B winner under the
    14 MB default budget); when S is not itself 128-aligned the halving
    chain contains no legal multiple-of-128 value, so ``ts == S`` is tried
    first instead of silently falling back to the unfused path."""
    kw = {} if budget is None else {"budget": budget}
    candidates = []
    ts = step2_block_s(S, block_s)
    while ts >= 8:
        if ts % 128 == 0 or ts == S:
            candidates.append(ts)
        ts //= 2
    if S % 128 != 0 and S not in candidates:
        # S not 128-aligned: the halving chain from block_s misses the
        # alignment-exempt full-S candidate — try it (budget still gates)
        candidates.insert(0, S)
    for ts in candidates:
        blocks = _pick_step2_blocks(Bp, D, H, QO, KVH, G, hd, ts, **kw)
        if blocks is not None:
            return ts, blocks
    return None


def decode_dma_descs(pos: jax.Array, B: int, S: int, TS: int):
    """Precompute the global (cell, block) DMA chain for one decode step.

    Returns (base [B], dcell [MAXG], doff [MAXG], total scalar) — a flat
    enumeration of every cache block any cell will stream, in consumption
    order, so the kernel can issue block g+2 the moment slot g frees and the
    first two blocks during the linear phases.
    """
    nbs = (pos + TS - 1) // TS  # ceil(pos / TS), strict-< rows
    cum = jnp.cumsum(nbs)
    base = cum - nbs
    total = cum[-1]
    maxg = B * (S // TS)
    idx = jnp.arange(maxg, dtype=jnp.int32)
    dcell = jnp.searchsorted(cum, idx, side="right").astype(jnp.int32)
    dcell = jnp.clip(dcell, 0, B - 1)
    doff = idx - base[dcell]
    return (base.astype(jnp.int32), dcell, jnp.clip(doff, 0, S // TS - 1),
            total.astype(jnp.int32))


def rope_tables(cos: jax.Array, sin: jax.Array, Bp: int):
    """Build the kernel's signed/interleave-expanded rope tables.

    cos/sin: [B, hd/2] rows gathered at each slot's position.  Returns
    (C, SA, SB) [Bp, hd] f32 with C[2j] = C[2j+1] = cos_j, SA[2j] = -sin_j
    (zero at odd lanes), SB[2j+1] = +sin_j (zero at even).
    """
    B = cos.shape[0]
    z = jnp.zeros_like(sin)
    C = jnp.stack([cos, cos], axis=-1).reshape(B, -1)
    SA = jnp.stack([-sin, z], axis=-1).reshape(B, -1)
    SB = jnp.stack([z, sin], axis=-1).reshape(B, -1)
    if Bp != B:
        pad = ((0, Bp - B), (0, 0))
        C, SA, SB = jnp.pad(C, pad), jnp.pad(SA, pad), jnp.pad(SB, pad)
    return (C.astype(jnp.float32), SA.astype(jnp.float32),
            SB.astype(jnp.float32))


def fused_step2_layer(
    x: jax.Array,  # [Bp, D] f32 — residual entering layer l
    attq: jax.Array,  # [Bp, D] int8 — layer l's quantized attention output
    satt: jax.Array,  # [Bp] f32
    k_cache, v_cache,  # [L, B, KVH, S, hd] int8
    k_scale, v_scale,  # [L, B, KVH, S] f32
    pos: jax.Array,  # [B] int32
    rope_c, rope_sa, rope_sb,  # [Bp, hd] f32 (see rope_tables)
    base, dcell, doff, total,  # decode_dma_descs output
    wo_q, wo_s, w13_q, w13_s, w2_q, w2_s, qkv_q, qkv_s,
    rms_ffn, rms_att,
    layer: jax.Array,
    n_layers: int,
    n_heads: int,
    block_s: int | None = None,
    budget: int | None = None,
):
    """One launch: layer ``l`` linear phases + layer ``l+1`` attention.

    Returns ``(x_next [Bp, D], attq_next [Bp, D] int8, satt_next [Bp],
    kq [B, KVH, hd] int8, ks [B, KVH], vq, vs)`` — the attq/satt feed the
    next launch's phase A; the fresh rows feed the per-step cache flush.
    The LAST layer's launch (skip flag) still runs its linear phases but
    pins phase D's weight stream and skips the cells; its attention outputs
    are garbage the caller discards.
    """
    from tpu_llama.ops.quant import quantize_activations

    Bp, D = x.shape
    L, B, KVH, S, hd = k_cache.shape
    G = n_heads // KVH
    NH = KVH * G
    KVD = KVH * hd
    H = w2_q.shape[1]
    QO = qkv_q.shape[2]
    assert Bp % 32 == 0, "int8 sublane tile is 32"
    assert hd % 128 == 0, "per-head lane slices need 128-aligned head_dim"
    assert k_cache.dtype == jnp.int8, "mega2 is INT8-KV only"

    plan = step2_plan(Bp, D, H, QO, KVH, G, hd, S, budget=budget,
                      block_s=block_s)
    if plan is None:
        raise ValueError(f"no VMEM-feasible mega2 tiling for Bp={Bp}")
    TS, (TOA, TOB, TOC, TOD, DEPTH) = plan
    nA, nB, nC, nD = D // TOA, H // TOB, D // TOC, QO // TOD
    nq, nkk = D // TOD, KVD // TOD
    B0 = nA + nB + nC + nD
    grid = (B0 + B,)
    w = _scale_pack_width(TOD, hd)
    MAXG = B * (S // TS)

    l = jnp.asarray(layer, jnp.int32)
    l2 = jnp.minimum(l + 1, n_layers - 1)
    skip = (l + 1 >= n_layers).astype(jnp.int32)
    meta = jnp.stack([l, l2, skip, jnp.asarray(total, jnp.int32)])

    k4 = k_cache.reshape(L * B, KVH, S, hd)
    v4 = v_cache.reshape(L * B, KVH, S, hd)
    ks3 = k_scale.reshape(L * B, KVH, S)
    vs3 = v_scale.reshape(L * B, KVH, S)

    def a_ix(o, *s):
        return jnp.clip(o, 0, nA - 1)

    def b_ix(o, *s):
        return jnp.clip(o - nA, 0, nB - 1)

    def c_ix(o, *s):
        return jnp.clip(o - nA - nB, 0, nC - 1)

    def d_ix(o, m, *s):
        return jnp.where(m[2] > 0, 0,
                         jnp.clip(o - nA - nB - nC, 0, nD - 1))

    V = pltpu.VMEM
    A = pl.ANY
    const = pl.BlockSpec(memory_space=V)  # whole array, VMEM-resident
    in_specs = [
        pl.BlockSpec((Bp, TOA), lambda o, m, *s: (0, a_ix(o)),
                     memory_space=V),
        const,  # attq
        const,  # satt
        const, const, const,  # rope tables
        pl.BlockSpec((1, 1, D), lambda o, m, *s: (m[0], 0, 0),
                     memory_space=V),
        pl.BlockSpec((1, 1, D), lambda o, m, *s: (m[1], 0, 0),
                     memory_space=V),
        pl.BlockSpec((1, D, TOA), lambda o, m, *s: (m[0], 0, a_ix(o)),
                     memory_space=V),
        pl.BlockSpec((1, 1, TOA), lambda o, m, *s: (m[0], 0, a_ix(o)),
                     memory_space=V),
        pl.BlockSpec((1, D, TOB), lambda o, m, *s: (m[0], 0, b_ix(o)),
                     memory_space=V),
        pl.BlockSpec((1, 1, TOB), lambda o, m, *s: (m[0], 0, b_ix(o)),
                     memory_space=V),
        pl.BlockSpec((1, D, TOB), lambda o, m, *s: (m[0], 0, nB + b_ix(o)),
                     memory_space=V),
        pl.BlockSpec((1, 1, TOB), lambda o, m, *s: (m[0], 0, nB + b_ix(o)),
                     memory_space=V),
        pl.BlockSpec((1, H, TOC), lambda o, m, *s: (m[0], 0, c_ix(o)),
                     memory_space=V),
        pl.BlockSpec((1, 1, TOC), lambda o, m, *s: (m[0], 0, c_ix(o)),
                     memory_space=V),
        pl.BlockSpec((1, D, TOD), lambda o, m, *s: (m[1], 0, d_ix(o, m)),
                     memory_space=V),
        pl.BlockSpec((1, 1, TOD), lambda o, m, *s: (m[1], 0, d_ix(o, m)),
                     memory_space=V),
        pl.BlockSpec(memory_space=A),  # k_hbm
        pl.BlockSpec(memory_space=A),  # v_hbm
        pl.BlockSpec(memory_space=A),  # ks_hbm
        pl.BlockSpec(memory_space=A),  # vs_hbm
    ]
    out_specs = (
        pl.BlockSpec((Bp, TOC), lambda o, m, *s: (0, c_ix(o)),
                     memory_space=V),
        const,  # kq
        const,  # vq
        const,  # kso
        const,  # vso
        const,  # sraw
        const,  # acc
        const,  # st
    )
    out_shape = (
        jax.ShapeDtypeStruct((Bp, D), jnp.float32),
        jax.ShapeDtypeStruct((Bp, KVD), jnp.int8),
        jax.ShapeDtypeStruct((Bp, KVD), jnp.int8),
        jax.ShapeDtypeStruct((Bp, KVH), jnp.float32),
        jax.ShapeDtypeStruct((Bp, KVH), jnp.float32),
        jax.ShapeDtypeStruct((Bp, NH), jnp.float32),
        jax.ShapeDtypeStruct((Bp, NH, hd), jnp.float32),
        jax.ShapeDtypeStruct((Bp, NH, 2), jnp.float32),
    )
    scratch = [
        pltpu.VMEM((Bp, D), jnp.float32),  # x2
        pltpu.VMEM((Bp, H), jnp.bfloat16),  # h2 (staging before int8 quant)
        pltpu.VMEM((Bp, D), jnp.int8),  # xq
        pltpu.VMEM((Bp, H), jnp.int8),  # xq3
        pltpu.VMEM((Bp, 1), jnp.float32),  # sx
        pltpu.VMEM((Bp, D), jnp.bfloat16),  # q_sc (staging)
        pltpu.VMEM((Bp, NH, hd), jnp.bfloat16),  # q3
        pltpu.VMEM((Bp, KVH * w), jnp.float32),  # ksx
        pltpu.VMEM((Bp, KVH * w), jnp.float32),  # vsx
        pltpu.VMEM((DEPTH, KVH, TS, hd), jnp.int8),  # K ring
        pltpu.VMEM((DEPTH, KVH, TS, hd), jnp.int8),  # V ring
        pltpu.VMEM((DEPTH, KVH, TS), jnp.float32),
        pltpu.VMEM((DEPTH, KVH, TS), jnp.float32),
        pltpu.SemaphoreType.DMA((DEPTH, 4)),
    ]

    kernel = functools.partial(
        _fused_step2_kernel, B=B, G=G, TS=TS, KVH=KVH, hd=hd, w=w,
        nA=nA, nB=nB, nC=nC, nD=nD, nq=nq, nkk=nkk,
        TOA=TOA, TOB=TOB, TOC=TOC, TOD=TOD, DEPTH=DEPTH)

    (x_next, kq, vq, kso, vso, sraw, acc, st) = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=scratch,
        ),
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=_interpret(),
    )(meta, pos.astype(jnp.int32), base, dcell, doff,
      x, attq, satt[:, None], rope_c, rope_sa, rope_sb,
      rms_ffn[:, None, :], rms_att[:, None, :],
      wo_q, wo_s[:, None, :],
      w13_q, w13_s[:, None, :], w13_q, w13_s[:, None, :],
      w2_q, w2_s[:, None, :],
      qkv_q, qkv_s[:, None, :],
      k4, v4, ks3, vs3)

    # ---- XLA epilogue: fresh-row merge + attention-output quantization -----
    # (the same math as ops/attention.py _fresh_tail_merge, with s_raw
    # replacing the qs.new_k einsum — the kernel already reduced it)
    accB = acc[:B].reshape(B, KVH, G, hd)
    stB = st[:B].reshape(B, KVH, G, 2)
    m = stB[..., 0:1]
    lden = stB[..., 1:2]
    ks = kso[:B]
    vs = vso[:B]
    s_new = (sraw[:B].reshape(B, KVH, G) * ks[:, :, None])[..., None]
    m_fin = jnp.maximum(m, s_new)
    corr = jnp.exp(m - m_fin)
    e_new = jnp.exp(s_new - m_fin)
    l_fin = lden * corr + e_new
    kqr = kq[:B].reshape(B, KVH, hd)
    vqr = vq[:B].reshape(B, KVH, hd)
    nv = vqr.astype(jnp.float32) * vs[..., None]
    att = (accB * corr + e_new * nv[:, :, None, :]) / jnp.maximum(
        l_fin, 1e-30)
    att2 = att.reshape(B, D)
    if Bp != B:
        att2 = jnp.pad(att2, ((0, Bp - B), (0, 0)))
    attq_next, satt_next = quantize_activations(att2)
    return x_next, attq_next, satt_next, kqr, ks, vqr, vs
