"""mega3: TWO layers per Pallas launch (mega2 pairs with an in-kernel seam).

mega2 (ops/fused_step2.py) runs one launch per layer; at ~75-80 us fixed
Mosaic launch cost (CLAUDE.md) the 7B step pays 32 x ~80 us = ~2.6 ms of
pure launch overhead on a ~12 ms step.  This kernel fuses CONSECUTIVE LAYER
PAIRS into one launch, halving that to ~1.3 ms:

  grid = [A B C D](l)  [cells](l+1)  ||seam||  [A B C D](l+1)  [cells](l+2)

Everything inside a half is exactly the mega2 kernel (same phase bodies,
same DMA descriptor chain mechanics, same in-stream rope/quant); the two
new pieces are

  * the SEAM at grid step HALF: the fresh-row softmax merge + activation
    quant of layer l+1's attention, i.e. variant M's in-kernel merge
    (commit 7e4c25e) reading this launch's own half-0 partials from
    scratch/output refs instead of cross-launch inputs — measured PARITY
    as a cross-launch mechanism (646 vs 653, reverted), but REQUIRED here
    because the second half consumes attq(l+1) inside the same launch;
  * a doubled DMA descriptor walk: blocks [0, total) stream layer l+1's
    cache rows for the half-0 cells, blocks [total, 2*total) stream layer
    l+2's for the half-1 cells, one contiguous ring across the seam so the
    half-1 cache stream issues while half-0's cells and the seam run.

The BETWEEN-launch merge stays in the XLA epilogue (it fuses into the scan
body for free — variant M's lesson).  The CELL body is emitted ONCE with a
traced half index (emitting it per static half doubled the 2*KVH unrolled
per-head dots to 128 at KVH=32 and hung the remote Mosaic compile): both
halves' partials land in the [2*Bp]-leading (acc, st) outputs, the seam
reads rows [0, Bp) and the epilogue rows [Bp, 2*Bp); fresh rows/scales/
sraw are [2, ...] outputs indexed by the static phase-D half so the
per-step flush gets BOTH layers' rows.

Reference: two iterations of llama2.ts:215's layer loop (the 7 matmuls of
llama2.ts:196-203 + the attention of llama2.ts:243-267, twice) per launch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_llama.ops.fused_layer import _block_candidates, _quant_rows, _rms_rows
from tpu_llama.ops.fused_step2 import (
    _lane0,
    _perhead_quant,
    _rope_block,
    _scale_pack_width,
    decode_dma_descs,
    rope_tables,
    step2_block_s,
)

__all__ = ["fused_step3_pair", "step3_plan", "decode_dma_descs",
           "rope_tables"]


def _i8w(blk):
    """S4 (W4 storage) weight blocks upcast in-VMEM for the int8 MXU dot
    (see ops/fused_layer._i8w)."""
    return blk if blk.dtype == jnp.int8 else blk.astype(jnp.int8)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


_NEG_INF = -1e30


def _fused_step3_kernel(
    meta_ref,  # [5] int32: l0, l1 (=l0+1), l2 (=min(l0+2, L-1)),
    #                      skip flag (l0+2 >= L: no half-1 cells), total
    pos_ref,  # [B] int32
    base_ref,  # [B] int32 — exclusive cumsum of per-slot block counts
    dcell_ref,  # [MAXG] int32 — per-layer block index -> slot
    doff_ref,  # [MAXG] int32 — per-layer block index -> S-block index
    # --- inputs -----------------------------------------------------------
    xres_ref,  # [Bp, TOA] f32 residual block (half 0's phase A only)
    attq_ref,  # [Bp, D] int8 — layer l0's quantized attention output
    satt_ref,  # [Bp, 1] f32
    cos_ref, sa_ref, sb_ref,  # [Bp, hd] f32 rope tables
    rmsf_ref,  # [1, 1, D] f32 — rms_ffn[l0 | l1] (half-indexed map)
    rmsa_ref,  # [1, 1, D] f32 — rms_att[l1 | l2]
    woq_ref, wos_ref,  # layer l0 | l1
    w13g_ref, w13gs_ref, w13u_ref, w13us_ref,
    w2q_ref, w2s_ref,
    qkvq_ref, qkvs_ref,  # layer l1 | l2
    k_hbm, v_hbm, ks_hbm, vs_hbm,  # [L*B, KVH, S, hd] / [L*B, KVH, S] (ANY)
    # --- outputs ----------------------------------------------------------
    xout_ref,  # [Bp, TOC] block — final content = half 1's phase C
    kq_ref, vq_ref,  # [2, Bp, KVD] int8 — fresh rows, layers l1/l2
    kso_ref, vso_ref,  # [2, Bp, KVH] f32
    sraw_ref,  # [2, Bp, NH] f32 — unscaled fresh-row scores
    acc_ref,  # [2*Bp, NH, hd] f32 — rows [h*Bp, h*Bp+B) = half h's cells
    st_ref,  # [2*Bp, NH, 2] f32 — (m, l) in the same layout
    # --- scratch ----------------------------------------------------------
    x2_ref, h2_ref, xq_ref, xq3_ref, sx_ref,
    q_sc, q3_sc, ksx_sc, vsx_sc,
    attq_sc,  # [Bp, D] int8 — layer l1's attention output (seam merge)
    satt_sc,  # [Bp, 1] f32
    kbuf, vbuf, ksbuf, vsbuf, sem,
    *, B: int, G: int, TS: int, KVH: int, hd: int, w: int,
    nA: int, nB: int, nC: int, nD: int, nq: int, nkk: int,
    TOA: int, TOB: int, TOC: int, TOD: int, DEPTH: int,
):
    o = pl.program_id(0)
    B0 = nA + nB + nC + nD
    HALF = B0 + B
    NH = KVH * G
    KVD = KVH * hd
    isqrt_hd = 1.0 / jnp.sqrt(jnp.float32(hd))
    total = meta_ref[4]
    # skip kills only HALF 1's cells; half 0's cache stream always runs
    tot_eff = jnp.where(meta_ref[3] > 0, total, 2 * total)

    # ---- KV DMA plumbing: ONE chain across both halves --------------------
    def copies(g, slot):
        g2 = g - jnp.where(g >= total, total, 0)
        bb = dcell_ref[g2]
        off = doff_ref[g2]
        lsel = jnp.where(g >= total, meta_ref[2], meta_ref[1])
        row = lsel * B + bb
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

    for _i in range(DEPTH):
        @pl.when(jnp.logical_and(o == _i, tot_eff > _i))
        def _(i=_i):
            start(i, i)

    # ---- seam: layer l1's fresh-row merge + activation quant ---------------
    # (variant M's in-kernel merge, reading half 0's partials from the
    # [0, Bp) acc/st rows and the h=0 output sections)
    @pl.when(o == HALF)
    def _seam():
        Bp = attq_sc.shape[0]
        m = st_ref[0:Bp, :, 0]  # [Bp, NH] — half-0 cells' section
        lden = st_ref[0:Bp, :, 1]
        ksh = kso_ref[0]  # [Bp, KVH]
        vsh = vso_ref[0]
        if G > 1:
            ksh = jnp.broadcast_to(
                ksh[:, :, None], (Bp, KVH, G)).reshape(Bp, NH)
            vsh = jnp.broadcast_to(
                vsh[:, :, None], (Bp, KVH, G)).reshape(Bp, NH)
        s_new = sraw_ref[0] * ksh
        m_fin = jnp.maximum(m, s_new)
        corr = jnp.exp(m - m_fin)
        e_new = jnp.exp(s_new - m_fin)
        l_fin = jnp.maximum(lden * corr + e_new, 1e-30)
        nv = (vq_ref[0].reshape(Bp, KVH, hd).astype(jnp.float32)
              * vso_ref[0][:, :, None])
        if G > 1:
            nv = jnp.broadcast_to(
                nv[:, :, None, :], (Bp, KVH, G, hd)).reshape(Bp, NH, hd)
        att = (acc_ref[0:Bp] * corr[..., None]
               + e_new[..., None] * nv) / l_fin[..., None]
        # rows [B, Bp) were never written by the cells (uninitialized VMEM,
        # possibly inf/nan) — zero them so the quant below stays finite;
        # the caller discards those rows anyway
        rows = jax.lax.broadcasted_iota(jnp.int32, (Bp, NH * hd), 0)
        att2 = jnp.where(rows < B, att.reshape(Bp, NH * hd), 0.0)
        q, s = _quant_rows(att2)
        attq_sc[:] = q
        satt_sc[:] = s

    # ---- linear phases + cells, emitted statically per half ----------------
    for h in (0, 1):
        off = h * HALF
        oo = o - off
        in_half = jnp.logical_and(o >= off, o < off + HALF)

        @pl.when(jnp.logical_and(in_half, oo < nA))
        def _phase_a(h=h, oo=oo):
            j = oo
            if h == 0:
                src = attq_ref[:]
                ssc = satt_ref[:]
            else:
                src = attq_sc[:]
                ssc = satt_sc[:]
            acc = jnp.dot(src, _i8w(woq_ref[0]),
                          preferred_element_type=jnp.int32)
            wo_out = acc.astype(jnp.float32) * ssc * wos_ref[0]
            if h == 0:
                blk = xres_ref[:] + wo_out
            else:
                blk = x2_ref[:, pl.ds(j * TOA, TOA)] + wo_out
            x2_ref[:, pl.ds(j * TOA, TOA)] = blk

        @pl.when(jnp.logical_and(in_half, oo == nA - 1))
        def _boundary_a():
            hh = _rms_rows(x2_ref[:], rmsf_ref[0])
            q, s = _quant_rows(hh)
            xq_ref[:] = q
            sx_ref[:] = s

        @pl.when(jnp.logical_and(
            in_half, jnp.logical_and(oo >= nA, oo < nA + nB)))
        def _phase_b(oo=oo):
            j = oo - nA
            g = jnp.dot(xq_ref[:], _i8w(w13g_ref[0]),
                        preferred_element_type=jnp.int32).astype(jnp.float32)
            u = jnp.dot(xq_ref[:], _i8w(w13u_ref[0]),
                        preferred_element_type=jnp.int32).astype(jnp.float32)
            g = g * sx_ref[:] * w13gs_ref[0]
            u = u * sx_ref[:] * w13us_ref[0]
            h2_ref[:, pl.ds(j * TOB, TOB)] = (
                g * (1.0 / (1.0 + jnp.exp(-g))) * u).astype(h2_ref.dtype)

        @pl.when(jnp.logical_and(in_half, oo == nA + nB - 1))
        def _boundary_b():
            q, s = _quant_rows(h2_ref[:].astype(jnp.float32))
            xq3_ref[:] = q
            sx_ref[:] = s

        @pl.when(jnp.logical_and(
            in_half, jnp.logical_and(oo >= nA + nB, oo < nA + nB + nC)))
        def _phase_c(oo=oo):
            j = oo - nA - nB
            acc = jnp.dot(xq3_ref[:], _i8w(w2q_ref[0]),
                          preferred_element_type=jnp.int32)
            blk = (x2_ref[:, pl.ds(j * TOC, TOC)]
                   + acc.astype(jnp.float32) * sx_ref[:] * w2s_ref[0])
            x2_ref[:, pl.ds(j * TOC, TOC)] = blk
            xout_ref[:] = blk

        @pl.when(jnp.logical_and(in_half, oo == nA + nB + nC - 1))
        def _boundary_c():
            hh = _rms_rows(x2_ref[:], rmsa_ref[0])
            q, s = _quant_rows(hh)
            xq_ref[:] = q
            sx_ref[:] = s

        @pl.when(jnp.logical_and(
            in_half, jnp.logical_and(oo >= nA + nB + nC, oo < B0)))
        def _phase_d(h=h, oo=oo):
            j = oo - nA - nB - nC
            acc = jnp.dot(xq_ref[:], _i8w(qkvq_ref[0]),
                          preferred_element_type=jnp.int32)
            val = acc.astype(jnp.float32) * sx_ref[:] * qkvs_ref[0]
            nh_blk = TOD // hd

            @pl.when(j < nq)
            def _q_block():
                r = _rope_block(val, cos_ref[:], sa_ref[:], sb_ref[:],
                                TOD, hd)
                q_sc[:, pl.ds(j * TOD, TOD)] = (
                    r * isqrt_hd).astype(q_sc.dtype)

            @pl.when(jnp.logical_and(j >= nq, j < nq + nkk))
            def _k_block():
                jj = j - nq
                r = _rope_block(val, cos_ref[:], sa_ref[:], sb_ref[:],
                                TOD, hd)
                qv, am = _perhead_quant(r, nh_blk, hd)
                kq_ref[h, :, pl.ds(jj * TOD, TOD)] = qv
                packed = jnp.broadcast_to(am, am.shape[:-1] + (w,))
                ksx_sc[:, pl.ds(jj * nh_blk * w, nh_blk * w)] = (
                    packed.reshape(packed.shape[0], nh_blk * w))

            @pl.when(j >= nq + nkk)
            def _v_block():
                jj = j - nq - nkk
                qv, am = _perhead_quant(val, nh_blk, hd)
                vq_ref[h, :, pl.ds(jj * TOD, TOD)] = qv
                packed = jnp.broadcast_to(am, am.shape[:-1] + (w,))
                vsx_sc[:, pl.ds(jj * nh_blk * w, nh_blk * w)] = (
                    packed.reshape(packed.shape[0], nh_blk * w))

        @pl.when(jnp.logical_and(in_half, oo == B0 - 1))
        def _boundary_d(h=h):
            Bp, D = q_sc.shape
            q3_sc[:] = q_sc[:].reshape(Bp, NH, hd).astype(jnp.bfloat16)
            ks3 = ksx_sc[:].reshape(Bp, KVH, w)
            vs3 = vsx_sc[:].reshape(Bp, KVH, w)
            kso_ref[h] = _lane0(ks3, w)
            vso_ref[h] = _lane0(vs3, w)
            kqf = kq_ref[h].reshape(Bp, KVH, hd).astype(jnp.float32)
            if G > 1:
                kqf = jnp.broadcast_to(kqf[:, :, None, :], (Bp, KVH, G, hd))
            sraw_ref[h] = jnp.sum(
                (q_sc[:].astype(jnp.float32)
                 * kqf.reshape(Bp, KVD * G)).reshape(Bp, NH, hd),
                axis=-1)

    # ---- attention cells: ONE body for both halves -------------------------
    # The per-head QK/PV dots unroll 2*KVH MXU ops per body; emitting the
    # body twice (per static half) doubled that to 128 at KVH=32 and HUNG
    # the remote Mosaic compile (the same failure class as the KVH-batched
    # dot_general, CLAUDE.md).  One body with a TRACED half index keeps the
    # op count at mega2's level; the partials land in the [2*Bp] leading
    # sections of acc/st, indexed dynamically (untiled leading dim).
    in_c0 = jnp.logical_and(o >= B0, o < HALF)
    in_c1 = o >= HALF + B0

    @pl.when(jnp.logical_or(in_c0, in_c1))
    def _cell():
        hsel = (o >= HALF).astype(jnp.int32)
        b = o - B0 - hsel * HALF
        pos = pos_ref[b]
        nb = jax.lax.div(pos + TS - 1, TS)  # strict < pos
        # skip kills only half 1's cells (last pair: layer L doesn't exist)
        nb = jnp.where(jnp.logical_and(hsel > 0, meta_ref[3] > 0), 0, nb)
        # half 0 consumes chain blocks [0, total); half 1 [total, 2*total)
        g0 = base_ref[b] + hsel * total
        qv = q3_sc[b]  # [NH, hd] bf16

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
                    qv[hh * G:(hh + 1) * G],
                    kbuf[slot, hh].astype(jnp.bfloat16),
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                for hh in range(KVH)])  # [NH, TS]
            ksr = ksbuf[slot]
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
                jnp.dot(p[hh * G:(hh + 1) * G],
                        vbuf[slot, hh].astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
                for hh in range(KVH)])  # [NH, hd]

            @pl.when(g + DEPTH < tot_eff)
            def _():
                start(g + DEPTH, slot)

            return m_new, l, acc * corr + pv

        m, l, acc = jax.lax.fori_loop(0, nb, body, init)
        row = hsel * attq_sc.shape[0] + b
        acc_ref[pl.ds(row, 1)] = acc[None]
        st_ref[pl.ds(row, 1)] = jnp.concatenate([m, l], axis=1)[None]


@functools.lru_cache(maxsize=64)
def _pick_step3_blocks(Bp: int, D: int, H: int, QO: int, KVH: int, G: int,
                       hd: int, TS: int, budget: int = int(15.2 * (1 << 20))):
    """(TOA, TOB, TOC, TOD, DEPTH) for the pair kernel, or None.

    Same greedy as _pick_step2_blocks with the pair's extra fixed VMEM:
    macc/mst cross-half scratches, the seam's attq/satt scratches, and the
    doubled fresh-row/scale/sraw outputs.  At the 7B shape that ~0.9 MB is
    expected to evict TOA 256 -> 128 (variant M measured that costs ~1%;
    the halved launch count is worth ~10%)."""
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
                + Bp * D + Bp * 4  # attq_sc + satt_sc (seam)
                + depth * 2 * KVH * TS * hd  # K/V rings (int8)
                + depth * 2 * KVH * TS * 4  # scale rings
                + 2 * Bp * D  # attq input (double-buffered)
                + 6 * Bp * hd * 4  # rope tables (x2 buffering)
                + 2 * 2 * Bp * KVD  # kq/vq outputs (both halves)
                + 2 * Bp * NH * hd * 4  # acc output (both halves)
                + 2 * Bp * NH * 2 * 4  # st output
                + 2 * Bp * NH * 4  # sraw (both halves)
                + 2 * 2 * Bp * KVH * 4)  # kso/vso (both halves)

    def operand_bytes(c):
        return 2 * (D * c["A"] + Bp * c["A"] * 4  # wo + xres
                    + 2 * D * c["B"]  # gate + up
                    + H * c["C"] + Bp * c["C"] * 4  # w2 + xout
                    + D * c["D"])  # qkv

    d_cands = [c for c in _block_candidates(QO)
               if c % hd == 0 and D % c == 0 and KVD % c == 0]
    if not d_cands:
        return None
    choices = {"A": _block_candidates(D)[-1], "B": _block_candidates(H)[-1],
               "C": _block_candidates(D)[-1], "D": d_cands[-1]}
    depth = 2

    def total(c, dep):
        return fixed(c["D"], dep) + operand_bytes(c)

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


def step3_plan(Bp: int, D: int, H: int, QO: int, KVH: int, G: int, hd: int,
               S: int, budget: int | None = None,
               block_s: int | None = None):
    """Resolve ``(TS, (TOA, TOB, TOC, TOD, DEPTH))`` for the pair kernel, or
    None.  Same TS legality rules as step2_plan (128-multiples or full S)."""
    kw = {} if budget is None else {"budget": budget}
    candidates = []
    ts = step2_block_s(S, block_s)
    while ts >= 8:
        if ts % 128 == 0 or ts == S:
            candidates.append(ts)
        ts //= 2
    if S % 128 != 0 and S not in candidates:
        candidates.insert(0, S)
    for ts in candidates:
        blocks = _pick_step3_blocks(Bp, D, H, QO, KVH, G, hd, ts, **kw)
        if blocks is not None:
            return ts, blocks
    return None


def fused_step3_pair(
    x: jax.Array,  # [Bp, D] f32 — residual entering layer l0
    attq: jax.Array,  # [Bp, D] int8 — layer l0's quantized attention output
    satt: jax.Array,  # [Bp] f32
    k_cache, v_cache,  # [L, B, KVH, S, hd] int8
    k_scale, v_scale,  # [L, B, KVH, S] f32
    pos: jax.Array,  # [B] int32
    rope_c, rope_sa, rope_sb,  # [Bp, hd] f32
    base, dcell, doff, total,  # decode_dma_descs output
    wo_q, wo_s, w13_q, w13_s, w2_q, w2_s, qkv_q, qkv_s,
    rms_ffn, rms_att,
    layer: jax.Array,  # l0 — must be EVEN (the caller scans 0, 2, 4, ...)
    n_layers: int,
    n_heads: int,
    block_s: int | None = None,
    budget: int | None = None,
):
    """One launch = layers ``l0`` and ``l0+1``'s linear phases + the
    attentions of layers ``l0+1`` (seam-merged in-kernel) and ``l0+2``.

    Returns ``(x_next [Bp, D], attq_next [Bp, D] int8, satt_next [Bp],
    rows)`` where ``rows = (kq [2, B, KVH, hd] int8, ks [2, B, KVH], vq,
    vs)`` are the fresh cache rows of layers l0+1 and l0+2 (the second set
    is garbage on the last pair — the caller discards it).  attq_next is
    layer l0+2's merged attention output (garbage on the last pair)."""
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
    assert k_cache.dtype == jnp.int8, "mega3 is INT8-KV only"
    assert n_layers % 2 == 0, "mega3 pairs layers; odd L takes mega2"

    plan = step3_plan(Bp, D, H, QO, KVH, G, hd, S, budget=budget,
                      block_s=block_s)
    if plan is None:
        raise ValueError(f"no VMEM-feasible mega3 tiling for Bp={Bp}")
    TS, (TOA, TOB, TOC, TOD, DEPTH) = plan
    nA, nB, nC, nD = D // TOA, H // TOB, D // TOC, QO // TOD
    nq, nkk = D // TOD, KVD // TOD
    B0 = nA + nB + nC + nD
    HALF = B0 + B
    grid = (2 * HALF,)
    w = _scale_pack_width(TOD, hd)

    l0 = jnp.asarray(layer, jnp.int32)
    l1 = l0 + 1
    l2 = jnp.minimum(l0 + 2, n_layers - 1)
    skip = (l0 + 2 >= n_layers).astype(jnp.int32)
    meta = jnp.stack([l0, l1, l2, skip, jnp.asarray(total, jnp.int32)])

    k4 = k_cache.reshape(L * B, KVH, S, hd)
    v4 = v_cache.reshape(L * B, KVH, S, hd)
    ks3 = k_scale.reshape(L * B, KVH, S)
    vs3 = v_scale.reshape(L * B, KVH, S)

    def oo(o):
        return o - jnp.where(o >= HALF, HALF, 0)

    def a_ix(o, *s):
        return jnp.clip(oo(o), 0, nA - 1)

    def b_ix(o, *s):
        return jnp.clip(oo(o) - nA, 0, nB - 1)

    def c_ix(o, *s):
        return jnp.clip(oo(o) - nA - nB, 0, nC - 1)

    def d_ix(o, m, *s):
        blk = jnp.clip(oo(o) - nA - nB - nC, 0, nD - 1)
        # skip pins HALF 1's phase-D weight stream to block 0 (clipped l2)
        return jnp.where(jnp.logical_and(m[3] > 0, o >= HALF), 0, blk)

    def l01(o, m, *s):  # linear-phase layer: l0 in half 0, l1 in half 1
        return jnp.where(o < HALF, m[0], m[1])

    def l12(o, m, *s):  # qkv/rms_att layer: l1 in half 0, l2 in half 1
        return jnp.where(o < HALF, m[1], m[2])

    V = pltpu.VMEM
    A = pl.ANY
    const = pl.BlockSpec(memory_space=V)
    in_specs = [
        pl.BlockSpec((Bp, TOA), lambda o, m, *s: (0, a_ix(o)),
                     memory_space=V),
        const,  # attq
        const,  # satt
        const, const, const,  # rope tables
        pl.BlockSpec((1, 1, D), lambda o, m, *s: (l01(o, m), 0, 0),
                     memory_space=V),
        pl.BlockSpec((1, 1, D), lambda o, m, *s: (l12(o, m), 0, 0),
                     memory_space=V),
        pl.BlockSpec((1, D, TOA), lambda o, m, *s: (l01(o, m), 0, a_ix(o)),
                     memory_space=V),
        pl.BlockSpec((1, 1, TOA), lambda o, m, *s: (l01(o, m), 0, a_ix(o)),
                     memory_space=V),
        pl.BlockSpec((1, D, TOB), lambda o, m, *s: (l01(o, m), 0, b_ix(o)),
                     memory_space=V),
        pl.BlockSpec((1, 1, TOB), lambda o, m, *s: (l01(o, m), 0, b_ix(o)),
                     memory_space=V),
        pl.BlockSpec((1, D, TOB), lambda o, m, *s: (l01(o, m), 0,
                                                    nB + b_ix(o)),
                     memory_space=V),
        pl.BlockSpec((1, 1, TOB), lambda o, m, *s: (l01(o, m), 0,
                                                    nB + b_ix(o)),
                     memory_space=V),
        pl.BlockSpec((1, H, TOC), lambda o, m, *s: (l01(o, m), 0, c_ix(o)),
                     memory_space=V),
        pl.BlockSpec((1, 1, TOC), lambda o, m, *s: (l01(o, m), 0, c_ix(o)),
                     memory_space=V),
        pl.BlockSpec((1, D, TOD), lambda o, m, *s: (l12(o, m), 0,
                                                    d_ix(o, m)),
                     memory_space=V),
        pl.BlockSpec((1, 1, TOD), lambda o, m, *s: (l12(o, m), 0,
                                                    d_ix(o, m)),
                     memory_space=V),
        pl.BlockSpec(memory_space=A),  # k_hbm
        pl.BlockSpec(memory_space=A),  # v_hbm
        pl.BlockSpec(memory_space=A),  # ks_hbm
        pl.BlockSpec(memory_space=A),  # vs_hbm
    ]
    # xout is [Bp, 2*D]: half h's phase C writes blocks [h*nC, (h+1)*nC) so
    # the output block index is MONOTONE over the grid — revisiting an
    # output block after moving away is undefined in the Pallas TPU
    # pipeline (and crashed the remote Mosaic compile when tried); the
    # caller reads the second half.
    out_specs = (
        pl.BlockSpec(
            (Bp, TOC),
            lambda o, m, *s: (0, jnp.where(o < HALF, 0, nC) + c_ix(o)),
            memory_space=V),
        const,  # kq [2, Bp, KVD]
        const,  # vq
        const,  # kso
        const,  # vso
        const,  # sraw
        const,  # acc
        const,  # st
    )
    out_shape = (
        jax.ShapeDtypeStruct((Bp, 2 * D), jnp.float32),
        jax.ShapeDtypeStruct((2, Bp, KVD), jnp.int8),
        jax.ShapeDtypeStruct((2, Bp, KVD), jnp.int8),
        jax.ShapeDtypeStruct((2, Bp, KVH), jnp.float32),
        jax.ShapeDtypeStruct((2, Bp, KVH), jnp.float32),
        jax.ShapeDtypeStruct((2, Bp, NH), jnp.float32),
        jax.ShapeDtypeStruct((2 * Bp, NH, hd), jnp.float32),
        jax.ShapeDtypeStruct((2 * Bp, NH, 2), jnp.float32),
    )
    scratch = [
        pltpu.VMEM((Bp, D), jnp.float32),  # x2
        pltpu.VMEM((Bp, H), jnp.bfloat16),  # h2
        pltpu.VMEM((Bp, D), jnp.int8),  # xq
        pltpu.VMEM((Bp, H), jnp.int8),  # xq3
        pltpu.VMEM((Bp, 1), jnp.float32),  # sx
        pltpu.VMEM((Bp, D), jnp.bfloat16),  # q_sc
        pltpu.VMEM((Bp, NH, hd), jnp.bfloat16),  # q3
        pltpu.VMEM((Bp, KVH * w), jnp.float32),  # ksx
        pltpu.VMEM((Bp, KVH * w), jnp.float32),  # vsx
        pltpu.VMEM((Bp, D), jnp.int8),  # attq_sc (seam)
        pltpu.VMEM((Bp, 1), jnp.float32),  # satt_sc
        pltpu.VMEM((DEPTH, KVH, TS, hd), jnp.int8),  # K ring
        pltpu.VMEM((DEPTH, KVH, TS, hd), jnp.int8),  # V ring
        pltpu.VMEM((DEPTH, KVH, TS), jnp.float32),
        pltpu.VMEM((DEPTH, KVH, TS), jnp.float32),
        pltpu.SemaphoreType.DMA((DEPTH, 4)),
    ]

    kernel = functools.partial(
        _fused_step3_kernel, B=B, G=G, TS=TS, KVH=KVH, hd=hd, w=w,
        nA=nA, nB=nB, nC=nC, nD=nD, nq=nq, nkk=nkk,
        TOA=TOA, TOB=TOB, TOC=TOC, TOD=TOD, DEPTH=DEPTH)

    (xout2, kq, vq, kso, vso, sraw, acc, st) = pl.pallas_call(
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

    x_next = xout2[:, D:]  # half 1's phase C blocks (layer l0+1's residual)

    # ---- XLA epilogue: layer l0+2's fresh-row merge (between launches) -----
    # identical math to fused_step2_layer's epilogue, on the h=1 sections
    accB = acc[Bp:Bp + B].reshape(B, KVH, G, hd)
    stB = st[Bp:Bp + B].reshape(B, KVH, G, 2)
    m = stB[..., 0:1]
    lden = stB[..., 1:2]
    ks = kso[1, :B]
    vs = vso[1, :B]
    s_new = (sraw[1, :B].reshape(B, KVH, G) * ks[:, :, None])[..., None]
    m_fin = jnp.maximum(m, s_new)
    corr = jnp.exp(m - m_fin)
    e_new = jnp.exp(s_new - m_fin)
    l_fin = lden * corr + e_new
    vqr2 = vq[1, :B].reshape(B, KVH, hd)
    nv = vqr2.astype(jnp.float32) * vs[..., None]
    att = (accB * corr + e_new * nv[:, :, None, :]) / jnp.maximum(
        l_fin, 1e-30)
    att2 = att.reshape(B, D)
    if Bp != B:
        att2 = jnp.pad(att2, ((0, Bp - B), (0, 0)))
    attq_next, satt_next = quantize_activations(att2)
    rows = (kq[:, :B].reshape(2, B, KVH, hd),
            kso[:, :B],
            vq[:, :B].reshape(2, B, KVH, hd),
            vso[:, :B])
    return x_next, attq_next, satt_next, rows
