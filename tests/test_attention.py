"""Flash decode-attention kernel tests vs a numpy oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from tpu_llama.ops.attention import flash_decode_attention, quantize_kv


def ref_attention(q, k, v, pos):
    """Straightforward fp64 GQA decode attention. q:[B,KVH,G,hd], k/v:[B,KVH,S,hd]."""
    B, KVH, G, hd = q.shape
    S = k.shape[2]
    out = np.zeros_like(q, dtype=np.float64)
    for b in range(B):
        for h in range(KVH):
            keys = k[b, h, : pos[b] + 1].astype(np.float64)
            vals = v[b, h, : pos[b] + 1].astype(np.float64)
            for g in range(G):
                s = keys @ q[b, h, g].astype(np.float64) / np.sqrt(hd)
                e = np.exp(s - s.max())
                out[b, h, g] = (e / e.sum()) @ vals
    return out


@pytest.mark.parametrize("B,KVH,G,S,hd", [
    (1, 4, 1, 64, 48),     # MHA tiny, odd hd
    (2, 2, 2, 64, 64),     # GQA
    (3, 1, 8, 128, 128),   # heavy GQA
])
def test_flash_matches_reference_fp32(rng_np, B, KVH, G, S, hd):
    q = rng_np.standard_normal((B, KVH, G, hd)).astype(np.float32)
    k = rng_np.standard_normal((B, KVH, S, hd)).astype(np.float32)
    v = rng_np.standard_normal((B, KVH, S, hd)).astype(np.float32)
    pos = rng_np.integers(0, S, size=B).astype(np.int32)

    got = np.asarray(flash_decode_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(pos)))
    want = ref_attention(q, k, v, pos)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_flash_ignores_garbage_beyond_pos(rng_np):
    B, KVH, G, S, hd = 2, 2, 1, 64, 64
    q = rng_np.standard_normal((B, KVH, G, hd)).astype(np.float32)
    k = rng_np.standard_normal((B, KVH, S, hd)).astype(np.float32)
    v = rng_np.standard_normal((B, KVH, S, hd)).astype(np.float32)
    pos = np.array([5, 20], np.int32)

    base = np.asarray(flash_decode_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(pos)))
    # poison everything beyond pos
    k2, v2 = k.copy(), v.copy()
    for b in range(B):
        k2[b, :, pos[b] + 1:] = 1e9
        v2[b, :, pos[b] + 1:] = -1e9
    poisoned = np.asarray(flash_decode_attention(
        jnp.asarray(q), jnp.asarray(k2), jnp.asarray(v2), jnp.asarray(pos)))
    np.testing.assert_array_equal(base, poisoned)


def test_flash_int8_close_to_fp(rng_np):
    B, KVH, G, S, hd = 2, 3, 2, 128, 64
    q = rng_np.standard_normal((B, KVH, G, hd)).astype(np.float32)
    k = rng_np.standard_normal((B, KVH, S, hd)).astype(np.float32)
    v = rng_np.standard_normal((B, KVH, S, hd)).astype(np.float32)
    pos = np.full(B, S - 1, np.int32)

    kq, ks = quantize_kv(jnp.asarray(k))
    vq, vs = quantize_kv(jnp.asarray(v))

    got = np.asarray(flash_decode_attention(
        jnp.asarray(q), kq, vq, jnp.asarray(pos), k_scale=ks, v_scale=vs))
    want = ref_attention(k=np.asarray(kq).astype(np.float32) * np.asarray(ks)[..., None],
                         v=np.asarray(vq).astype(np.float32) * np.asarray(vs)[..., None],
                         q=q, pos=pos)
    # int8 path computes in bf16 — tolerance covers bf16 rounding
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("int8", [False, True])
@pytest.mark.parametrize("KHb", [2, 4])
def test_fresh_head_fold_parity(rng_np, int8, KHb):
    """Folding KV heads into one grid cell (head_block > 1) is bit-identical
    to the per-head grid — the per-head math is unchanged."""
    from tpu_llama.ops.attention import flash_decode_attention_fresh

    B, KVH, G, S, hd = 2, 4, 2, 64, 64
    L = 3
    q = jnp.asarray(rng_np.standard_normal((B, KVH, G, hd)), jnp.float32)
    k = jnp.asarray(rng_np.standard_normal((L, B, KVH, S, hd)), jnp.float32)
    v = jnp.asarray(rng_np.standard_normal((L, B, KVH, S, hd)), jnp.float32)
    nk = jnp.asarray(rng_np.standard_normal((B, KVH, hd)), jnp.float32)
    nv = jnp.asarray(rng_np.standard_normal((B, KVH, hd)), jnp.float32)
    pos = jnp.asarray(rng_np.integers(0, S, size=B), jnp.int32)

    kw = dict(layer=1)
    if int8:
        kq, ks = quantize_kv(k)
        vq, vs = quantize_kv(v)
        nkq, nks = quantize_kv(nk)
        nvq, nvs = quantize_kv(nv)
        kw.update(k_scale=ks, v_scale=vs, new_ks=nks, new_vs=nvs)
        k, v, nk, nv = kq, vq, nkq, nvq
    base = flash_decode_attention_fresh(q, k, v, pos, nk, nv,
                                        head_block=1, **kw)
    fold = flash_decode_attention_fresh(q, k, v, pos, nk, nv,
                                        head_block=KHb, **kw)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(fold))


def test_quantize_kv_roundtrip(rng_np):
    x = rng_np.standard_normal((4, 2, 16, 64)).astype(np.float32)
    q, s = quantize_kv(jnp.asarray(x))
    back = np.asarray(q).astype(np.float32) * np.asarray(s)[..., None]
    assert np.abs(back - x).max() <= np.abs(x).max() / 127 * 0.51 + 1e-6
    # zero rows stay zero with zero scale
    x0 = np.zeros((1, 1, 2, 8), np.float32)
    q0, s0 = quantize_kv(jnp.asarray(x0))
    assert np.all(np.asarray(q0) == 0) and np.all(np.asarray(s0) == 0)


# ---- flash prefill kernel ----

def ref_prefill_attention(q, k, v, start):
    """fp64 causal prefill over the cache: key s iff s <= start[b]+t."""
    B, T, NH, hd = q.shape
    KVH, S = k.shape[1], k.shape[2]
    G = NH // KVH
    out = np.zeros((B, T, NH, hd))
    for b in range(B):
        for t in range(T):
            for h in range(NH):
                kv = h // G
                lim = start[b] + t + 1
                keys = k[b, kv, :lim].astype(np.float64)
                vals = v[b, kv, :lim].astype(np.float64)
                s = keys @ q[b, t, h].astype(np.float64) / np.sqrt(hd)
                e = np.exp(s - s.max())
                out[b, t, h] = (e / e.sum()) @ vals
    return out.reshape(B, T, NH * hd)


@pytest.mark.parametrize("B,T,NH,KVH,S,hd,start", [
    (1, 8, 4, 4, 32, 48, [0]),          # MHA from pos 0
    (2, 16, 4, 2, 64, 64, [0, 13]),     # GQA with per-row offsets
    (1, 5, 2, 2, 16, 32, [7]),          # odd T (row padding)
])
def test_flash_prefill_matches_reference(rng_np, B, T, NH, KVH, S, hd, start):
    from tpu_llama.ops.attention import flash_prefill_attention

    q = rng_np.standard_normal((B, T, NH, hd)).astype(np.float32)
    k = rng_np.standard_normal((B, KVH, S, hd)).astype(np.float32)
    v = rng_np.standard_normal((B, KVH, S, hd)).astype(np.float32)
    start = np.asarray(start, np.int32)

    got = np.asarray(flash_prefill_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(start),
        block_q=8, block_s=16))
    want = ref_prefill_attention(q, k, v, start)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_flash_prefill_int8_kv_matches_dequant():
    """INT8-KV flash prefill (scales folded in-kernel) vs explicit dequant +
    reference attention (VERDICT r1 weak #6)."""
    from tpu_llama.ops.attention import flash_prefill_attention, quantize_kv

    rng = np.random.default_rng(7)
    B, T, NH, KVH, S, hd = 2, 16, 4, 2, 32, 16
    q = rng.standard_normal((B, T, NH, hd)).astype(np.float32)
    k = rng.standard_normal((B, KVH, S, hd)).astype(np.float32)
    v = rng.standard_normal((B, KVH, S, hd)).astype(np.float32)
    start = np.array([0, 5], np.int32)

    kq, ks = quantize_kv(jnp.asarray(k))
    vq, vs = quantize_kv(jnp.asarray(v))
    got = np.asarray(flash_prefill_attention(
        jnp.asarray(q), kq, vq, jnp.asarray(start), ks, vs,
        block_q=8, block_s=16))

    kf = np.asarray(kq, np.float32) * np.asarray(ks)[..., None]
    vf = np.asarray(vq, np.float32) * np.asarray(vs)[..., None]
    want = ref_prefill_attention(q, kf, vf, start)
    # int8 path scores ride bf16 on the MXU: ~3 decimal digits
    np.testing.assert_allclose(got, want, rtol=5e-2, atol=5e-3)


@pytest.mark.parametrize("int8", [False, True])
@pytest.mark.parametrize("block_s", [16, 64])
def test_dma_decode_matches_fresh(rng_np, int8, block_s):
    """Manual-DMA pos-proportional decode attention equals the fresh kernel
    (fp exactly; int8 to bf16 accumulation-order tolerance — the DMA kernel
    normalizes after online accumulation, the fresh kernel before)."""
    from tpu_llama.ops.attention import (
        flash_decode_attention_dma,
        flash_decode_attention_fresh,
    )

    B, KVH, G, S, hd = 3, 4, 2, 64, 64
    L = 2
    q = jnp.asarray(rng_np.standard_normal((B, KVH, G, hd)), jnp.float32)
    k = jnp.asarray(rng_np.standard_normal((L, B, KVH, S, hd)), jnp.float32)
    v = jnp.asarray(rng_np.standard_normal((L, B, KVH, S, hd)), jnp.float32)
    nk = jnp.asarray(rng_np.standard_normal((B, KVH, hd)), jnp.float32)
    nv = jnp.asarray(rng_np.standard_normal((B, KVH, hd)), jnp.float32)
    pos = jnp.asarray([0, 17, S - 1], jnp.int32)  # empty, partial, full

    kw = dict()
    if int8:
        kq, ks = quantize_kv(k)
        vq, vs = quantize_kv(v)
        nkq, nks = quantize_kv(nk)
        nvq, nvs = quantize_kv(nv)
        kw.update(k_scale=ks, v_scale=vs, new_ks=nks, new_vs=nvs)
        k, v, nk, nv = kq, vq, nkq, nvq
    for layer in range(L):
        base = flash_decode_attention_fresh(q, k, v, pos, nk, nv,
                                            layer=layer, **kw)
        dma = flash_decode_attention_dma(q, k, v, pos, nk, nv,
                                         layer=jnp.int32(layer),
                                         block_s=block_s, **kw)
        if int8:
            np.testing.assert_allclose(np.asarray(base), np.asarray(dma),
                                       rtol=2e-2, atol=2e-2)
        else:
            np.testing.assert_allclose(np.asarray(base), np.asarray(dma),
                                       rtol=1e-5, atol=1e-5)


def test_dma_decode_ignores_rows_at_and_beyond_pos(rng_np):
    """Strict < pos masking: rows at/past pos can hold garbage."""
    from tpu_llama.ops.attention import flash_decode_attention_dma

    B, KVH, G, S, hd = 2, 2, 1, 64, 64
    q = jnp.asarray(rng_np.standard_normal((B, KVH, G, hd)), jnp.float32)
    k = rng_np.standard_normal((1, B, KVH, S, hd)).astype(np.float32)
    v = rng_np.standard_normal((1, B, KVH, S, hd)).astype(np.float32)
    nk = jnp.asarray(rng_np.standard_normal((B, KVH, hd)), jnp.float32)
    nv = jnp.asarray(rng_np.standard_normal((B, KVH, hd)), jnp.float32)
    pos = np.array([5, 33], np.int32)

    base = np.asarray(flash_decode_attention_dma(
        q, jnp.asarray(k), jnp.asarray(v), jnp.asarray(pos), nk, nv,
        layer=jnp.int32(0), block_s=16))
    k2, v2 = k.copy(), v.copy()
    for b in range(B):
        k2[0, b, :, pos[b]:] = 1e9
        v2[0, b, :, pos[b]:] = -1e9
    poisoned = np.asarray(flash_decode_attention_dma(
        q, jnp.asarray(k2), jnp.asarray(v2), jnp.asarray(pos), nk, nv,
        layer=jnp.int32(0), block_s=16))
    np.testing.assert_array_equal(base, poisoned)


def test_paged_dma_matches_paged_fresh(rng_np):
    """Paged manual-DMA kernel matches the index-map-clamped paged fresh
    kernel (same online block structure; the DMA kernel's fresh-column merge
    runs in an XLA epilogue, so reductions may associate differently)."""
    from tpu_llama.ops.attention import (
        paged_flash_decode_attention_dma,
        paged_flash_decode_attention_fresh,
    )

    L, B, KVH, G, hd = 2, 3, 4, 2, 128
    P, ps, MP = 8, 16, 4
    kf = jnp.asarray(rng_np.standard_normal((L, P, KVH, ps, hd)), jnp.float32)
    vf = jnp.asarray(rng_np.standard_normal((L, P, KVH, ps, hd)), jnp.float32)
    kq, ks = quantize_kv(kf)
    vq, vs = quantize_kv(vf)
    q = jnp.asarray(rng_np.standard_normal((B, KVH, G, hd)), jnp.float32)
    nk = jnp.asarray(rng_np.standard_normal((B, KVH, hd)), jnp.float32)
    nv = jnp.asarray(rng_np.standard_normal((B, KVH, hd)), jnp.float32)
    nkq, nks = quantize_kv(nk)
    nvq, nvs = quantize_kv(nv)
    pt = jnp.asarray([[0, 3, 5, 7], [1, 2, 4, 6], [7, 0, 1, 2]], jnp.int32)
    pos = jnp.asarray([0, 19, P * ps // 2 - 1][:B], jnp.int32)
    pos = jnp.minimum(pos, MP * ps - 1)

    for layer in range(L):
        a = paged_flash_decode_attention_fresh(
            q, kq, vq, ks, vs, pt, pos, nkq, nvq, nks, nvs,
            layer=jnp.int32(layer))
        b = paged_flash_decode_attention_dma(
            q, kq, vq, ks, vs, pt, pos, nkq, nvq, nks, nvs,
            layer=jnp.int32(layer))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)
