"""INT8 quantization + fused dequant-matmul kernel tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_llama.ops import QuantTensor, dequantize, pick_group_size, q8_matmul, quantize_q8


def test_pick_group_size():
    assert pick_group_size(4096) == 64   # 8g=512 divides -> no padding
    assert pick_group_size(11008) == 32  # 256 | 11008 -> no padding
    assert pick_group_size(768) == 32    # 256 | 768
    assert pick_group_size(288) == 16    # min-padding fallback (288 -> 384)
    assert pick_group_size(48) == 16     # 48 -> 128


def test_quantize_pads_unaligned_dims():
    w = np.ones((288, 8), np.float32)
    t = quantize_q8(w)  # g=16, align=128 -> in 384; out -> 128
    assert t.q.shape == (384, 128)
    assert (t.logical_in, t.logical_out) == (288, 8)
    assert t.shape == (288, 8)
    # padding groups carry zero scale
    assert np.all(np.asarray(t.s)[288 // 16:] == 0)
    assert np.all(np.asarray(t.s)[:, 8:] == 0)
    np.testing.assert_allclose(np.asarray(dequantize(t)), w, atol=0.01)


def test_quantize_roundtrip_accuracy(rng_np):
    w = rng_np.standard_normal((256, 128)).astype(np.float32) * 0.1
    t = quantize_q8(w, 32)  # align 256 -> no padding
    assert t.q.dtype == jnp.int8
    assert t.s.shape == (8, 128)
    back = np.asarray(dequantize(t))
    # symmetric int8 groupwise: worst-case rel error ~ 1/127 per group absmax
    rel = np.abs(back - w) / (np.abs(w).max() + 1e-9)
    assert rel.max() < 0.01
    # theoretical floor for gaussian weights, g=64: absmax≈2.5σ, step/√12 ≈ 0.006σ
    rms = np.sqrt(np.mean((back - w) ** 2)) / np.sqrt(np.mean(w**2))
    assert rms < 0.008


def test_quantize_exact_values():
    # Integer weights in groups whose absmax is exactly 127 quantize exactly
    pattern = np.concatenate([np.arange(-7, 8), [127]])  # 16 values incl. ±127-max
    w = np.tile(pattern, 8)[:, None].astype(np.float32)  # (128, 1)
    t = quantize_q8(w, 16)  # align 128 -> no padding
    back = np.asarray(dequantize(t))
    np.testing.assert_array_equal(back, w)


def test_zero_group_handled():
    w = np.zeros((64, 8), np.float32)
    t = quantize_q8(w, 32)
    assert np.all(np.asarray(t.q) == 0)
    assert np.all(np.asarray(t.s) == 0)
    np.testing.assert_array_equal(np.asarray(dequantize(t)), w)


def test_stacked_layers_quantize(rng_np):
    w = rng_np.standard_normal((3, 256, 128)).astype(np.float32)
    t = quantize_q8(w, 32)  # align 256, out 128 -> no padding
    assert t.q.shape == (3, 256, 128)
    assert t.s.shape == (3, 8, 128)
    back = np.asarray(dequantize(t))
    assert np.sqrt(np.mean((back - w) ** 2)) < 0.02


@pytest.mark.parametrize("B,IN,OUT,g", [
    (1, 256, 128, 64),
    (8, 512, 256, 64),
    (3, 288, 320, 32),     # stories15M-ish non-aligned dims
    (16, 128, 512, 32),
    (2, 48, 128, 16),      # tiny config dims
])
def test_q8_matmul_matches_dequant_reference(rng_np, B, IN, OUT, g):
    x = rng_np.standard_normal((B, IN)).astype(np.float32)
    w = rng_np.standard_normal((IN, OUT)).astype(np.float32) * 0.05
    t = quantize_q8(w, g)
    want = x @ np.asarray(dequantize(t))  # f32 reference on dequantized weights
    got = np.asarray(q8_matmul(jnp.asarray(x), t))
    # kernel computes in bf16*bf16->f32; tolerance accounts for bf16 mantissa
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2 * np.abs(want).max())


def test_q8_matmul_batched_lead_dims(rng_np):
    x = rng_np.standard_normal((2, 4, 128)).astype(np.float32)
    w = rng_np.standard_normal((128, 64)).astype(np.float32)
    t = quantize_q8(w, 32)
    got = np.asarray(q8_matmul(jnp.asarray(x), t))
    want = x.reshape(-1, 128) @ np.asarray(dequantize(t))
    np.testing.assert_allclose(got.reshape(-1, 64), want, rtol=2e-2,
                               atol=2e-2 * np.abs(want).max())
    assert got.shape == (2, 4, 64)


# ---- W8A8 per-channel path ----

def test_quantize_channel_roundtrip(rng_np):
    from tpu_llama.ops import dequantize_channel, quantize_channel

    w = rng_np.standard_normal((256, 128)).astype(np.float32) * 0.1
    t = quantize_channel(w)
    assert t.q.dtype == jnp.int8
    assert t.s.shape == (128,)
    back = np.asarray(dequantize_channel(t))
    rms = np.sqrt(np.mean((back - w) ** 2)) / np.sqrt(np.mean(w**2))
    assert rms < 0.01


def test_quantize_activations(rng_np):
    from tpu_llama.ops import quantize_activations

    x = rng_np.standard_normal((4, 64)).astype(np.float32)
    q, s = quantize_activations(jnp.asarray(x))
    back = np.asarray(q).astype(np.float32) * np.asarray(s)[:, None]
    assert np.abs(back - x).max() < np.abs(x).max() / 100


@pytest.mark.parametrize("B,IN,OUT", [
    (1, 256, 128), (8, 512, 256), (3, 288, 320), (33, 128, 512),
])
def test_w8a8_matmul_matches_reference(rng_np, B, IN, OUT):
    from tpu_llama.ops import dequantize_channel, quantize_channel, w8a8_matmul
    from tpu_llama.ops.quant import quantize_activations

    x = rng_np.standard_normal((B, IN)).astype(np.float32)
    w = rng_np.standard_normal((IN, OUT)).astype(np.float32) * 0.05
    t = quantize_channel(w)
    # reference: quantized activations times dequantized weights
    xq, sx = quantize_activations(jnp.asarray(np.pad(x, ((0,0),(0,t.q.shape[0]-IN)))))
    want = (np.asarray(xq).astype(np.float32) * np.asarray(sx)[:, None]) @ \
           (np.asarray(t.q).astype(np.float32) * np.asarray(t.s)[None, :])
    got = np.asarray(w8a8_matmul(jnp.asarray(x), t))
    np.testing.assert_allclose(got, want[:, :OUT], rtol=1e-5,
                               atol=1e-5 * np.abs(want).max() + 1e-6)


def test_w8a8_model_decode_close(tiny_weights):
    from tpu_llama.models import forward_decode, make_kv_cache, params_from_raw
    from tpu_llama.models.llama import quantize_params

    c = tiny_weights.config
    params = params_from_raw(tiny_weights)
    qparams = quantize_params(params, mode="w8a8")
    tokens = [1, 5, 17, 300]
    cf, cq = make_kv_cache(c, 1), make_kv_cache(c, 1)
    agree = 0
    for p, t in enumerate(tokens):
        tt, pp = jnp.array([t], jnp.int32), jnp.array([p], jnp.int32)
        lf, cf = forward_decode(params, cf, tt, pp, c)
        lq, cq = forward_decode(qparams, cq, tt, pp, c)
        lf, lq = np.asarray(lf[0]), np.asarray(lq[0])
        assert np.abs(lq - lf).max() / (np.abs(lf).max() + 1e-9) < 0.15, p
        agree += int(np.argmax(lq) == np.argmax(lf))
    assert agree >= len(tokens) - 1


def test_w8a8_xla_matches_kernel(rng_np):
    from tpu_llama.ops import quantize_channel, w8a8_matmul, w8a8_matmul_xla

    x = rng_np.standard_normal((8, 256)).astype(np.float32)
    w = rng_np.standard_normal((256, 128)).astype(np.float32) * 0.05
    t = quantize_channel(w)
    a = np.asarray(w8a8_matmul(jnp.asarray(x), t))
    b = np.asarray(w8a8_matmul_xla(jnp.asarray(x), t))
    np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-5)


def test_quantize_activations_pallas_matches():
    """The one-pass Pallas row quant == the XLA formula exactly."""
    import jax

    from tpu_llama.ops.quant import (
        quantize_activations,
        quantize_activations_pallas,
    )

    x = jax.random.normal(jax.random.PRNGKey(5), (512, 256), jnp.float32) * 3
    q_ref, s_ref = quantize_activations(x)
    q_got, s_got = quantize_activations_pallas(x)
    np.testing.assert_array_equal(np.asarray(q_got), np.asarray(q_ref))
    np.testing.assert_allclose(np.asarray(s_got), np.asarray(s_ref),
                               rtol=1e-6)  # absmax/127 division rounds
    # once per pass; interpret-vs-XLA differ in the last ulp
    # zero rows quantize to zeros with zero scale (the where-guard)
    x0 = x.at[3].set(0.0)
    q0, s0 = quantize_activations_pallas(x0)
    assert np.all(np.asarray(q0)[3] == 0) and float(np.asarray(s0)[3]) == 0.0


def test_w8a8_matmul_prefill_rows_use_pallas_quant():
    """Bp > 256 routes activation quant through the one-pass Pallas kernel
    (prefill hot path); result must match the XLA-chain reference path."""
    import numpy as np

    from tpu_llama.ops import quantize_channel
    from tpu_llama.ops.matmul import w8a8_matmul, w8a8_matmul_xla

    rng = np.random.default_rng(7)
    w = quantize_channel(rng.normal(size=(512, 256)).astype(np.float32) * 0.05)
    x = jnp.asarray(rng.normal(size=(512, 512)).astype(np.float32))
    got = w8a8_matmul(x, w, out_dtype=jnp.float32)
    ref = w8a8_matmul_xla(x, w, out_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_rmsnorm_quantize_pallas_matches_chain():
    """Fused rmsnorm+quant == models.llama.rmsnorm -> quantize_activations
    (same formula, same cast points) — the prefill fast path must not drift
    from the unfused chain."""
    import jax

    from tpu_llama.models.llama import rmsnorm
    from tpu_llama.ops.quant import (
        quantize_activations,
        rmsnorm_quantize_pallas,
    )

    x = (jax.random.normal(jax.random.PRNGKey(11), (512, 256), jnp.float32)
         * 2.0).astype(jnp.bfloat16)
    w = (jax.random.normal(jax.random.PRNGKey(12), (256,), jnp.float32)
         * 0.5 + 1.0).astype(jnp.bfloat16)
    q_got, s_got = rmsnorm_quantize_pallas(x, w)
    s_got, q_got = np.asarray(s_got), np.asarray(q_got, np.float32)

    # the fused op defines its numerics in f32 (no intermediate bf16
    # rounding) — compare the DEQUANTIZED values against the f32 chain
    x32 = np.asarray(x, np.float32)
    ms = np.mean(x32 * x32, axis=-1, keepdims=True)
    ref = x32 / np.sqrt(1e-5 + ms) * np.asarray(w, np.float32)[None, :]
    np.testing.assert_allclose(q_got * s_got[:, None], ref,
                               atol=float(s_got.max()) * 0.75, rtol=0)

    # and stay within one quant step of the unfused bf16 chain
    q_ref, s_ref = quantize_activations(rmsnorm(x, w))
    deq_ref = np.asarray(q_ref, np.float32) * np.asarray(s_ref)[:, None]
    np.testing.assert_allclose(q_got * s_got[:, None], deq_ref,
                               atol=float(s_got.max()) * 1.5, rtol=0)


def test_silu_mul_quantize_pallas_matches_chain():
    import jax

    from tpu_llama.ops.quant import (
        quantize_activations,
        silu_mul_quantize_pallas,
    )

    g = (jax.random.normal(jax.random.PRNGKey(21), (256, 384), jnp.float32)
         * 2.0).astype(jnp.bfloat16)
    u = (jax.random.normal(jax.random.PRNGKey(22), (256, 384), jnp.float32)
         * 2.0).astype(jnp.bfloat16)
    q_got, s_got = silu_mul_quantize_pallas(g, u)
    s_got, q_got = np.asarray(s_got), np.asarray(q_got, np.float32)
    g32, u32 = np.asarray(g, np.float32), np.asarray(u, np.float32)
    ref = g32 / (1.0 + np.exp(-g32)) * u32
    np.testing.assert_allclose(q_got * s_got[:, None], ref,
                               atol=float(s_got.max()) * 0.75, rtol=0)


def test_w8a8_matmul_residual_epilogue():
    """residual + x @ W in one kernel == the unfused add, at both the
    decode tiling (B<=256) and the prefill rows tiling (B>256)."""
    from tpu_llama.ops import quantize_channel
    from tpu_llama.ops.matmul import w8a8_matmul

    rng = np.random.default_rng(31)
    w = quantize_channel(rng.normal(size=(256, 384)).astype(np.float32) * 0.05)
    for B in (64, 512):
        x = jnp.asarray(rng.normal(size=(B, 256)).astype(np.float32)
                        ).astype(jnp.bfloat16)
        r = jnp.asarray(rng.normal(size=(B, 384)).astype(np.float32)
                        ).astype(jnp.bfloat16)
        ref = r + w8a8_matmul(x, w, out_dtype=jnp.bfloat16)
        got = w8a8_matmul(x, w, out_dtype=jnp.bfloat16, residual=r)
        np.testing.assert_allclose(
            np.asarray(got, dtype=np.float32), np.asarray(ref, np.float32),
            rtol=2e-2, atol=2e-2)


def test_rope_split_quantize_pallas_matches_chain():
    """Fused qkv epilogue == apply_rope + quantize_kv (the unfused XLA
    chain), at int8-quant tolerance (the fused op quantizes unrounded f32
    rope outputs; the chain rounds to bf16 between rope and quant)."""
    import jax

    from tpu_llama.models.llama import apply_rope
    from tpu_llama.ops.attention import quantize_kv
    from tpu_llama.ops.quant import rope_split_quantize_pallas

    B, T, NH, KVH, hd = 2, 16, 4, 2, 128
    D, KVD = NH * hd, KVH * hd
    M = B * T
    key = jax.random.PRNGKey(5)
    qkv = (jax.random.normal(key, (M, D + 2 * KVD), jnp.float32) * 2.0
           ).astype(jnp.bfloat16)
    t = jnp.broadcast_to(jnp.arange(T)[None], (B, T)).astype(jnp.float32)
    ang = t[..., None] / (10.0 ** (2 * jnp.arange(hd // 2) / hd))[None, None]
    cos, sin = jnp.cos(ang), jnp.sin(ang)  # [B, T, hd/2]

    qr, kq, ks, vq, vs = rope_split_quantize_pallas(qkv, cos, sin, D, KVH, hd)

    q = qkv[:, :D].reshape(B, T, NH, hd)
    k = qkv[:, D:D + KVD].reshape(B, T, KVH, hd)
    v = qkv[:, D + KVD:].reshape(B, T, KVH, hd)
    q_ref = apply_rope(q, cos, sin)
    k_ref = apply_rope(k, cos, sin)
    kq_r, ks_r = quantize_kv(k_ref)
    vq_r, vs_r = quantize_kv(v)

    np.testing.assert_allclose(
        np.asarray(qr.reshape(B, T, NH, hd), np.float32),
        np.asarray(q_ref, np.float32), atol=0.05, rtol=0.02)
    # dequantized k/v agree with the chain's dequantized values
    deq = np.asarray(kq, np.float32).reshape(B, T, KVH, hd) \
        * np.asarray(ks).reshape(B, T, KVH)[..., None]
    deq_r = np.asarray(kq_r, np.float32) * np.asarray(ks_r)[..., None]
    np.testing.assert_allclose(deq, deq_r, atol=float(np.abs(deq_r).max())
                               * 0.03)
    deqv = np.asarray(vq, np.float32).reshape(B, T, KVH, hd) \
        * np.asarray(vs).reshape(B, T, KVH)[..., None]
    deqv_r = np.asarray(vq_r, np.float32) * np.asarray(vs_r)[..., None]
    np.testing.assert_allclose(deqv, deqv_r,
                               atol=float(np.abs(deqv_r).max()) * 0.03)


def test_w8a8_rows_resident_matches_default(monkeypatch):
    """The resident-x rows kernel (single-buffered x scratch, weights
    streamed once per m-block) must match the double-buffered rows path
    bit-for-bit at the prefill shapes, with and without residual."""
    import tpu_llama.ops.matmul as mt
    from tpu_llama.ops import quantize_channel
    from tpu_llama.ops.matmul import (
        _pick_rows_resident,
        w8a8_matmul_prequant,
    )

    rng = np.random.default_rng(41)
    M, IN, OUT = 512, 256, 384
    assert _pick_rows_resident(M, IN, OUT, 2) is not None
    w = quantize_channel(rng.normal(size=(IN, OUT)).astype(np.float32) * 0.05)
    xq = jnp.asarray(rng.integers(-127, 128, (M, IN)).astype(np.int8))
    sx = jnp.asarray(rng.uniform(0.01, 0.1, (M,)).astype(np.float32))
    r = jnp.asarray(rng.normal(size=(M, OUT)).astype(np.float32)
                    ).astype(jnp.bfloat16)

    monkeypatch.setenv("TPU_LLAMA_ROWS_RESIDENT", "0")
    base = np.asarray(w8a8_matmul_prequant(xq, sx, w, out_dtype=jnp.bfloat16),
                      np.float32)
    base_r = np.asarray(w8a8_matmul_prequant(
        xq, sx, w, out_dtype=jnp.bfloat16, residual=r), np.float32)
    monkeypatch.setenv("TPU_LLAMA_ROWS_RESIDENT", "1")
    # a fresh trace is needed — w8a8_matmul_prequant is jitted and the env
    # gate is read at trace time
    w8a8_matmul_prequant._clear_cache()
    got = np.asarray(w8a8_matmul_prequant(xq, sx, w, out_dtype=jnp.bfloat16),
                     np.float32)
    got_r = np.asarray(w8a8_matmul_prequant(
        xq, sx, w, out_dtype=jnp.bfloat16, residual=r), np.float32)
    w8a8_matmul_prequant._clear_cache()
    np.testing.assert_array_equal(got, base)
    np.testing.assert_array_equal(got_r, base_r)


def test_quantize_channel4_roundtrip(rng_np):
    from tpu_llama.ops.quant import (dequantize_channel, quantize_channel4,
                                     unpack_channel4)

    w = rng_np.standard_normal((256, 256)).astype(np.float32) * 0.1
    t = quantize_channel4(w)
    assert t.packed4 and t.q.shape == (256, 128) and t.q.dtype == jnp.int8
    assert t.s.shape == (256,) and t.padded_out == 256
    # unpack recovers column order (bitcast pair layout)
    q4 = np.asarray(jax.jit(unpack_channel4)(t)).astype(np.int8)
    assert q4.shape == (256, 256) and np.abs(q4).max() <= 7
    back = np.asarray(dequantize_channel(t))
    rms = np.sqrt(np.mean((back - w) ** 2)) / np.sqrt(np.mean(w**2))
    # int4 on gaussian data: step = absmax/7 ~ 0.5 sigma, rms ~ step/sqrt(12)
    # ~ 0.14 relative — 16x coarser than int8's 0.01 gate
    assert rms < 0.2


def test_quantize_channel4_pads_out_to_256(rng_np):
    from tpu_llama.ops.quant import quantize_channel4

    w = rng_np.standard_normal((100, 130)).astype(np.float32)
    t = quantize_channel4(w)
    assert t.q.shape == (128, 128)  # in->128 (mult 32), out 256 packed
    assert (t.logical_in, t.logical_out) == (100, 130)


@pytest.mark.parametrize("B,IN,OUT", [(1, 256, 256), (8, 512, 256),
                                      (33, 128, 512)])
def test_w4a8_matmul_matches_unpacked_reference(rng_np, B, IN, OUT):
    from tpu_llama.ops import w8a8_matmul
    from tpu_llama.ops.quant import (quantize_activations, quantize_channel4,
                                     unpack_channel4)

    x = rng_np.standard_normal((B, IN)).astype(np.float32)
    w = rng_np.standard_normal((IN, OUT)).astype(np.float32) * 0.05
    t = quantize_channel4(w)
    q4 = np.asarray(jax.jit(unpack_channel4)(t)).astype(np.float32)
    xq, sx = quantize_activations(jnp.asarray(x))
    want = (np.asarray(xq).astype(np.float32) * np.asarray(sx)[:, None]) @ (
        q4 * np.asarray(t.s)[None, :])
    got = np.asarray(w8a8_matmul(jnp.asarray(x), t))
    np.testing.assert_allclose(got, want[:, :OUT], rtol=1e-5,
                               atol=1e-5 * np.abs(want).max() + 1e-6)


def test_w4a8_matmul_xla_matches_kernel(rng_np):
    from tpu_llama.ops.matmul import w8a8_matmul, w8a8_matmul_xla
    from tpu_llama.ops.quant import quantize_channel4

    x = rng_np.standard_normal((4, 256)).astype(np.float32)
    w = rng_np.standard_normal((256, 256)).astype(np.float32) * 0.05
    t = quantize_channel4(w)
    a = np.asarray(w8a8_matmul(jnp.asarray(x), t))
    b = np.asarray(w8a8_matmul_xla(jnp.asarray(x), t))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_w4a8_model_decode_close(tiny_weights):
    from tpu_llama.models import forward_decode, make_kv_cache, params_from_raw
    from tpu_llama.models.llama import quantize_params

    c = tiny_weights.config
    params = params_from_raw(tiny_weights)
    qparams = quantize_params(params, mode="w4a8")
    lp = qparams.layers
    assert lp.wq.packed4 and lp.w2.packed4 and qparams.wcls.packed4
    tokens = [1, 5, 17, 300]
    cf, cq = make_kv_cache(c, 1), make_kv_cache(c, 1, kv_dtype="int8")
    agree = 0
    for p, t in enumerate(tokens):
        tt, pp = jnp.array([t], jnp.int32), jnp.array([p], jnp.int32)
        lf, cf = forward_decode(params, cf, tt, pp, c)
        lq, cq = forward_decode(qparams, cq, tt, pp, c)
        lf, lq = np.asarray(lf[0]), np.asarray(lq[0])
        # int4 weights: looser gate than w8a8's 0.15
        assert np.abs(lq - lf).max() / (np.abs(lf).max() + 1e-9) < 0.6, p
        agree += int(np.argmax(lq) == np.argmax(lf))
    assert agree >= len(tokens) - 1


def test_w4a8_prefill_runs(tiny_weights):
    from tpu_llama.models import make_kv_cache, params_from_raw
    from tpu_llama.models.llama import forward_prefill, quantize_params

    c = tiny_weights.config
    qparams = quantize_params(params_from_raw(tiny_weights), mode="w4a8")
    B, T = 2, 16
    rng = np.random.default_rng(3)
    tokens = jnp.asarray(rng.integers(2, c.vocab_size, (B, T)), jnp.int32)
    lengths = jnp.array([T, 9], jnp.int32)
    cache = make_kv_cache(c, B, kv_dtype="int8")
    logits, cache = forward_prefill(
        qparams, cache, tokens, jnp.zeros(B, jnp.int32), lengths, c,
        logits_mode="last")
    assert np.isfinite(np.asarray(logits)).all()


def test_w4a8_internal_format_roundtrip(tmp_path, tiny_weights):
    from tpu_llama.io.internal import load_params, save_params
    from tpu_llama.models import params_from_raw
    from tpu_llama.models.llama import quantize_params

    c = tiny_weights.config
    qparams = quantize_params(params_from_raw(tiny_weights), mode="w4a8")
    save_params(tmp_path / "m", qparams, c)
    loaded, c2 = load_params(tmp_path / "m")
    assert c2 == c
    assert loaded.layers.wq.packed4
    np.testing.assert_array_equal(np.asarray(loaded.layers.wq.q),
                                  np.asarray(qparams.layers.wq.q))
    np.testing.assert_array_equal(np.asarray(loaded.wcls.s),
                                  np.asarray(qparams.wcls.s))
