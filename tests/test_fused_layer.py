"""ops/fused_layer.py — the one-Pallas-call-per-layer decode linear path.

The fused kernel must reproduce, step for step, what the unfused path
computes with four separate matmul calls + XLA glue: wo @ attq + residual,
f32 rmsnorm (eps inside the sqrt), [w1|w3] matmul, silu(gate)*up, w2 matmul
+ residual, next layer's rms_att + qkv.  All quantization steps use the
exact quantize_activations formula, so the int8 intermediates match
bit-for-bit and the only tolerance needed is f32 rounding.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_llama.config import ModelConfig
from tpu_llama.ops.fused_layer import fused_layer_linear, w8a8_matmul_stacked
from tpu_llama.ops.quant import quantize_activations, quantize_channel


def _stacked_channel_quant(key, L, IN, OUT):
    w = jax.random.normal(key, (L, IN, OUT), jnp.float32) * 0.05
    return quantize_channel(w)


def _deq(w, l):
    return w.q[l].astype(jnp.float32) * w.s[l][None, :]


def _rms(x, w):
    ms = jnp.mean(x * x, axis=-1, keepdims=True)
    return x * jax.lax.rsqrt(1e-5 + ms) * w[None, :]


def _reference_layer(x, attq, satt, wo, w13, w2, qkv, rms_ffn, rms_att,
                     l, L):
    """Unfused f32 composition of exactly what the kernel computes."""
    H = w2.q.shape[1]
    att = attq.astype(jnp.float32) * satt[:, None]
    x2 = x + att @ _deq(wo, l)
    h = _rms(x2, rms_ffn[l])
    q2, s2 = quantize_activations(h)
    gu = (q2.astype(jnp.float32) * s2[:, None]) @ _deq(w13, l)
    g, u = gu[:, :H], gu[:, H:]
    h2 = jax.nn.silu(g) * u
    q3, s3 = quantize_activations(h2)
    x3 = x2 + (q3.astype(jnp.float32) * s3[:, None]) @ _deq(w2, l)
    l2 = min(l + 1, L - 1)
    h4 = _rms(x3, rms_att[l2])
    q4, s4 = quantize_activations(h4)
    qkv_next = (q4.astype(jnp.float32) * s4[:, None]) @ _deq(qkv, l2)
    return x3, qkv_next


@pytest.fixture(scope="module")
def setup():
    L, D, H, QO, Bp = 3, 128, 256, 384, 32
    keys = jax.random.split(jax.random.PRNGKey(7), 8)
    wo = _stacked_channel_quant(keys[0], L, D, D)
    w13 = _stacked_channel_quant(keys[1], L, D, 2 * H)
    w2 = _stacked_channel_quant(keys[2], L, H, D)
    qkv = _stacked_channel_quant(keys[3], L, D, QO)
    rms_ffn = 1.0 + 0.1 * jax.random.normal(keys[4], (L, D), jnp.float32)
    rms_att = 1.0 + 0.1 * jax.random.normal(keys[5], (L, D), jnp.float32)
    x = jax.random.normal(keys[6], (Bp, D), jnp.float32)
    att = jax.random.normal(keys[7], (Bp, D), jnp.float32)
    attq, satt = quantize_activations(att)
    return dict(L=L, D=D, H=H, QO=QO, Bp=Bp, wo=wo, w13=w13, w2=w2,
                qkv=qkv, rms_ffn=rms_ffn, rms_att=rms_att, x=x,
                attq=attq, satt=satt)


@pytest.mark.parametrize("l", [0, 1, 2])
def test_fused_layer_matches_reference(setup, l):
    s = setup
    x_ref, qkv_ref = _reference_layer(
        s["x"], s["attq"], s["satt"], s["wo"], s["w13"], s["w2"], s["qkv"],
        s["rms_ffn"], s["rms_att"], l, s["L"])
    x_out, qkv_out = fused_layer_linear(
        s["x"], s["attq"], s["satt"],
        s["wo"].q, s["wo"].s, s["w13"].q, s["w13"].s,
        s["w2"].q, s["w2"].s, s["qkv"].q, s["qkv"].s,
        s["rms_ffn"], s["rms_att"], jnp.int32(l), s["L"])
    np.testing.assert_allclose(np.asarray(x_out), np.asarray(x_ref),
                               rtol=2e-5, atol=2e-5)
    if l + 1 < s["L"]:  # last layer's qkv phase is skipped (garbage out)
        np.testing.assert_allclose(np.asarray(qkv_out), np.asarray(qkv_ref),
                                   rtol=2e-5, atol=2e-5)


def test_stacked_matmul_matches_per_layer(setup):
    s = setup
    xq, sx = quantize_activations(s["x"])
    for l in range(s["L"]):
        got = w8a8_matmul_stacked(xq, sx, s["qkv"].q, s["qkv"].s, l)
        want = (xq.astype(jnp.float32) * sx[:, None]) @ _deq(s["qkv"], l)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)


# ---------------------------------------------------------------------------
# end-to-end: forward_decode(fused=True) vs the unfused flash path
# ---------------------------------------------------------------------------


def _tiny_config(**kw):
    base = dict(dim=128, hidden_dim=256, n_layers=3, n_heads=2,
                n_kv_heads=2, vocab_size=64, seq_len=64)
    base.update(kw)
    return ModelConfig(**base)


def _fused_model(config):
    from tpu_llama.models import random_params
    from tpu_llama.models.llama import fuse_projections, quantize_params

    params = random_params(config, dtype=jnp.float32, seed=3)
    return quantize_params(fuse_projections(params), mode="w8a8")


@pytest.mark.parametrize("kv", ["int8", "float32"])
def test_forward_decode_fused_matches_unfused(kv):
    from tpu_llama.models import make_kv_cache
    from tpu_llama.models.llama import _fused_path_ok, forward_decode

    config = _tiny_config()
    params = _fused_model(config)
    assert _fused_path_ok(params, config)
    B = 2
    tokens = jnp.array([3, 5], jnp.int32)
    pos = jnp.array([4, 9], jnp.int32)

    def run(fused):
        cache = make_kv_cache(config, batch=B, kv_dtype=kv)
        # prefill a few rows so attention reads real cache content
        from tpu_llama.models.llama import forward_prefill
        warm = jnp.tile(jnp.arange(10, dtype=jnp.int32)[None], (B, 1))
        _, cache = forward_prefill(params, cache, warm,
                                   jnp.zeros((B,), jnp.int32),
                                   jnp.array([4, 9], jnp.int32), config)
        return forward_decode(params, cache, tokens, pos, config,
                              attn="flash", fused=fused)

    logits_f, cache_f = run(True)
    logits_u, cache_u = run(False)
    np.testing.assert_allclose(np.asarray(logits_f), np.asarray(logits_u),
                               rtol=5e-3, atol=5e-3)
    # the written KV rows must agree too (same quantized values)
    np.testing.assert_allclose(np.asarray(cache_f.k), np.asarray(cache_u.k),
                               atol=1)


def test_forward_decode_fused_paged():
    import dataclasses

    from tpu_llama.models import make_kv_cache
    from tpu_llama.models.llama import forward_decode
    from tpu_llama.runtime.paged import PagePool

    config = _tiny_config()
    params = _fused_model(config)
    B, S, ps = 2, 64, 32
    mp = S // ps
    pool = PagePool(B * mp + 1, ps, B, mp)
    for s in range(B):
        assert pool.reserve(s, S) is not None
    cache = make_kv_cache(config, batch=B, kv_dtype="int8", seq_len=S,
                          paged=True, num_pages=B * mp + 1, page_size=ps)
    cache = dataclasses.replace(cache, page_table=jnp.asarray(pool.table))

    tokens = jnp.array([3, 5], jnp.int32)
    pos = jnp.array([4, 9], jnp.int32)
    logits_f, _ = forward_decode(params, cache, tokens, pos, config,
                                 attn="flash", fused=True)

    dense = make_kv_cache(config, batch=B, kv_dtype="int8", seq_len=S)
    logits_u, _ = forward_decode(params, dense, tokens, pos, config,
                                 attn="flash", fused=False)
    np.testing.assert_allclose(np.asarray(logits_f), np.asarray(logits_u),
                               rtol=5e-3, atol=5e-3)


def test_fused_path_ok_rejects_unaligned():
    from tpu_llama.models.llama import _fused_path_ok

    config = _tiny_config(dim=96, n_heads=2, n_kv_heads=2, hidden_dim=256)
    params = _fused_model(config)
    assert not _fused_path_ok(params, config)


def test_forward_decode_fused_gqa():
    """GQA (n_kv_heads < n_heads): the fused carry splits qkv at D/KVD and
    attention runs grouped — must match the unfused path."""
    from tpu_llama.models import make_kv_cache
    from tpu_llama.models.llama import _fused_path_ok, forward_decode

    config = _tiny_config(n_heads=2, n_kv_heads=1)  # hd=64, KVD=64, QO=256
    params = _fused_model(config)
    assert _fused_path_ok(params, config)
    B = 2
    tokens = jnp.array([3, 5], jnp.int32)
    pos = jnp.array([4, 9], jnp.int32)

    def run(fused):
        cache = make_kv_cache(config, batch=B, kv_dtype="int8")
        from tpu_llama.models.llama import forward_prefill
        warm = jnp.tile(jnp.arange(10, dtype=jnp.int32)[None], (B, 1))
        _, cache = forward_prefill(params, cache, warm,
                                   jnp.zeros((B,), jnp.int32),
                                   jnp.array([4, 9], jnp.int32), config)
        return forward_decode(params, cache, tokens, pos, config,
                              attn="flash", fused=fused)[0]

    np.testing.assert_allclose(np.asarray(run(True)), np.asarray(run(False)),
                               rtol=5e-3, atol=5e-3)


def test_fused_blocks_infeasible_at_70b():
    """70B's w2 minimum block (28672 x 128 int8 = 3.6 MB, double-buffered)
    exceeds the VMEM budget — the picker must return None so
    _fused_path_ok falls back to the unfused path instead of a compile-time
    VMEM OOM (70B runs TP-sharded with unfused layouts anyway)."""
    from tpu_llama.ops.fused_layer import _pick_fused_blocks

    assert _pick_fused_blocks(32, 8192, 28672, 10240) is None
    # 7B and 13B must stay feasible
    assert _pick_fused_blocks(32, 4096, 11008, 12288) is not None
    assert _pick_fused_blocks(32, 5120, 13824, 15360) is not None
