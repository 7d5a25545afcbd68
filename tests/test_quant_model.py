"""End-to-end INT8 weight-only model tests."""

import jax.numpy as jnp
import numpy as np

from tpu_llama.models import KVCache, forward_decode, forward_prefill, params_from_raw
from tpu_llama.models.llama import quantize_params


def test_quantized_decode_close_to_fp32(tiny_weights):
    c = tiny_weights.config
    params = params_from_raw(tiny_weights)
    qparams = quantize_params(params)

    tokens = [1, 5, 17, 300, 42]
    cache_f = KVCache.create(c, batch=1)
    cache_q = KVCache.create(c, batch=1)
    agree = 0
    for p, t in enumerate(tokens):
        tt, pp = jnp.array([t], jnp.int32), jnp.array([p], jnp.int32)
        lf, cache_f = forward_decode(params, cache_f, tt, pp, c)
        lq, cache_q = forward_decode(qparams, cache_q, tt, pp, c)
        lf, lq = np.asarray(lf[0]), np.asarray(lq[0])
        # INT8 weight-only should track fp32 logits closely
        denom = np.abs(lf).max() + 1e-9
        assert np.abs(lq - lf).max() / denom < 0.08, f"pos {p}"
        agree += int(np.argmax(lq) == np.argmax(lf))
    assert agree >= len(tokens) - 1  # argmax agreement nearly always


def test_quantized_prefill_matches_decode(tiny_weights):
    c = tiny_weights.config
    qparams = quantize_params(params_from_raw(tiny_weights))
    tokens = [1, 5, 17, 300]

    cache_a = KVCache.create(c, batch=1)
    dec = []
    for p, t in enumerate(tokens):
        logits, cache_a = forward_decode(
            qparams, cache_a, jnp.array([t], jnp.int32), jnp.array([p], jnp.int32), c)
        dec.append(np.asarray(logits[0]))

    cache_b = KVCache.create(c, batch=1)
    pre, _ = forward_prefill(
        qparams, cache_b, jnp.array([tokens], jnp.int32),
        jnp.array([0], jnp.int32), jnp.array([4], jnp.int32), c)
    np.testing.assert_allclose(np.asarray(pre[0]), np.stack(dec), rtol=3e-2, atol=3e-2)


def test_quantized_memory_is_int8(tiny_weights):
    qparams = quantize_params(params_from_raw(tiny_weights))
    assert qparams.layers.wq.q.dtype == jnp.int8
    assert qparams.wcls.q.dtype == jnp.int8
    # ~4x smaller than fp32 (scales add a small overhead)
    fp_bytes = np.prod(qparams.layers.wq.q.shape) * 4
    q_bytes = np.prod(qparams.layers.wq.q.shape) + np.prod(qparams.layers.wq.s.shape) * 4
    assert q_bytes < fp_bytes / 3


def test_w8a8_fused_prefill_fresh_matches_decode():
    """The one-pass fused prefill stages (rmsnorm+quant, silu*up+quant,
    residual matmul epilogues) must agree with the step-by-step decode
    path, which shares none of those kernels."""
    import jax

    from tpu_llama.config import ModelConfig
    from tpu_llama.io.checkpoint import make_random_weights
    from tpu_llama.models.llama import (
        _prefill_w8a8_fast_ok,
        fuse_projections,
        quantize_params,
    )

    c = ModelConfig(dim=256, hidden_dim=384, n_layers=2, n_heads=2,
                    n_kv_heads=2, vocab_size=320, seq_len=64,
                    shared_weights=False)
    raw = make_random_weights(c, seed=7)
    qp = quantize_params(
        fuse_projections(params_from_raw(raw, dtype=jnp.bfloat16)),
        mode="w8a8")
    B, T = 2, 16
    assert _prefill_w8a8_fast_ok(qp, c, B, T)  # the fast path must engage

    tokens = np.array([[1, 5, 17, 300, 42, 7, 9, 250, 3, 11, 2, 99,
                        104, 33, 8, 61],
                       [4, 9, 280, 6, 12, 33, 150, 2, 87, 5, 19, 44,
                        1, 310, 22, 13]], np.int32)
    cache_a = KVCache.create(c, batch=B)
    dec = []
    for p in range(T):
        logits, cache_a = forward_decode(
            qp, cache_a, jnp.asarray(tokens[:, p]),
            jnp.full((B,), p, jnp.int32), c)
        dec.append(np.asarray(logits))
    dec = np.stack(dec, axis=1)  # [B, T, V]

    cache_b = KVCache.create(c, batch=B)
    pre, _ = forward_prefill(
        qp, cache_b, jnp.asarray(tokens), jnp.zeros((B,), jnp.int32),
        jnp.full((B,), T, jnp.int32), c, assume_fresh=True)
    scale = np.abs(dec).max()
    np.testing.assert_allclose(np.asarray(pre) / scale, dec / scale,
                               atol=4e-2)


def test_w8a8_fused_prefill_int8_cache_matches_decode():
    """The attend_prequant path (fused rope+split+quant epilogue, int8
    cache) must agree with the step-by-step decode path at int8-KV
    tolerance — and its cache contents must round-trip into decode."""
    import jax

    from tpu_llama.config import ModelConfig
    from tpu_llama.io.checkpoint import make_random_weights
    from tpu_llama.models.llama import (
        QuantKVCache,
        _prefill_w8a8_fast_ok,
        fuse_projections,
        quantize_params,
    )

    c = ModelConfig(dim=512, hidden_dim=384, n_layers=2, n_heads=4,
                    n_kv_heads=2, vocab_size=320, seq_len=64,
                    shared_weights=False)
    raw = make_random_weights(c, seed=11)
    qp = quantize_params(
        fuse_projections(params_from_raw(raw, dtype=jnp.bfloat16)),
        mode="w8a8")
    B, T = 2, 16
    assert _prefill_w8a8_fast_ok(qp, c, B, T)

    tokens = np.array([[1, 5, 17, 300, 42, 7, 9, 250, 3, 11, 2, 99,
                        104, 33, 8, 61],
                       [4, 9, 280, 6, 12, 33, 150, 2, 87, 5, 19, 44,
                        1, 310, 22, 13]], np.int32)
    cache_a = QuantKVCache.create(c, batch=B)
    dec = []
    for p in range(T):
        logits, cache_a = forward_decode(
            qp, cache_a, jnp.asarray(tokens[:, p]),
            jnp.full((B,), p, jnp.int32), c)
        dec.append(np.asarray(logits))
    dec = np.stack(dec, axis=1)  # [B, T, V]

    cache_b = QuantKVCache.create(c, batch=B)
    # attn="flash" so attend_prequant (the TPU default) engages under
    # interpret mode — CPU auto would take the xla branch and skip it
    pre, cache_b = forward_prefill(
        qp, cache_b, jnp.asarray(tokens), jnp.zeros((B,), jnp.int32),
        jnp.full((B,), T, jnp.int32), c, assume_fresh=True, attn="flash")
    scale = np.abs(dec).max()
    np.testing.assert_allclose(np.asarray(pre) / scale, dec / scale,
                               atol=6e-2)

    # one decode step from each cache continues identically (cache parity)
    nxt = jnp.asarray(np.argmax(np.asarray(pre)[:, -1], -1).astype(np.int32))
    la, _ = forward_decode(qp, cache_a, nxt, jnp.full((B,), T, jnp.int32), c)
    lb, _ = forward_decode(qp, cache_b, nxt, jnp.full((B,), T, jnp.int32), c)
    np.testing.assert_allclose(np.asarray(la) / scale,
                               np.asarray(lb) / scale, atol=6e-2)


def test_w8a8_fused_continuation_prefill_matches_decode():
    """The non-fresh fused layer body (chunked prefill / start_pos>0
    continuations) must agree with step-by-step decode at int8-KV
    tolerance."""
    import jax

    from tpu_llama.config import ModelConfig
    from tpu_llama.io.checkpoint import make_random_weights
    from tpu_llama.models.llama import (
        QuantKVCache,
        _prefill_w8a8_fast_ok,
        fuse_projections,
        quantize_params,
    )

    c = ModelConfig(dim=512, hidden_dim=384, n_layers=2, n_heads=4,
                    n_kv_heads=2, vocab_size=320, seq_len=64,
                    shared_weights=False)
    raw = make_random_weights(c, seed=13)
    qp = quantize_params(
        fuse_projections(params_from_raw(raw, dtype=jnp.bfloat16)),
        mode="w8a8")
    B, T = 2, 32
    T1 = 16  # fresh part; the rest continues at start_pos=T1
    assert _prefill_w8a8_fast_ok(qp, c, B, T - T1)

    rng = np.random.default_rng(3)
    tokens = rng.integers(1, 320, (B, T)).astype(np.int32)
    cache_a = QuantKVCache.create(c, batch=B)
    dec = []
    for p in range(T):
        logits, cache_a = forward_decode(
            qp, cache_a, jnp.asarray(tokens[:, p]),
            jnp.full((B,), p, jnp.int32), c)
        dec.append(np.asarray(logits))
    dec = np.stack(dec, axis=1)

    cache_b = QuantKVCache.create(c, batch=B)
    _, cache_b = forward_prefill(
        qp, cache_b, jnp.asarray(tokens[:, :T1]), jnp.zeros((B,), jnp.int32),
        jnp.full((B,), T1, jnp.int32), c, assume_fresh=True, attn="flash")
    # continuation: start_pos = T1, the NON-fresh path (scatter + attend
    # over the warm cache) through the fused w8a8 body
    pre2, cache_b = forward_prefill(
        qp, cache_b, jnp.asarray(tokens[:, T1:]),
        jnp.full((B,), T1, jnp.int32), jnp.full((B,), T - T1, jnp.int32),
        c, attn="flash", max_keys=T)
    scale = np.abs(dec).max()
    np.testing.assert_allclose(np.asarray(pre2) / scale,
                               dec[:, T1:] / scale, atol=6e-2)
