"""Pipeline-parallel stage execution vs single-device reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_llama.models import forward_decode, forward_prefill, make_kv_cache, params_from_raw
from tpu_llama.parallel.pipeline import PipelineRunner, split_stages


@pytest.fixture(scope="module")
def devices():
    if len(jax.devices()) < 3:
        pytest.skip("needs >=3 devices")
    return jax.devices()


def test_split_stages_shapes(tiny_weights):
    params = params_from_raw(tiny_weights)
    stages = split_stages(params, 3)
    assert [s.n_layers for s, _ in stages] == [1, 1, 1]
    assert stages[0][0].first and stages[-1][0].last
    # middle stages carry token-embedding/classifier stubs only
    assert stages[1][1].tok_emb.shape[0] == 1
    assert stages[1][1].wcls.shape[1] == 1


@pytest.mark.parametrize("n_stages", [2, 3])
def test_pipeline_decode_matches(tiny_weights, devices, n_stages):
    c = tiny_weights.config
    params = params_from_raw(tiny_weights)
    B = 2
    runner = PipelineRunner(params, c, n_stages=n_stages, batch=B,
                            precision="highest")

    cache = make_kv_cache(c, B)
    toks = np.array([5, 9], np.int32)
    for p in range(4):
        pos = np.full(B, p, np.int32)
        ref, cache = forward_decode(params, cache, jnp.asarray(toks),
                                    jnp.asarray(pos), c, precision="highest")
        got = runner.decode(toks, pos)
        np.testing.assert_allclose(got, np.asarray(ref), rtol=1e-5, atol=1e-6,
                                   err_msg=f"pos={p}")
        toks = np.argmax(np.asarray(ref), -1).astype(np.int32)


@pytest.mark.parametrize("n_micro", [1, 2])
def test_pipeline_prefill_matches(tiny_weights, devices, n_micro):
    c = tiny_weights.config
    params = params_from_raw(tiny_weights)
    B, T = 4, 8
    rng = np.random.default_rng(0)
    tokens = rng.integers(2, c.vocab_size, (B, T)).astype(np.int32)
    lengths = np.full(B, T, np.int32)

    cache = make_kv_cache(c, B)
    ref, _ = forward_prefill(params, cache, jnp.asarray(tokens),
                             jnp.zeros(B, jnp.int32), jnp.asarray(lengths), c,
                             precision="highest")
    ref_last = np.asarray(ref)[np.arange(B), lengths - 1]

    runner = PipelineRunner(params, c, n_stages=2, batch=B, precision="highest")
    got = runner.prefill(tokens, lengths, n_micro=n_micro)
    np.testing.assert_allclose(got, ref_last, rtol=1e-5, atol=1e-6)


def test_pipeline_prefill_then_decode(tiny_weights, devices):
    c = tiny_weights.config
    params = params_from_raw(tiny_weights)
    B, T = 2, 6
    rng = np.random.default_rng(1)
    tokens = rng.integers(2, c.vocab_size, (B, T)).astype(np.int32)
    lengths = np.full(B, T, np.int32)

    runner = PipelineRunner(params, c, n_stages=2, batch=B, precision="highest")
    last = runner.prefill(tokens, lengths)
    nxt = np.argmax(last, -1).astype(np.int32)
    got = runner.decode(nxt, np.full(B, T, np.int32))

    cache = make_kv_cache(c, B)
    _, cache = forward_prefill(params, cache, jnp.asarray(tokens),
                               jnp.zeros(B, jnp.int32), jnp.asarray(lengths),
                               c, precision="highest")
    ref, _ = forward_decode(params, cache, jnp.asarray(nxt),
                            jnp.full((B,), T, jnp.int32), c, precision="highest")
    np.testing.assert_allclose(got, np.asarray(ref), rtol=1e-5, atol=1e-6)


def test_pipeline_int8_kv(tiny_weights, devices):
    """PP stages with INT8 KV caches track the fp pipeline closely."""
    c = tiny_weights.config
    params = params_from_raw(tiny_weights)
    B = 2
    fp = PipelineRunner(params, c, n_stages=2, batch=B, precision="highest")
    q8 = PipelineRunner(params, c, n_stages=2, batch=B, precision="highest",
                        kv_dtype="int8")
    toks = np.array([5, 9], np.int32)
    for p in range(3):
        pos = np.full(B, p, np.int32)
        a = fp.decode(toks, pos)
        b = q8.decode(toks, pos)
        assert np.abs(b - a).max() / (np.abs(a).max() + 1e-9) < 0.05, p
        toks = np.argmax(a, -1).astype(np.int32)


def test_pipeline_quantized_weights(tiny_weights, devices):
    from tpu_llama.models import quantize_params

    c = tiny_weights.config
    qparams = quantize_params(params_from_raw(tiny_weights))
    runner = PipelineRunner(qparams, c, n_stages=3, batch=1,
                            precision="highest")
    out = runner.decode(np.array([5], np.int32), np.array([0], np.int32))
    assert np.isfinite(out).all()


@pytest.mark.parametrize("n_micro", [1, 2])
def test_pipeline_tp_composed(tiny_weights, devices, n_micro):
    """PP x TP: 2 stages, each TP'd over its own 2-device submesh, matches
    the single-device forward for prefill AND subsequent decode."""
    if len(jax.devices()) < 4:
        pytest.skip("needs >=4 devices")
    c = tiny_weights.config
    params = params_from_raw(tiny_weights)
    B, T = 4, 8
    rng = np.random.default_rng(7)
    tokens = rng.integers(2, c.vocab_size, (B, T)).astype(np.int32)
    lengths = np.full(B, T, np.int32)

    runner = PipelineRunner(params, c, n_stages=2, batch=B,
                            precision="highest", tp=2)
    last = runner.prefill(tokens, lengths, n_micro=n_micro)

    cache = make_kv_cache(c, B)
    ref, cache = forward_prefill(params, cache, jnp.asarray(tokens),
                                 jnp.zeros(B, jnp.int32),
                                 jnp.asarray(lengths), c,
                                 precision="highest")
    ref_last = np.asarray(ref)[np.arange(B), lengths - 1]
    np.testing.assert_allclose(last, ref_last, rtol=1e-5, atol=1e-6)

    toks = np.argmax(last, -1).astype(np.int32)
    for p in range(T, T + 3):
        pos = np.full(B, p, np.int32)
        refd, cache = forward_decode(params, cache, jnp.asarray(toks),
                                     jnp.asarray(pos), c,
                                     precision="highest")
        got = runner.decode(toks, pos)
        np.testing.assert_allclose(got, np.asarray(refd), rtol=1e-5,
                                   atol=1e-6, err_msg=f"pos={p}")
        toks = np.argmax(got, -1).astype(np.int32)


def test_pipeline_tp_quantized(tiny_weights, devices):
    """PP x TP with INT8 weights runs and stays finite (quantized specs
    shard values and scales consistently across the stage submesh)."""
    if len(jax.devices()) < 4:
        pytest.skip("needs >=4 devices")
    from tpu_llama.models import quantize_params

    c = tiny_weights.config
    qparams = quantize_params(params_from_raw(tiny_weights))
    runner = PipelineRunner(qparams, c, n_stages=2, batch=2,
                            precision="highest", tp=2)
    out = runner.decode(np.array([5, 9], np.int32), np.zeros(2, np.int32))
    assert np.isfinite(out).all()


def test_pipeline_fused_w8a8_int8(devices):
    """PP stages through the FUSED perf stack (fused W8A8 layouts + int8
    KV + deferred-flush flash attention — VERDICT r2 #4): tokens match the
    single-chip fused engine."""
    from tpu_llama.config import ModelConfig
    from tpu_llama.io.checkpoint import make_random_weights
    from tpu_llama.models import quantize_params
    from tpu_llama.models.llama import fuse_projections

    c = ModelConfig(dim=256, hidden_dim=512, n_layers=4, n_heads=2,
                    n_kv_heads=2, vocab_size=256, seq_len=64)
    params = params_from_raw(make_random_weights(c, seed=31))
    fp = quantize_params(fuse_projections(params), mode="w8a8")
    B, T = 2, 8

    runner = PipelineRunner(fp, c, n_stages=2, batch=B, kv_dtype="int8")
    assert runner.fused, "fused path must engage for this config"
    toks = np.zeros((B, T), np.int32)
    toks[0, :T] = np.arange(1, T + 1)
    toks[1, :T] = np.arange(3, T + 3)
    lengths = np.full((B,), T, np.int32)
    last = runner.prefill(toks, lengths, n_micro=2)
    t = np.argmax(last, -1).astype(np.int32)
    stream = [t.copy()]
    pos = np.full((B,), T, np.int32)
    for _ in range(3):
        logits = runner.decode(t, pos)
        t = np.argmax(logits, -1).astype(np.int32)
        pos += 1
        stream.append(t.copy())

    # single-chip fused reference
    cache = make_kv_cache(c, B, "int8")
    logits, cache = forward_prefill(fp, cache, jnp.asarray(toks),
                                    jnp.zeros((B,), jnp.int32),
                                    jnp.asarray(lengths), c,
                                    precision="default", logits_mode="last")
    t = jnp.argmax(logits, -1).astype(jnp.int32)
    ref = [np.asarray(t)]
    p = jnp.full((B,), T, jnp.int32)
    for _ in range(3):
        logits, cache = forward_decode(fp, cache, t, p, c,
                                       precision="default", attn="flash",
                                       fused=True)
        t = jnp.argmax(logits, -1).astype(jnp.int32)
        p = p + 1
        ref.append(np.asarray(t))
    for r, g in zip(ref, stream):
        np.testing.assert_array_equal(g, r)


# ---------------------------------------------------------------------------
# device-side ring pipeline (pp-device): one program, ppermute hand-offs
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("n_stages", [2, 4])
def test_pp_device_greedy_matches_single_chip(devices, n_stages):
    """The device-side ring-pipelined greedy decode (microbatch rotation,
    token feedback over ppermute, fill-phase trash writes) must emit exactly
    the single-chip greedy token stream."""
    from jax.sharding import Mesh

    from tpu_llama.config import ModelConfig
    from tpu_llama.models.llama import random_params
    from tpu_llama.parallel.pipeline import STAGE_AXIS, pp_device_greedy_decode

    c = ModelConfig(dim=64, hidden_dim=172, n_layers=8, n_heads=4,
                    n_kv_heads=2, vocab_size=97, seq_len=64,
                    shared_weights=True)
    params = random_params(c, dtype=jnp.float32, seed=3)
    B, K = 8, 5
    rng = np.random.default_rng(0)
    tok0 = rng.integers(3, c.vocab_size - 1, size=B).astype(np.int32)
    pos0 = np.zeros(B, np.int32)

    cache = make_kv_cache(c, B)
    ref = []
    tok, pos = jnp.asarray(tok0), jnp.asarray(pos0)
    for _ in range(K):
        logits, cache = forward_decode(params, cache, tok, pos, c,
                                       precision="highest", attn="xla",
                                       fused=False)
        tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        pos = pos + 1
        ref.append(np.asarray(tok))
    ref = np.stack(ref, axis=1)

    mesh = Mesh(np.array(jax.devices()[:n_stages]), (STAGE_AXIS,))
    out, _ = pp_device_greedy_decode(params, c, mesh, make_kv_cache(c, B),
                                     tok0, pos0, K)
    np.testing.assert_array_equal(np.asarray(out), ref)


def test_pp_device_prefilled_start(devices):
    """pp-device decode continuing from a prefilled cache (init_pos > 0,
    per-row staggered lengths) matches stepwise single-chip decode."""
    from jax.sharding import Mesh

    from tpu_llama.config import ModelConfig
    from tpu_llama.models import forward_prefill
    from tpu_llama.models.llama import random_params
    from tpu_llama.parallel.pipeline import STAGE_AXIS, pp_device_greedy_decode

    c = ModelConfig(dim=64, hidden_dim=172, n_layers=4, n_heads=4,
                    n_kv_heads=2, vocab_size=97, seq_len=64,
                    shared_weights=True)
    params = random_params(c, dtype=jnp.float32, seed=5)
    B, T, K = 4, 6, 4
    rng = np.random.default_rng(1)
    prompts = rng.integers(3, c.vocab_size - 1, (B, T)).astype(np.int32)
    lengths = np.array([6, 4, 5, 6], np.int32)

    cache = make_kv_cache(c, B)
    logits, cache = forward_prefill(params, cache, jnp.asarray(prompts),
                                    jnp.zeros(B, jnp.int32),
                                    jnp.asarray(lengths), c,
                                    precision="highest", logits_mode="last")
    tok0 = np.asarray(jnp.argmax(logits, -1)).astype(np.int32)
    pos0 = lengths.copy()  # next decode position per row

    ref, tok, pos = [], jnp.asarray(tok0), jnp.asarray(pos0)
    ref_cache = cache
    for _ in range(K):
        logits, ref_cache = forward_decode(params, ref_cache, tok, pos, c,
                                           precision="highest", attn="xla",
                                           fused=False)
        tok = jnp.argmax(logits, -1).astype(jnp.int32)
        pos = pos + 1
        ref.append(np.asarray(tok))
    ref = np.stack(ref, axis=1)

    mesh = Mesh(np.array(jax.devices()[:2]), (STAGE_AXIS,))
    out, _ = pp_device_greedy_decode(params, c, mesh, cache, tok0, pos0, K)
    np.testing.assert_array_equal(np.asarray(out), ref)


@pytest.mark.parametrize("fused", [False, True])
def test_pp_device_int8_stage_bodies(devices, fused):
    """pp-device v2 (VERDICT r4 #7): the production int8 stack — QuantKVCache
    stage slices + deferred-flush flash kernels, and (fused=True) the
    one-linear-launch fused stage body — emits the single-chip greedy
    stream."""
    from jax.sharding import Mesh

    from tpu_llama.config import ModelConfig
    from tpu_llama.models import random_params
    from tpu_llama.models.llama import (
        _fused_path_ok,
        fuse_projections,
        quantize_params,
    )
    from tpu_llama.parallel.pipeline import STAGE_AXIS, pp_device_greedy_decode

    c = ModelConfig(dim=128, hidden_dim=256, n_layers=4, n_heads=2,
                    n_kv_heads=2, vocab_size=64, seq_len=64,
                    shared_weights=True)
    params = quantize_params(fuse_projections(
        random_params(c, dtype=jnp.float32, seed=7)), mode="w8a8")
    assert _fused_path_ok(params, c)
    B, K = 4, 4
    rng = np.random.default_rng(2)
    tok0 = rng.integers(3, c.vocab_size - 1, size=B).astype(np.int32)
    pos0 = np.zeros(B, np.int32)

    cache = make_kv_cache(c, B, "int8")
    ref = []
    tok, pos = jnp.asarray(tok0), jnp.asarray(pos0)
    for _ in range(K):
        logits, cache = forward_decode(params, cache, tok, pos, c,
                                       attn="flash", fused=fused)
        tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        pos = pos + 1
        ref.append(np.asarray(tok))
    ref = np.stack(ref, axis=1)

    mesh = Mesh(np.array(jax.devices()[:2]), (STAGE_AXIS,))
    out, new_cache = pp_device_greedy_decode(
        params, c, mesh, make_kv_cache(c, B, "int8"), tok0, pos0, K,
        attn="flash", fused=fused)
    np.testing.assert_array_equal(np.asarray(out), ref)
    # the written KV rows must agree with the single-chip cache (positions
    # < K only: the ring's drain ticks legitimately pre-write position K's
    # rows on early stages — the correct KV for the NEXT token, which a
    # continuation re-writes identically)
    np.testing.assert_allclose(np.asarray(new_cache.k[:, :, :, :K]),
                               np.asarray(cache.k[:, :, :, :K]), atol=1)
