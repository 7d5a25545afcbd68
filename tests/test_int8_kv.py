"""INT8 KV cache + flash attention integration tests."""

import jax.numpy as jnp
import numpy as np

from tpu_llama.models import (
    forward_decode,
    forward_prefill,
    make_kv_cache,
    params_from_raw,
)
from tpu_llama.runtime import ContinuousBatcher, Engine, Request


def run_decode_seq(params, c, cache, tokens, attn="xla"):
    out = []
    for p, t in enumerate(tokens):
        logits, cache = forward_decode(
            params, cache, jnp.array([t], jnp.int32), jnp.array([p], jnp.int32),
            c, attn=attn)
        out.append(np.asarray(logits[0]))
    return np.stack(out), cache


def test_flash_attention_matches_xla_in_model(tiny_weights):
    c = tiny_weights.config
    params = params_from_raw(tiny_weights)
    tokens = [1, 5, 17, 300, 42]
    ref, _ = run_decode_seq(params, c, make_kv_cache(c, 1), tokens, attn="xla")
    got, _ = run_decode_seq(params, c, make_kv_cache(c, 1), tokens, attn="flash")
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)
    assert np.array_equal(np.argmax(got, -1), np.argmax(ref, -1))


def test_int8_kv_decode_close_to_fp(tiny_weights):
    c = tiny_weights.config
    params = params_from_raw(tiny_weights)
    tokens = [1, 5, 17, 300, 42, 9]
    ref, _ = run_decode_seq(params, c, make_kv_cache(c, 1), tokens)
    got, cache = run_decode_seq(params, c, make_kv_cache(c, 1, "int8"), tokens)
    denom = np.abs(ref).max()
    assert np.abs(got - ref).max() / denom < 0.05
    # the cache really is int8
    assert cache.k.dtype == jnp.int8
    assert cache.ks.dtype == jnp.float32


def test_int8_kv_prefill_matches_int8_decode(tiny_weights):
    c = tiny_weights.config
    params = params_from_raw(tiny_weights)
    tokens = [1, 5, 17, 300]
    dec, _ = run_decode_seq(params, c, make_kv_cache(c, 1, "int8"), tokens)
    pre, _ = forward_prefill(
        params, make_kv_cache(c, 1, "int8"),
        jnp.array([tokens], jnp.int32), jnp.array([0], jnp.int32),
        jnp.array([4], jnp.int32), c)
    # same int8 rounding of K/V on both paths -> tight tolerance
    np.testing.assert_allclose(np.asarray(pre[0]), dec, rtol=3e-3, atol=1e-2)


def test_engine_int8_kv_end_to_end(tiny_weights, tiny_tokenizer):
    c = tiny_weights.config
    params = params_from_raw(tiny_weights)
    fp = Engine(params, c, max_batch=2, precision="highest")
    q8 = Engine(params, c, max_batch=2, kv_dtype="int8", precision="highest")

    outs = []
    for engine in (fp, q8):
        b = ContinuousBatcher(engine)
        r = Request(prompt_tokens=tiny_tokenizer.encode("Once upon a time"),
                    steps=20, temperature=0.0, seed=1)
        b.submit(r)
        b.run()
        outs.append(r.out_tokens)
    fp_toks, q8_toks = outs
    assert len(q8_toks) > 0
    # int8 KV is an approximation — require a matching prefix, not identity
    n = min(len(fp_toks), len(q8_toks), 5)
    assert fp_toks[:n] == q8_toks[:n]


def test_int8_kv_xla_attention_matches_flash(tiny_weights):
    c = tiny_weights.config
    params = params_from_raw(tiny_weights)
    tokens = [1, 5, 17, 300]
    a, _ = run_decode_seq(params, c, make_kv_cache(c, 1, "int8"), tokens,
                          attn="flash")
    b, _ = run_decode_seq(params, c, make_kv_cache(c, 1, "int8"), tokens,
                          attn="xla")
    np.testing.assert_allclose(b, a, rtol=5e-3, atol=5e-3)
