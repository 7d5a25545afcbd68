"""JAX model parity tests against the float64 oracle.

The oracle (tests/test_oracle.py validates it independently) is the golden
reference; the jitted batched model must agree with it to fp32 tolerance and,
critically, produce identical argmax decisions (the actual compatibility
contract) on every step.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_llama.compat.oracle import OracleState, oracle_forward
from tpu_llama.models import KVCache, forward_decode, forward_prefill, params_from_raw


def oracle_logits_for_sequence(weights, tokens):
    c = weights.config
    s = OracleState.create(c)
    return np.stack(
        [oracle_forward(t, p, c, s, weights).copy() for p, t in enumerate(tokens)]
    )


@pytest.mark.parametrize("weights_fixture", ["tiny_weights", "tiny_gqa_weights"])
def test_decode_matches_oracle(request, weights_fixture):
    w = request.getfixturevalue(weights_fixture)
    c = w.config
    tokens = [1, 5, 17, 300, 42, 7, 123]
    want = oracle_logits_for_sequence(w, tokens)

    params = params_from_raw(w)
    cache = KVCache.create(c, batch=1)
    for p, t in enumerate(tokens):
        logits, cache = forward_decode(
            params, cache,
            jnp.array([t], jnp.int32), jnp.array([p], jnp.int32), c,
        )
        got = np.asarray(logits[0])
        np.testing.assert_allclose(got, want[p], rtol=2e-4, atol=2e-5,
                                   err_msg=f"pos={p}")
        assert int(np.argmax(got)) == int(np.argmax(want[p])), f"argmax@{p}"


def test_prefill_matches_decode(tiny_weights):
    """Batched prefill logits must equal sequential decode logits."""
    c = tiny_weights.config
    tokens = [1, 5, 17, 300, 42, 7]
    params = params_from_raw(tiny_weights)

    cache = KVCache.create(c, batch=1)
    dec = []
    for p, t in enumerate(tokens):
        logits, cache = forward_decode(
            params, cache, jnp.array([t], jnp.int32), jnp.array([p], jnp.int32), c)
        dec.append(np.asarray(logits[0]))

    cache2 = KVCache.create(c, batch=1)
    pre, cache2 = forward_prefill(
        params, cache2,
        jnp.array([tokens], jnp.int32),
        start_pos=jnp.array([0], jnp.int32),
        lengths=jnp.array([len(tokens)], jnp.int32),
        config=c,
    )
    np.testing.assert_allclose(np.asarray(pre[0]), np.stack(dec),
                               rtol=1e-4, atol=1e-5)
    # caches agree on the written region
    np.testing.assert_allclose(
        np.asarray(cache.k[:, :, :, : len(tokens)]),
        np.asarray(cache2.k[:, :, :, : len(tokens)]), rtol=1e-5, atol=1e-6)


def test_prefill_then_decode_continuation(tiny_weights):
    """prefill(prompt) then decode must equal pure sequential decode."""
    c = tiny_weights.config
    prompt = [1, 5, 17, 300]
    extra = [42, 7]
    params = params_from_raw(tiny_weights)

    want = oracle_logits_for_sequence(tiny_weights, prompt + extra)

    cache = KVCache.create(c, batch=1)
    _, cache = forward_prefill(
        params, cache, jnp.array([prompt], jnp.int32),
        jnp.array([0], jnp.int32), jnp.array([len(prompt)], jnp.int32), c)
    for i, t in enumerate(extra):
        p = len(prompt) + i
        logits, cache = forward_decode(
            params, cache, jnp.array([t], jnp.int32), jnp.array([p], jnp.int32), c)
        np.testing.assert_allclose(np.asarray(logits[0]), want[p],
                                   rtol=2e-4, atol=2e-5)


def test_batched_rows_independent(tiny_weights):
    """Rows of a batch must not leak into each other, including with
    different positions per row (continuous batching)."""
    c = tiny_weights.config
    params = params_from_raw(tiny_weights)

    # row 0: sequence [1, 5]; row 1: sequence [9, 250, 33]
    cache = KVCache.create(c, batch=2)
    logits, cache = forward_decode(
        params, cache, jnp.array([1, 9], jnp.int32), jnp.array([0, 0], jnp.int32), c)
    logits, cache = forward_decode(
        params, cache, jnp.array([5, 250], jnp.int32), jnp.array([1, 1], jnp.int32), c)
    logits, cache = forward_decode(
        params, cache, jnp.array([5, 33], jnp.int32), jnp.array([1, 2], jnp.int32), c)
    # compare row 1 against a batch-1 run of the same sequence
    cache1 = KVCache.create(c, batch=1)
    for p, t in enumerate([9, 250, 33]):
        solo, cache1 = forward_decode(
            params, cache1, jnp.array([t], jnp.int32), jnp.array([p], jnp.int32), c)
    np.testing.assert_allclose(np.asarray(logits[1]), np.asarray(solo[0]),
                               rtol=1e-5, atol=1e-6)


def test_prefill_padding_is_harmless(tiny_weights):
    """Padded prefill rows produce the same logits/caches as exact-length."""
    c = tiny_weights.config
    params = params_from_raw(tiny_weights)
    prompt = [1, 5, 17]

    cache_a = KVCache.create(c, batch=1)
    la, cache_a = forward_prefill(
        params, cache_a, jnp.array([prompt], jnp.int32),
        jnp.array([0], jnp.int32), jnp.array([3], jnp.int32), c)

    padded = prompt + [0, 0, 0]
    cache_b = KVCache.create(c, batch=1)
    lb, cache_b = forward_prefill(
        params, cache_b, jnp.array([padded], jnp.int32),
        jnp.array([0], jnp.int32), jnp.array([3], jnp.int32), c)

    np.testing.assert_allclose(np.asarray(la[0]), np.asarray(lb[0, :3]),
                               rtol=1e-5, atol=1e-6)
    # continuing decode after padded prefill matches oracle
    want = oracle_logits_for_sequence(tiny_weights, prompt + [42])
    logits, _ = forward_decode(
        params, cache_b, jnp.array([42], jnp.int32), jnp.array([3], jnp.int32), c)
    np.testing.assert_allclose(np.asarray(logits[0]), want[3], rtol=2e-4, atol=2e-5)


def test_decode_jit_cache_stable(tiny_weights):
    """Repeated decode calls at different pos must not retrace (static parts
    are config/precision only)."""
    c = tiny_weights.config
    params = params_from_raw(tiny_weights)
    cache = KVCache.create(c, batch=2)
    fn = forward_decode
    n0 = fn._cache_size() if hasattr(fn, "_cache_size") else None
    for p in range(4):
        _, cache = fn(params, cache, jnp.array([1, 2], jnp.int32),
                      jnp.full((2,), p, jnp.int32), c)
    if n0 is not None:
        assert fn._cache_size() <= (n0 or 0) + 1


def test_greedy_decode_loop_matches_sequential(tiny_weights):
    from tpu_llama.models.llama import greedy_decode_loop

    c = tiny_weights.config
    params = params_from_raw(tiny_weights)

    cache = KVCache.create(c, batch=2)
    first = jnp.array([5, 9], jnp.int32)
    out, _ = greedy_decode_loop(
        params, cache, first, jnp.zeros(2, jnp.int32), 6, c,
        precision="highest")
    assert out.shape == (2, 6)

    # sequential reference
    cache2 = KVCache.create(c, batch=2)
    toks = first
    seq = []
    for p in range(6):
        logits, cache2 = forward_decode(
            params, cache2, toks, jnp.full((2,), p, jnp.int32), c,
            precision="highest")
        toks = jnp.argmax(logits, -1).astype(jnp.int32)
        seq.append(np.asarray(toks))
    np.testing.assert_array_equal(np.asarray(out), np.stack(seq, 1))


def test_fused_projections_match(tiny_weights):
    from tpu_llama.models.llama import fuse_projections, quantize_params

    c = tiny_weights.config
    params = params_from_raw(tiny_weights)
    fused = fuse_projections(params)
    assert fused.layers.wq.shape[-1] == c.dim + 2 * c.kv_dim
    assert fused.layers.w1.shape[-1] == 2 * c.hidden_dim

    toks = jnp.array([5], jnp.int32)
    cache_a = KVCache.create(c, 1)
    cache_b = KVCache.create(c, 1)
    for p in range(3):
        pp = jnp.array([p], jnp.int32)
        la, cache_a = forward_decode(params, cache_a, toks, pp, c,
                                     precision="highest")
        lb, cache_b = forward_decode(fused, cache_b, toks, pp, c,
                                     precision="highest")
        # different matmul tiling reorders f32 accumulation slightly
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   rtol=1e-5, atol=1e-5)

    # fused + quantized composes
    qf = quantize_params(fused)
    cache_c = KVCache.create(c, 1)
    lc, _ = forward_decode(qf, cache_c, toks, jnp.array([0], jnp.int32), c)
    assert np.isfinite(np.asarray(lc)).all()


def test_chunked_prefill_matches_oneshot(tiny_weights):
    from tpu_llama.models.llama import forward_prefill_chunked

    c = tiny_weights.config
    params = params_from_raw(tiny_weights)
    B, T = 2, 32
    rng = np.random.default_rng(7)
    tokens = jnp.asarray(rng.integers(2, c.vocab_size, (B, T)), jnp.int32)
    lengths = jnp.array([T, 19], jnp.int32)  # one padded row

    ref, ref_cache = forward_prefill(
        params, KVCache.create(c, B), tokens, jnp.zeros(B, jnp.int32),
        lengths, c, precision="highest", logits_mode="last")

    got, got_cache = forward_prefill_chunked(
        params, KVCache.create(c, B), tokens, lengths, c,
        precision="highest", chunk=8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)
    # caches identical on valid region of each row
    for b, ln in enumerate([T, 19]):
        np.testing.assert_allclose(
            np.asarray(got_cache.k[:, b, :, :ln]),
            np.asarray(ref_cache.k[:, b, :, :ln]), rtol=1e-5, atol=1e-6)

    # the UNROLLED form (the r5-toolchain replacement for the lax.scan
    # chunk loop on TPU — see forward_prefill_chunked_unrolled docstring)
    # is numerically identical to the scan form
    from tpu_llama.models.llama import forward_prefill_chunked_unrolled

    got_u, got_ucache = forward_prefill_chunked_unrolled(
        params, KVCache.create(c, B), tokens, lengths, c,
        precision="highest", chunk=8)
    np.testing.assert_allclose(np.asarray(got_u), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)
    for b, ln in enumerate([T, 19]):
        np.testing.assert_allclose(
            np.asarray(got_ucache.k[:, b, :, :ln]),
            np.asarray(ref_cache.k[:, b, :, :ln]), rtol=1e-5, atol=1e-6)


def test_prefill_flash_matches_xla(tiny_weights):
    c = tiny_weights.config
    params = params_from_raw(tiny_weights)
    tokens = jnp.array([[1, 5, 17, 300, 42, 7, 9, 2]], jnp.int32)
    kw = dict(start_pos=jnp.zeros(1, jnp.int32),
              lengths=jnp.array([8], jnp.int32), config=c, precision="highest")
    ref, rc = forward_prefill(params, KVCache.create(c, 1), tokens,
                              attn="xla", **kw)
    got, gc = forward_prefill(params, KVCache.create(c, 1), tokens,
                              attn="flash", **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=5e-5)
    # later layers' K depends on earlier layers' attention outputs, so the
    # cache inherits the fp32 path difference
    np.testing.assert_allclose(np.asarray(gc.k), np.asarray(rc.k),
                               rtol=1e-4, atol=1e-5)


def test_decode_carry_flash_matches_xla_fp32(tiny_weights):
    """attn='flash' decode (cache-in-carry + layer-aware Pallas kernels) vs
    the XLA einsum fallback — same tokens over a greedy rollout."""
    import jax.numpy as jnp

    from tpu_llama.models import params_from_raw
    from tpu_llama.models.llama import greedy_decode_loop, make_kv_cache

    c = tiny_weights.config
    params = params_from_raw(tiny_weights)
    toks = jnp.array([3, 7], jnp.int32)
    pos = jnp.zeros((2,), jnp.int32)
    out_x, _ = greedy_decode_loop(params, make_kv_cache(c, 2), toks, pos, 8,
                                  c, precision="highest", attn="xla")
    out_f, _ = greedy_decode_loop(params, make_kv_cache(c, 2), toks, pos, 8,
                                  c, precision="highest", attn="flash")
    assert np.array_equal(np.asarray(out_x), np.asarray(out_f))


def test_decode_carry_flash_matches_xla_int8kv(tiny_weights):
    import jax.numpy as jnp

    from tpu_llama.models import params_from_raw
    from tpu_llama.models.llama import greedy_decode_loop, make_kv_cache

    c = tiny_weights.config
    params = params_from_raw(tiny_weights)
    toks = jnp.array([3, 7], jnp.int32)
    pos = jnp.zeros((2,), jnp.int32)
    out_x, _ = greedy_decode_loop(params, make_kv_cache(c, 2, kv_dtype="int8"),
                                  toks, pos, 8, c, precision="highest",
                                  attn="xla")
    out_f, _ = greedy_decode_loop(params, make_kv_cache(c, 2, kv_dtype="int8"),
                                  toks, pos, 8, c, precision="highest",
                                  attn="flash")
    assert np.array_equal(np.asarray(out_x), np.asarray(out_f))


def test_prefill_assume_fresh_matches(tiny_weights):
    """The fresh fast path (cache out of the layer loop) must match the
    general prefill bit-for-bit-ish on fp and int8 caches."""
    import jax.numpy as jnp

    from tpu_llama.models import forward_prefill, make_kv_cache
    from tpu_llama.models import params_from_raw

    c = tiny_weights.config
    params = params_from_raw(tiny_weights)
    B, T = 2, 8
    toks = (jnp.arange(B * T, dtype=jnp.int32) % 40).reshape(B, T) + 1
    start = jnp.zeros((B,), jnp.int32)
    lengths = jnp.array([T, T - 2], jnp.int32)

    for kv in (None, "int8"):
        for mode in ("last", "all"):
            ref, ref_cache = forward_prefill(
                params, make_kv_cache(c, B, kv), toks, start, lengths, c,
                precision="highest", logits_mode=mode)
            got, got_cache = forward_prefill(
                params, make_kv_cache(c, B, kv), toks, start, lengths, c,
                precision="highest", logits_mode=mode, assume_fresh=True)
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       rtol=1e-5, atol=1e-6, err_msg=f"{kv} {mode}")
            np.testing.assert_allclose(
                np.asarray(got_cache.k), np.asarray(ref_cache.k),
                rtol=1e-5, atol=1e-6, err_msg=f"{kv} {mode} cache")


def test_chunked_prefill_carry_matches_flash_reference():
    """forward_prefill_chunked_carry (cache in the layer-scan CARRY +
    aliased Pallas chunk writes — the r5 b32-dense TTFT path) is
    bit-identical to host-dispatched forward_prefill chunks through the
    same fused W8A8 stages (attn=flash)."""
    import dataclasses

    from tpu_llama.config import STORIES110M
    from tpu_llama.models import make_kv_cache, random_params
    from tpu_llama.models.llama import (_prefill_chunked_carry_ok,
                                        forward_prefill,
                                        forward_prefill_chunked_carry,
                                        fuse_projections, quantize_params)

    cfg = dataclasses.replace(STORIES110M, n_layers=3, seq_len=512, dim=768,
                              n_heads=6, n_kv_heads=6)  # head_dim 128
    params = quantize_params(
        fuse_projections(random_params(cfg, dtype=jnp.bfloat16, seed=0)),
        mode="w8a8")
    B, T, chunk = 2, 256, 128
    tokens = jax.random.randint(jax.random.PRNGKey(1), (B, T), 0,
                                cfg.vocab_size)
    lengths = jnp.array([256, 131], jnp.int32)

    c1 = make_kv_cache(cfg, batch=B, kv_dtype="int8", seq_len=512)
    l1 = None
    for i in range(T // chunk):
        tok_c = tokens[:, i * chunk:(i + 1) * chunk]
        start = jnp.full((B,), i * chunk, jnp.int32)
        len_c = jnp.clip(lengths - i * chunk, 1, chunk)
        li, c1 = forward_prefill(params, c1, tok_c, start, len_c, cfg,
                                 precision="default", logits_mode="last",
                                 attn="flash", max_keys=T)
        owner = (lengths - 1) // chunk == i
        l1 = li if l1 is None else jnp.where(owner[:, None], li, l1)

    c2 = make_kv_cache(cfg, batch=B, kv_dtype="int8", seq_len=512)
    assert _prefill_chunked_carry_ok(params, cfg, c2, B, chunk)
    l2, c2 = forward_prefill_chunked_carry(params, c2, tokens, lengths, cfg,
                                           precision="default", chunk=chunk)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-5,
                               atol=1e-5)
    for b, ln in enumerate([256, 131]):
        np.testing.assert_array_equal(np.asarray(c1.k[:, b, :, :ln]),
                                      np.asarray(c2.k[:, b, :, :ln]))
        np.testing.assert_allclose(np.asarray(c1.ks[:, b, :, :ln]),
                                   np.asarray(c2.ks[:, b, :, :ln]),
                                   rtol=1e-6, atol=0)
