"""Explicit shard_map TP decode vs single-device reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_llama.models import (
    forward_decode,
    make_kv_cache,
    params_from_raw,
    quantize_params,
)
from tpu_llama.parallel import MeshConfig, make_mesh, shard_cache, shard_params
from tpu_llama.parallel.tp import tp_forward_decode


@pytest.fixture(scope="module")
def eight_devices():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return jax.devices()


@pytest.mark.parametrize("dp,tp", [(1, 2), (1, 4), (2, 2)])
def test_tp_decode_matches_single_device(tiny_weights, eight_devices, dp, tp):
    c = tiny_weights.config
    params = params_from_raw(tiny_weights)
    B = 2 * dp

    toks = jnp.arange(B, dtype=jnp.int32) + 5
    ref = []
    cache = make_kv_cache(c, B)
    for p in range(3):
        logits, cache = forward_decode(params, cache, toks + p,
                                       jnp.full((B,), p, jnp.int32), c,
                                       precision="highest")
        ref.append(np.asarray(logits))

    mesh = make_mesh(MeshConfig(dp, tp))
    sp = shard_params(params, mesh)
    sc = shard_cache(make_kv_cache(c, B), mesh)
    got = []
    for p in range(3):
        logits, sc = tp_forward_decode(sp, sc, toks + p,
                                       jnp.full((B,), p, jnp.int32), c, mesh,
                                       precision="highest")
        got.append(np.asarray(logits))

    for r, g in zip(ref, got):
        np.testing.assert_allclose(g, r, rtol=1e-5, atol=1e-5)


def test_tp_decode_int8_weights(eight_devices):
    # alignment-clean config: no quantization padding (like real Llama dims)
    from tpu_llama.config import ModelConfig
    from tpu_llama.io.checkpoint import make_random_weights

    # local (per-shard) in-dims must stay kernel-aligned too: dim/tp >= 128
    c = ModelConfig(dim=256, hidden_dim=512, n_layers=2, n_heads=2,
                    n_kv_heads=2, vocab_size=256, seq_len=32)
    w = make_random_weights(c, seed=3)
    qparams = quantize_params(params_from_raw(w), group_size=16)
    B = 2

    toks = jnp.array([5, 9], jnp.int32)
    cache = make_kv_cache(c, B)
    ref, _ = forward_decode(qparams, cache, toks, jnp.zeros(B, jnp.int32), c,
                            precision="highest")

    mesh = make_mesh(MeshConfig(1, 2))
    sp = shard_params(qparams, mesh)
    sc = shard_cache(make_kv_cache(c, B), mesh)
    got, _ = tp_forward_decode(sp, sc, toks, jnp.zeros(B, jnp.int32), c, mesh,
                               precision="highest")
    # int8 kernel partial sums split across shards round differently in bf16
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-3, atol=1e-2)
    assert np.array_equal(np.argmax(np.asarray(got), -1),
                          np.argmax(np.asarray(ref), -1))


def test_tp_rejects_padded_quant(tiny_weights, eight_devices):
    c = tiny_weights.config  # dim 48 -> quantization pads
    qparams = quantize_params(params_from_raw(tiny_weights))
    mesh = make_mesh(MeshConfig(1, 2))
    sp = shard_params(qparams, mesh)
    sc = shard_cache(make_kv_cache(c, 2), mesh)
    with pytest.raises(ValueError, match="padding-free"):
        tp_forward_decode(sp, sc, jnp.array([5, 9], jnp.int32),
                          jnp.zeros(2, jnp.int32), c, mesh)


def test_tp_decode_int8_kv(tiny_weights, eight_devices):
    c = tiny_weights.config
    params = params_from_raw(tiny_weights)
    B = 2
    toks = jnp.array([5, 9], jnp.int32)
    ref, _ = forward_decode(params, make_kv_cache(c, B, "int8"), toks,
                            jnp.zeros(B, jnp.int32), c, precision="highest")

    mesh = make_mesh(MeshConfig(1, 2))
    sp = shard_params(params, mesh)
    sc = shard_cache(make_kv_cache(c, B, "int8"), mesh)
    got, sc2 = tp_forward_decode(sp, sc, toks, jnp.zeros(B, jnp.int32), c,
                                 mesh, precision="highest")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
    assert sc2.k.dtype == jnp.int8


def test_tp_overlap_matches_psum(tiny_weights, eight_devices):
    """Ring-overlapped collective matmul == psum path numerically."""
    c = tiny_weights.config
    params = params_from_raw(tiny_weights)
    B = 2
    toks = jnp.array([5, 9], jnp.int32)

    mesh = make_mesh(MeshConfig(1, 4))
    sp = shard_params(params, mesh)
    outs = []
    for overlap in (False, True):
        sc = shard_cache(make_kv_cache(c, B), mesh)
        seq = []
        t = toks
        for p in range(3):
            logits, sc = tp_forward_decode(
                sp, sc, t, jnp.full((B,), p, jnp.int32), c, mesh,
                precision="highest", overlap=overlap)
            seq.append(np.asarray(logits))
            t = jnp.argmax(jnp.asarray(logits), -1).astype(jnp.int32)
        outs.append(seq)
    for a, b in zip(*outs):
        np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("quant", [None, "w8a8"])
def test_tp_decode_fused_projections(eight_devices, quant):
    """Shard-interleaved fused qkv/w13 (fuse_projections(tp=...)) through
    the explicit-TP path == unfused single-device reference."""
    from tpu_llama.config import ModelConfig
    from tpu_llama.io.checkpoint import make_random_weights
    from tpu_llama.models.llama import fuse_projections

    c = ModelConfig(dim=256, hidden_dim=512, n_layers=2, n_heads=2,
                    n_kv_heads=2, vocab_size=256, seq_len=32)
    w = make_random_weights(c, seed=7)
    params = params_from_raw(w)
    B = 2
    toks = jnp.array([5, 9], jnp.int32)

    tp = 2
    mesh = make_mesh(MeshConfig(1, tp))
    if quant is None:
        # fp weights: fused TP must match the single-device forward tightly
        ref, _ = forward_decode(params, make_kv_cache(c, B), toks,
                                jnp.zeros(B, jnp.int32), c,
                                precision="highest")
        tol = dict(rtol=1e-5, atol=1e-5)
    else:
        # w8a8 TP quantizes the FFN activations per shard (local row max),
        # a semantic difference from single-device — so isolate the FUSION
        # layout by comparing against the unfused TP path instead
        qp = quantize_params(params, mode=quant)
        sp0 = shard_params(qp, mesh)
        sc0 = shard_cache(make_kv_cache(c, B), mesh)
        ref, _ = tp_forward_decode(sp0, sc0, toks, jnp.zeros(B, jnp.int32),
                                   c, mesh, precision="highest")
        ref = np.asarray(ref)
        tol = dict(rtol=1e-5, atol=1e-5)

    fused = fuse_projections(params, tp=tp)
    if quant is not None:
        fused = quantize_params(fused, mode=quant)
    sp = shard_params(fused, mesh)
    sc = shard_cache(make_kv_cache(c, B), mesh)
    got, _ = tp_forward_decode(sp, sc, toks, jnp.zeros(B, jnp.int32), c,
                               mesh, precision="highest")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), **tol)
    assert np.array_equal(np.argmax(np.asarray(got), -1),
                          np.argmax(np.asarray(ref), -1))


@pytest.mark.parametrize("kv", [None, "int8"])
def test_tp_fused_kernel_path_matches_unfused(eight_devices, kv):
    """tp_forward_decode_fused (3 fused launches + 2 psums per layer,
    VERDICT r2 #3) == the unfused explicit-TP path, greedy tokens equal."""
    from tpu_llama.config import ModelConfig
    from tpu_llama.io.checkpoint import make_random_weights
    from tpu_llama.models.llama import fuse_projections
    from tpu_llama.parallel.tp import tp_forward_decode_fused

    c = ModelConfig(dim=256, hidden_dim=512, n_layers=2, n_heads=2,
                    n_kv_heads=2, vocab_size=256, seq_len=32)
    w = make_random_weights(c, seed=11)
    params = params_from_raw(w)
    B = 2
    toks = jnp.array([5, 9], jnp.int32)
    tp = 2
    mesh = make_mesh(MeshConfig(1, tp))

    fused = quantize_params(fuse_projections(params, tp=tp), mode="w8a8")
    sp = shard_params(fused, mesh)

    def roll(fn, **kw):
        sc = shard_cache(make_kv_cache(c, B, kv), mesh)
        t, out = toks, []
        for p in range(3):
            logits, sc = fn(sp, sc, t, jnp.full((B,), p, jnp.int32), c,
                            mesh, **kw)
            out.append(np.asarray(logits))
            t = jnp.argmax(jnp.asarray(logits), -1).astype(jnp.int32)
        return out

    ref = roll(tp_forward_decode, precision="highest")
    got = roll(tp_forward_decode_fused)
    tol = 2e-2 if kv is None else 8e-2  # int8 KV: the flash kernel's bf16
    # QK dots vs the unfused path's f32 dequant einsum add score rounding
    for r, g in zip(ref, got):
        # same quant formulas, different op order (in-kernel rms/quant);
        # int8-requant noise bounds the drift; greedy TOKENS must agree
        np.testing.assert_allclose(g, r, rtol=tol, atol=tol)
        assert np.array_equal(np.argmax(g, -1), np.argmax(r, -1))


@pytest.mark.parametrize("fused_tp", [False, True])
def test_tp_prefill_matches_single_device(eight_devices, fused_tp):
    """Explicit-TP prefill == single-device forward_prefill (fp weights),
    including the shard-interleaved fused layouts GSPMD cannot split."""
    from tpu_llama.config import ModelConfig
    from tpu_llama.io.checkpoint import make_random_weights
    from tpu_llama.models import forward_prefill
    from tpu_llama.models.llama import fuse_projections
    from tpu_llama.parallel.tp import tp_forward_prefill

    c = ModelConfig(dim=256, hidden_dim=512, n_layers=2, n_heads=2,
                    n_kv_heads=2, vocab_size=256, seq_len=32)
    w = make_random_weights(c, seed=13)
    params = params_from_raw(w)
    B, T = 2, 8
    toks = (jnp.arange(B * T, dtype=jnp.int32) % 250).reshape(B, T) + 1
    start = jnp.zeros((B,), jnp.int32)
    lengths = jnp.array([T, T - 3], jnp.int32)

    ref, ref_cache = forward_prefill(
        params, make_kv_cache(c, B), toks, start, lengths, c,
        precision="highest", logits_mode="last")

    tp = 2
    mesh = make_mesh(MeshConfig(1, tp))
    p = fuse_projections(params, tp=tp) if fused_tp else params
    sp = shard_params(p, mesh)
    sc = shard_cache(make_kv_cache(c, B), mesh)
    got, sc2 = tp_forward_prefill(sp, sc, toks, start, lengths, c, mesh,
                                  precision="highest", logits_mode="last")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    # the written cache must match row-for-row
    np.testing.assert_allclose(np.asarray(sc2.k), np.asarray(ref_cache.k),
                               rtol=1e-5, atol=1e-5)


def test_tp_prefill_then_fused_decode_roundtrip(eight_devices):
    """Serving shape: explicit-TP prefill fills the cache, then the fused
    TP decode continues from it — tokens match the single-device engine."""
    from tpu_llama.config import ModelConfig
    from tpu_llama.io.checkpoint import make_random_weights
    from tpu_llama.models.llama import fuse_projections
    from tpu_llama.parallel.tp import (
        tp_forward_decode_fused,
        tp_forward_prefill,
    )

    c = ModelConfig(dim=256, hidden_dim=512, n_layers=2, n_heads=2,
                    n_kv_heads=2, vocab_size=256, seq_len=32)
    w = make_random_weights(c, seed=17)
    params = params_from_raw(w)
    B, T = 2, 8
    toks = (jnp.arange(B * T, dtype=jnp.int32) % 250).reshape(B, T) + 1
    start = jnp.zeros((B,), jnp.int32)
    lengths = jnp.full((B,), T, jnp.int32)

    # Reference: explicit-TP prefill + UNFUSED explicit-TP decode on the
    # same tp-interleaved W8A8 params.  (Single-device is NOT the right
    # reference: W8A8 TP quantizes the attention output per shard-local
    # row absmax — an acknowledged semantic difference that flips
    # near-ties on random weights; see test_tp_decode_fused_projections.)
    tp = 2
    mesh = make_mesh(MeshConfig(1, tp))
    tp_params = quantize_params(fuse_projections(params, tp=tp), mode="w8a8")
    sp = shard_params(tp_params, mesh)

    def roll(decode_fn, **kw):
        sc = shard_cache(make_kv_cache(c, B, "int8"), mesh)
        logits, sc = tp_forward_prefill(sp, sc, toks, start, lengths, c,
                                        mesh, logits_mode="last")
        t = jnp.argmax(jnp.asarray(logits), -1).astype(jnp.int32)
        out = [np.asarray(t)]
        for p in range(3):
            logits, sc = decode_fn(sp, sc, t, lengths + p, c, mesh, **kw)
            t = jnp.argmax(jnp.asarray(logits), -1).astype(jnp.int32)
            out.append(np.asarray(t))
        return out

    ref_toks = roll(tp_forward_decode, precision="default")
    got_toks = roll(tp_forward_decode_fused)
    # greedy token streams must agree — the parity contract for the fused
    # kernels (same quant formulas, in-kernel op order)
    for r, g in zip(ref_toks, got_toks):
        np.testing.assert_array_equal(g, r)
