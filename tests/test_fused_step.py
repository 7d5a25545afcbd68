"""ops/fused_step.py — the ONE-launch-per-layer merged decode kernel.

Parity contract: fused_step_layer(x, q, fresh-KV, cache, weights) must equal
the two-launch composition it replaces — flash_decode_attention_dma (cache
rows < pos + fresh row) -> quantize_activations -> fused_layer_linear — for
the real rows [:B].  Padding rows (B..Bp) are garbage in the merged kernel
(attention never fills them) and are confined row-wise, exactly like the
unfused path discards them.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_llama.config import ModelConfig
from tpu_llama.ops.attention import flash_decode_attention_dma, quantize_kv
from tpu_llama.ops.fused_layer import fused_layer_linear
from tpu_llama.ops.fused_step import _pick_step_blocks, fused_step_layer
from tpu_llama.ops.quant import quantize_activations, quantize_channel


def _stacked_channel_quant(key, L, IN, OUT):
    w = jax.random.normal(key, (L, IN, OUT), jnp.float32) * 0.05
    return quantize_channel(w)


def _make_case(seed, L, B, KVH, G, hd, H, S, pos_list):
    D = KVH * G * hd
    QO = D + 2 * KVH * hd
    keys = jax.random.split(jax.random.PRNGKey(seed), 12)
    wo = _stacked_channel_quant(keys[0], L, D, D)
    w13 = _stacked_channel_quant(keys[1], L, D, 2 * H)
    w2 = _stacked_channel_quant(keys[2], L, H, D)
    qkv = _stacked_channel_quant(keys[3], L, D, QO)
    rms_ffn = 1.0 + 0.1 * jax.random.normal(keys[4], (L, D), jnp.float32)
    rms_att = 1.0 + 0.1 * jax.random.normal(keys[5], (L, D), jnp.float32)
    Bp = 32
    x = jax.random.normal(keys[6], (Bp, D), jnp.float32)
    q = jax.random.normal(keys[7], (B, KVH, G, hd), jnp.float32)
    kc, ks = quantize_kv(
        jax.random.normal(keys[8], (L, B, KVH, S, hd), jnp.float32))
    vc, vs = quantize_kv(
        jax.random.normal(keys[9], (L, B, KVH, S, hd), jnp.float32))
    nk, nks = quantize_kv(
        jax.random.normal(keys[10], (B, KVH, hd), jnp.float32))
    nv, nvs = quantize_kv(
        jax.random.normal(keys[11], (B, KVH, hd), jnp.float32))
    pos = jnp.asarray(pos_list, jnp.int32)
    return dict(L=L, B=B, Bp=Bp, D=D, QO=QO, H=H, G=G, x=x, q=q,
                kc=kc, ks=ks, vc=vc, vs=vs, nk=nk, nks=nks, nv=nv, nvs=nvs,
                pos=pos, wo=wo, w13=w13, w2=w2, qkv=qkv,
                rms_ffn=rms_ffn, rms_att=rms_att)


def _composed(c, l):
    """The two-launch path the merged kernel replaces."""
    att = flash_decode_attention_dma(
        c["q"], c["kc"], c["vc"], c["pos"], c["nk"], c["nv"],
        c["ks"], c["vs"], c["nks"], c["nvs"], layer=jnp.int32(l))
    att2 = att.reshape(c["B"], c["D"]).astype(jnp.float32)
    att2 = jnp.pad(att2, ((0, c["Bp"] - c["B"]), (0, 0)))
    attq, satt = quantize_activations(att2)
    return fused_layer_linear(
        c["x"], attq, satt,
        c["wo"].q, c["wo"].s, c["w13"].q, c["w13"].s,
        c["w2"].q, c["w2"].s, c["qkv"].q, c["qkv"].s,
        c["rms_ffn"], c["rms_att"], jnp.int32(l), c["L"])


def _merged(c, l):
    return fused_step_layer(
        c["x"], c["q"], c["nk"], c["nv"], c["nks"], c["nvs"],
        c["kc"], c["vc"], c["ks"], c["vs"], c["pos"],
        c["wo"].q, c["wo"].s, c["w13"].q, c["w13"].s,
        c["w2"].q, c["w2"].s, c["qkv"].q, c["qkv"].s,
        c["rms_ffn"], c["rms_att"], jnp.int32(l), c["L"])


@pytest.mark.parametrize("l", [0, 1, 2])
def test_merged_matches_composed(l):
    c = _make_case(11, L=3, B=2, KVH=2, G=1, hd=128, H=384, S=64,
                   pos_list=[5, 33])
    x_ref, qkv_ref = _composed(c, l)
    x_got, qkv_got = _merged(c, l)
    B = c["B"]
    np.testing.assert_allclose(np.asarray(x_got)[:B], np.asarray(x_ref)[:B],
                               rtol=2e-4, atol=2e-4)
    if l + 1 < c["L"]:
        np.testing.assert_allclose(np.asarray(qkv_got)[:B],
                                   np.asarray(qkv_ref)[:B],
                                   rtol=2e-4, atol=2e-4)


def test_merged_gqa():
    c = _make_case(12, L=2, B=3, KVH=1, G=2, hd=128, H=256, S=32,
                   pos_list=[0, 7, 31])
    x_ref, qkv_ref = _composed(c, 0)
    x_got, qkv_got = _merged(c, 0)
    B = c["B"]
    np.testing.assert_allclose(np.asarray(x_got)[:B], np.asarray(x_ref)[:B],
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(qkv_got)[:B],
                               np.asarray(qkv_ref)[:B],
                               rtol=2e-4, atol=2e-4)


def test_merged_pos_zero_reads_only_fresh_row():
    """pos=0: no cache blocks are DMA'd; poisoning the cache must not change
    the output (the fresh row is the whole softmax)."""
    c = _make_case(13, L=2, B=2, KVH=2, G=1, hd=128, H=256, S=32,
                   pos_list=[0, 0])
    x0, _ = _merged(c, 0)
    poisoned = dict(c)
    poisoned["kc"] = jnp.full_like(c["kc"], 127)
    poisoned["vc"] = jnp.full_like(c["vc"], 127)
    poisoned["ks"] = jnp.full_like(c["ks"], 1e9)
    poisoned["vs"] = jnp.full_like(c["vs"], 1e9)
    x1, _ = _merged(poisoned, 0)
    np.testing.assert_allclose(np.asarray(x0)[:2], np.asarray(x1)[:2],
                               rtol=1e-6, atol=1e-6)


def test_pick_step_tiling_headline_shapes():
    """7B and 13B must be VMEM-feasible at the headline batch (TS drops to
    64 to make room for the weight streams); 70B falls back (w2's minimum
    block alone busts the budget, same as the fused linear kernel)."""
    from tpu_llama.ops.fused_step import _pick_step_tiling

    t7 = _pick_step_tiling(32, 4096, 11008, 12288, 32, 1, 128, 2048)
    assert t7 is not None and t7[0] in (64, 128)
    # 13B's h2 scratch (32 x 13824 f32) + rings + minimum weight streams
    # exceed the budget even at TS=32 — it stays on the two-launch path
    assert _pick_step_tiling(32, 5120, 13824, 15360, 40, 1, 128, 2048) is None
    assert _pick_step_tiling(32, 8192, 28672, 10240, 8, 8, 128, 2048) is None


# ---------------------------------------------------------------------------
# end-to-end: forward_decode(fused="mega") vs the unfused path
# ---------------------------------------------------------------------------


def _tiny_config(**kw):
    base = dict(dim=256, hidden_dim=256, n_layers=3, n_heads=2,
                n_kv_heads=2, vocab_size=64, seq_len=64)
    base.update(kw)
    return ModelConfig(**base)


def _fused_model(config):
    from tpu_llama.models import random_params
    from tpu_llama.models.llama import fuse_projections, quantize_params

    params = random_params(config, dtype=jnp.float32, seed=3)
    return quantize_params(fuse_projections(params), mode="w8a8")


def test_forward_decode_mega_matches_unfused():
    from tpu_llama.models import make_kv_cache
    from tpu_llama.models.llama import (
        _mega_path_ok,
        forward_decode,
        forward_prefill,
    )

    config = _tiny_config()  # hd = 128
    params = _fused_model(config)
    B = 2
    tokens = jnp.array([3, 5], jnp.int32)
    pos = jnp.array([4, 9], jnp.int32)

    def run(fused, attn="flash"):
        cache = make_kv_cache(config, batch=B, kv_dtype="int8")
        assert _mega_path_ok(params, config, cache, B)
        warm = jnp.tile(jnp.arange(10, dtype=jnp.int32)[None], (B, 1))
        _, cache = forward_prefill(params, cache, warm,
                                   jnp.zeros((B,), jnp.int32),
                                   jnp.array([4, 9], jnp.int32), config)
        return forward_decode(params, cache, tokens, pos, config,
                              attn=attn, fused=fused)

    logits_m, cache_m = run("mega")
    # two-launch fused with the SAME blocked DMA attention: identical
    # accumulation order, so the comparison is tight
    logits_f, cache_f = run(True, attn="flash_dma")
    logits_u, cache_u = run(False)
    np.testing.assert_allclose(np.asarray(logits_m), np.asarray(logits_f),
                               rtol=5e-3, atol=5e-3)
    # vs the unfused path only gross errors: int8 requant boundaries flip
    # discretely under f32 accumulation-order differences
    np.testing.assert_allclose(np.asarray(logits_m), np.asarray(logits_u),
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(cache_m.k), np.asarray(cache_f.k),
                               atol=1)


def test_forward_decode_mega_gqa_matches_unfused():
    from tpu_llama.models import make_kv_cache
    from tpu_llama.models.llama import forward_decode, forward_prefill

    config = _tiny_config(n_heads=4, n_kv_heads=2, dim=512,
                          hidden_dim=384)  # hd=128, G=2
    params = _fused_model(config)
    B = 2
    tokens = jnp.array([3, 5], jnp.int32)
    pos = jnp.array([4, 9], jnp.int32)

    def run(fused, attn="flash"):
        cache = make_kv_cache(config, batch=B, kv_dtype="int8")
        warm = jnp.tile(jnp.arange(10, dtype=jnp.int32)[None], (B, 1))
        _, cache = forward_prefill(params, cache, warm,
                                   jnp.zeros((B,), jnp.int32),
                                   jnp.array([4, 9], jnp.int32), config)
        return forward_decode(params, cache, tokens, pos, config,
                              attn=attn, fused=fused)[0]

    np.testing.assert_allclose(np.asarray(run("mega")),
                               np.asarray(run(True, attn="flash_dma")),
                               rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(run("mega")),
                               np.asarray(run(False)),
                               rtol=2e-2, atol=2e-2)


def test_mega_path_ok_gates():
    from tpu_llama.models import make_kv_cache
    from tpu_llama.models.llama import _mega_path_ok

    config = _tiny_config()
    params = _fused_model(config)
    dense = make_kv_cache(config, batch=2, kv_dtype="int8")
    assert _mega_path_ok(params, config, dense, 2)
    # fp cache: no
    fp = make_kv_cache(config, batch=2, kv_dtype="float32")
    assert not _mega_path_ok(params, config, fp, 2)
    # hd 64: no (lane writes need 128)
    c64 = _tiny_config(dim=128)
    p64 = _fused_model(c64)
    d64 = make_kv_cache(c64, batch=2, kv_dtype="int8")
    assert not _mega_path_ok(p64, c64, d64, 2)
    # paged: no
    paged = make_kv_cache(config, batch=2, kv_dtype="int8", seq_len=64,
                          paged=True, num_pages=5, page_size=32)
    assert not _mega_path_ok(params, config, paged, 2)
