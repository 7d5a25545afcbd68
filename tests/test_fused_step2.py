"""ops/fused_step2.py — the trailing-attention one-launch decode kernel.

Parity contract: one mega2 launch for layer ``l`` must equal the two-launch
composition  fused_layer_linear(l)  ->  rope/quant in XLA  ->
flash_decode_attention_dma(l+1) -> quantize_activations — for the real rows
[:B].  The kernel's in-stream rope and fresh-row quant reproduce
apply_rope/quantize_kv's formulas; only instruction-level rounding may
differ, so comparisons use the same tolerances as tests/test_fused_step.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_llama.config import ModelConfig
from tpu_llama.ops.attention import flash_decode_attention_dma, quantize_kv
from tpu_llama.ops.fused_layer import fused_layer_linear
from tpu_llama.ops.fused_step2 import (
    decode_dma_descs,
    fused_step2_layer,
    rope_tables,
    step2_block_s,
)
from tpu_llama.ops.quant import quantize_activations, quantize_channel


def _stacked_channel_quant(key, L, IN, OUT):
    w = jax.random.normal(key, (L, IN, OUT), jnp.float32) * 0.05
    return quantize_channel(w)


def _apply_rope_interleaved(x, cos, sin):
    """f64-free reference: rotate interleaved (even, odd) pairs, matching
    models/llama.apply_rope for f32 inputs."""
    B, NH, hd = x.shape
    xr = x.reshape(B, NH, hd // 2, 2)
    x0, x1 = xr[..., 0], xr[..., 1]
    c = cos[:, None, :]
    s = sin[:, None, :]
    r0 = x0 * c - x1 * s
    r1 = x0 * s + x1 * c
    return jnp.stack([r0, r1], axis=-1).reshape(B, NH, hd)


def _make_case(seed, L, B, KVH, G, hd, H, S, pos_list):
    D = KVH * G * hd
    KVD = KVH * hd
    QO = D + 2 * KVD
    keys = jax.random.split(jax.random.PRNGKey(seed), 14)
    wo = _stacked_channel_quant(keys[0], L, D, D)
    w13 = _stacked_channel_quant(keys[1], L, D, 2 * H)
    w2 = _stacked_channel_quant(keys[2], L, H, D)
    qkv = _stacked_channel_quant(keys[3], L, D, QO)
    rms_ffn = 1.0 + 0.1 * jax.random.normal(keys[4], (L, D), jnp.float32)
    rms_att = 1.0 + 0.1 * jax.random.normal(keys[5], (L, D), jnp.float32)
    Bp = 32
    x = jax.random.normal(keys[6], (Bp, D), jnp.float32)
    attq = jax.random.randint(keys[7], (Bp, D), -127, 128, jnp.int8)
    satt = jnp.abs(jax.random.normal(keys[8], (Bp,), jnp.float32)) * 0.01
    kc, ks = quantize_kv(
        jax.random.normal(keys[9], (L, B, KVH, S, hd), jnp.float32))
    vc, vs = quantize_kv(
        jax.random.normal(keys[10], (L, B, KVH, S, hd), jnp.float32))
    cos = jnp.cos(jax.random.normal(keys[11], (B, hd // 2), jnp.float32))
    sin = jnp.sin(jax.random.normal(keys[12], (B, hd // 2), jnp.float32))
    pos = jnp.asarray(pos_list, jnp.int32)
    return dict(L=L, B=B, Bp=Bp, D=D, KVD=KVD, QO=QO, H=H, G=G, KVH=KVH,
                hd=hd, S=S, x=x, attq=attq, satt=satt, kc=kc, ks=ks, vc=vc,
                vs=vs, cos=cos, sin=sin, pos=pos, wo=wo, w13=w13, w2=w2,
                qkv=qkv, rms_ffn=rms_ffn, rms_att=rms_att)


def _composed(c, l):
    """Two-launch reference for one mega2 launch: layer l's linear phases,
    then layer l+1's attention through the standalone DMA kernel."""
    x_next, qkv_next = fused_layer_linear(
        c["x"], c["attq"], c["satt"],
        c["wo"].q, c["wo"].s, c["w13"].q, c["w13"].s,
        c["w2"].q, c["w2"].s, c["qkv"].q, c["qkv"].s,
        c["rms_ffn"], c["rms_att"], jnp.int32(l), c["L"])
    B, D, KVD = c["B"], c["D"], c["KVD"]
    NH, KVH, hd, G = c["KVH"] * c["G"], c["KVH"], c["hd"], c["G"]
    qb = qkv_next[:B]
    q = _apply_rope_interleaved(
        qb[:, :D].reshape(B, NH, hd), c["cos"], c["sin"])
    k = _apply_rope_interleaved(
        qb[:, D:D + KVD].reshape(B, KVH, hd), c["cos"], c["sin"])
    v = qb[:, D + KVD:].reshape(B, KVH, hd)
    kq, ksn = quantize_kv(k)
    vq, vsn = quantize_kv(v)
    l2 = min(l + 1, c["L"] - 1)
    att = flash_decode_attention_dma(
        q.reshape(B, KVH, G, hd), c["kc"], c["vc"], c["pos"], kq, vq,
        c["ks"], c["vs"], ksn, vsn, layer=jnp.int32(l2))
    att2 = att.reshape(B, D).astype(jnp.float32)
    att2 = jnp.pad(att2, ((0, c["Bp"] - B), (0, 0)))
    attq_n, satt_n = quantize_activations(att2)
    return x_next, attq_n, satt_n, kq, ksn, vq, vsn


def _merged(c, l):
    TS = step2_block_s(c["S"])
    base, dcell, doff, total = decode_dma_descs(c["pos"], c["B"], c["S"], TS)
    rc, rsa, rsb = rope_tables(c["cos"], c["sin"], c["Bp"])
    return fused_step2_layer(
        c["x"], c["attq"], c["satt"], c["kc"], c["vc"], c["ks"], c["vs"],
        c["pos"], rc, rsa, rsb, base, dcell, doff, total,
        c["wo"].q, c["wo"].s, c["w13"].q, c["w13"].s,
        c["w2"].q, c["w2"].s, c["qkv"].q, c["qkv"].s,
        c["rms_ffn"], c["rms_att"], jnp.int32(l), c["L"],
        c["KVH"] * c["G"])


# NOTE r3: mega2 stages h2/q_sc in bf16 (funds TOD growth + a deeper KV
# DMA ring, NEXT.md #1); downstream comparisons against the f32-staging
# composed path are therefore bounded by int8-REQUANT noise (~1e-2 on O(1)
# activations), not f32 ulp.  Tolerances below are calibrated to that.
@pytest.mark.parametrize("l", [0, 1])
def test_mega2_matches_composed(l):
    c = _make_case(21, L=3, B=2, KVH=2, G=1, hd=128, H=384, S=64,
                   pos_list=[5, 33])
    x_ref, attq_ref, satt_ref, kq_ref, ks_ref, vq_ref, vs_ref = _composed(c, l)
    x_got, attq_got, satt_got, kq_got, ks_got, vq_got, vs_got = _merged(c, l)
    B = c["B"]
    np.testing.assert_allclose(np.asarray(x_got)[:B], np.asarray(x_ref)[:B],
                               rtol=1e-2, atol=1e-2)
    # fresh rows: identical quant formula on ulp-close rope results — allow
    # single-step int8 flips
    np.testing.assert_allclose(np.asarray(kq_got), np.asarray(kq_ref), atol=3)
    np.testing.assert_allclose(np.asarray(vq_got), np.asarray(vq_ref), atol=3)
    np.testing.assert_allclose(np.asarray(ks_got), np.asarray(ks_ref),
                               rtol=2e-2, atol=1e-6)
    np.testing.assert_allclose(np.asarray(vs_got), np.asarray(vs_ref),
                               rtol=2e-2, atol=1e-6)
    # attention output: dequantized comparison (int8 boundaries may flip)
    att_got = (np.asarray(attq_got[:B]).astype(np.float32)
               * np.asarray(satt_got)[:B, None])
    att_ref = (np.asarray(attq_ref[:B]).astype(np.float32)
               * np.asarray(satt_ref)[:B, None])
    np.testing.assert_allclose(att_got, att_ref, rtol=2e-2, atol=2e-2)


def test_mega2_gqa_matches_composed():
    c = _make_case(22, L=2, B=3, KVH=1, G=2, hd=128, H=256, S=32,
                   pos_list=[0, 7, 31])
    x_ref, attq_ref, satt_ref, *_ = _composed(c, 0)
    x_got, attq_got, satt_got, *_ = _merged(c, 0)
    B = c["B"]
    np.testing.assert_allclose(np.asarray(x_got)[:B], np.asarray(x_ref)[:B],
                               rtol=1e-2, atol=1e-2)
    att_got = (np.asarray(attq_got[:B]).astype(np.float32)
               * np.asarray(satt_got)[:B, None])
    att_ref = (np.asarray(attq_ref[:B]).astype(np.float32)
               * np.asarray(satt_ref)[:B, None])
    np.testing.assert_allclose(att_got, att_ref, rtol=2e-2, atol=2e-2)


def test_mega2_last_layer_skips_attention():
    """The last launch (skip flag) must still produce the correct x_next and
    must not read the cache (poisoning it changes nothing)."""
    c = _make_case(23, L=2, B=2, KVH=2, G=1, hd=128, H=256, S=32,
                   pos_list=[9, 13])
    l = c["L"] - 1
    x_ref, *_ = _composed(c, l)
    x_got, *_ = _merged(c, l)
    np.testing.assert_allclose(np.asarray(x_got)[:2], np.asarray(x_ref)[:2],
                               rtol=1e-2, atol=1e-2)
    poisoned = dict(c)
    poisoned["kc"] = jnp.full_like(c["kc"], 127)
    poisoned["ks"] = jnp.full_like(c["ks"], 1e9)
    x_p, *_ = _merged(poisoned, l)
    np.testing.assert_allclose(np.asarray(x_got)[:2], np.asarray(x_p)[:2],
                               rtol=1e-6, atol=1e-6)


def test_decode_dma_descs():
    pos = jnp.asarray([5, 0, 33], jnp.int32)
    base, dcell, doff, total = decode_dma_descs(pos, 3, 64, 16)
    # nbs = [1, 0, 3]
    assert int(total) == 4
    np.testing.assert_array_equal(np.asarray(base), [0, 1, 1])
    np.testing.assert_array_equal(np.asarray(dcell)[:4], [0, 2, 2, 2])
    np.testing.assert_array_equal(np.asarray(doff)[:4], [0, 0, 1, 2])


# ---------------------------------------------------------------------------
# end-to-end: forward_decode(fused="mega2") vs the other paths
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


def test_forward_decode_mega2_matches_fused():
    from tpu_llama.models import make_kv_cache
    from tpu_llama.models.llama import (
        _mega2_path_ok,
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
        assert _mega2_path_ok(params, config, cache, B)
        warm = jnp.tile(jnp.arange(10, dtype=jnp.int32)[None], (B, 1))
        _, cache = forward_prefill(params, cache, warm,
                                   jnp.zeros((B,), jnp.int32),
                                   jnp.array([4, 9], jnp.int32), config)
        return forward_decode(params, cache, tokens, pos, config,
                              attn=attn, fused=fused)

    logits_m, cache_m = run("mega2")
    logits_f, cache_f = run(True, attn="flash_dma")
    logits_u, cache_u = run(False)
    np.testing.assert_allclose(np.asarray(logits_m), np.asarray(logits_f),
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(logits_m), np.asarray(logits_u),
                               rtol=4e-2, atol=4e-2)
    np.testing.assert_allclose(np.asarray(cache_m.k), np.asarray(cache_f.k),
                               atol=2)


def test_forward_decode_mega2_gqa():
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

    np.testing.assert_allclose(np.asarray(run("mega2")),
                               np.asarray(run(True, attn="flash_dma")),
                               rtol=2e-2, atol=2e-2)


def test_mega2_path_ok_gates():
    from tpu_llama.models import make_kv_cache
    from tpu_llama.models.llama import _mega2_path_ok

    config = _tiny_config()
    params = _fused_model(config)
    dense = make_kv_cache(config, batch=2, kv_dtype="int8")
    assert _mega2_path_ok(params, config, dense, 2)
    fp = make_kv_cache(config, batch=2, kv_dtype="float32")
    assert not _mega2_path_ok(params, config, fp, 2)
    c64 = _tiny_config(dim=128)
    p64 = _fused_model(c64)
    d64 = make_kv_cache(c64, batch=2, kv_dtype="int8")
    assert not _mega2_path_ok(p64, c64, d64, 2)
    paged = make_kv_cache(config, batch=2, kv_dtype="int8", seq_len=64,
                          paged=True, num_pages=5, page_size=32)
    assert not _mega2_path_ok(params, config, paged, 2)


def test_mega2_depth1_ring_matches_composed():
    """The depth-1 KV-ring fallback (13B shapes: the minimal depth-2 plan
    overflows the VMEM budget) must stay numerically identical — the ring
    degenerates to wait-per-block, changing only the DMA schedule."""
    from tpu_llama.ops.fused_step2 import step2_plan

    c = _make_case(23, L=3, B=2, KVH=2, G=1, hd=128, H=384, S=64,
                   pos_list=[5, 33])
    budget = int(0.78 * (1 << 20))  # depth-1 window for this shape
    assert step2_plan(c["Bp"], c["D"], c["H"], c["QO"], c["KVH"], c["G"],
                      c["hd"], c["S"], budget=budget)[1][4] == 1
    x_ref, attq_ref, satt_ref, *_ = _composed(c, 0)
    TS = step2_block_s(c["S"])
    base, dcell, doff, total = decode_dma_descs(c["pos"], c["B"], c["S"], TS)
    rc, rsa, rsb = rope_tables(c["cos"], c["sin"], c["Bp"])
    x_got, attq_got, satt_got, *_ = fused_step2_layer(
        c["x"], c["attq"], c["satt"], c["kc"], c["vc"], c["ks"], c["vs"],
        c["pos"], rc, rsa, rsb, base, dcell, doff, total,
        c["wo"].q, c["wo"].s, c["w13"].q, c["w13"].s,
        c["w2"].q, c["w2"].s, c["qkv"].q, c["qkv"].s,
        c["rms_ffn"], c["rms_att"], jnp.int32(0), c["L"],
        c["KVH"] * c["G"], budget=budget)
    B = c["B"]
    np.testing.assert_allclose(np.asarray(x_got)[:B], np.asarray(x_ref)[:B],
                               rtol=1e-2, atol=1e-2)
    att_got = (np.asarray(attq_got[:B]).astype(np.float32)
               * np.asarray(satt_got)[:B, None])
    att_ref = (np.asarray(attq_ref[:B]).astype(np.float32)
               * np.asarray(satt_ref)[:B, None])
    np.testing.assert_allclose(att_got, att_ref, rtol=2e-2, atol=2e-2)


def test_mega_kernel_gates_track_r5_fault_landscape(monkeypatch):
    """The kernel-fault landscape DRIFTS with the remote toolchain
    (CLAUDE.md): r4 hard-blocked B=2 everywhere after a real chip fault;
    the r5 re-probe (r5_probe.log, commit d3a5e23) cleared mega2/mega3 at
    every batch while MEGA alone stays TPU-blocked (its full-depth 7B b1
    decode still crashes the worker, ab_r5_b1.log).  The gates must track
    that: mega blocked on TPU at any batch, mega2/mega3 open at B=2, and
    interpret mode (these tests) always open."""
    import jax

    from tpu_llama.models import make_kv_cache
    from tpu_llama.models.llama import (
        _mega2_path_ok,
        _mega3_path_ok,
        _mega_path_ok,
    )

    config = _tiny_config()
    params = _fused_model(config)
    caches = {b: make_kv_cache(config, batch=b, kv_dtype="int8")
              for b in (1, 2, 3, 4)}
    # interpret (CPU) backend: everything allowed
    assert _mega_path_ok(params, config, caches[2], 2)
    assert _mega2_path_ok(params, config, caches[2], 2)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    # mega: TPU-blocked at EVERY batch (full-depth crash un-root-caused)
    for b in (1, 2, 4):
        assert not _mega_path_ok(params, config, caches[b], b), b
    # mega2: open on TPU, including the once-blocked B=2 (mega3 is not
    # assertable on this tiny config — it pairs layers and L=3 is odd)
    for b in (1, 2, 3, 4):
        assert _mega2_path_ok(params, config, caches[b], b), b
    del _mega3_path_ok  # imported for symmetry; structural gate covers it
