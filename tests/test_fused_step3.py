"""ops/fused_step3.py — the two-layers-per-launch pair kernel (mega3).

Parity contract: one mega3 launch for the pair (l0, l0+1) must equal TWO
chained mega2 launches (fused_step2_layer for l0, its XLA epilogue feeding
fused_step2_layer for l0+1) — same formulas, so only instruction-level
rounding may differ.  The seam merge reuses variant M's math (7e4c25e),
whose chained-merge parity these tests inherit.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_llama.config import ModelConfig
from tpu_llama.ops.fused_step2 import (
    decode_dma_descs,
    fused_step2_layer,
    rope_tables,
    step2_block_s,
)
from tpu_llama.ops.fused_step3 import fused_step3_pair, step3_plan

from tests.test_fused_step2 import _make_case  # shared synthetic case


def _chained_mega2(c, l0):
    """Two mega2 launches: layer l0 then l0+1, epilogue merge between."""
    TS = step2_block_s(c["S"])
    base, dcell, doff, total = decode_dma_descs(c["pos"], c["B"], c["S"], TS)
    rc, rsa, rsb = rope_tables(c["cos"], c["sin"], c["Bp"])

    def one(x, attq, satt, l):
        return fused_step2_layer(
            x, attq, satt, c["kc"], c["vc"], c["ks"], c["vs"],
            c["pos"], rc, rsa, rsb, base, dcell, doff, total,
            c["wo"].q, c["wo"].s, c["w13"].q, c["w13"].s,
            c["w2"].q, c["w2"].s, c["qkv"].q, c["qkv"].s,
            c["rms_ffn"], c["rms_att"], jnp.int32(l), c["L"],
            c["KVH"] * c["G"])

    x1, attq1, satt1, kq1, ks1, vq1, vs1 = one(
        c["x"], c["attq"], c["satt"], l0)
    x2, attq2, satt2, kq2, ks2, vq2, vs2 = one(x1, attq1, satt1, l0 + 1)
    return (x2, attq2, satt2,
            (kq1, ks1, vq1, vs1), (kq2, ks2, vq2, vs2))


def _pair(c, l0):
    TS = step2_block_s(c["S"])
    base, dcell, doff, total = decode_dma_descs(c["pos"], c["B"], c["S"], TS)
    rc, rsa, rsb = rope_tables(c["cos"], c["sin"], c["Bp"])
    return fused_step3_pair(
        c["x"], c["attq"], c["satt"], c["kc"], c["vc"], c["ks"], c["vs"],
        c["pos"], rc, rsa, rsb, base, dcell, doff, total,
        c["wo"].q, c["wo"].s, c["w13"].q, c["w13"].s,
        c["w2"].q, c["w2"].s, c["qkv"].q, c["qkv"].s,
        c["rms_ffn"], c["rms_att"], jnp.int32(l0), c["L"],
        c["KVH"] * c["G"], block_s=TS)


@pytest.mark.parametrize("l0", [0, 2])
def test_mega3_matches_chained_mega2(l0):
    c = _make_case(31, L=4, B=2, KVH=2, G=1, hd=128, H=384, S=64,
                   pos_list=[5, 33])
    x_ref, attq_ref, satt_ref, rows1_ref, rows2_ref = _chained_mega2(c, l0)
    x_got, attq_got, satt_got, rows = _pair(c, l0)
    B = c["B"]
    np.testing.assert_allclose(np.asarray(x_got)[:B], np.asarray(x_ref)[:B],
                               rtol=1e-2, atol=1e-2)
    kq, ks, vq, vs = rows
    for h, (kq_r, ks_r, vq_r, vs_r) in enumerate([rows1_ref, rows2_ref]):
        np.testing.assert_allclose(np.asarray(kq[h]), np.asarray(kq_r),
                                   atol=3)
        np.testing.assert_allclose(np.asarray(vq[h]), np.asarray(vq_r),
                                   atol=3)
        np.testing.assert_allclose(np.asarray(ks[h]), np.asarray(ks_r),
                                   rtol=2e-2, atol=1e-6)
        np.testing.assert_allclose(np.asarray(vs[h]), np.asarray(vs_r),
                                   rtol=2e-2, atol=1e-6)
    att_got = (np.asarray(attq_got[:B]).astype(np.float32)
               * np.asarray(satt_got)[:B, None])
    att_ref = (np.asarray(attq_ref[:B]).astype(np.float32)
               * np.asarray(satt_ref)[:B, None])
    np.testing.assert_allclose(att_got, att_ref, rtol=2e-2, atol=2e-2)


def test_mega3_gqa_matches_chained():
    c = _make_case(32, L=4, B=3, KVH=1, G=2, hd=128, H=256, S=32,
                   pos_list=[0, 7, 31])
    x_ref, attq_ref, satt_ref, *_ = _chained_mega2(c, 0)
    x_got, attq_got, satt_got, _ = _pair(c, 0)
    B = c["B"]
    np.testing.assert_allclose(np.asarray(x_got)[:B], np.asarray(x_ref)[:B],
                               rtol=1e-2, atol=1e-2)
    att_got = (np.asarray(attq_got[:B]).astype(np.float32)
               * np.asarray(satt_got)[:B, None])
    att_ref = (np.asarray(attq_ref[:B]).astype(np.float32)
               * np.asarray(satt_ref)[:B, None])
    np.testing.assert_allclose(att_got, att_ref, rtol=2e-2, atol=2e-2)


def test_mega3_last_pair_skips_second_cells():
    """The last pair (skip flag) must produce the correct x_next (both
    layers' linears + the seam merge) without reading layer L's cache row:
    poisoning the cache BEYOND layer l0+1 changes nothing."""
    c = _make_case(33, L=4, B=2, KVH=2, G=1, hd=128, H=256, S=32,
                   pos_list=[9, 13])
    l0 = c["L"] - 2
    x_ref, *_ = _chained_mega2(c, l0)
    x_got, *_ = _pair(c, l0)
    np.testing.assert_allclose(np.asarray(x_got)[:2], np.asarray(x_ref)[:2],
                               rtol=1e-2, atol=1e-2)
    poisoned = dict(c)
    # poison every layer EXCEPT l0+1 (whose rows the half-0 cells must read)
    mask = jnp.arange(c["L"])[:, None, None, None, None] != l0 + 1
    poisoned["kc"] = jnp.where(mask, jnp.int8(127), c["kc"])
    poisoned["ks"] = jnp.where(mask[..., 0], 1e9, c["ks"])
    x_p, *_ = _pair(poisoned, l0)
    np.testing.assert_allclose(np.asarray(x_got)[:2], np.asarray(x_p)[:2],
                               rtol=1e-6, atol=1e-6)


# ---------------------------------------------------------------------------
# end-to-end: forward_decode(fused="mega3") vs mega2 and the two-launch path
# ---------------------------------------------------------------------------


def _tiny_config(**kw):
    base = dict(dim=256, hidden_dim=256, n_layers=4, n_heads=2,
                n_kv_heads=2, vocab_size=64, seq_len=64)
    base.update(kw)
    return ModelConfig(**base)


def _fused_model(config):
    from tpu_llama.models import random_params
    from tpu_llama.models.llama import fuse_projections, quantize_params

    params = random_params(config, dtype=jnp.float32, seed=3)
    return quantize_params(fuse_projections(params), mode="w8a8")


def test_forward_decode_mega3_matches_mega2():
    from tpu_llama.models import make_kv_cache
    from tpu_llama.models.llama import (
        _mega3_path_ok,
        forward_decode,
        forward_prefill,
    )

    config = _tiny_config()  # hd = 128, L = 4 (even)
    params = _fused_model(config)
    B = 2
    tokens = jnp.array([3, 5], jnp.int32)
    pos = jnp.array([4, 9], jnp.int32)

    def run(fused, attn="flash"):
        cache = make_kv_cache(config, batch=B, kv_dtype="int8")
        assert _mega3_path_ok(params, config, cache, B)
        warm = jnp.tile(jnp.arange(10, dtype=jnp.int32)[None], (B, 1))
        _, cache = forward_prefill(params, cache, warm,
                                   jnp.zeros((B,), jnp.int32),
                                   jnp.array([4, 9], jnp.int32), config)
        return forward_decode(params, cache, tokens, pos, config,
                              attn=attn, fused=fused)

    logits_3, cache_3 = run("mega3")
    logits_2, cache_2 = run("mega2")
    logits_u, cache_u = run(False)
    np.testing.assert_allclose(np.asarray(logits_3), np.asarray(logits_2),
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(logits_3), np.asarray(logits_u),
                               rtol=4e-2, atol=4e-2)
    np.testing.assert_allclose(np.asarray(cache_3.k), np.asarray(cache_2.k),
                               atol=2)
    np.testing.assert_allclose(np.asarray(cache_3.ks), np.asarray(cache_2.ks),
                               rtol=2e-2, atol=1e-7)


def test_forward_decode_mega3_gqa():
    from tpu_llama.models import make_kv_cache
    from tpu_llama.models.llama import forward_decode, forward_prefill

    config = _tiny_config(n_heads=4, n_kv_heads=2, dim=512,
                          hidden_dim=384)  # hd=128, G=2
    params = _fused_model(config)
    B = 2
    tokens = jnp.array([3, 5], jnp.int32)
    pos = jnp.array([4, 9], jnp.int32)

    def run(fused):
        cache = make_kv_cache(config, batch=B, kv_dtype="int8")
        warm = jnp.tile(jnp.arange(10, dtype=jnp.int32)[None], (B, 1))
        _, cache = forward_prefill(params, cache, warm,
                                   jnp.zeros((B,), jnp.int32),
                                   jnp.array([4, 9], jnp.int32), config)
        return forward_decode(params, cache, tokens, pos, config,
                              fused=fused)[0]

    np.testing.assert_allclose(np.asarray(run("mega3")),
                               np.asarray(run("mega2")),
                               rtol=2e-2, atol=2e-2)


def test_mega3_path_ok_gates():
    from tpu_llama.models import make_kv_cache
    from tpu_llama.models.llama import _mega3_path_ok

    config = _tiny_config()
    params = _fused_model(config)
    dense = make_kv_cache(config, batch=2, kv_dtype="int8")
    assert _mega3_path_ok(params, config, dense, 2)
    # odd layer count -> no pairing
    c_odd = _tiny_config(n_layers=3)
    p_odd = _fused_model(c_odd)
    d_odd = make_kv_cache(c_odd, batch=2, kv_dtype="int8")
    assert not _mega3_path_ok(p_odd, c_odd, d_odd, 2)
    fp = make_kv_cache(config, batch=2, kv_dtype="float32")
    assert not _mega3_path_ok(params, config, fp, 2)


def test_mega3_multistep_greedy_matches_mega2():
    """Three chained greedy steps through the full loop: cache flushes and
    the cross-launch epilogue compose across steps exactly like mega2."""
    from tpu_llama.models import make_kv_cache
    from tpu_llama.models.llama import forward_prefill, greedy_decode_loop

    config = _tiny_config()
    params = _fused_model(config)
    B = 2

    def run(fused):
        cache = make_kv_cache(config, batch=B, kv_dtype="int8")
        warm = jnp.tile(jnp.arange(8, dtype=jnp.int32)[None], (B, 1))
        _, cache = forward_prefill(params, cache, warm,
                                   jnp.zeros((B,), jnp.int32),
                                   jnp.array([6, 8], jnp.int32), config)
        toks, _ = greedy_decode_loop(
            params, cache, jnp.array([3, 5], jnp.int32),
            jnp.array([6, 8], jnp.int32), 3, config, fused=fused)
        return np.asarray(toks)

    np.testing.assert_array_equal(run("mega3"), run("mega2"))
