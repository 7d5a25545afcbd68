"""Pool-direct chunked prefill: attention against pool pages + aliased
chunk writes, no compact duplicate cache (NEXT r3 #4b — the path that makes
single-chip b64 x 512 admission fit in HBM).

Parity anchor: the compact `_prefill_into_slots` path (same quantization,
same keys) — logits must match to kernel tolerance and the written pool
rows must match EXACTLY (identical int8 rows + scales)."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from tpu_llama.models import params_from_raw
from tpu_llama.models.llama import (
    forward_prefill_paged_chunked,
    greedy_decode_loop,
    make_kv_cache,
)
from tpu_llama.runtime import PagePool
from tpu_llama.runtime.engine import _prefill_into_slots


def _make_paged(c, B, ps):
    mp = -(-c.seq_len // ps)
    pool = PagePool(num_pages=B * mp + 1, page_size=ps, slots=B,
                    max_pages_per_slot=mp)
    for s in range(B):
        assert pool.reserve(s, c.seq_len) is not None
    cache = make_kv_cache(c, B, kv_dtype="int8", paged=True,
                          num_pages=B * mp + 1, page_size=ps)
    return dataclasses.replace(cache, page_table=jnp.asarray(pool.table))


def _gather_rows(cache, slot, n, ps):
    """Dense [L, KVH, n, hd] view of slot's first n positions."""
    pt = np.asarray(cache.page_table)[slot]
    k = np.asarray(cache.k)
    parts = [k[:, pt[j]] for j in range(-(-n // ps))]
    return np.concatenate(parts, axis=2)[:, :, :n]


@pytest.mark.parametrize("weights", ["tiny_weights", "tiny_gqa_weights"])
def test_pool_chunked_matches_compact(weights, request):
    raw = request.getfixturevalue(weights)
    c = raw.config
    params = params_from_raw(raw)
    B, T, ps, chunk = 2, 16, 16, 8
    rng = np.random.default_rng(7)
    tokens = jnp.asarray(rng.integers(3, c.vocab_size, (B, T)), jnp.int32)
    lengths = jnp.array([T, 9], jnp.int32)
    slots = jnp.arange(B, dtype=jnp.int32)

    ca = _make_paged(c, B, ps)
    last_a, _, ca = _prefill_into_slots(
        params, ca, tokens, lengths, slots, c, logits_mode="last")

    cb = _make_paged(c, B, ps)
    last_b, cb = forward_prefill_paged_chunked(
        params, cb, tokens, lengths, slots, c, chunk=chunk)

    # bf16 in-kernel dots vs the compact path's f32 einsum on CPU
    np.testing.assert_allclose(np.asarray(last_a), np.asarray(last_b),
                               atol=6e-3)
    assert np.array_equal(np.argmax(np.asarray(last_a), -1),
                          np.argmax(np.asarray(last_b), -1))
    # Layer-0 rows are BIT-identical (attention has not yet influenced the
    # residual stream: proves pages/positions/quantization line up exactly).
    # Deeper layers inherit the ~1e-3 attention-kernel delta (bf16 in-kernel
    # dots vs the compact path's f32 einsum on CPU), so compare dequantized.
    for s, n in [(0, T), (1, 9)]:
        ga, gb = _gather_rows(ca, s, n, ps), _gather_rows(cb, s, n, ps)
        np.testing.assert_array_equal(ga[0], gb[0])
        pt = np.asarray(ca.page_table)[s]

        def deq(cache, kv, sc, j_pages):
            r = np.concatenate(
                [np.asarray(kv)[:, pt[j]] for j in j_pages],
                axis=2)[:, :, :n].astype(np.float32)
            sr = np.concatenate(
                [np.asarray(sc)[:, pt[j]] for j in j_pages],
                axis=2)[:, :, :n]
            return r * sr[..., None]

        pages = range(-(-n // ps))
        np.testing.assert_allclose(deq(ca, ca.k, ca.ks, pages),
                                   deq(cb, cb.k, cb.ks, pages), atol=2e-2)
        np.testing.assert_allclose(deq(ca, ca.v, ca.vs, pages),
                                   deq(cb, cb.v, cb.vs, pages), atol=2e-2)


def test_pool_chunked_multi_page(tiny_weights):
    """Chunks spanning several pool pages: ps < T exercises the past-page
    walk (page 2's queries attend pages 0-1 via the page table)."""
    c = tiny_weights.config
    params = params_from_raw(tiny_weights)
    B, T, ps, chunk = 2, 32, 8, 8
    rng = np.random.default_rng(11)
    tokens = jnp.asarray(rng.integers(3, c.vocab_size, (B, T)), jnp.int32)
    lengths = jnp.array([T, 21], jnp.int32)
    slots = jnp.arange(B, dtype=jnp.int32)

    ca = _make_paged(c, B, ps)
    last_a, _, ca = _prefill_into_slots(
        params, ca, tokens, lengths, slots, c, logits_mode="last")
    cb = _make_paged(c, B, ps)
    last_b, cb = forward_prefill_paged_chunked(
        params, cb, tokens, lengths, slots, c, chunk=chunk)
    np.testing.assert_allclose(np.asarray(last_a), np.asarray(last_b),
                               atol=6e-3)
    for s, n in [(0, T), (1, 21)]:
        np.testing.assert_array_equal(_gather_rows(ca, s, n, ps)[0],
                                      _gather_rows(cb, s, n, ps)[0])


def test_pool_chunked_then_decode(tiny_weights):
    """Greedy continuation after pool-chunked prefill equals continuation
    after compact prefill — the cache state is interchangeable."""
    c = tiny_weights.config
    params = params_from_raw(tiny_weights)
    B, T, ps, steps = 2, 16, 16, 6
    rng = np.random.default_rng(3)
    tokens = jnp.asarray(rng.integers(3, c.vocab_size, (B, T)), jnp.int32)
    lengths = jnp.full((B,), T, jnp.int32)
    slots = jnp.arange(B, dtype=jnp.int32)

    ca = _make_paged(c, B, ps)
    last_a, _, ca = _prefill_into_slots(
        params, ca, tokens, lengths, slots, c, logits_mode="last")
    cb = _make_paged(c, B, ps)
    last_b, cb = forward_prefill_paged_chunked(
        params, cb, tokens, lengths, slots, c, chunk=8)

    nxt_a = jnp.argmax(last_a, -1).astype(jnp.int32)
    nxt_b = jnp.argmax(last_b, -1).astype(jnp.int32)
    assert np.array_equal(np.asarray(nxt_a), np.asarray(nxt_b))
    out_a, _ = greedy_decode_loop(params, ca, nxt_a, lengths, steps, c)
    out_b, _ = greedy_decode_loop(params, cb, nxt_b, lengths, steps, c)
    np.testing.assert_array_equal(np.asarray(out_a), np.asarray(out_b))


def test_pool_direct_wave_admission(tiny_weights, monkeypatch):
    """The admission front door splits large paged admissions into
    HOST-dispatched slot waves, each forced pool-direct — thresholds
    patched down so the tiny model exercises two waves of two slots."""
    from tpu_llama.runtime import engine as eng

    c = tiny_weights.config
    params = params_from_raw(tiny_weights)
    B, T, ps = 4, 16, 16
    rng = np.random.default_rng(21)
    tokens = jnp.asarray(rng.integers(3, c.vocab_size, (B, T)), jnp.int32)
    lengths = jnp.array([T, 9, T, 12], jnp.int32)
    slots = jnp.arange(B, dtype=jnp.int32)

    ca = _make_paged(c, B, ps)
    last_a, _, ca = eng._prefill_into_slots(
        params, ca, tokens, lengths, slots, c, logits_mode="last")

    monkeypatch.setattr(eng, "_POOL_DIRECT_ROWS", 16)
    monkeypatch.setattr(eng, "_POOL_CHUNK", 8)
    monkeypatch.setattr(eng, "_WAVE_ROWS", 16)  # 2 slots x T=16 rows/wave
    cb = _make_paged(c, B, ps)
    last_b, _, cb = eng.prefill_into_slots_waved(
        params, cb, tokens, lengths, slots, c, logits_mode="last")
    np.testing.assert_allclose(np.asarray(last_a), np.asarray(last_b),
                               atol=6e-3)
    for s, n in [(0, T), (1, 9), (3, 12)]:
        np.testing.assert_array_equal(_gather_rows(ca, s, n, ps)[0],
                                      _gather_rows(cb, s, n, ps)[0])


def test_kv_pool_write_chunk_matches_set():
    """Aliased chunk write == XLA advanced-index set on the same pool."""
    from tpu_llama.ops.attention import kv_pool_write_chunk

    rng = np.random.default_rng(5)
    L, P, KVH, ps, hd = 3, 7, 2, 8, 12
    B, Tc = 3, 8
    ck = jnp.asarray(rng.integers(-127, 128, (L, P, KVH, ps, hd)), jnp.int8)
    cv = jnp.asarray(rng.integers(-127, 128, (L, P, KVH, ps, hd)), jnp.int8)
    cks = jnp.asarray(rng.random((L, P, KVH, ps)), jnp.float32)
    cvs = jnp.asarray(rng.random((L, P, KVH, ps)), jnp.float32)
    rk = jnp.asarray(rng.integers(-127, 128, (B, KVH, Tc, hd)), jnp.int8)
    rv = jnp.asarray(rng.integers(-127, 128, (B, KVH, Tc, hd)), jnp.int8)
    rks = jnp.asarray(rng.random((B, KVH, Tc)), jnp.float32)
    rvs = jnp.asarray(rng.random((B, KVH, Tc)), jnp.float32)
    pt = jnp.asarray([[1, 2], [3, 4], [5, 6]], jnp.int32)
    start = jnp.array([0, 8, 0], jnp.int32)  # slot 1 writes its 2nd page
    layer = jnp.int32(1)

    ok, ov, oks, ovs = kv_pool_write_chunk(
        rk, rv, rks, rvs, pt, start, layer, ck, cv, cks, cvs)

    ek, ev, eks, evs = (np.asarray(ck).copy(), np.asarray(cv).copy(),
                        np.asarray(cks).copy(), np.asarray(cvs).copy())
    for b in range(B):
        pg = int(pt[b, int(start[b]) // ps])
        off = int(start[b]) % ps
        ek[1, pg, :, off:off + Tc] = np.asarray(rk)[b]
        ev[1, pg, :, off:off + Tc] = np.asarray(rv)[b]
        eks[1, pg, :, off:off + Tc] = np.asarray(rks)[b]
        evs[1, pg, :, off:off + Tc] = np.asarray(rvs)[b]
    np.testing.assert_array_equal(np.asarray(ok), ek)
    np.testing.assert_array_equal(np.asarray(ov), ev)
    np.testing.assert_array_equal(np.asarray(oks), eks)
    np.testing.assert_array_equal(np.asarray(ovs), evs)


def test_paged_prefill_attention_matches_reference():
    """Kernel vs float reference: past pool keys (< start) + causal fresh
    chunk, per-token int8 scales, GQA grouping."""
    from tpu_llama.ops.attention import paged_flash_prefill_attention

    rng = np.random.default_rng(13)
    L, P, KVH, ps, hd, G = 2, 5, 2, 8, 16, 2
    B, Tc = 2, 8
    NH = KVH * G
    kp = jnp.asarray(rng.integers(-127, 128, (L, P, KVH, ps, hd)), jnp.int8)
    vp = jnp.asarray(rng.integers(-127, 128, (L, P, KVH, ps, hd)), jnp.int8)
    ksp = jnp.asarray(rng.random((L, P, KVH, ps)) * 0.1, jnp.float32)
    vsp = jnp.asarray(rng.random((L, P, KVH, ps)) * 0.1, jnp.float32)
    q = jnp.asarray(rng.standard_normal((B, Tc, NH, hd)), jnp.float32)
    fk = jnp.asarray(rng.integers(-127, 128, (B, KVH, Tc, hd)), jnp.int8)
    fv = jnp.asarray(rng.integers(-127, 128, (B, KVH, Tc, hd)), jnp.int8)
    fks = jnp.asarray(rng.random((B, KVH, Tc)) * 0.1, jnp.float32)
    fvs = jnp.asarray(rng.random((B, KVH, Tc)) * 0.1, jnp.float32)
    pt = jnp.asarray([[1, 2], [3, 4]], jnp.int32)
    start = jnp.array([16, 5], jnp.int32)  # full 2 pages / partial page 0
    layer = jnp.int32(1)

    out = paged_flash_prefill_attention(
        q, kp, vp, ksp, vsp, pt, start, fk, fv, fks, fvs,
        layer=layer, past_pages=2)
    out = np.asarray(out).reshape(B, Tc, NH, hd)

    for b in range(B):
        s0 = int(start[b])
        # dense past keys from the page table
        pages = [int(pt[b, j]) for j in range(2)]
        kd = np.concatenate([np.asarray(kp)[1, p] for p in pages], axis=1)
        vd = np.concatenate([np.asarray(vp)[1, p] for p in pages], axis=1)
        ksd = np.concatenate([np.asarray(ksp)[1, p] for p in pages], axis=1)
        vsd = np.concatenate([np.asarray(vsp)[1, p] for p in pages], axis=1)
        kf = kd.astype(np.float32) * ksd[..., None]  # [KVH, 2ps, hd]
        vf = vd.astype(np.float32) * vsd[..., None]
        fkf = np.asarray(fk)[b].astype(np.float32) * np.asarray(fks)[b][..., None]
        fvf = np.asarray(fv)[b].astype(np.float32) * np.asarray(fvs)[b][..., None]
        for h in range(NH):
            kvh = h // G
            keys = np.concatenate([kf[kvh][:s0], fkf[kvh]], axis=0)
            vals = np.concatenate([vf[kvh][:s0], fvf[kvh]], axis=0)
            for t in range(Tc):
                qv = np.asarray(q)[b, t, h] / np.sqrt(hd)
                n = s0 + t + 1  # causal: past + fresh rows <= t
                sc = keys[:n] @ qv
                p = np.exp(sc - sc.max())
                p /= p.sum()
                ref = p @ vals[:n]
                np.testing.assert_allclose(out[b, t, h], ref,
                                           rtol=5e-2, atol=5e-2)


def test_pool_chunked_w8a8_fused_matches_compact():
    """The fused W8A8 chunk body (rmsnorm+quant, rope/split/quant epilogue,
    residual epilogues) must match the compact admission path at int8
    tolerance on a fused-layout model."""
    from tpu_llama.config import ModelConfig
    from tpu_llama.io.checkpoint import make_random_weights
    from tpu_llama.models.llama import fuse_projections, quantize_params

    c = ModelConfig(dim=512, hidden_dim=384, n_layers=2, n_heads=4,
                    n_kv_heads=2, vocab_size=320, seq_len=64,
                    shared_weights=False)
    raw = make_random_weights(c, seed=17)
    params = quantize_params(
        fuse_projections(params_from_raw(raw, dtype=jnp.bfloat16)),
        mode="w8a8")
    B, T, ps, chunk = 2, 64, 32, 32
    from tpu_llama.models.llama import _prefill_w8a8_fast_ok
    assert _prefill_w8a8_fast_ok(params, c, B, chunk)
    rng = np.random.default_rng(9)
    tokens = jnp.asarray(rng.integers(3, c.vocab_size, (B, T)), jnp.int32)
    lengths = jnp.array([T, T - 7], jnp.int32)
    slots = jnp.arange(B, dtype=jnp.int32)

    ca = _make_paged(c, B, ps)
    last_a, _, ca = _prefill_into_slots(
        params, ca, tokens, lengths, slots, c, logits_mode="last")

    cb = _make_paged(c, B, ps)
    last_b, cb = forward_prefill_paged_chunked(
        params, cb, tokens, lengths, slots, c, chunk=chunk)

    sa, sb = np.asarray(last_a), np.asarray(last_b)
    scale = np.abs(sa).max() + 1e-9
    np.testing.assert_allclose(sb / scale, sa / scale, atol=6e-2)
    # pool contents round-trip: K rows of slot 0 match at int8 tolerance.
    # Layer 0 sees identical inputs (only the fused ops' f32-vs-bf16
    # rounding differs -> within one step); deeper layers add residual
    # drift (a couple of steps).
    ka = _gather_rows(ca, 0, T, ps).astype(np.float32)
    kb = _gather_rows(cb, 0, T, ps).astype(np.float32)
    assert np.mean(np.abs(ka[0] - kb[0]) <= 1) > 0.995
    # deeper layers compound residual drift in the int8 codes; end-to-end
    # correctness is held by the logits check above


def test_pool_chunked_unrolled_matches_scan(tiny_weights, monkeypatch):
    """The unrolled chunk loop (r5 default, compile-robust) is bit-identical
    to the scan-over-chunks form it replaced: same logits, same pool rows."""
    import tpu_llama.models.llama as llama_mod

    c = tiny_weights.config
    params = params_from_raw(tiny_weights)
    B, T, ps, chunk = 2, 32, 8, 8
    rng = np.random.default_rng(23)
    tokens = jnp.asarray(rng.integers(3, c.vocab_size, (B, T)), jnp.int32)
    lengths = jnp.array([T, 13], jnp.int32)
    slots = jnp.arange(B, dtype=jnp.int32)

    ca = _make_paged(c, B, ps)
    last_a, ca = forward_prefill_paged_chunked(
        params, ca, tokens, lengths, slots, c, chunk=chunk)  # unrolled (n=4)

    monkeypatch.setattr(llama_mod, "_PAGED_UNROLL_CHUNKS", 0)  # force scan
    cb = _make_paged(c, B, ps)
    last_b, cb = forward_prefill_paged_chunked(
        params, cb, tokens, lengths, slots, c, chunk=chunk)

    np.testing.assert_array_equal(np.asarray(last_a), np.asarray(last_b))
    np.testing.assert_array_equal(np.asarray(ca.k), np.asarray(cb.k))
    np.testing.assert_array_equal(np.asarray(ca.v), np.asarray(cb.v))
    np.testing.assert_array_equal(np.asarray(ca.ks), np.asarray(cb.ks))
    np.testing.assert_array_equal(np.asarray(ca.vs), np.asarray(cb.vs))


def test_pool_chunked_waved_matches_oneshot(tiny_weights):
    """Host-dispatched waves through ONE program (traced start0) equal the
    single-call prefill bit-for-bit: same final logits, same pool rows.
    This is the long-prompt path: the r5 Mosaic scoped-vmem budget caps a
    B=1 unrolled program at ~3 chunks, so longer prompts re-dispatch the
    same compiled program at successive start offsets."""
    import jax
    from functools import partial as _partial

    c = tiny_weights.config
    params = params_from_raw(tiny_weights)
    B, T, ps, chunk, W = 2, 32, 8, 8, 16  # 2 waves of W=16 (2 chunks each)
    rng = np.random.default_rng(31)
    tokens = jnp.asarray(rng.integers(3, c.vocab_size, (B, T)), jnp.int32)
    lengths = jnp.array([T, 27], jnp.int32)
    slots = jnp.arange(B, dtype=jnp.int32)

    ca = _make_paged(c, B, ps)
    last_a, ca = forward_prefill_paged_chunked(
        params, ca, tokens, lengths, slots, c, chunk=chunk)

    cb = _make_paged(c, B, ps)
    pf = jax.jit(_partial(forward_prefill_paged_chunked, config=c,
                          chunk=chunk, max_pos=T), donate_argnums=(1,))
    last_b = None
    for w in range(0, T, W):
        last_b, cb = pf(params, cb, tokens[:, w:w + W], lengths, slots,
                        start0=jnp.int32(w))

    np.testing.assert_array_equal(np.asarray(last_a), np.asarray(last_b))
    np.testing.assert_array_equal(np.asarray(ca.k), np.asarray(cb.k))
    np.testing.assert_array_equal(np.asarray(ca.v), np.asarray(cb.v))
    np.testing.assert_array_equal(np.asarray(ca.ks), np.asarray(cb.ks))
    np.testing.assert_array_equal(np.asarray(ca.vs), np.asarray(cb.vs))
