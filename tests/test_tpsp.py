"""Composed TP x SP (3-D mesh) decode vs single-device reference
(VERDICT r1 missing #5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_llama.models import forward_decode, make_kv_cache, params_from_raw
from tpu_llama.parallel import shard_params
from tpu_llama.parallel.tpsp import (
    MeshConfig3,
    make_mesh3,
    shard_cache_tpsp,
    tpsp_forward_decode,
)


@pytest.fixture(scope="module")
def eight_devices():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return jax.devices()


@pytest.mark.parametrize("dp,tp,sp", [(1, 2, 4), (1, 4, 2), (2, 2, 2)])
def test_tpsp_decode_matches_single_device(tiny_weights, eight_devices,
                                           dp, tp, sp):
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

    mesh = make_mesh3(MeshConfig3(dp, tp, sp))
    sp_params = shard_params(params, mesh)
    sc = shard_cache_tpsp(make_kv_cache(c, B), mesh)
    got = []
    for p in range(3):
        logits, sc = tpsp_forward_decode(sp_params, sc, toks + p,
                                         jnp.full((B,), p, jnp.int32), c,
                                         mesh, precision="highest")
        got.append(np.asarray(logits))

    for r, g in zip(ref, got):
        np.testing.assert_allclose(g, r, rtol=1e-5, atol=1e-5)


def test_tpsp_cache_is_doubly_sharded(tiny_weights, eight_devices):
    c = tiny_weights.config
    mesh = make_mesh3(MeshConfig3(1, 2, 4))
    sc = shard_cache_tpsp(make_kv_cache(c, 2), mesh)
    # per-device tile: KVH split by 2 (model), S split by 4 (seq)
    shard_shape = sc.k.sharding.shard_shape(sc.k.shape)
    assert shard_shape[2] == c.n_kv_heads // 2
    assert shard_shape[3] == c.seq_len // 4


def test_tpsp_long_context_beyond_single_shard(tiny_weights, eight_devices):
    """Positions past one shard's chunk still attend correctly (the LSE
    merge sees every shard's contribution)."""
    c = tiny_weights.config
    params = params_from_raw(tiny_weights)
    B = 2
    mesh = make_mesh3(MeshConfig3(1, 2, 4))
    sp_params = shard_params(params, mesh)
    sc = shard_cache_tpsp(make_kv_cache(c, B), mesh)
    cache = make_kv_cache(c, B)

    chunk = c.seq_len // 4
    # fill positions crossing two seq shards
    positions = list(range(chunk - 2, chunk + 2))
    toks = jnp.array([7, 9], jnp.int32)
    for p in positions:
        posv = jnp.full((B,), p, jnp.int32)
        ref, cache = forward_decode(params, cache, toks, posv, c,
                                    precision="highest")
        got, sc = tpsp_forward_decode(sp_params, sc, toks, posv, c, mesh,
                                      precision="highest")
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


def test_tpsp_decode_int8_kv(tiny_weights, eight_devices):
    """TP x SP over an int8 cache (heads x sequence sharded values AND
    scales) == single-device int8 reference (VERDICT r2 #5)."""
    import jax.numpy as jnp

    from tpu_llama.models import forward_decode, make_kv_cache, params_from_raw
    from tpu_llama.parallel import shard_params
    from tpu_llama.parallel.tpsp import (
        MeshConfig3,
        make_mesh3,
        shard_cache_tpsp,
        tpsp_forward_decode,
    )

    c = tiny_weights.config
    params = params_from_raw(tiny_weights)
    B = 2
    toks = jnp.array([5, 9], jnp.int32)

    ref_cache = make_kv_cache(c, B, "int8")
    ref = []
    t = toks
    for p in range(3):
        logits, ref_cache = forward_decode(params, ref_cache, t,
                                           jnp.full((B,), p, jnp.int32), c,
                                           precision="highest", attn="xla")
        ref.append(np.asarray(logits))
        t = jnp.argmax(jnp.asarray(logits), -1).astype(jnp.int32)

    mesh3 = make_mesh3(MeshConfig3(data=1, model=2, seq=2))
    sp = shard_params(params, mesh3)
    sc = shard_cache_tpsp(make_kv_cache(c, B, "int8"), mesh3)
    assert sc.k.dtype == jnp.int8
    got = []
    t = toks
    for p in range(3):
        logits, sc = tpsp_forward_decode(sp, sc, t,
                                         jnp.full((B,), p, jnp.int32), c,
                                         mesh3, precision="highest")
        got.append(np.asarray(logits))
        t = jnp.argmax(jnp.asarray(logits), -1).astype(jnp.int32)

    for r, g in zip(ref, got):
        np.testing.assert_allclose(g, r, rtol=1e-4, atol=1e-4)
        assert np.array_equal(np.argmax(g, -1), np.argmax(r, -1))
