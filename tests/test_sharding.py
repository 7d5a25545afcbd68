"""Multi-chip sharding tests on the 8-device virtual CPU mesh (SURVEY §4.5).

Verifies that the TP/DP shardings compile and produce results identical to
the single-device model — the TPU-native analog of "test multi-node without a
real cluster".
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_llama.models import KVCache, forward_decode, forward_prefill, params_from_raw
from tpu_llama.parallel import MeshConfig, make_mesh, shard_cache, shard_params


@pytest.fixture(scope="module")
def eight_devices():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return jax.devices()


@pytest.mark.parametrize("mesh_shape", [(1, 2), (2, 1), (2, 4), (1, 4)])
def test_sharded_decode_matches_single_device(tiny_weights, eight_devices, mesh_shape):
    c = tiny_weights.config
    params = params_from_raw(tiny_weights)
    B = 2

    # single-device reference
    cache0 = KVCache.create(c, batch=B)
    toks = jnp.array([5, 9], jnp.int32)
    ref = []
    cache = cache0
    for p in range(3):
        logits, cache = forward_decode(params, cache, toks + p,
                                       jnp.full((B,), p, jnp.int32), c)
        ref.append(np.asarray(logits))

    mesh = make_mesh(MeshConfig(*mesh_shape))
    sp = shard_params(params, mesh)
    scache = shard_cache(cache0, mesh)
    got = []
    for p in range(3):
        logits, scache = forward_decode(sp, scache, toks + p,
                                        jnp.full((B,), p, jnp.int32), c)
        got.append(np.asarray(logits))

    for r, g in zip(ref, got):
        np.testing.assert_allclose(g, r, rtol=1e-5, atol=1e-6)


def test_sharded_prefill_matches(tiny_weights, eight_devices):
    c = tiny_weights.config
    params = params_from_raw(tiny_weights)
    tokens = jnp.array([[1, 5, 17, 300], [9, 250, 33, 2]], jnp.int32)
    start = jnp.zeros(2, jnp.int32)
    lengths = jnp.array([4, 4], jnp.int32)

    cache = KVCache.create(c, batch=2)
    ref, _ = forward_prefill(params, cache, tokens, start, lengths, c)

    mesh = make_mesh(MeshConfig(2, 4))
    sp = shard_params(params, mesh)
    sc = shard_cache(KVCache.create(c, batch=2), mesh)
    got, sc2 = forward_prefill(sp, sc, tokens, start, lengths, c)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-6)
    # cache stays sharded (no implicit gather)
    assert not sc2.k.sharding.is_fully_replicated


def test_param_sharding_layout(tiny_weights, eight_devices):
    """Weights must actually be distributed: each wq shard holds 1/model of
    the head dim."""
    params = params_from_raw(tiny_weights)
    mesh = make_mesh(MeshConfig(1, 4))
    sp = shard_params(params, mesh)
    shard = sp.layers.wq.addressable_shards[0]
    L, D, out = params.layers.wq.shape
    assert shard.data.shape == (L, D, out // 4)
    w2shard = sp.layers.w2.addressable_shards[0]
    L, H, D2 = params.layers.w2.shape
    assert w2shard.data.shape == (L, H // 4, D2)
