"""TP sharding of INT8 params + INT8 KV cache on the virtual CPU mesh."""

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


@pytest.fixture(scope="module")
def eight_devices():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return jax.devices()


def test_sharded_int8_params_decode(tiny_weights, eight_devices):
    c = tiny_weights.config
    qparams = quantize_params(params_from_raw(tiny_weights))

    # single-device reference
    cache = make_kv_cache(c, 2)
    toks = jnp.array([5, 9], jnp.int32)
    ref, _ = forward_decode(qparams, cache, toks, jnp.zeros(2, jnp.int32), c)

    mesh = make_mesh(MeshConfig(2, 2))
    sp = shard_params(qparams, mesh)
    sc = shard_cache(make_kv_cache(c, 2), mesh)
    got, _ = forward_decode(sp, sc, toks, jnp.zeros(2, jnp.int32), c)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)
    # int8 values actually sharded over model axis
    shard = sp.layers.w1.q.addressable_shards[0]
    L, IN, OUT = qparams.layers.w1.q.shape
    assert shard.data.shape == (L, IN, OUT // 2)


def test_sharded_int8_kv_cache(tiny_weights, eight_devices):
    c = tiny_weights.config
    params = params_from_raw(tiny_weights)
    mesh = make_mesh(MeshConfig(2, 2))

    cache0 = make_kv_cache(c, 2, "int8")
    ref_logits, _ = forward_decode(
        params, cache0, jnp.array([5, 9], jnp.int32), jnp.zeros(2, jnp.int32), c)

    sp = shard_params(params, mesh)
    sc = shard_cache(make_kv_cache(c, 2, "int8"), mesh)
    got, sc2 = forward_decode(
        sp, sc, jnp.array([5, 9], jnp.int32), jnp.zeros(2, jnp.int32), c)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref_logits),
                               rtol=1e-4, atol=1e-5)
    assert sc2.k.dtype == jnp.int8
    assert not sc2.ks.sharding.is_fully_replicated


def test_sharded_w8a8_params_decode(tiny_weights, eight_devices):
    c = tiny_weights.config
    qparams = quantize_params(params_from_raw(tiny_weights), mode="w8a8")

    cache = make_kv_cache(c, 2)
    toks = jnp.array([5, 9], jnp.int32)
    ref, _ = forward_decode(qparams, cache, toks, jnp.zeros(2, jnp.int32), c)

    mesh = make_mesh(MeshConfig(2, 2))
    sp = shard_params(qparams, mesh)
    sc = shard_cache(make_kv_cache(c, 2), mesh)
    got, _ = forward_decode(sp, sc, toks, jnp.zeros(2, jnp.int32), c)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)
