"""Internal checkpoint format roundtrip tests."""

import jax
import jax.numpy as jnp
import numpy as np

from tpu_llama.io.internal import load_params, save_params
from tpu_llama.models import (
    forward_decode,
    make_kv_cache,
    params_from_raw,
    quantize_params,
)


def test_dense_roundtrip(tmp_path, tiny_weights):
    params = params_from_raw(tiny_weights)
    save_params(tmp_path / "ckpt", params, tiny_weights.config)
    loaded, config = load_params(tmp_path / "ckpt")
    assert config == tiny_weights.config
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_int8_roundtrip_and_forward(tmp_path, tiny_weights):
    c = tiny_weights.config
    qparams = quantize_params(params_from_raw(tiny_weights))
    save_params(tmp_path / "q8", qparams, c)
    loaded, config = load_params(tmp_path / "q8")
    assert config == c
    assert loaded.layers.wq.q.dtype == jnp.int8
    assert loaded.layers.wq.logical_in == qparams.layers.wq.logical_in

    tok = jnp.array([5], jnp.int32)
    pos = jnp.array([0], jnp.int32)
    la, _ = forward_decode(qparams, make_kv_cache(c, 1), tok, pos, c)
    lb, _ = forward_decode(loaded, make_kv_cache(c, 1), tok, pos, c)
    np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_convert_tool(tmp_path, tiny_weights):
    from tpu_llama.io.checkpoint import write_checkpoint

    ckpt = tmp_path / "model.bin"
    write_checkpoint(ckpt, tiny_weights)
    import os, subprocess, sys
    env = dict(os.environ)
    # keep the subprocess on CPU: the axon sitecustomize registers the TPU
    # backend whenever PALLAS_AXON_POOL_IPS is set
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [sys.executable, "tools/convert.py", str(ckpt), str(tmp_path / "out"),
         "--int8"],
        capture_output=True, text=True, env=env,
    )
    assert out.returncode == 0, out.stderr
    loaded, config = load_params(tmp_path / "out")
    assert config == tiny_weights.config
    assert loaded.layers.w1.q.dtype == jnp.int8


def test_w8a8_roundtrip_and_forward(tmp_path, tiny_weights):
    c = tiny_weights.config
    qparams = quantize_params(params_from_raw(tiny_weights), mode="w8a8")
    save_params(tmp_path / "w8a8", qparams, c)
    loaded, config = load_params(tmp_path / "w8a8")
    assert config == c
    from tpu_llama.ops import ChannelQuantTensor
    assert isinstance(loaded.layers.wq, ChannelQuantTensor)
    tok = jnp.array([5], jnp.int32)
    pos = jnp.array([0], jnp.int32)
    la, _ = forward_decode(qparams, make_kv_cache(c, 1), tok, pos, c)
    lb, _ = forward_decode(loaded, make_kv_cache(c, 1), tok, pos, c)
    np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_content_hash_verification(tmp_path, tiny_weights):
    params = params_from_raw(tiny_weights)
    save_params(tmp_path / "h", params, tiny_weights.config)
    import json
    meta = json.loads((tmp_path / "h" / "manifest.json").read_text())
    assert "sha256" in meta["tensors"]["rms_final"]
    # clean verify passes
    load_params(tmp_path / "h", verify=True)
    # corrupt one tensor -> verify fails
    import numpy as np
    path = tmp_path / "h" / "rms_final.npy"
    arr = np.load(path)
    arr[0] += 1.0
    np.save(path, arr)
    import pytest
    with pytest.raises(ValueError, match="content hash mismatch"):
        load_params(tmp_path / "h", verify=True)
