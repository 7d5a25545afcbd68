"""Engine config, profiler hook, and KV snapshot tests."""

import numpy as np

from tpu_llama.utils import EngineConfig, profile_trace


def test_engine_config_roundtrip(tmp_path):
    cfg = EngineConfig(checkpoint="m.bin", quant="int8", max_batch=16,
                       kv_dtype="int8", mesh_model=4)
    cfg.server.port = 9999
    path = tmp_path / "engine.json"
    cfg.save(path)
    loaded = EngineConfig.load(path)
    assert loaded == cfg


def test_engine_config_rejects_unknown(tmp_path):
    path = tmp_path / "bad.json"
    path.write_text('{"checkpoint": "x", "bogus_knob": 1}')
    import pytest
    with pytest.raises(ValueError, match="bogus_knob"):
        EngineConfig.load(path)


def test_engine_config_build(tmp_path, tiny_weights, tiny_tokenizer):
    from tpu_llama.io.checkpoint import write_checkpoint

    write_checkpoint(tmp_path / "model.bin", tiny_weights)
    tiny_tokenizer.save(tmp_path / "tok.bin")
    cfg = EngineConfig(checkpoint=str(tmp_path / "model.bin"),
                       tokenizer=str(tmp_path / "tok.bin"),
                       quant="int8", max_batch=2, precision="highest")
    engine, tok = cfg.build_engine()
    assert engine.max_batch == 2
    assert tok.vocab_size == tiny_weights.config.vocab_size

    from tpu_llama.runtime import ContinuousBatcher, Request
    b = ContinuousBatcher(engine)
    r = Request(prompt_tokens=tok.encode("Once"), steps=8, temperature=0.0)
    b.submit(r)
    b.run()
    assert r.done


def test_engine_config_build_paged(tmp_path, tiny_weights, tiny_tokenizer):
    """Config-driven serving can run the paged KV layout end to end."""
    from tpu_llama.io.checkpoint import write_checkpoint

    write_checkpoint(tmp_path / "model.bin", tiny_weights)
    tiny_tokenizer.save(tmp_path / "tok.bin")
    cfg = EngineConfig(checkpoint=str(tmp_path / "model.bin"),
                       tokenizer=str(tmp_path / "tok.bin"),
                       max_batch=2, precision="highest",
                       kv_layout="paged", page_size=8)
    path = tmp_path / "engine.json"
    cfg.save(path)
    cfg = EngineConfig.load(path)
    engine, tok = cfg.build_engine()
    assert engine.pool is not None and engine.pool.page_size == 8

    from tpu_llama.runtime import ContinuousBatcher, Request
    b = ContinuousBatcher(engine)
    r = Request(prompt_tokens=tok.encode("Once"), steps=8, temperature=0.0)
    b.submit(r)
    b.run()
    assert r.done and r.out_tokens


def test_profile_trace_noop_and_capture(tmp_path):
    with profile_trace(None):
        pass  # no-op path
    import jax.numpy as jnp
    with profile_trace(str(tmp_path / "trace")):
        (jnp.ones((8, 8)) @ jnp.ones((8, 8))).block_until_ready()
    # trace directory produced something
    assert any((tmp_path / "trace").rglob("*"))


def test_kv_snapshot_prefix_reuse(tiny_weights):
    """Restore a snapshotted prefix into a fresh slot; decode continues
    identically without re-prefilling."""
    import jax.numpy as jnp
    from tpu_llama.models import params_from_raw
    from tpu_llama.runtime import Engine

    c = tiny_weights.config
    engine = Engine(params_from_raw(tiny_weights), c, max_batch=2,
                    precision="highest")
    prompt = [1, 5, 17, 300]
    engine.prefill([prompt], [0])
    snap = engine.snapshot_slot(0, len(prompt))

    logits_a = engine.decode(np.array([42, 0], np.int32),
                             np.array([len(prompt), 0], np.int32))[0]

    # fresh engine: restore the prefix into slot 1, decode there
    engine2 = Engine(params_from_raw(tiny_weights), c, max_batch=2,
                     precision="highest")
    engine2.restore_slot(1, snap)
    logits_b = engine2.decode(np.array([0, 42], np.int32),
                              np.array([0, len(prompt)], np.int32))[1]
    np.testing.assert_allclose(logits_a, logits_b, rtol=1e-5, atol=1e-6)


def test_debug_mode_catches_nan():
    import jax.numpy as jnp
    import pytest
    from tpu_llama.utils.debug import debug_mode

    with debug_mode(nans=True):
        with pytest.raises(FloatingPointError):
            import jax
            jax.jit(lambda x: jnp.log(x))(jnp.array([-1.0])).block_until_ready()


def test_donation_guard(tiny_weights):
    import jax.numpy as jnp
    from tpu_llama.models import make_kv_cache, params_from_raw
    from tpu_llama.runtime.engine import _decode_step
    from tpu_llama.utils.debug import assert_not_donated

    c = tiny_weights.config
    params = params_from_raw(tiny_weights)
    cache = make_kv_cache(c, 1)
    _, new_cache = _decode_step(params, cache,
                                jnp.zeros(1, jnp.int32), jnp.zeros(1, jnp.int32), c)
    import pytest
    with pytest.raises(AssertionError, match="donated"):
        assert_not_donated(cache.k, "old cache")  # cache was donated
    assert_not_donated(new_cache.k, "new cache")  # fine


def test_logits_fingerprint_stable():
    import numpy as np
    from tpu_llama.utils.debug import logits_fingerprint

    a = np.arange(12, dtype=np.float32)
    assert logits_fingerprint(a) == logits_fingerprint(a.copy())
    assert logits_fingerprint(a) != logits_fingerprint(a + 1)
