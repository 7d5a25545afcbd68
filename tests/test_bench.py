"""bench.py code paths on CPU (tiny shapes) — keeps the driver entry green."""

import sys
from pathlib import Path

import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def test_bench_decode_tiny(tiny_config):
    from bench import _build, bench_decode

    params = _build(tiny_config, jnp.float32, None, False)
    tps, spread, times = bench_decode(params, tiny_config, batch=2, steps=4,
                                      dtype=jnp.float32, seq_fill=8, reps=2)
    assert tps > 0
    assert len(times) == 2


def test_bench_decode_quant_paths(tiny_config):
    from bench import _build, bench_decode

    for quant in ("int8", "w8a8"):
        params = _build(tiny_config, jnp.float32, quant, False)
        tps, _, _ = bench_decode(params, tiny_config, batch=1, steps=2,
                                 dtype=jnp.float32, seq_fill=4,
                                 kv_dtype="int8", reps=2)
        assert tps > 0


def test_bench_ttft(tiny_config):
    from bench import _build, bench_ttft

    params = _build(tiny_config, jnp.float32, None, False)
    t, times = bench_ttft(params, tiny_config, batch=2, prompt_len=8,
                          dtype=jnp.float32, reps=2)
    assert t > 0 and len(times) == 2


def test_bench_prefill_ttft(tiny_config):
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    from benchmark import bench_prefill_ttft

    t = bench_prefill_ttft(tiny_config, batch=2, prompt_len=8,
                           dtype=jnp.float32)
    assert t > 0
