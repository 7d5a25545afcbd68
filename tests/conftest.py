"""Test configuration.

Tests run on CPU with 8 virtual XLA devices so multi-chip sharding is
exercised without TPU hardware (SURVEY §4 item 5).  Environment must be set
before jax initializes, hence module level.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon TPU plugin (sitecustomize) force-sets jax_platforms="axon,cpu" at
# interpreter start, so the env var alone is not enough — override at the
# config level before any backend initializes.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from tpu_llama.config import ModelConfig  # noqa: E402
from tpu_llama.io.checkpoint import RawWeights, make_random_weights  # noqa: E402
from tpu_llama.io.tokenizer import Tokenizer, make_byte_tokenizer  # noqa: E402

# A tiny but structurally interesting config: multiple layers/heads, GQA-free
# (v0-compatible), dims deliberately NOT multiples of 128 to exercise padding.
TINY = ModelConfig(
    dim=48, hidden_dim=128, n_layers=3, n_heads=4, n_kv_heads=4,
    vocab_size=320, seq_len=64, shared_weights=True,
)
# GQA variant (beyond v0 reference capability; framework-native).
TINY_GQA = ModelConfig(
    dim=48, hidden_dim=128, n_layers=2, n_heads=4, n_kv_heads=2,
    vocab_size=320, seq_len=64, shared_weights=False,
)


@pytest.fixture(scope="session")
def tiny_config() -> ModelConfig:
    return TINY


@pytest.fixture(scope="session")
def tiny_weights() -> RawWeights:
    return make_random_weights(TINY, seed=1234)


@pytest.fixture(scope="session")
def tiny_gqa_weights() -> RawWeights:
    return make_random_weights(TINY_GQA, seed=99)


@pytest.fixture(scope="session")
def tiny_tokenizer() -> Tokenizer:
    # Vocab sized to TINY.vocab_size: 3 specials + 256 bytes + merges.
    merges = [
        ("on", -1.0), ("ce", -2.0), ("up", -3.0), ("Once", -3.5),
        (" upon", -4.0), (" a", -5.0), (" time", -6.0), ("time", -6.5),
        ("ti", -7.0), ("me", -8.0), (" ti", -9.0), ("On", -10.0),
        ("nce", -11.0), (" u", -12.0), ("pon", -13.0), ("po", -14.0),
    ]
    pad = TINY.vocab_size - (3 + 256 + len(merges))
    assert pad >= 0
    merges += [(f"<pad{i}>", -1e5) for i in range(pad)]
    return make_byte_tokenizer(merges)


@pytest.fixture(scope="session")
def rng_np():
    return np.random.default_rng(7)
