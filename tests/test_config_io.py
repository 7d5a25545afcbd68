"""Config header + checkpoint binary IO tests (llama2.ts:80-129 format)."""

import numpy as np
import pytest

from tpu_llama.config import HEADER_BYTES, ModelConfig
from tpu_llama.io.checkpoint import load_checkpoint, make_random_weights, write_checkpoint


def test_header_roundtrip(tiny_config):
    raw = tiny_config.to_header()
    assert len(raw) == HEADER_BYTES
    assert ModelConfig.from_header(raw) == tiny_config


def test_header_sign_trick():
    """Negative vocab_size encodes unshared classifier weights (llama2.ts:87-90)."""
    c = ModelConfig(dim=8, hidden_dim=16, n_layers=1, n_heads=2, n_kv_heads=2,
                    vocab_size=100, seq_len=10, shared_weights=False)
    raw = c.to_header()
    parsed = ModelConfig.from_header(raw)
    assert parsed.vocab_size == 100
    assert parsed.shared_weights is False

    c2 = ModelConfig(dim=8, hidden_dim=16, n_layers=1, n_heads=2, n_kv_heads=2,
                     vocab_size=100, seq_len=10, shared_weights=True)
    assert ModelConfig.from_header(c2.to_header()).shared_weights is True


def test_derived_shapes():
    c = ModelConfig(dim=64, hidden_dim=128, n_layers=2, n_heads=8, n_kv_heads=2,
                    vocab_size=50, seq_len=16)
    assert c.head_dim == 8
    assert c.kv_dim == 16
    assert c.group_size == 4


def test_invalid_config_raises():
    with pytest.raises(ValueError):
        ModelConfig(dim=10, hidden_dim=16, n_layers=1, n_heads=3, n_kv_heads=3,
                    vocab_size=5, seq_len=4)


def test_checkpoint_roundtrip(tmp_path, tiny_weights):
    path = tmp_path / "model.bin"
    write_checkpoint(path, tiny_weights)
    for mmap in (True, False):
        loaded = load_checkpoint(path, mmap=mmap)
        assert loaded.config == tiny_weights.config
        for name in ("token_embedding", "rms_att", "wq", "wk", "wv", "wo",
                     "rms_ffn", "w1", "w2", "w3", "rms_final",
                     "freq_cis_real", "freq_cis_imag", "wcls"):
            np.testing.assert_array_equal(
                getattr(loaded, name), getattr(tiny_weights, name), err_msg=name
            )


def test_shared_wcls_aliases_embedding(tmp_path, tiny_weights):
    """llama2.ts:127 — with shared weights, wcls IS the embedding table."""
    path = tmp_path / "model.bin"
    write_checkpoint(path, tiny_weights)
    loaded = load_checkpoint(path)
    assert loaded.config.shared_weights
    np.testing.assert_array_equal(loaded.wcls, loaded.token_embedding)


def test_unshared_checkpoint_roundtrip(tmp_path, tiny_gqa_weights):
    path = tmp_path / "gqa.bin"
    write_checkpoint(path, tiny_gqa_weights)
    loaded = load_checkpoint(path)
    assert not loaded.config.shared_weights
    assert loaded.wk.shape == (2, 24, 48)  # (L, kv_dim, dim) — GQA layout
    np.testing.assert_array_equal(loaded.wcls, tiny_gqa_weights.wcls)


def test_truncated_checkpoint_raises(tmp_path, tiny_weights):
    path = tmp_path / "model.bin"
    write_checkpoint(path, tiny_weights)
    data = path.read_bytes()
    path.write_bytes(data[: len(data) - 64])
    with pytest.raises(ValueError, match="truncated"):
        load_checkpoint(path)
