"""Native C++ BPE encoder must match the pure-Python encoder exactly."""

import pytest

from tpu_llama.io import fast_bpe
from tpu_llama.io.tokenizer import Tokenizer, make_byte_tokenizer


@pytest.fixture(scope="module")
def native_ok():
    if not fast_bpe.available():
        pytest.skip("g++ / native build unavailable")


def test_native_matches_python(native_ok, tiny_tokenizer):
    for text in ["Once upon a time", "", "on", "time after time", "aaa",
                 "x" * 200]:
        got = tiny_tokenizer.encode(text)           # native path
        want = tiny_tokenizer._encode_py(text)      # pure python
        assert got == want, text


def test_native_unknown_char(native_ok, tiny_tokenizer):
    with pytest.raises(ValueError, match="not found in vocab"):
        tiny_tokenizer.encode("\U0001F600")


def test_native_duplicate_first_index(native_ok):
    tok = make_byte_tokenizer([])
    rep = "�"
    assert tok.encode(rep) == [3 + 0x80]


def test_native_real_tokenizer_if_present(native_ok):
    import os
    path = "/root/reference/tokenizer.bin"
    if not os.path.exists(path):
        pytest.skip("no reference tokenizer")
    tok = Tokenizer.load(path, vocab_size=32000)
    text = "Once upon a time, in a land far away, there lived a dragon."
    assert tok.encode(text) == tok._encode_py(text)


def test_native_speedup(native_ok, tiny_tokenizer):
    """Native should not be slower than Python on a long input."""
    import time
    text = "time upon a time " * 200
    tiny_tokenizer.encode(text)  # warm/build
    t0 = time.perf_counter(); a = tiny_tokenizer.encode(text)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter(); b = tiny_tokenizer._encode_py(text)
    t_py = time.perf_counter() - t0
    assert a == b
    assert t_native < t_py * 2  # sanity; typically 10-100x faster
