"""RNG stream tests pinning xorshift64* semantics (llama2.ts:348-360)."""

import numpy as np

from tpu_llama.compat.rng import Xorshift64Star


def _u32_numpy_oracle(seed: int, n: int) -> list[int]:
    """Independent reimplementation with numpy uint64 wraparound arithmetic
    (vs the library's arbitrary-precision Python ints) to cross-check masking.
    """
    out = []
    with np.errstate(over="ignore"):
        s = np.uint64(seed)
        for _ in range(n):
            s ^= s >> np.uint64(12)
            s ^= s << np.uint64(25)
            s ^= s >> np.uint64(27)
            prod = s * np.uint64(0x2545F4914F6CDD1D)
            out.append(int((prod >> np.uint64(32)) & np.uint64(0xFFFFFFFF)))
    return out


def test_u32_stream_matches_independent_impl():
    for seed in (1, 2, 1234567, 2**63 + 12345, 0xFFFFFFFFFFFFFFFF):
        rng = Xorshift64Star(seed)
        got = [rng.random_u32() for _ in range(200)]
        assert got == _u32_numpy_oracle(seed, 200)


def test_u32_range_and_determinism():
    a = Xorshift64Star(1)
    b = Xorshift64Star(1)
    xs = [a.random_u32() for _ in range(1000)]
    assert xs == [b.random_u32() for _ in range(1000)]
    assert all(0 <= x < 2**32 for x in xs)
    # Not degenerate
    assert len(set(xs)) > 990


def test_f32_semantics():
    """random_f32 must be f32(u32 / 2^32) — the JS `/256` keeps fraction bits
    (llama2.ts:358), unlike llama2.c's integer `>> 8`."""
    rng = Xorshift64Star(42)
    shadow = Xorshift64Star(42)
    for _ in range(500):
        f = rng.random_f32()
        u = shadow.random_u32()
        expected = float(np.float32((u / 256.0) / 16777216.0))
        assert f == expected
        assert 0.0 <= f < 1.0
    # Demonstrate the divergence from the C semantics exists for some draw
    rng = Xorshift64Star(42)
    shadow = Xorshift64Star(42)
    diverged = False
    for _ in range(10000):
        f = rng.random_f32()
        u = shadow.random_u32()
        c_style = float(np.float32((u >> 8) / 16777216.0))
        if f != c_style:
            diverged = True
            break
    assert diverged, "JS-style f32 conversion should differ from C-style for some draws"


def test_seed_masked_to_64_bits():
    assert Xorshift64Star(2**64 + 5).state == 5
