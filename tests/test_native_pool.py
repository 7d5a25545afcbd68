"""Native C++ page allocator == Python PagePool, op for op."""

import numpy as np
import pytest

from tpu_llama.runtime.paged import PagePool

try:
    from tpu_llama.runtime.native_pool import NativePagePool
    _HAVE = NativePagePool(4, 8, 2, 2) is not None
except Exception:  # no g++ in env
    _HAVE = False

pytestmark = pytest.mark.skipif(not _HAVE, reason="no native pagepool")


def _pair(num_pages=17, page_size=16, slots=6, mpps=4):
    return (PagePool(num_pages, page_size, slots, mpps),
            NativePagePool(num_pages, page_size, slots, mpps))


def _same(py, nat):
    assert py.free_pages == nat.free_pages
    np.testing.assert_array_equal(py.table, nat.table)
    for pg in range(py.num_pages):
        assert py.refcount(pg) == nat.refcount(pg), pg


def test_pool_parity_random_ops():
    py, nat = _pair()
    rng = np.random.default_rng(7)
    snaps: list[tuple[list[int], int]] = []
    for step in range(300):
        op = rng.integers(0, 5)
        slot = int(rng.integers(0, 6))
        if op == 0:  # reserve
            n_tok = int(rng.integers(1, 4 * 16 + 1))
            if py.held(slot):
                continue
            a = py.reserve(slot, n_tok)
            b = nat.reserve(slot, n_tok)
            assert (a is None) == (b is None)
            if a is not None:
                np.testing.assert_array_equal(a, b)
        elif op == 1:  # release
            assert py.release(slot) == nat.release(slot)
        elif op == 2 and py.held(slot):  # snapshot pin: retain slot pages
            pages = [int(p) for p in py.table[slot] if p > 0]
            prefix_len = int(rng.integers(1, len(pages) * 16 + 1))
            need = py.pages_needed(prefix_len)
            pin = pages[:need]
            if pin:
                py.retain(pin)
                nat.retain(pin)
                snaps.append((pin, prefix_len))
        elif op == 3 and snaps and not py.held(slot):  # prefix reserve
            pin, prefix_len = snaps[int(rng.integers(0, len(snaps)))]
            n_tok = int(rng.integers(prefix_len, 4 * 16 + 1))
            a = py.reserve_with_prefix(slot, n_tok, pin, prefix_len)
            b = nat.reserve_with_prefix(slot, n_tok, pin, prefix_len)
            assert (a is None) == (b is None)
            if a is not None:
                np.testing.assert_array_equal(a[0], b[0])
                assert a[1] == b[1]
        elif op == 4 and snaps:  # unpin a snapshot
            i = int(rng.integers(0, len(snaps)))
            pin, _ = snaps.pop(i)
            py.release_pages(pin)
            nat.release_pages(pin)
        _same(py, nat)


def test_pool_parity_basics():
    py, nat = _pair(num_pages=5, page_size=4, slots=2, mpps=3)
    for pool in (py, nat):
        assert pool.pages_needed(1) == 1
        assert pool.pages_needed(9) == 3
        assert pool.can_reserve(12)
        row = pool.reserve(0, 9)
        assert list(row[:3]) == [1, 2, 3] and row[3:].sum() == 0 \
            if len(row) > 3 else True
        assert pool.free_pages == 1
        assert not pool.can_reserve(8)
        assert pool.release(0) and not pool.release(0)
        assert pool.free_pages == 4
    _same(py, nat)


def test_engine_uses_native_pool_when_available():
    from tpu_llama.runtime.engine import _make_page_pool

    pool = _make_page_pool(8, 16, 2, 4)
    assert isinstance(pool, NativePagePool)
