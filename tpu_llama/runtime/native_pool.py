"""ctypes binding for the native C++ page allocator (native/pagepool.cpp).

Same semantics as ``runtime.paged.PagePool`` (full reservation, trash page
0, refcounted prefix sharing); the page-table mirror is a numpy array whose
memory the C++ pool writes directly — no per-admission Python list churn.
Compiles lazily like native/bpe (g++ in image, no pybind11 — C ABI).
``NativePagePool`` raises ImportError at construction when no compiler is
available; the engine falls back to the Python pool.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_LIB_NAME = "libtpu_llama_pagepool.so"


def _build_lib() -> Path | None:
    src = _NATIVE_DIR / "pagepool.cpp"
    if not src.exists():
        return None
    cache = Path(os.environ.get(
        "TPU_LLAMA_CACHE", Path(tempfile.gettempdir()) / "tpu_llama_native"))
    cache.mkdir(parents=True, exist_ok=True)
    lib = cache / _LIB_NAME
    if lib.exists() and lib.stat().st_mtime >= src.stat().st_mtime:
        return lib
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
             str(src), "-o", str(lib)],
            check=True, capture_output=True,
        )
    except (OSError, subprocess.CalledProcessError):
        return None
    return lib


_lib = None

_I32P = ctypes.POINTER(ctypes.c_int32)


def _load():
    global _lib
    if _lib is None:
        path = _build_lib()
        if path is None:
            _lib = False
            return None
        lib = ctypes.CDLL(str(path))
        lib.pool_create.restype = ctypes.c_void_p
        lib.pool_create.argtypes = [ctypes.c_int32] * 4 + [_I32P]
        lib.pool_destroy.argtypes = [ctypes.c_void_p]
        for name, args in (
            ("pool_pages_needed", [ctypes.c_void_p, ctypes.c_int32]),
            ("pool_free_pages", [ctypes.c_void_p]),
            ("pool_can_reserve", [ctypes.c_void_p, ctypes.c_int32]),
            ("pool_refcount", [ctypes.c_void_p, ctypes.c_int32]),
            ("pool_held", [ctypes.c_void_p, ctypes.c_int32]),
            ("pool_alloc_page", [ctypes.c_void_p]),
            ("pool_retain", [ctypes.c_void_p, _I32P, ctypes.c_int32]),
            ("pool_release_pages", [ctypes.c_void_p, _I32P, ctypes.c_int32]),
            ("pool_reserve",
             [ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32]),
            ("pool_reserve_with_prefix",
             [ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32, _I32P,
              ctypes.c_int32, ctypes.c_int32, _I32P, _I32P]),
            ("pool_release", [ctypes.c_void_p, ctypes.c_int32]),
        ):
            fn = getattr(lib, name)
            fn.restype = ctypes.c_int32
            fn.argtypes = args
        _lib = lib
    return _lib or None


def _as_i32(pages) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(list(pages), np.int32))


class NativePagePool:
    """Drop-in twin of ``runtime.paged.PagePool`` backed by C++."""

    def __init__(self, num_pages: int, page_size: int, slots: int,
                 max_pages_per_slot: int):
        if num_pages < 2:
            raise ValueError("need >= 2 pages (page 0 is the trash page)")
        lib = _load()
        if lib is None:
            raise ImportError("native pagepool unavailable (no g++)")
        self._lib = lib
        self.page_size = page_size
        self.num_pages = num_pages
        self.max_pages_per_slot = max_pages_per_slot
        self.table = np.zeros((slots, max_pages_per_slot), np.int32)
        self._h = lib.pool_create(
            num_pages, page_size, slots, max_pages_per_slot,
            self.table.ctypes.data_as(_I32P))
        if not self._h:
            raise RuntimeError("pool_create failed")

    def __del__(self):
        h = getattr(self, "_h", None)
        if h:
            self._lib.pool_destroy(h)
            self._h = None

    # ---- queries ----
    def pages_needed(self, n_tokens: int) -> int:
        return int(self._lib.pool_pages_needed(self._h, n_tokens))

    def can_reserve(self, n_tokens: int) -> bool:
        return bool(self._lib.pool_can_reserve(self._h, n_tokens))

    @property
    def free_pages(self) -> int:
        return int(self._lib.pool_free_pages(self._h))

    def refcount(self, page: int) -> int:
        return int(self._lib.pool_refcount(self._h, page))

    # ---- raw page holds ----
    def alloc_page(self) -> int | None:
        p = int(self._lib.pool_alloc_page(self._h))
        return None if p < 0 else p

    def retain(self, pages) -> None:
        arr = _as_i32(pages)
        rc = self._lib.pool_retain(self._h, arr.ctypes.data_as(_I32P),
                                   len(arr))
        assert rc == 0, "retain of dead page"

    def release_pages(self, pages) -> None:
        arr = _as_i32(pages)
        rc = self._lib.pool_release_pages(
            self._h, arr.ctypes.data_as(_I32P), len(arr))
        assert rc == 0, "double free"

    # ---- slot lifecycle ----
    def reserve(self, slot: int, n_tokens: int):
        rc = int(self._lib.pool_reserve(self._h, slot, n_tokens))
        if rc == -2:
            raise ValueError(f"slot {slot} already holds pages")
        if rc < 0:
            return None
        return self.table[slot].copy()

    def reserve_with_prefix(self, slot: int, n_tokens: int, prefix_pages,
                            prefix_len: int):
        arr = _as_i32(prefix_pages)
        src = ctypes.c_int32(-1)
        dst = ctypes.c_int32(-1)
        rc = int(self._lib.pool_reserve_with_prefix(
            self._h, slot, n_tokens, arr.ctypes.data_as(_I32P), len(arr),
            prefix_len, ctypes.byref(src), ctypes.byref(dst)))
        if rc == -2:
            raise ValueError(f"slot {slot} already holds pages")
        if rc == -3:
            raise AssertionError("bad prefix pin list")
        if rc < 0:
            return None
        copies = ([(int(src.value), int(dst.value))]
                  if src.value >= 0 else [])
        return self.table[slot].copy(), copies

    def release(self, slot: int) -> bool:
        return int(self._lib.pool_release(self._h, slot)) > 0

    def held(self, slot: int) -> int:
        return int(self._lib.pool_held(self._h, slot))
