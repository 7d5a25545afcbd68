"""ctypes binding for the native C++ BPE encoder (native/bpe.cpp).

Compiles the shared library on first use (g++ is in the image; pybind11 is
not, hence the C ABI + ctypes).  Falls back transparently to the pure-Python
encoder when no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_LIB_NAME = "libtpu_llama_bpe.so"


def _build_lib() -> Path | None:
    src = _NATIVE_DIR / "bpe.cpp"
    if not src.exists():
        return None
    cache = Path(os.environ.get("TPU_LLAMA_CACHE",
                                Path(tempfile.gettempdir()) / "tpu_llama_native"))
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


def _load():
    global _lib
    if _lib is None:
        path = _build_lib()
        if path is None:
            _lib = False
            return None
        lib = ctypes.CDLL(str(path))
        lib.bpe_create.restype = ctypes.c_void_p
        lib.bpe_create.argtypes = [
            ctypes.POINTER(ctypes.c_uint16), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32, ctypes.POINTER(ctypes.c_float),
        ]
        lib.bpe_encode.restype = ctypes.c_int32
        lib.bpe_encode.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint16), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
        ]
        lib.bpe_free.restype = None
        lib.bpe_free.argtypes = [ctypes.c_void_p]
        _lib = lib
    return _lib or None


def _utf16_units(s: str) -> np.ndarray:
    return np.frombuffer(s.encode("utf-16-le"), dtype=np.uint16)


class NativeBpe:
    """Native encoder over a vocab; exact reference merge semantics."""

    def __init__(self, vocab, scores):
        lib = _load()
        if lib is None:
            raise RuntimeError("native BPE unavailable (no g++?)")
        self._lib = lib
        units = [_utf16_units(t) for t in vocab]
        offsets = np.zeros(len(vocab) + 1, np.int32)
        np.cumsum([len(u) for u in units], out=offsets[1:])
        data = (np.concatenate(units) if units else
                np.zeros(0, np.uint16)).astype(np.uint16)
        scores32 = np.asarray(scores, np.float32)
        self._keepalive = (data, offsets, scores32)
        self._h = lib.bpe_create(
            data.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
            offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            np.int32(len(vocab)),
            scores32.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )

    def encode(self, text: str) -> list[int]:
        units = _utf16_units(text)
        out = np.zeros(max(len(units), 1), np.int32)
        n = self._lib.bpe_encode(
            self._h,
            units.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
            np.int32(len(units)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            np.int32(len(out)),
        )
        if n == -1000000000:
            raise RuntimeError("output buffer too small")
        if n < 0:
            pos = -n - 1
            ch = chr(units[pos])
            raise ValueError(f"character not found in vocab: {ch!r}")
        return out[:n].tolist()

    def __del__(self):
        try:
            if getattr(self, "_h", None):
                self._lib.bpe_free(self._h)
        except Exception:
            pass


def available() -> bool:
    return _load() is not None
