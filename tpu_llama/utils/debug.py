"""Debug / sanitizer mode (SURVEY §5.2).

The reference is single-threaded memory-safe JS; its only hazard class is
buffer aliasing (in-place rmsnorm llama2.ts:299, shared wcls :127).  JAX's
functional purity removes data races by construction; what remains worth
guarding:

* NaN propagation — ``debug_mode()`` flips ``jax_debug_nans`` so the first
  NaN-producing op raises with its location;
* donated-buffer misuse — accessing an array after passing it to a
  ``donate_argnums`` call; ``assert_not_donated`` makes tests fail loudly;
* cross-host determinism — ``logits_fingerprint`` hashes per-host logits so
  multi-host runs can assert identical computation.
"""

from __future__ import annotations

import contextlib
import hashlib

import jax
import numpy as np


@contextlib.contextmanager
def debug_mode(nans: bool = True, disable_jit: bool = False):
    """Test-mode numerics guards (jax_debug_nans, optional de-jit)."""
    old_nans = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", nans)
    try:
        if disable_jit:
            with jax.disable_jit():
                yield
        else:
            yield
    finally:
        jax.config.update("jax_debug_nans", old_nans)


def assert_not_donated(x: jax.Array, name: str = "array") -> None:
    """Raise if ``x`` was donated (its buffer handed to a jit output)."""
    if getattr(x, "is_deleted", lambda: False)():
        raise AssertionError(
            f"{name} was donated/deleted — reusing a donated buffer; keep the "
            "returned array instead (jax.jit donate_argnums)"
        )


def logits_fingerprint(logits) -> str:
    """Stable content hash for cross-host determinism checks: every host of a
    replicated computation must produce the same fingerprint."""
    arr = np.ascontiguousarray(np.asarray(logits, np.float32))
    return hashlib.sha256(arr.tobytes()).hexdigest()[:16]
