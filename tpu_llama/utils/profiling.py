"""Profiling / tracing (SURVEY §5.1).

The reference's entire observability is one wall-clock tok/s line
(llama2.ts:506-511).  Here: ``jax.profiler`` trace capture wrapped in a
context manager, usable from the CLI (``--profile DIR``), bench
(``--profile``), or code.  Traces open in TensorBoard / Perfetto.
"""

from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def profile_trace(log_dir: str | None):
    """Capture a jax.profiler trace into ``log_dir`` (no-op if None)."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
