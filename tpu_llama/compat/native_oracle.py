"""Builder/runner for the independent C oracle twin (native/oracle.c).

The C binary is a SECOND implementation of the reference's numeric contract
(f64 compute, f32 stores — llama2.ts:205-303, :348-394), sharing zero code
with ``compat.oracle``.  Tests assert the two implementations generate
token-identical streams on the repro config (seed 1, temp 0, "Once upon a
time", /root/reference/package.json:10), upgrading the golden fixtures from
self-anchored to cross-anchored (VERDICT r3 #5).

Compiled lazily with cc/gcc/g++ (no make step), cached like the other
native helpers.  ``build_oracle`` returns None when no compiler is
available — callers (tests) skip.
"""

from __future__ import annotations

import os
import subprocess
import tempfile
from pathlib import Path

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_BIN_NAME = "tpu_llama_oracle"


def build_oracle() -> Path | None:
    """Compile native/oracle.c (cached on mtime); None if impossible."""
    src = _NATIVE_DIR / "oracle.c"
    if not src.exists():
        return None
    cache = Path(os.environ.get(
        "TPU_LLAMA_CACHE", Path(tempfile.gettempdir()) / "tpu_llama_native"))
    cache.mkdir(parents=True, exist_ok=True)
    binary = cache / _BIN_NAME
    if binary.exists() and binary.stat().st_mtime >= src.stat().st_mtime:
        return binary
    for cc in ("cc", "gcc", "g++"):
        try:
            subprocess.run(
                [cc, "-O2", "-o", str(binary), str(src), "-lm"],
                check=True, capture_output=True)
            return binary
        except (OSError, subprocess.CalledProcessError):
            continue
    return None


def run_oracle(
    model_path: str | os.PathLike,
    tokenizer_path: str | os.PathLike,
    prompt: str = "",
    steps: int = 256,
    temperature: float = 1.0,
    topp: float = 1.0,
    seed: int = 1,
    timeout: float = 600.0,
) -> list[int]:
    """Run the C oracle; returns the chosen-token stream (prompt-forced +
    sampled, stopping before the BOS terminator) — the same stream
    ``compat.generate.generate_compat`` returns in ``.tokens``."""
    binary = build_oracle()
    if binary is None:
        raise RuntimeError("no C compiler available for native/oracle.c")
    cmd = [str(binary), str(model_path), str(tokenizer_path),
           "-s", str(seed), "-t", repr(temperature), "-p", repr(topp),
           "-n", str(steps)]
    if prompt:
        cmd += ["-i", prompt]
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=timeout)
    if out.returncode != 0:
        raise RuntimeError(f"oracle exited {out.returncode}: {out.stderr}")
    return [int(line) for line in out.stdout.split()]
