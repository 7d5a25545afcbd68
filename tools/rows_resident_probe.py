"""A/B the resident-x W8A8 rows kernel vs the double-buffered default.

Times an in-program lax.scan of 32 matmul calls (>=100 total in-program
ops per window is unnecessary here: each call is ~1-2 ms, far above the
27 ms dispatch floor across the scan) at the four 7B prefill shapes with
M=4096 (b8 T512 rows).  Interleaved reps, medians.

Usage: TPU_LLAMA_ROWS_RESIDENT is read per-process; this probe builds
BOTH variants in one process via block args...  it instead toggles the
module gate directly (monkeypatching _rows_resident_enabled) and clears
the jit cache between variants, timing each program interleaved.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/tpu_llama_jax_cache")

import tpu_llama.ops.matmul as mt
from tpu_llama.ops import quantize_channel


def build(shape, resident, M):
    IN, OUT = shape
    rng = np.random.default_rng(0)
    w = quantize_channel(rng.normal(size=(IN, OUT)).astype(np.float32) * 0.02)
    xq = jnp.asarray(rng.integers(-127, 128, (M, IN)).astype(np.int8))
    sx = jnp.full((M,), 0.02, jnp.float32)

    mt._rows_resident_enabled = lambda: resident
    mt.w8a8_matmul_prequant._clear_cache()

    @jax.jit
    def loop(xq, sx, wq, ws):
        wt = mt.ChannelQuantTensor(q=wq, s=ws, logical_in=IN,
                                   logical_out=OUT)

        def body(acc, _):
            o = mt.w8a8_matmul_prequant(xq, sx, wt, out_dtype=jnp.bfloat16)
            return acc + o[0, 0].astype(jnp.float32), None

        acc, _ = jax.lax.scan(body, jnp.float32(0), None, length=32)
        return acc

    out = loop(xq, sx, w.q, w.s)  # compile+warm
    np.asarray(out)
    return lambda: np.asarray(loop(xq, sx, w.q, w.s))


def main():
    M = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    shapes = {"qkv": (4096, 12288), "wo": (4096, 4096),
              "w13": (4096, 22016), "w2": (11008, 4096)}
    for name, shape in shapes.items():
        fns = {}
        for label, res in (("default", False), ("resident", True)):
            fns[label] = build(shape, res, M)
        times = {k: [] for k in fns}
        for _ in range(5):
            for k, f in fns.items():
                t0 = time.perf_counter()
                f()
                times[k].append((time.perf_counter() - t0) / 32 * 1e3)
        meds = {k: float(np.median(v)) for k, v in times.items()}
        spread = {k: round((max(v) - min(v)) / meds[k], 3)
                  for k, v in times.items()}
        print(f"{name} {shape} M={M}: default {meds['default']:.3f} ms "
              f"(sp {spread['default']}) vs resident "
              f"{meds['resident']:.3f} ms (sp {spread['resident']})",
              flush=True)
    print("ROWS_RESIDENT_PROBE_OK", flush=True)


if __name__ == "__main__":
    main()
