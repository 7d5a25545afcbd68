"""b64 paged bisect (VERDICT r3 #1 / NEXT r3 #4b) — run each suspect
program of the BASELINE "batch 1->64" gate in ORDER, printing a JSON line
per stage, so a crash localizes the culprit.

Geometry (the one that FITS 16 GB with decode headroom — r3's failure ran
prompt_len == pool capacity, whose first decode step read pt[b, 1] on an
mp=1 page table, an OOB scalar-prefetch read feeding an aliased pool
write):

  prompt 256, seq_len 512, page_size 256  ->  mp=2, pool 129 pages
  pool 8.66 GB + w8a8 params 6.7 GB = 15.4 GB; decode pos 256..511 in
  bounds; the TTFT decode step hits page column 1 < mp.

Stages:
  1. decode_step    — engine._decode_step at b64-paged (NEVER executed r3)
  2. greedy_loop    — 16-step fused loop (scan-carry flush kernels)
  3. wave_prefill   — prefill_into_slots_waved, 4 host waves of 16 slots
  4. composed_ttft  — bench.bench_ttft b64 paged (prefill + decode step)

Run:  timeout 3600 python tools/b64_bisect.py
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/tpu_llama_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

import bench
from tpu_llama.config import LLAMA2_7B

B, T, S, PS = 64, 256, 512, 256


def stage(name, fn):
    t0 = time.perf_counter()
    try:
        extra = fn() or {}
        out = {"stage": name, "ok": True,
               "wall_s": round(time.perf_counter() - t0, 1), **extra}
    except Exception as e:
        out = {"stage": name, "ok": False,
               "wall_s": round(time.perf_counter() - t0, 1),
               "error": f"{type(e).__name__}: {e}"[:400]}
    print(json.dumps(out), flush=True)
    return out["ok"]


def main():
    config = LLAMA2_7B
    dtype = jnp.dtype("bfloat16")
    params = bench._build(config, dtype, "w8a8", fuse=True)
    print(json.dumps({"stage": "build", "ok": True}), flush=True)

    state = {}

    def fresh_cache():
        return bench._make_cache(config, B, "int8", S, "paged", PS)

    def s1_decode_step():
        from tpu_llama.runtime.engine import _decode_step

        cache = fresh_cache()
        toks = jnp.zeros((B,), jnp.int32)
        pos = jnp.full((B,), T, jnp.int32)
        logits, cache = _decode_step(params, cache, toks, pos, config,
                                     "default")
        first = np.asarray(jnp.argmax(logits, axis=-1))[:4].tolist()
        # a second step at pos+1 (fresh-row path against just-written rows)
        logits, cache = _decode_step(params, cache, toks, pos + 1, config,
                                     "default")
        np.asarray(logits[0, :4])
        state["cache"] = cache
        return {"argmax4": first}

    def s2_greedy_loop():
        from tpu_llama.models.llama import greedy_decode_loop

        cache = state.pop("cache")
        toks = jnp.zeros((B,), jnp.int32)
        pos = jnp.full((B,), T, jnp.int32)
        out, cache = greedy_decode_loop(params, cache, toks, pos, 16,
                                        config)
        np.asarray(out)
        del cache
        return {}

    def s3_wave_prefill():
        from tpu_llama.runtime.engine import prefill_into_slots_waved

        cache = fresh_cache()
        tokens = jnp.zeros((B, T), jnp.int32)
        lengths = jnp.full((B,), T, jnp.int32)
        slots = jnp.arange(B, dtype=jnp.int32)
        t0 = time.perf_counter()
        last, _, cache = prefill_into_slots_waved(
            params, cache, tokens, lengths, slots, config,
            precision="default", logits_mode="last")
        first = np.asarray(jnp.argmax(last, axis=-1))[:4].tolist()
        state["cache2"] = cache
        return {"prefill_s": round(time.perf_counter() - t0, 2),
                "argmax4": first}

    def s4_composed_ttft():
        state.pop("cache2", None)  # free the pool before bench allocates its own
        ttft, times = bench.bench_ttft(
            params, config, B, T, dtype, kv_dtype="int8", reps=3,
            seq_len=S, kv_layout="paged", page_size=PS)
        return {"p50_ttft_ms": round(ttft * 1e3, 1),
                "times_ms": [round(t * 1e3, 1) for t in times]}

    ok = stage("decode_step_b64_paged", s1_decode_step)
    if ok:
        ok = stage("greedy_loop_b64_paged", s2_greedy_loop)
    if ok:
        ok = stage("wave_prefill_b64", s3_wave_prefill)
    if ok:
        ok = stage("composed_ttft_b64", s4_composed_ttft)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
