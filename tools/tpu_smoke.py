#!/usr/bin/env python
"""TPU kernel smoke gate — compile + run every Pallas kernel family on the
real chip, at the 7B shape, in ONE serialized pass.

Why this exists (VERDICT r2, missing #6): all CPU tests run Pallas in
interpret mode; mega2 shipped three Mosaic compile failures (lane-aligned
DMA slices, vector-reshape collapse, VMEM budget) invisible to 286 green
tests.  The failures appear only at the REAL shape on the REAL compiler, so
this gate runs the 7B plans, not toy ones.  Run it before every BENCH
capture:

    timeout 3600 python tools/tpu_smoke.py          # writes TPU_SMOKE.json

Each variant decodes a few steps through ``bench.bench_decode`` (which
covers the scan-carry flush kernels) or prefills through ``bench.bench_ttft``
(flash prefill + paged page-scatter).  Kernel families covered:

  mega2 (fused_step2), mega (fused_step), fused_layer + w8a8_matmul_stacked,
  q8/w8a8 matmul, flash_decode_attention[_fresh], flash_dma dense + paged,
  kv_cache_write_decode / kv_pool_write_decode, kv_cache_flush_rows /
  kv_pool_flush_rows, flash_prefill_attention, paged _prefill_into_slots.

First cold run is slow (30-120 s per program through the remote compile
service); the persistent cache (/tmp/tpu_llama_jax_cache) makes repeats
take a couple of minutes.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

import bench  # noqa: E402  (sets the persistent compile cache)
import jax.numpy as jnp  # noqa: E402

# (name, kind, kwargs) — kind "decode" -> bench_decode, "ttft" -> bench_ttft
VARIANTS = [
    ("mega3_b8_dense_int8", "decode", dict(batch=8, fused="mega3")),
    ("mega2_b8_dense_int8", "decode", dict(batch=8, fused="mega2")),
    ("mega_b1_dense_int8", "decode", dict(batch=1, fused="mega")),
    ("two_launch_b8_dense_int8", "decode", dict(batch=8, fused=True)),
    ("unfused_dma_b8_dense_int8", "decode",
     dict(batch=8, fused=False, attn="flash_dma")),
    ("unfused_flash_b8_dense_int8", "decode",
     dict(batch=8, fused=False, attn="flash")),
    ("unfused_xla_b2_dense_int8", "decode",
     dict(batch=2, fused=False, attn="xla")),
    ("paged_auto_b8_int8", "decode",
     dict(batch=8, kv_layout="paged", fused="auto")),
    ("paged_flash_b8_int8", "decode",
     dict(batch=8, kv_layout="paged", fused=False, attn="flash")),
    ("prefill_dense_b8_t512", "ttft", dict(batch=8, prompt_len=512)),
    # S=1024 pool: the S=2048 pool + compact chunk cache + params is ~15 GB
    # and OOMs the 16 GB chip — the kernels (pool scatter, paged prefill)
    # are what this gate validates, not the memory budget of one config
    ("prefill_paged_b8_t512", "ttft",
     dict(batch=8, prompt_len=512, kv_layout="paged", seq_len=1024)),
    # pool-DIRECT chunked prefill (paged_flash_prefill_attention +
    # kv_pool_write_chunk + per-layer carry writes): b48 crosses the
    # >16k-row gate, so bench_ttft routes through prefill_into_slots_waved
    # — 3 host-dispatched waves of 16 slots.  prompt_len == pool capacity,
    # so bench_ttft SKIPS the decode step (zero decode headroom would be an
    # OOB page-table read, ADVICE r3 high); this variant validates the wave
    # prefill kernels only.  Run LAST: it is the most memory-hungry
    # variant, and a crashed near-capacity program poisons the chip for
    # ~5 min (CLAUDE.md).
    ("prefill_pool_direct_b48_t512", "ttft",
     dict(batch=48, prompt_len=512, kv_layout="paged", seq_len=512)),
]


def main():
    from tpu_llama.config import LLAMA2_7B

    if jax.default_backend() != "tpu":
        print("tpu_smoke: no TPU backend — nothing to smoke", file=sys.stderr)
        sys.exit(2)

    config = LLAMA2_7B
    dtype = jnp.dtype("bfloat16")
    t_build = time.perf_counter()
    params = bench._build(config, dtype, "w8a8", fuse=True)
    results = {"build_s": round(time.perf_counter() - t_build, 1),
               "variants": {}}
    failures = 0
    for name, kind, kw in VARIANTS:
        t0 = time.perf_counter()
        try:
            if kind == "decode":
                toks, _, _ = bench.bench_decode(
                    params, config, kw.pop("batch"), steps=8, dtype=dtype,
                    kv_dtype="int8", reps=1, seq_fill=512, **kw)
                out = {"ok": True, "toks": round(toks, 1)}
            else:
                ttft, _ = bench.bench_ttft(
                    params, config, kw.pop("batch"), kw.pop("prompt_len"),
                    dtype, kv_dtype="int8", reps=1, **kw)
                out = {"ok": True, "ttft_ms": round(ttft * 1e3, 1)}
        except Exception as e:
            out = {"ok": False, "error": f"{type(e).__name__}: {e}"[:300]}
            failures += 1
        out["wall_s"] = round(time.perf_counter() - t0, 1)
        results["variants"][name] = out
        print(f"{name}: {json.dumps(out)}", flush=True)
        # each variant's jitted programs pin their (multi-GB) donated cache
        # buffers; ten variants' worth OOMs the 16 GB chip by the end — the
        # on-disk compile cache keeps repeat compiles cheap anyway
        jax.clear_caches()
    results["failures"] = failures
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "TPU_SMOKE.json"), "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({"metric": "tpu_smoke_failures", "value": failures,
                      "n_variants": len(VARIANTS)}))
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
