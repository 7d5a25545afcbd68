#!/usr/bin/env python
"""Serving-stack benchmark: continuous batching + device sampling + chunks.

Measures the scheduler path end-to-end (not just the raw decode loop):
aggregate tok/s, per-request tok/s, TTFT percentiles; warm-up wave first so
the numbers exclude compiles.

    python tools/serving_bench.py --config 110m --slots 16 --requests 48 \
        --steps 128 --chunk 8 [--kv int8] [--quant w8a8]
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="110m", choices=["15m", "110m", "7b", "13b"])
    ap.add_argument("--slots", type=int, default=16)
    ap.add_argument("--requests", type=int, default=48)
    ap.add_argument("--steps", type=int, default=128,
                    help="TOTAL per-request budget INCLUDING the prompt "
                         "(reference -n semantics, llama2.ts:476-503): a "
                         "request emits steps - prompt_len - 1 tokens, and "
                         "steps <= prompt_len teacher-forces then retires "
                         "with ZERO output — pass prompt_len + decode "
                         "tokens wanted")
    ap.add_argument("--prompt-len", type=int, default=31)
    ap.add_argument("--chunk", type=int, default=8)
    ap.add_argument("--kv", default="int8")
    ap.add_argument("--kv-layout", default="dense", choices=["dense", "paged"])
    ap.add_argument("--page-size", type=int, default=512)
    ap.add_argument("--attn", default="auto",
                    choices=["auto", "flash", "flash_dma", "xla"])
    ap.add_argument("--seq-len", type=int, default=None,
                    help="engine KV capacity (default: model seq_len)")
    ap.add_argument("--quant", default=None, choices=[None, "int8", "w8a8"])
    ap.add_argument("--temperature", type=float, default=0.8)
    ap.add_argument("--occupancy-sweep", action="store_true",
                    help="measure at slots/2, slots, and 3x-oversubscribed; "
                         "append results to BENCH_serving.jsonl")
    ap.add_argument("--profile", action="store_true",
                    help="print per-phase wall-time attribution "
                         "(ContinuousBatcher.timers) after each measurement")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/tpu_llama_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from tpu_llama.config import LLAMA2_7B, LLAMA2_13B, STORIES15M, STORIES110M
    from tpu_llama.models import quantize_params, random_params
    from tpu_llama.runtime import ContinuousBatcher, Engine, Request
    from tpu_llama.runtime.metrics import summarize

    configs = {"15m": STORIES15M, "110m": STORIES110M,
               "7b": LLAMA2_7B, "13b": LLAMA2_13B}
    config = configs[args.config]
    if args.quant and args.config in ("7b", "13b"):
        # fp form would not fit HBM alongside the int8 copy — generate int8
        from tpu_llama.models.llama import random_quant_params

        params = random_quant_params(
            config, mode="q8_0" if args.quant == "int8" else "w8a8",
            fuse=True)
    else:
        params = random_params(config, dtype=jnp.bfloat16, seed=0)
        if args.quant:
            params = quantize_params(
                params, mode="q8_0" if args.quant == "int8" else "w8a8")
    engine = Engine(params, config, max_batch=args.slots, kv_dtype=args.kv,
                    kv_layout=args.kv_layout, page_size=args.page_size,
                    seq_len=args.seq_len, attn=args.attn)
    batcher = ContinuousBatcher(engine, max_chunk=args.chunk)
    rng = np.random.default_rng(0)

    def wave(n):
        reqs = [Request(
            prompt_tokens=rng.integers(3, config.vocab_size - 1,
                                       size=args.prompt_len).tolist(),
            steps=args.steps, temperature=args.temperature, topp=0.95,
            seed=i, device_sampling=True) for i in range(n)]
        t0 = time.time()
        for r in reqs:
            batcher.submit(r)
        batcher.run()
        return reqs, time.time() - t0

    # Warm BOTH the full- and half-occupancy admission shapes: the admission
    # prefill batch is pow2-grouped (engine.prefill), so wave(slots) warms
    # [slots, T] but NOT [slots//2, T] — measuring the half-occupancy point
    # against a cold shape charged ~1.1 s of compile/deserialize to its TTFT
    # and tok/s (r4: 591 tok/s with the stall vs ~1000 without).
    _, warm = wave(min(args.slots, args.requests))
    _, warm2 = wave(max(1, min(args.slots, args.requests) // 2))
    print(f"# warmup (compiles): {warm:.1f}s + {warm2:.1f}s", flush=True)

    def measure(n_requests: int) -> dict:
        batcher.finished.clear()
        for k in batcher.timers:
            batcher.timers[k] = 0 if isinstance(batcher.timers[k], int) \
                else 0.0
        reqs, wall = wave(n_requests)
        if args.profile:
            t = batcher.timers
            attributed = t["admit"] + t["decode_dispatch"] + \
                t["decode_read"] + t["emit"]
            print(f"# timers: admit={t['admit']:.2f}s "
                  f"dispatch={t['decode_dispatch']:.2f}s "
                  f"read={t['decode_read']:.2f}s emit={t['emit']:.2f}s "
                  f"| other={wall - attributed:.2f}s of {wall:.2f}s "
                  f"| {t['chunks']} chunks/{t['chunk_steps']} steps, "
                  f"{t['admits']} admits/{t['admitted']} reqs", flush=True)
        rep = summarize(reqs)
        return {
            "config": args.config, "slots": args.slots,
            "requests": n_requests,
            "occupancy": round(min(1.0, n_requests / args.slots), 2),
            "chunk": args.chunk, "kv": args.kv, "quant": args.quant,
            "kv_layout": args.kv_layout, "seq_len": args.seq_len,
            "attn": args.attn,
            "wall_s": round(wall, 2),
            "tokens_per_sec": round(rep.tokens_per_sec, 1),
            "per_request_tps_p50": round(rep.per_request_tps_p50, 2),
            "ttft_p50_s": round(rep.ttft_p50_s, 3),
            "ttft_p95_s": round(rep.ttft_p95_s, 3),
        }

    if args.occupancy_sweep:
        # BASELINE gate: record >=2 occupancy levels (NEXT.md r1 #10) —
        # half-full, full, and 3x oversubscribed (queueing visible in TTFT)
        out = []
        for n in (max(1, args.slots // 2), args.slots, args.slots * 3):
            rec = measure(n)
            print(json.dumps(rec), flush=True)
            out.append(rec)
        with open("BENCH_serving.jsonl", "a") as f:
            for rec in out:
                f.write(json.dumps(rec) + "\n")
    else:
        print(json.dumps(measure(args.requests)))


if __name__ == "__main__":
    main()
