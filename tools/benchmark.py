#!/usr/bin/env python
"""Benchmark table runner — the BASELINE.md measurement harness.

Sweeps (config x quant x batch), measuring decode tokens/s/chip and prefill
TTFT; emits JSONL rows + a markdown table.  `bench.py` at the repo root stays
the driver's single-line entry point; this produces the full table.

    python tools/benchmark.py --configs 110m 7b --batches 1 8 32 --quant both
"""

from __future__ import annotations

import argparse
import json
import time


def bench_prefill_ttft(config, batch, prompt_len, dtype, quant=None):
    import jax
    import jax.numpy as jnp

    from tpu_llama.models import (
        forward_prefill, make_kv_cache, quantize_params, random_params,
    )

    params = random_params(config, dtype=dtype, seed=0)
    if quant == "int8":
        params = jax.block_until_ready(quantize_params(params))
    cache = make_kv_cache(config, batch, kv_dtype=dtype)
    tokens = jnp.zeros((batch, prompt_len), jnp.int32)
    start = jnp.zeros((batch,), jnp.int32)
    lengths = jnp.full((batch,), prompt_len, jnp.int32)

    import numpy as np

    fn = jax.jit(
        lambda p, c: forward_prefill(p, c, tokens, start, lengths, config,
                                     precision="default", logits_mode="last"),
        donate_argnums=(1,),
    )
    logits, cache = fn(params, cache)  # compile
    np.asarray(logits)  # host readback = real completion (see CLAUDE.md)
    cache2 = make_kv_cache(config, batch, kv_dtype=dtype)
    t0 = time.perf_counter()
    logits, _ = fn(params, cache2)
    np.asarray(logits)
    return time.perf_counter() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", nargs="+", default=["110m"],
                    choices=["15m", "110m", "7b", "13b"])
    ap.add_argument("--batches", nargs="+", type=int, default=[1, 8])
    ap.add_argument("--quant", default="both", choices=["none", "int8", "both"])
    ap.add_argument("--steps", type=int, default=32)
    ap.add_argument("--prompt-len", type=int, default=512)
    ap.add_argument("--kv", default="same", choices=["same", "int8"])
    args = ap.parse_args()

    import jax.numpy as jnp

    from bench import bench_decode  # repo-root bench.py
    from tpu_llama.config import LLAMA2_7B, LLAMA2_13B, STORIES15M, STORIES110M

    configs = {"15m": STORIES15M, "110m": STORIES110M,
               "7b": LLAMA2_7B, "13b": LLAMA2_13B}
    quants = {"none": [None], "int8": ["int8"], "both": [None, "int8"]}[args.quant]

    rows = []
    for name in args.configs:
        config = configs[name]
        for quant in quants:
            for batch in args.batches:
                try:
                    tps = bench_decode(config, batch, args.steps, jnp.bfloat16,
                                       quant=quant)
                    ttft = bench_prefill_ttft(config, min(batch, 8),
                                              args.prompt_len, jnp.bfloat16,
                                              quant=quant)
                except Exception as e:  # noqa: BLE001
                    print(f"# {name} quant={quant} b={batch}: "
                          f"{type(e).__name__}: {e}")
                    continue
                row = {
                    "config": name, "quant": quant or "bf16", "batch": batch,
                    "decode_tok_s": round(tps, 2),
                    "prefill_ttft_s": round(ttft, 4),
                    "prompt_len": args.prompt_len,
                }
                rows.append(row)
                print(json.dumps(row), flush=True)

    print("\n| config | quant | batch | decode tok/s | TTFT(s) |")
    print("|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['config']} | {r['quant']} | {r['batch']} | "
              f"{r['decode_tok_s']} | {r['prefill_ttft_s']} |")


if __name__ == "__main__":
    main()
