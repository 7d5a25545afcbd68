#!/usr/bin/env python
"""Decode step-time ablation: where do the milliseconds go?

No device-plane profiler exists through the relay (CLAUDE.md), so this
attributes step time by differencing configurations: layer count (per-layer
cost), KV dtype / attention impl (attention + cache-write cost), quant mode
(matmul cost), steps (fixed dispatch overhead).

  python tools/ablate.py --cases L8,L32,kvbf16,attnxla,nofuse,steps512
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/tpu_llama_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from tpu_llama.config import LLAMA2_7B


def run(name: str, config, batch=8, steps=256, kv="int8", attn="auto",
        fuse=True, reps=3, seq_fill=512, seq_len=None, quant="w8a8"):
    from tpu_llama.models import make_kv_cache
    from tpu_llama.models.llama import greedy_decode_loop, random_quant_params

    params = jax.block_until_ready(
        random_quant_params(config, mode=quant, fuse=fuse)
        if quant in ("w8a8", "q8_0") else None)
    if params is None:
        from tpu_llama.models import random_params
        params = jax.block_until_ready(
            random_params(config, dtype=jnp.bfloat16))
    cache = make_kv_cache(config, batch=batch, kv_dtype=kv, seq_len=seq_len)
    tokens = jnp.zeros((batch,), jnp.int32)
    pos = jnp.full((batch,), seq_fill, jnp.int32)
    out, cache = greedy_decode_loop(params, cache, tokens, pos, steps, config,
                                    attn=attn)
    np.asarray(out)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out, cache = greedy_decode_loop(params, cache, tokens, pos, steps,
                                        config, attn=attn)
        np.asarray(out)
        times.append(time.perf_counter() - t0)
    med = float(np.median(times))
    print(json.dumps({"case": name, "ms_per_step": round(med / steps * 1e3, 3),
                      "tok_s": round(batch * steps / med, 1),
                      "steps": steps,
                      "spread": round((max(times) - min(times)) / med, 3)}),
          flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cases", default="L32,L8")
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()
    c7 = LLAMA2_7B
    for case in args.cases.split(","):
        try:
            if case.startswith("L"):
                cfg = dataclasses.replace(c7, n_layers=int(case[1:]))
                run(case, cfg, batch=args.batch)
            elif case == "kvbf16":
                run(case, c7, batch=args.batch, kv="bfloat16")
            elif case == "attnxla":
                run(case, c7, batch=args.batch, attn="xla")
            elif case == "attnflash":
                run(case, c7, batch=args.batch, attn="flash")
            elif case == "nofuse":
                run(case, c7, batch=args.batch, fuse=False)
            elif case == "q8":
                run(case, c7, batch=args.batch, quant="q8_0")
            elif case.startswith("steps"):
                run(case, c7, batch=args.batch, steps=int(case[5:]))
            elif case.startswith("S"):
                run(case, c7, batch=args.batch, seq_len=int(case[1:]))
            elif case.startswith("b"):
                run(case, c7, batch=int(case[1:]))
            else:
                print(json.dumps({"case": case, "error": "unknown"}))
        except Exception as e:
            print(json.dumps({"case": case,
                              "error": f"{type(e).__name__}: {e}"[:200]}),
                  flush=True)


if __name__ == "__main__":
    main()
