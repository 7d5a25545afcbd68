"""Heterogeneous long-context decode row — the capability the page pool
buys past the dense int8 wall (NEXT r5 #4).

At 7B b8 the dense int8 cache hits HBM capacity at S ~= 4800
(w4_rows_r5.log): params 6.7 GB + [L,8,KVH,S,hd] k+v.  A dense b8 x 8192
cache is 16.8 GB — cannot exist on one chip.  The page pool reserves per
SLOT, so one 8k-context request beside seven short ones costs only the
positions actually reserved: slot 0 gets long_cap, slots 1..B-1 get
short_cap, pool ~= (long_cap + (B-1)*short_cap + ps) positions.  At the
default geometry that is ~4.2 GB — the row in this file exists ONLY
because of paged reservation (generalizes the reference's single [S]
cache, llama2.ts:196-203, to per-request reservation).

Decode runs the production stack: greedy_decode_loop, paged int8 KV,
auto attention (manual-DMA paged flash), per-row positions.  RoPE is
extended past the checkpoint horizon with extend_rope (same formula,
models/llama.py:361).

Usage (TPU):
  python tools/longctx_bench.py                # 7B, slot0 @ 7680/8192
  python tools/longctx_bench.py --record       # append to BENCH_sweep.jsonl
Prints one JSON line.
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/tpu_llama_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="7b", choices=["7b", "13b", "110m"])
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=256)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--page-size", type=int, default=512)
    ap.add_argument("--long-cap", type=int, default=8192,
                    help="slot 0 reservation (positions)")
    ap.add_argument("--short-cap", type=int, default=1024,
                    help="reservation for slots 1..B-1")
    ap.add_argument("--long-fill", type=int, default=7680,
                    help="slot 0 context length at measurement")
    ap.add_argument("--short-fill", type=int, default=768)
    ap.add_argument("--record", action="store_true",
                    help="append the row to BENCH_sweep.jsonl")
    ap.add_argument("--ttft", action="store_true",
                    help="also measure TTFT of the long prompt: pool-direct "
                         "prefill of slot 0's long_fill tokens (B=1, "
                         "unrolled chunk loop) + sampled-token readback")
    ap.add_argument("--ttft-chunk", type=int, default=512,
                    help="prefill chunk (must divide page size and "
                         "long_fill)")
    ap.add_argument("--wave-chunks", type=int, default=3,
                    help="chunks per host-dispatched prefill wave (<=3 is "
                         "the r5 Mosaic scoped-vmem envelope at B=1)")
    args = ap.parse_args()

    from tpu_llama.config import LLAMA2_7B, LLAMA2_13B, STORIES110M
    from tpu_llama.models import make_kv_cache
    from tpu_llama.models.llama import (extend_rope, greedy_decode_loop,
                                        random_quant_params)
    from tpu_llama.runtime.paged import PagePool

    config = {"7b": LLAMA2_7B, "13b": LLAMA2_13B,
              "110m": STORIES110M}[args.config]
    B, ps = args.batch, args.page_size
    assert args.long_fill + args.steps <= args.long_cap, "slot 0 overflows"
    assert args.short_fill + args.steps <= args.short_cap, "short slots overflow"

    t0 = time.time()
    print("building params...", file=sys.stderr, flush=True)
    params = jax.block_until_ready(
        random_quant_params(config, mode="w8a8", fuse=True))
    print(f"params built {time.time() - t0:.1f}s", file=sys.stderr,
          flush=True)
    params = extend_rope(params, args.long_cap)

    # heterogeneous reservations: the whole point of the row
    mp = -(-args.long_cap // ps)
    n_pages = mp + (B - 1) * (-(-args.short_cap // ps)) + 1  # +1 trash
    pool = PagePool(n_pages, ps, slots=B, max_pages_per_slot=mp)
    assert pool.reserve(0, args.long_cap) is not None
    for s in range(1, B):
        assert pool.reserve(s, args.short_cap) is not None
    cache = make_kv_cache(config, batch=B, kv_dtype="int8", paged=True,
                          num_pages=n_pages, page_size=ps,
                          seq_len=args.long_cap)
    cache = dataclasses.replace(cache, page_table=jnp.asarray(pool.table))

    kv_bytes = (cache.k.size + cache.v.size
                + cache.ks.size * 4 + cache.vs.size * 4)
    dense_bytes = (2 * config.n_layers * B * config.n_kv_heads
                   * args.long_cap * config.head_dim)  # int8 k+v, no scales
    print(f"pool {kv_bytes / 1e9:.2f} GB vs dense-equivalent "
          f"{dense_bytes / 1e9:.2f} GB (b{B} x {args.long_cap})",
          file=sys.stderr, flush=True)

    ttft_ms = None
    if args.ttft:
        from functools import partial

        from tpu_llama.models.llama import forward_prefill_paged_chunked

        # Host-dispatched waves of <= wave_chunks chunks through ONE
        # compiled program (traced start0): the r5 Mosaic scoped-vmem
        # budget caps a B=1 unrolled paged-prefill program at ~3 chunks
        # (compile_probe prefill_paged_long: n<=3 green, n>=4 fails with a
        # fixed 77.48M scoped alloc at the silu kernel regardless of n).
        W = args.ttft_chunk * args.wave_chunks
        assert args.long_fill % args.ttft_chunk == 0
        if args.long_fill % W:  # tail wave would change program shape
            W = args.ttft_chunk  # degrade to per-chunk waves
        pf = jax.jit(partial(forward_prefill_paged_chunked, config=config,
                             precision="default", chunk=args.ttft_chunk,
                             max_pos=args.long_fill),
                     donate_argnums=(1,))
        tok_p = jnp.zeros((1, args.long_fill), jnp.int32)
        len_p = jnp.array([args.long_fill], jnp.int32)
        slot_p = jnp.array([0], jnp.int32)

        def run_prefill(cache):
            logits = None
            for w in range(0, args.long_fill, W):
                logits, cache = pf(params, cache, tok_p[:, w:w + W],
                                   len_p, slot_p, start0=jnp.int32(w))
            np.asarray(jnp.argmax(logits, -1))  # sampled-token readback
            return cache

        t0 = time.time()
        print(f"compiling + warming long prefill ({W}-token waves)...",
              file=sys.stderr, flush=True)
        cache = run_prefill(cache)
        print(f"prefill warm done {time.time() - t0:.1f}s", file=sys.stderr,
              flush=True)
        pf_times = []
        for _ in range(max(3, args.reps)):
            t0 = time.perf_counter()
            cache = run_prefill(cache)
            pf_times.append(time.perf_counter() - t0)
        ttft_ms = round(float(np.median(pf_times)) * 1e3, 1)
        print(f"long-prompt TTFT p50 {ttft_ms} ms "
              f"(times {[round(t * 1e3, 1) for t in pf_times]})",
              file=sys.stderr, flush=True)

    tokens = jnp.zeros((B,), jnp.int32)
    pos = jnp.asarray([args.long_fill] + [args.short_fill] * (B - 1),
                      jnp.int32)

    t0 = time.time()
    print("compiling + warming decode loop...", file=sys.stderr, flush=True)
    out, cache = greedy_decode_loop(params, cache, tokens, pos, args.steps,
                                    config)
    np.asarray(out)  # host readback = real completion (CLAUDE.md)
    print(f"warm done {time.time() - t0:.1f}s", file=sys.stderr, flush=True)
    times = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        out, cache = greedy_decode_loop(params, cache, tokens, pos,
                                        args.steps, config)
        np.asarray(out)
        times.append(time.perf_counter() - t0)
    med = float(np.median(times))
    spread = (max(times) - min(times)) / med
    rec = {
        "metric": (f"decode_tokens_per_sec_{args.config}_bfloat16_w8a8_"
                   f"kvint8_paged_longctx_b{B}"),
        "value": round(B * args.steps / med, 3),
        "unit": "tok/s/chip",
        "spread": round(spread, 3),
        "steps": args.steps,
        "seq_fill": [args.long_fill] + [args.short_fill] * (B - 1),
        "reservations": [args.long_cap] + [args.short_cap] * (B - 1),
        "pool_gb": round(kv_bytes / 1e9, 2),
        "dense_equiv_gb": round(dense_bytes / 1e9, 2),
        "note": "heterogeneous per-slot reservation; dense b8 int8 wall is "
                "~S4800 at 7B (w4_rows_r5.log) — this row needs paged",
    }
    if ttft_ms is not None:
        rec["long_prompt_ttft_ms"] = ttft_ms
    line = json.dumps(rec)
    print(line, flush=True)
    if args.record:
        with open("BENCH_sweep.jsonl", "a") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
