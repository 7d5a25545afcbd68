"""Attribute the b64 paged waved TTFT (VERDICT r4 #6: 1221.5 ms p50 — a
number, not a good number).

Measures, on the real chip: (a) each wave's DEVICE time (synced per wave),
(b) the pipelined total (no inter-wave sync — what bench_ttft pays),
(c) the decode step, (d) whether later waves hit fresh compiles.

Run:  python tools/b64_wave_probe.py [--batch 64] [--t 512] [--reps 3]
"""
from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/tpu_llama_jax_cache")

import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--t", type=int, default=512)
    ap.add_argument("--seq-len", type=int, default=512)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import bench
    from tpu_llama.config import LLAMA2_7B
    from tpu_llama.runtime.engine import (_POOL_CHUNK, _WAVE_ROWS,
                                          _decode_step, _prefill_into_slots)

    config = LLAMA2_7B
    B, T = args.batch, args.t
    params = bench._build(config, jnp.dtype("bfloat16"), "w8a8", True)
    tokens = jnp.zeros((B, T), jnp.int32)
    lengths = jnp.full((B,), T, jnp.int32)
    slots = jnp.arange(B, dtype=jnp.int32)
    bw = max(1, min(B, _WAVE_ROWS // _POOL_CHUNK))
    n_waves = -(-B // bw)
    print(f"waves: {n_waves} x {bw} slots, chunk {_POOL_CHUNK}",
          file=sys.stderr)

    def make_cache():
        return bench._make_cache(config, B, "int8", args.seq_len, "paged")

    # warm/compile every wave shape once
    cache = make_cache()
    for w in range(0, B, bw):
        out_w, _, cache = _prefill_into_slots(
            params, cache, tokens[w:w + bw], lengths[w:w + bw],
            slots[w:w + bw], config, precision="default",
            logits_mode="last", pool_direct=True)
        np.asarray(out_w)
    del cache

    per_wave = []
    pipelined = []
    decode_ms = []
    for _ in range(args.reps):
        # (a) per-wave synced
        cache = make_cache()
        times = []
        for w in range(0, B, bw):
            t0 = time.perf_counter()
            out_w, _, cache = _prefill_into_slots(
                params, cache, tokens[w:w + bw], lengths[w:w + bw],
                slots[w:w + bw], config, precision="default",
                logits_mode="last", pool_direct=True)
            np.asarray(out_w)
            times.append(round((time.perf_counter() - t0) * 1e3, 1))
        per_wave.append(times)
        del cache
        # (b) pipelined (bench semantics) + (c) decode step
        cache = make_cache()
        t0 = time.perf_counter()
        outs = []
        for w in range(0, B, bw):
            out_w, _, cache = _prefill_into_slots(
                params, cache, tokens[w:w + bw], lengths[w:w + bw],
                slots[w:w + bw], config, precision="default",
                logits_mode="last", pool_direct=True)
            outs.append(out_w)
        nxt = jnp.argmax(jnp.concatenate(outs, 0), -1).astype(jnp.int32)
        np.asarray(nxt)
        t1 = time.perf_counter()
        logits2, cache = _decode_step(params, cache, nxt, lengths, config,
                                      "default")
        np.asarray(jnp.argmax(logits2, -1))
        t2 = time.perf_counter()
        pipelined.append(round((t1 - t0) * 1e3, 1))
        decode_ms.append(round((t2 - t1) * 1e3, 1))
        del cache

    print(json.dumps({
        "batch": B, "t": T, "waves": n_waves, "wave_slots": bw,
        "per_wave_ms_synced": per_wave,
        "pipelined_prefill_ms": pipelined,
        "decode_step_ms": decode_ms,
    }))


if __name__ == "__main__":
    main()
