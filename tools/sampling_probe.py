#!/usr/bin/env python
"""On-device sampling cost attribution (serving-path suspect, r3).

The serving 32-slot occupancy gap (1047 vs 2200 raw, VERDICT r2 weak #5)
is NOT explained by chunk dispatch overhead (2 dispatches x 27 ms over a
2.96 s wall).  Each decode+sample step runs `ops.sampling.sample` on
[B, 32000] logits: jnp.argsort (stable) over the full vocab + full-vocab
gumbel.  XLA sort on TPU is a multi-pass bitonic network — suspected
~10-15 ms/step, i.e. the entire gap.

Probes (all 64-step scans, host readback, median of --reps):
  greedy    — argmax only (the raw-decode baseline)
  sample    — current sort-based sampler
  nosort    — binary-search-threshold prototype (no argsort):
              top-p mass threshold + top-k count threshold found by
              ~24 halvings, then masked gumbel-argmax
  gumbel    — gumbel-argmax with NO filter (lower bound w/o the sort)
"""

from __future__ import annotations

import argparse
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/tpu_llama_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np


def timed(fn, reps):
    np.asarray(jax.block_until_ready(fn()))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(jax.block_until_ready(fn()))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--vocab", type=int, default=32000)
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()
    B, V, N = args.batch, args.vocab, args.steps

    from tpu_llama.ops.sampling import sample, sample_nosort

    logits = jax.random.normal(jax.random.key(0), (B, V), jnp.float32) * 4
    keys = jax.vmap(jax.random.key)(jnp.arange(B, dtype=jnp.uint32))
    temps = jnp.full((B,), 0.8, jnp.float32)
    topps = jnp.full((B,), 0.95, jnp.float32)
    topks = jnp.zeros((B,), jnp.int32)

    def scan_of(fn):
        @jax.jit
        def run(logits, keys):
            def body(acc, i):
                ks = jax.vmap(jax.random.fold_in, in_axes=(0, None))(keys, i)
                t = fn(logits + acc[:, None] * 1e-6, ks)
                return t.astype(jnp.float32), t
            _, toks = jax.lax.scan(body, jnp.zeros((B,), jnp.float32),
                                   jnp.arange(N))
            return toks
        return lambda: run(logits, keys)

    ms = timed(scan_of(lambda lg, ks: jnp.argmax(lg, -1).astype(jnp.int32)),
               args.reps)
    print(f"greedy  x{N} [B{B},V{V}]: {ms:.1f} ms ({ms/N*1e3:.0f} us/step)",
          flush=True)

    ms = timed(scan_of(lambda lg, ks: sample(lg, ks, temps, topps, topks)),
               args.reps)
    print(f"sample  x{N} [B{B},V{V}]: {ms:.1f} ms ({ms/N*1e3:.0f} us/step)",
          flush=True)

    ms = timed(scan_of(
        lambda lg, ks: sample_nosort(lg, ks, temps, topps, topks)), args.reps)
    print(f"nosort  x{N} [B{B},V{V}]: {ms:.1f} ms ({ms/N*1e3:.0f} us/step)",
          flush=True)

    ms = timed(scan_of(
        lambda lg, ks: sample_nosort(lg, ks, temps, jnp.ones((B,)), topks)),
        args.reps)
    print(f"gumbel  x{N} [B{B},V{V}] (no filter): {ms:.1f} ms "
          f"({ms/N*1e3:.0f} us/step)", flush=True)


if __name__ == "__main__":
    main()
