"""Interleaved A/B of the fresh prefill-attention kernel's triangular
strip split (VERDICT r4 #2: flash-prefill attention is 76.4 ms of the 7B
b8 T512 TTFT at ~9.5-11 us/cell, and the per-cell floor is VPU pass count
— tri=k cuts the dot/softmax AREA to (k+1)/2k of the full square).

Run on TPU:  python tools/fresh_tri_probe.py [--tris 1,2,4,8] [--iters 32]
Geometry defaults to the 7B b8 T512 TTFT shape (B=8, NH=KVH=32, hd=128,
S=1024 cache, int8 KV).  Interleaved reps — the only method that resolves
<10% deltas on this time-shared chip (CLAUDE.md).
"""
from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/tpu_llama_jax_cache")
if "--cpu" in sys.argv:
    sys.argv.remove("--cpu")
    jax.config.update("jax_platforms", "cpu")

import functools

import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--t", type=int, default=512)
    ap.add_argument("--seq-len", type=int, default=1024)
    ap.add_argument("--heads", type=int, default=32)
    ap.add_argument("--kv-heads", type=int, default=32)
    ap.add_argument("--hd", type=int, default=128)
    ap.add_argument("--iters", type=int, default=32)
    ap.add_argument("--reps", type=int, default=7)
    ap.add_argument("--tris", default="1,2,4,8")
    args = ap.parse_args()

    from tpu_llama.ops.attention import flash_prefill_attention

    B, T, NH, KVH, hd, S = (args.batch, args.t, args.heads, args.kv_heads,
                            args.hd, args.seq_len)
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, T, NH, hd)) * 0.1, jnp.float32)
    kc = jnp.asarray(rng.integers(-127, 128, (B, KVH, S, hd)), jnp.int8)
    vc = jnp.asarray(rng.integers(-127, 128, (B, KVH, S, hd)), jnp.int8)
    ks = jnp.asarray(rng.uniform(0.01, 0.1, (B, KVH, S)), jnp.float32)
    vs = jnp.asarray(rng.uniform(0.01, 0.1, (B, KVH, S)), jnp.float32)
    start = jnp.zeros((B,), jnp.int32)

    @functools.partial(jax.jit, static_argnames=("tri",))
    def loop(q, kc, vc, ks, vs, tri):
        def body(acc, _):
            att = flash_prefill_attention(
                q, kc, vc, start, ks, vs, max_keys=T, assume_fresh=True,
                tri=tri)
            return acc + att[:, 0, 0], None

        out, _ = jax.lax.scan(body, jnp.zeros((B,), jnp.float32),
                              None, length=args.iters)
        return out

    tris = [int(x) for x in args.tris.split(",")]
    # correctness vs tri=1 before timing
    ref = np.asarray(flash_prefill_attention(
        q, kc, vc, start, ks, vs, max_keys=T, assume_fresh=True, tri=1))
    for tri in tris[1:]:
        got = np.asarray(flash_prefill_attention(
            q, kc, vc, start, ks, vs, max_keys=T, assume_fresh=True,
            tri=tri))
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)
    print("correctness: OK", file=sys.stderr)

    for tri in tris:  # compile + warm
        np.asarray(loop(q, kc, vc, ks, vs, tri))
    times = {tri: [] for tri in tris}
    for _ in range(args.reps):
        for tri in tris:
            t0 = time.perf_counter()
            np.asarray(loop(q, kc, vc, ks, vs, tri))
            times[tri].append(time.perf_counter() - t0)
    res = {}
    for tri, ts in times.items():
        med = float(np.median(ts)) / args.iters
        res[str(tri)] = {"ms_per_call": round(med * 1e3, 3),
                         "spread": round((max(ts) - min(ts)) / np.median(ts),
                                         3)}
    print(json.dumps({"shape": [B, T, NH, hd, S], "iters": args.iters,
                      "ab": res}))


if __name__ == "__main__":
    main()
