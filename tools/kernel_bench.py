#!/usr/bin/env python
"""Matmul-kernel A/B microbenchmark (decode shapes, real TPU).

Methodology (CLAUDE.md): per-dispatch latency through the relay is ~1 ms and
block_until_ready can return early, so each case runs ITERS matmuls inside ONE
jitted lax.scan (data-dependent chain defeats loop hoisting) and the timing
window ends with a host readback.  Reports ms/iter and effective weight-stream
GB/s so variants can be compared against the HBM roofline.

Usage:
  python tools/kernel_bench.py --cases xla_bf16,w8a8 --shapes 7b_ffn
"""

from __future__ import annotations

import argparse
import functools
import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/tpu_llama_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from tpu_llama.ops.matmul import q8_matmul, w8a8_matmul, w8a8_matmul_xla
from tpu_llama.ops.quant import quantize_channel, quantize_q8

# decode shapes for Llama-2 7B (fused projections) and a couple of others
SHAPES = {
    "7b_qkv": (4096, 12288),
    "7b_wo": (4096, 4096),
    "7b_w13": (4096, 22016),
    "7b_ffn": (11008, 4096),   # w2 — the IN-heavy one
    "7b_cls": (4096, 32000),
}


def _chain(out, x):
    """Cheap data dependence: x' = x + f(out) so XLA can't hoist the matmul."""
    r = jnp.sum(out[..., :1]) * 1e-30
    return x + r.astype(x.dtype)


def make_case(name: str, IN: int, OUT: int, B: int, key):
    """Returns (weights_pytree, step_fn(x, w) -> out[B, OUT])."""
    wf = jax.random.normal(key, (IN, OUT), jnp.float32) * 0.02
    if name == "xla_bf16":
        w = wf.astype(jnp.bfloat16)
        return w, lambda x, w: jnp.dot(x.astype(jnp.bfloat16), w,
                                       preferred_element_type=jnp.float32)
    if name == "xla_f32":
        return wf, lambda x, w: jnp.dot(x, w)
    if name == "xla_w8a8":
        return quantize_channel(wf), lambda x, w: w8a8_matmul_xla(x, w)
    if name == "w8a8":
        return quantize_channel(wf), lambda x, w: w8a8_matmul(x, w)
    if name.startswith("w8a8_t"):  # w8a8_t<TI>x<TO>
        ti, to = map(int, name[6:].split("x"))
        return quantize_channel(wf), lambda x, w: w8a8_matmul(
            x, w, block_out=to, block_in=ti)
    if name == "q8":
        return quantize_q8(wf), lambda x, w: q8_matmul(x, w)
    if name.startswith("q8_t"):
        ti, to = map(int, name[4:].split("x"))
        return quantize_q8(wf), lambda x, w: q8_matmul(
            x, w, block_out=to, block_in=ti)
    raise ValueError(name)


def run_case(name: str, shape_name: str, B: int, iters: int, reps: int):
    IN, OUT = SHAPES[shape_name]
    w, step = make_case(name, IN, OUT, B, jax.random.PRNGKey(0))
    x0 = jax.random.normal(jax.random.PRNGKey(1), (B, IN), jnp.float32)

    @jax.jit
    def loop(x, w):
        def body(x, _):
            out = step(x, w)
            return _chain(out, x), out[0, :1]
        x, outs = jax.lax.scan(body, x, length=iters)
        return x, outs

    x, outs = loop(x0, w)
    np.asarray(outs)  # compile + real completion
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        x, outs = loop(x0, w)
        np.asarray(outs)
        times.append(time.perf_counter() - t0)
    med = float(np.median(times))
    ms = med / iters * 1e3
    wbytes = sum(int(np.prod(a.shape)) * a.dtype.itemsize
                 for a in jax.tree.leaves(w))
    gbs = wbytes / (med / iters) / 1e9
    rec = {"case": name, "shape": shape_name, "B": B, "ms_per_iter": round(ms, 4),
           "weight_GB_s": round(gbs, 1), "spread": round(
               (max(times) - min(times)) / med, 3)}
    print(json.dumps(rec), flush=True)
    return rec


def bandwidth_probe(nbytes: int = 1 << 30, reps: int = 5):
    """Pure HBM read bandwidth: sum over a large int8 array, scanned."""
    a = jnp.ones((nbytes,), jnp.int8)

    @jax.jit
    def loop(a, s0):
        def body(s, _):
            return s + jnp.sum(a, dtype=jnp.int32) + s * 0, None
        s, _ = jax.lax.scan(body, s0, length=8)
        return s

    s = loop(a, jnp.int32(0))
    np.asarray(s)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        s = loop(a, s)
        np.asarray(s)
        times.append(time.perf_counter() - t0)
    med = float(np.median(times)) / 8
    print(json.dumps({"case": "hbm_read_probe", "GB_s": round(nbytes / med / 1e9, 1),
                      "ms": round(med * 1e3, 3)}), flush=True)


def run_attention(B: int, KVH: int, S: int, hd: int, pos_fill: int,
                  iters: int, reps: int, block_s: int, int8: bool = True):
    """Flash decode attention at a given context fill (block-skip A/B)."""
    from tpu_llama.ops.attention import flash_decode_attention

    key = jax.random.PRNGKey(0)
    G = 1
    q = jax.random.normal(key, (B, KVH, G, hd), jnp.float32)
    if int8:
        kc = jax.random.randint(key, (B, KVH, S, hd), -127, 127, jnp.int8)
        vc = jax.random.randint(key, (B, KVH, S, hd), -127, 127, jnp.int8)
        ks = jnp.full((B, KVH, S), 1e-2, jnp.float32)
        vs = jnp.full((B, KVH, S), 1e-2, jnp.float32)
    else:
        kc = jax.random.normal(key, (B, KVH, S, hd), jnp.bfloat16)
        vc = jax.random.normal(key, (B, KVH, S, hd), jnp.bfloat16)
        ks = vs = None
    pos = jnp.full((B,), pos_fill, jnp.int32)

    @functools.partial(jax.jit, static_argnames=("bs",))
    def loop(q, kc, vc, pos, bs):
        def body(q, _):
            out = flash_decode_attention(q, kc, vc, pos, ks, vs, block_s=bs)
            q2 = q + jnp.sum(out) * 1e-30
            return q2, out[0, 0, 0, :1]
        return jax.lax.scan(body, q, length=iters)

    q1, outs = loop(q, kc, vc, pos, block_s)
    np.asarray(outs)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _, outs = loop(q, kc, vc, pos, block_s)
        np.asarray(outs)
        times.append(time.perf_counter() - t0)
    med = float(np.median(times)) / iters
    # useful traffic: rows [0, pos] of K and V (+scales)
    itembytes = 1 if int8 else 2
    useful = 2 * B * KVH * (pos_fill + 1) * hd * itembytes
    full = 2 * B * KVH * S * hd * itembytes
    print(json.dumps({
        "case": f"flash_decode_{'int8' if int8 else 'bf16'}_bs{block_s}",
        "B": B, "KVH": KVH, "S": S, "pos": pos_fill,
        "ms_per_iter": round(med * 1e3, 4),
        "useful_GB_s": round(useful / med / 1e9, 1),
        "full_GB_s": round(full / med / 1e9, 1),
        "spread": round((max(times) - min(times)) / (med * iters), 3),
    }), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cases", default="xla_bf16,w8a8,q8")
    ap.add_argument("--shapes", default="7b_w13,7b_ffn")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--probe", action="store_true", help="HBM bandwidth probe")
    ap.add_argument("--attn", default="", help="comma list of pos:block_s "
                    "pairs, e.g. 512:256,512:2048 (7B-shape flash decode)")
    ap.add_argument("--attn-S", type=int, default=2048)
    args = ap.parse_args()

    if args.probe:
        bandwidth_probe()
    if args.attn:
        for spec in args.attn.split(","):
            posf, bs = map(int, spec.split(":"))
            try:
                run_attention(args.batch, 32, args.attn_S, 128, posf,
                              max(8, args.iters // 4), args.reps, bs)
            except Exception as e:
                print(json.dumps({"case": f"attn_{spec}",
                                  "error": f"{type(e).__name__}: {e}"[:200]}),
                      flush=True)
        return
    for shape in args.shapes.split(","):
        for case in args.cases.split(","):
            try:
                run_case(case, shape, args.batch, args.iters, args.reps)
            except Exception as e:
                print(json.dumps({"case": case, "shape": shape,
                                  "error": f"{type(e).__name__}: {e}"[:200]}),
                      flush=True)


if __name__ == "__main__":
    main()
