#!/usr/bin/env python
"""Decode-attention bottleneck ladder (round 2).

The deferred-flush decode kernel streams KV at only ~190 GB/s at b64
(tools/kernel_bench.py --fresh) against a ~640-750 GB/s chip.  This probe
isolates WHERE the time goes with a ladder of kernels over the same
[L*B, KVH, S, hd] int8 cache blocks:

  dma       block DMA only (body touches 8 rows)            -> pure HBM rate
  conv      + int8 -> bf16 elementwise convert + reduce     -> conversion cost
  dot       + both matmuls (scores + values) on bf16 MXU    -> MXU/layout cost
  full      the production fresh kernel                     -> + softmax/mask
  full_bf16 production kernel on a native bf16 cache        -> no-conversion A/B
  s8dot     int8 x int8 MXU dots (q and probs quantized)    -> conversion-free

Each case scans `iters` calls with a data dependency (acc chain) so XLA
cannot hoist; layer index cycles through the stacked cache like the decode
scan does.  GB/s is K+V cache bytes per call / time.
"""

from __future__ import annotations

import argparse
import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/tpu_llama_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _specs(B, KVH, S, hd, G8, KHb, with_scales):
    def small_index(b, k, s_ref):
        return (b, k, 0, 0)

    def kv_index(b, k, s_ref):
        return (s_ref[1, 0] * B + b, k, 0, 0)

    qspec = pl.BlockSpec((1, KHb, G8, hd), small_index,
                         memory_space=pltpu.VMEM)
    kvspec = pl.BlockSpec((1, KHb, S, hd), kv_index, memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((1, KHb, G8, hd), small_index,
                         memory_space=pltpu.VMEM)
    specs = [qspec, kvspec, kvspec]
    if with_scales:
        sspec = pl.BlockSpec((1, KHb, 1, S), kv_index,
                             memory_space=pltpu.VMEM)
        specs += [sspec, sspec]
    return specs, ospec


def _bench(fn, args_, iters, reps, bytes_per_iter, name, extra=None):
    @jax.jit
    def loop(q, *rest):
        def body(carry, l):
            out = fn(carry, l, *rest)
            q2 = carry + jnp.sum(out) * 1e-30
            return q2, out.reshape(-1)[:1]
        return jax.lax.scan(body, q, jnp.arange(iters, dtype=jnp.int32))

    q1, outs = loop(*args_)
    np.asarray(outs)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _, outs = loop(*args_)
        np.asarray(outs)
        times.append(time.perf_counter() - t0)
    med = float(np.median(times)) / iters
    rec = {"case": name, "ms_per_iter": round(med * 1e3, 4),
           "GB_s": round(bytes_per_iter / med / 1e9, 1),
           "spread": round((max(times) - min(times)) / (med * iters), 3)}
    if extra:
        rec.update(extra)
    print(json.dumps(rec), flush=True)
    return med


def run(case, L, B, KVH, S, hd, KHb, iters, reps):
    key = jax.random.PRNGKey(0)
    G8 = 8
    bf16 = case.endswith("_bf16")
    dt = jnp.bfloat16 if bf16 else jnp.int8
    q = jax.random.normal(key, (B, KVH, G8, hd), jnp.float32)
    if bf16:
        kc = jax.random.normal(key, (L * B, KVH, S, hd), jnp.bfloat16)
        vc = jax.random.normal(key, (L * B, KVH, S, hd), jnp.bfloat16)
    else:
        kc = jax.random.randint(key, (L * B, KVH, S, hd), -127, 127, jnp.int8)
        vc = jax.random.randint(key, (L * B, KVH, S, hd), -127, 127, jnp.int8)
    ks = jnp.full((L * B, KVH, 1, S), 1e-2, jnp.float32)
    pos = jnp.full((B,), S // 2, jnp.int32)
    bytes_per = 2 * B * KVH * S * hd * dt.dtype.itemsize
    grid = (B, KVH // KHb)
    with_scales = case in ("full", "s8dot")
    specs, ospec = _specs(B, KVH, S, hd, G8, KHb, with_scales)
    base = case[:-5] if bf16 else case

    def scal_of(l):
        return jnp.stack([pos, jnp.full((B,), l % L, jnp.int32)])

    if base == "dma":
        def kern(s_ref, q_ref, k_ref, v_ref, o_ref):
            o_ref[0] = (k_ref[0, :, :G8, :].astype(jnp.float32)
                        + v_ref[0, :, :G8, :].astype(jnp.float32))
    elif base == "conv":
        def kern(s_ref, q_ref, k_ref, v_ref, o_ref):
            for h in range(KHb):
                kk = k_ref[0, h].astype(jnp.bfloat16)
                vv = v_ref[0, h].astype(jnp.bfloat16)
                r = (jnp.sum(kk, axis=0) + jnp.sum(vv, axis=0))  # [hd]
                o_ref[0, h] = jnp.broadcast_to(
                    r[None].astype(jnp.float32), (G8, hd))
    elif base == "dot":
        def kern(s_ref, q_ref, k_ref, v_ref, o_ref):
            for h in range(KHb):
                qq = q_ref[0, h].astype(jnp.bfloat16)
                s = jax.lax.dot_general(
                    qq, k_ref[0, h].astype(jnp.bfloat16),
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)  # [G8, S]
                p = (s * 1e-4).astype(jnp.bfloat16)
                o_ref[0, h] = jax.lax.dot_general(
                    p, v_ref[0, h].astype(jnp.bfloat16),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
    elif base == "full":
        from tpu_llama.ops.attention import flash_decode_attention_fresh
        kc5 = kc.reshape(L, B, KVH, S, hd)
        vc5 = vc.reshape(L, B, KVH, S, hd)
        nk = (jax.random.randint(key, (B, KVH, hd), -127, 127, jnp.int8)
              if not bf16 else jax.random.normal(key, (B, KVH, hd),
                                                 jnp.bfloat16))
        nks = jnp.full((B, KVH), 1e-2, jnp.float32)
        ks5 = ks.reshape(L, B, KVH, S)

        def fn(qc, l, *rest):
            if bf16:
                return flash_decode_attention_fresh(
                    qc, kc5, vc5, pos, nk, nk, layer=l % L, head_block=KHb)
            return flash_decode_attention_fresh(
                qc, kc5, vc5, pos, nk, nk, ks5, ks5, nks, nks,
                layer=l % L, head_block=KHb)

        return _bench(fn, (q,), iters, reps, bytes_per,
                      f"{case}_hb{KHb}", {"B": B, "S": S})
    elif base == "s8dot":
        def kern(s_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref, o_ref):
            p_of = pos  # unused; mask omitted — measuring compute shape only
            for h in range(KHb):
                qf = q_ref[0, h]  # [G8, hd] f32
                am = jnp.max(jnp.abs(qf), axis=-1, keepdims=True)
                qsc = am / 127.0
                qi = jnp.clip(jnp.rint(qf / jnp.maximum(qsc, 1e-30)),
                              -127, 127).astype(jnp.int8)
                s32 = jax.lax.dot_general(
                    qi, k_ref[0, h], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32)  # [G8, S]
                s = s32.astype(jnp.float32) * qsc * ks_ref[0, h]
                # fake-normalize (skip exp): p in [0,1]-ish, quantize to int8
                pm = jnp.max(jnp.abs(s), axis=-1, keepdims=True)
                pq = jnp.clip(jnp.rint(s / jnp.maximum(pm, 1e-30) * 127.0),
                              -127, 127).astype(jnp.int8)
                o32 = jax.lax.dot_general(
                    pq, v_ref[0, h], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)  # [G8, hd]
                o_ref[0, h] = (o32.astype(jnp.float32)
                               * (pm / 127.0) * vs_ref[0, h, 0, :1])
    else:
        raise SystemExit(f"unknown case {case}")

    inputs = [q, kc, vc] + ([ks, ks] if with_scales else [])

    def fn(qc, l, *rest):
        return pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=grid,
                in_specs=specs, out_specs=ospec),
            out_shape=jax.ShapeDtypeStruct((B, KVH, G8, hd), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel")),
        )(scal_of(l), qc, *rest)

    return _bench(fn, tuple([q] + inputs[1:]), iters, reps, bytes_per,
                  f"{case}_hb{KHb}", {"B": B, "S": S})


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cases",
                    default="dma,conv,dot,full,full_bf16,s8dot")
    ap.add_argument("--L", type=int, default=4)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--kvh", type=int, default=32)
    ap.add_argument("--S", type=int, default=2048)
    ap.add_argument("--hd", type=int, default=128)
    ap.add_argument("--hb", type=int, default=1)
    ap.add_argument("--iters", type=int, default=32)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    for case in args.cases.split(","):
        try:
            run(case, args.L, args.batch, args.kvh, args.S, args.hd,
                args.hb, args.iters, args.reps)
        except Exception as e:
            print(json.dumps({"case": case,
                              "error": f"{type(e).__name__}: {e}"[:300]}),
                  flush=True)


if __name__ == "__main__":
    main()
