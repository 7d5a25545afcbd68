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
    "tiny": (512, 512),  # ~launch-cost floor: 256 KB of weights
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
    if name == "w8a8_cast":
        # trivial activation "quant" (one cast, fixed scale): the delta vs
        # "w8a8" is the cost of the XLA absmax/rint/clip quant chain
        from tpu_llama.ops.matmul import w8a8_matmul_prequant

        def cast_step(x, w):
            B = x.shape[0]
            Bp = max(32, -(-B // 32) * 32)
            xq = jnp.pad(x, ((0, Bp - B), (0, 0))).astype(jnp.int8)
            return w8a8_matmul_prequant(
                xq, jnp.full((Bp,), 0.01, jnp.float32), w)[:B]
        return quantize_channel(wf), cast_step
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


def run_fresh_attention(L: int, B: int, KVH: int, S: int, hd: int,
                        pos_fill: int, iters: int, reps: int,
                        head_block: int):
    """Deferred-flush fresh attention: head-fold A/B (NEXT r2 #3).

    Times flash_decode_attention_fresh over a stacked [L, ...] cache with a
    chained q dependency (reads cannot be hoisted); layer cycles through the
    stack like the decode scan does."""
    from tpu_llama.ops.attention import flash_decode_attention_fresh

    key = jax.random.PRNGKey(0)
    G = 1
    q = jax.random.normal(key, (B, KVH, G, hd), jnp.float32)
    kc = jax.random.randint(key, (L, B, KVH, S, hd), -127, 127, jnp.int8)
    vc = jax.random.randint(key, (L, B, KVH, S, hd), -127, 127, jnp.int8)
    ks = jnp.full((L, B, KVH, S), 1e-2, jnp.float32)
    vs = jnp.full((L, B, KVH, S), 1e-2, jnp.float32)
    nk = jax.random.randint(key, (B, KVH, hd), -127, 127, jnp.int8)
    nv = jax.random.randint(key, (B, KVH, hd), -127, 127, jnp.int8)
    nks = jnp.full((B, KVH), 1e-2, jnp.float32)
    nvs = jnp.full((B, KVH), 1e-2, jnp.float32)
    pos = jnp.full((B,), pos_fill, jnp.int32)

    @functools.partial(jax.jit, static_argnames=("hb",))
    def loop(q, kc, vc, ks, vs, pos, hb):
        def body(carry, l):
            q, _ = carry, None
            out = flash_decode_attention_fresh(
                q, kc, vc, pos, nk, nv, ks, vs, nks, nvs,
                layer=l % L, head_block=hb)
            q2 = q + jnp.sum(out) * 1e-30
            return q2, out[0, 0, 0, :1]
        return jax.lax.scan(body, q, jnp.arange(iters, dtype=jnp.int32))

    loop = functools.partial(loop, q, kc, vc, ks, vs)

    def run(hb):
        return loop(pos, hb)

    q1, outs = run(head_block)
    np.asarray(outs)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _, outs = run(head_block)
        np.asarray(outs)
        times.append(time.perf_counter() - t0)
    med = float(np.median(times)) / iters
    full = 2 * B * KVH * S * hd  # int8 K+V block bytes per call
    print(json.dumps({
        "case": f"fresh_attn_hb{head_block}",
        "L": L, "B": B, "KVH": KVH, "S": S, "pos": pos_fill,
        "ms_per_iter": round(med * 1e3, 4),
        "cells": B * (KVH // max(1, head_block)),
        "full_GB_s": round(full / med / 1e9, 1),
        "spread": round((max(times) - min(times)) / (med * iters), 3),
    }), flush=True)


def run_dma_attention(L: int, B: int, KVH: int, S: int, hd: int,
                      pos_fill: int, iters: int, reps: int, block_s: int):
    """Manual-DMA decode attention A/B vs the fresh kernel: same harness as
    run_fresh_attention, but reads are pos-proportional."""
    from tpu_llama.ops.attention import flash_decode_attention_dma

    key = jax.random.PRNGKey(0)
    G = 1
    q = jax.random.normal(key, (B, KVH, G, hd), jnp.float32)
    kc = jax.random.randint(key, (L, B, KVH, S, hd), -127, 127, jnp.int8)
    vc = jax.random.randint(key, (L, B, KVH, S, hd), -127, 127, jnp.int8)
    ks = jnp.full((L, B, KVH, S), 1e-2, jnp.float32)
    vs = jnp.full((L, B, KVH, S), 1e-2, jnp.float32)
    nk = jax.random.randint(key, (B, KVH, hd), -127, 127, jnp.int8)
    nv = jax.random.randint(key, (B, KVH, hd), -127, 127, jnp.int8)
    nks = jnp.full((B, KVH), 1e-2, jnp.float32)
    nvs = jnp.full((B, KVH), 1e-2, jnp.float32)
    pos = jnp.full((B,), pos_fill, jnp.int32)

    @functools.partial(jax.jit, static_argnames=("bs",))
    def loop(q, kc, vc, ks, vs, pos, bs):
        def body(carry, l):
            out = flash_decode_attention_dma(
                carry, kc, vc, pos, nk, nv, ks, vs, nks, nvs,
                layer=l % L, block_s=bs)
            q2 = carry + jnp.sum(out) * 1e-30
            return q2, out[0, 0, 0, :1]
        return jax.lax.scan(body, q, jnp.arange(iters, dtype=jnp.int32))

    def run():
        return loop(q, kc, vc, ks, vs, pos, block_s)

    q1, outs = run()
    np.asarray(outs)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _, outs = run()
        np.asarray(outs)
        times.append(time.perf_counter() - t0)
    med = float(np.median(times)) / iters
    # traffic actually read: ceil(pos/TS) blocks of K+V (+f32 scales)
    nb = -(-pos_fill // block_s)
    touched = 2 * B * KVH * nb * block_s * (hd + 4)
    print(json.dumps({
        "case": f"dma_attn_bs{block_s}",
        "L": L, "B": B, "KVH": KVH, "S": S, "pos": pos_fill,
        "ms_per_iter": round(med * 1e3, 4),
        "touched_GB_s": round(touched / med / 1e9, 1),
        "spread": round((max(times) - min(times)) / (med * iters), 3),
    }), flush=True)


def run_fused_layer(L: int, B: int, D: int, H: int, QO: int,
                    iters: int, reps: int):
    """Per-call cost of ops/fused_layer.py's one-call-per-layer kernel at
    model shapes (layer cycling, data-dependent chain)."""
    from tpu_llama.ops.fused_layer import fused_layer_linear
    from tpu_llama.ops.quant import ChannelQuantTensor, quantize_activations

    key = jax.random.PRNGKey(0)
    Bp = max(32, -(-B // 32) * 32)

    def mk(k, i, o):  # int8 directly — the f32 intermediates exceed HBM
        return ChannelQuantTensor(
            q=jax.random.randint(k, (L, i, o), -127, 127, jnp.int8),
            s=jnp.full((L, o), 1e-4, jnp.float32), logical_in=i,
            logical_out=o)

    ks = jax.random.split(key, 6)
    wo, w13, w2, qkv = (mk(ks[0], D, D), mk(ks[1], D, 2 * H),
                        mk(ks[2], H, D), mk(ks[3], D, QO))
    rmsf = jnp.ones((L, D), jnp.float32)
    rmsa = jnp.ones((L, D), jnp.float32)
    x0 = jax.random.normal(ks[4], (Bp, D), jnp.float32)
    attq, satt = quantize_activations(
        jax.random.normal(ks[5], (Bp, D), jnp.float32))

    @jax.jit
    def loop(x, attq, satt, wo, w13, w2, qkv):
        def body(x, l):
            xn, qk = fused_layer_linear(
                x, attq, satt, wo.q, wo.s, w13.q, w13.s, w2.q, w2.s,
                qkv.q, qkv.s, rmsf, rmsa, l % L, L)
            return xn * 1e-3, qk[0, :1]
        return jax.lax.scan(body, x, jnp.arange(iters, dtype=jnp.int32))

    def run():
        return loop(x0, attq, satt, wo, w13, w2, qkv)

    _, outs = run()
    np.asarray(outs)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _, outs = run()
        np.asarray(outs)
        times.append(time.perf_counter() - t0)
    med = float(np.median(times)) / iters
    wbytes = D * D + 2 * D * H + H * D + D * QO  # int8 weights per layer
    print(json.dumps({
        "case": "fused_layer", "L": L, "Bp": Bp,
        "ms_per_iter": round(med * 1e3, 4),
        "weight_GB_s": round(wbytes / med / 1e9, 1),
        "spread": round((max(times) - min(times)) / (med * iters), 3),
    }), flush=True)


def run_paged_attention(L: int, B: int, KVH: int, S: int, hd: int,
                        pos_fill: int, iters: int, reps: int, ps: int,
                        impl: str):
    """Paged decode attention A/B: index-map-clamped fresh kernel vs the
    manual page-DMA kernel, identical pool/page-table inputs."""
    from tpu_llama.ops.attention import (
        paged_flash_decode_attention_dma,
        paged_flash_decode_attention_fresh,
    )

    fn = (paged_flash_decode_attention_dma if impl == "dma"
          else paged_flash_decode_attention_fresh)
    key = jax.random.PRNGKey(0)
    G = 1
    MP = S // ps
    P = B * MP + 1  # pool sized like Engine's dense-equivalent default
    q = jax.random.normal(key, (B, KVH, G, hd), jnp.float32)
    kp = jax.random.randint(key, (L, P, KVH, ps, hd), -127, 127, jnp.int8)
    vp = jax.random.randint(key, (L, P, KVH, ps, hd), -127, 127, jnp.int8)
    ks = jnp.full((L, P, KVH, ps), 1e-2, jnp.float32)
    vs = jnp.full((L, P, KVH, ps), 1e-2, jnp.float32)
    nk = jax.random.randint(key, (B, KVH, hd), -127, 127, jnp.int8)
    nv = jax.random.randint(key, (B, KVH, hd), -127, 127, jnp.int8)
    nks = jnp.full((B, KVH), 1e-2, jnp.float32)
    nvs = jnp.full((B, KVH), 1e-2, jnp.float32)
    pt = jnp.arange(B * MP, dtype=jnp.int32).reshape(B, MP)  # disjoint pages
    pos = jnp.full((B,), pos_fill, jnp.int32)

    @jax.jit
    def loop(q, kp, vp, ks, vs, pt, pos):
        def body(carry, l):
            out = fn(carry, kp, vp, ks, vs, pt, pos, nk, nv, nks, nvs,
                     layer=l % L)
            q2 = carry + jnp.sum(out) * 1e-30
            return q2, out[0, 0, 0, :1]
        return jax.lax.scan(body, q, jnp.arange(iters, dtype=jnp.int32))

    def run():
        return loop(q, kp, vp, ks, vs, pt, pos)

    _, outs = run()
    np.asarray(outs)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _, outs = run()
        np.asarray(outs)
        times.append(time.perf_counter() - t0)
    med = float(np.median(times)) / iters
    np_used = -(-pos_fill // ps)
    touched = 2 * B * KVH * np_used * ps * (hd + 4)
    print(json.dumps({
        "case": f"paged_{impl}_ps{ps}",
        "L": L, "B": B, "KVH": KVH, "S": S, "pos": pos_fill,
        "ms_per_iter": round(med * 1e3, 4),
        "touched_GB_s": round(touched / med / 1e9, 1),
        "spread": round((max(times) - min(times)) / (med * iters), 3),
    }), flush=True)


def run_write_alias(L: int, B: int, KVH: int, S: int, hd: int,
                    iters: int, reps: int, mode: str):
    """Does the aliased in-place KV write stay in place inside a scan?

    Scans ``kv_cache_write_decode`` (mode='write'), the layer-aware flash
    read (mode='read'), or both (mode='rw') over layers.  If aliasing works,
    per-iter cost is ~DMA of a few KB (write) / one S-row stream (read); if
    the carry is copied, per-iter cost scales with TOTAL cache size.
    """
    from tpu_llama.ops.attention import (
        flash_decode_attention, kv_cache_write_decode)

    key = jax.random.PRNGKey(0)
    k = jax.random.normal(key, (B, KVH, hd), jnp.float32)
    pos = jnp.full((B,), S // 2, jnp.int32)
    kv_dtype = jnp.bfloat16 if mode == "write_kv_only" else jnp.int8
    ck = jnp.zeros((L, B, KVH, S, hd), kv_dtype)
    cv = jnp.zeros((L, B, KVH, S, hd), kv_dtype)
    cks = jnp.zeros((L, B, KVH, S), jnp.float32)
    cvs = jnp.zeros((L, B, KVH, S), jnp.float32)
    q = jax.random.normal(key, (B, KVH, 1, hd), jnp.float32)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def loop(arrs, k, q):
        def body(carry, l):
            arrs, acc = carry
            if mode in ("write", "rw"):
                arrs = kv_cache_write_decode(k + acc * 1e-30, k, pos,
                                             l % L, *arrs)
            elif mode == "write_kv_only":
                # fp-path kernel updates only k/v (scales bypass the call) —
                # isolates which aliased operands force copies
                ck2, cv2 = kv_cache_write_decode(k + acc * 1e-30, k, pos,
                                                 l % L, arrs[0], arrs[1])
                arrs = (ck2, cv2, arrs[2], arrs[3])
            elif mode == "dus":
                # B-unrolled dynamic_update_slice writes (XLA in-place path)
                ck, cv, cks, cvs = arrs
                kq = (k + acc * 1e-30).astype(jnp.int8)
                sc = jnp.max(jnp.abs(k), axis=-1) / 127.0  # [B, KVH]
                for b in range(B):
                    ix = (l % L, b, 0, pos[b], 0)
                    ck = jax.lax.dynamic_update_slice(
                        ck, kq[b][None, None, :, None, :], ix)
                    cv = jax.lax.dynamic_update_slice(
                        cv, kq[b][None, None, :, None, :], ix)
                    cks = jax.lax.dynamic_update_slice(
                        cks, sc[b][None, None, :, None], ix[:4])
                    cvs = jax.lax.dynamic_update_slice(
                        cvs, sc[b][None, None, :, None], ix[:4])
                arrs = (ck, cv, cks, cvs)
            if mode in ("read", "rw"):
                att = flash_decode_attention(q + acc * 1e-30, arrs[0],
                                             arrs[1], pos, arrs[2], arrs[3],
                                             layer=l % L)
                acc = acc + jnp.sum(att) * 1e-30
            elif mode == "read_static":
                # python-unrolled layers: STATIC index maps per call; the
                # acc chain prevents hoisting out of the timing scan
                for lc in range(L):
                    att = flash_decode_attention(q + acc * 1e-30, arrs[0],
                                                 arrs[1], pos, arrs[2],
                                                 arrs[3], layer=lc)
                    acc = acc + jnp.sum(att) * 1e-30
            return (arrs, acc), None
        (arrs, acc), _ = jax.lax.scan(
            body, (arrs, jnp.float32(0)), jnp.arange(iters, dtype=jnp.int32))
        return arrs, acc

    arrs, acc = loop((ck, cv, cks, cvs), k, q)
    np.asarray(acc)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        arrs, acc = loop(arrs, k, q)
        np.asarray(acc)
        times.append(time.perf_counter() - t0)
    med = float(np.median(times)) / iters
    print(json.dumps({"case": f"kv_{mode}_alias", "L": L, "S": S, "B": B,
                      "us_per_iter": round(med * 1e6, 1),
                      "spread": round((max(times) - min(times))
                                      / (med * iters), 3)}), flush=True)


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
    ap.add_argument("--alias", default="", help="comma list of write|read|rw")
    ap.add_argument("--alias-L", type=int, default=32)
    ap.add_argument("--fresh", default="",
                    help="comma list of pos:head_block for the deferred-"
                         "flush attention head-fold A/B")
    ap.add_argument("--dyn", default="",
                    help="comma list of pos:block_s for the manual-DMA "
                         "pos-proportional decode attention A/B")
    ap.add_argument("--paged", default="",
                    help="comma list of pos:page_size:impl (impl=fresh|dma) "
                         "for the paged decode attention A/B")
    ap.add_argument("--fusedlayer", type=int, default=0,
                    help="probe the fused one-call-per-layer kernel at 7B "
                         "shapes (value = 1 enables)")
    args = ap.parse_args()

    if args.fusedlayer:
        run_fused_layer(32, args.batch, 4096, 11008, 12288,
                        max(16, args.iters), args.reps)
        return

    if args.paged:
        for spec in args.paged.split(","):
            posf, ps, impl = spec.split(":")
            try:
                run_paged_attention(args.alias_L, args.batch, 32, args.attn_S,
                                    128, int(posf), max(8, args.iters // 4),
                                    args.reps, int(ps), impl)
            except Exception as e:
                print(json.dumps({"case": f"paged_{spec}",
                                  "error": f"{type(e).__name__}: {e}"[:300]}),
                      flush=True)
        return

    if args.dyn:
        for spec in args.dyn.split(","):
            posf, bs = map(int, spec.split(":"))
            try:
                run_dma_attention(args.alias_L, args.batch, 32, args.attn_S,
                                  128, posf, max(8, args.iters // 4),
                                  args.reps, bs)
            except Exception as e:
                print(json.dumps({"case": f"dyn_{spec}",
                                  "error": f"{type(e).__name__}: {e}"[:300]}),
                      flush=True)
        return

    if args.fresh:
        for spec in args.fresh.split(","):
            posf, hb = map(int, spec.split(":"))
            try:
                run_fresh_attention(args.alias_L, args.batch, 32, args.attn_S,
                                    128, posf, max(8, args.iters // 4),
                                    args.reps, hb)
            except Exception as e:
                print(json.dumps({"case": f"fresh_{spec}",
                                  "error": f"{type(e).__name__}: {e}"[:300]}),
                      flush=True)
        return

    if args.probe:
        bandwidth_probe()
    if args.alias:
        for mode in args.alias.split(","):
            try:
                run_write_alias(args.alias_L, args.batch, 32, args.attn_S,
                                128, max(32, args.iters), args.reps, mode)
            except Exception as e:
                print(json.dumps({"case": f"alias_{mode}",
                                  "error": f"{type(e).__name__}: {e}"[:300]}),
                      flush=True)
        return
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
