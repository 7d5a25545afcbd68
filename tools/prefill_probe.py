#!/usr/bin/env python
"""Prefill time attribution at the 7B b8/T512 TTFT shape.

TTFT r3 is ~472 ms vs a ~135 ms int8-MXU compute floor.  jax.profiler sees
no device plane through the relay (CLAUDE.md), so attribute by ablation:

  matmul   — the four per-layer W8A8 matmuls alone, 32 layers, M=4096
  +glue    — matmuls + rmsnorm/rope/silu glue (no attention, no cache)
  noattn   — full forward_prefill with attention stubbed (cache writes stay)
  full     — forward_prefill (flash)
  fullxla  — forward_prefill (xla einsum attention)

Each timed with host readback, median of --reps.  Also per-shape kernel
A/Bs: old decode tiling (BM=256 forced via block args) vs the rows picker.
"""

from __future__ import annotations

import argparse
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/tpu_llama_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np


def partial_jit_donate(fn):
    return jax.jit(fn, donate_argnums=(0,))


def timed(fn, reps):
    np.asarray(jax.block_until_ready(fn()))  # compile+warm, readback
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(jax.block_until_ready(fn()))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--t", type=int, default=512)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--seq-len", type=int, default=2048)
    ap.add_argument("--probe", default="all",
                    help="comma list: matmul,glue,full,fullxla,kernels")
    args = ap.parse_args()
    probes = set(args.probe.split(","))

    sys.path.insert(0, "/root/repo")
    import bench

    from tpu_llama.config import LLAMA2_7B as config
    from tpu_llama.models import forward_prefill, make_kv_cache
    from tpu_llama.models.llama import (
        _project_gate_up,
        _project_qkv,
        matmul_any,
        rmsnorm,
    )

    params = bench._build(config, jnp.dtype("bfloat16"), "w8a8", fuse=True)
    B, T = args.batch, args.t
    tokens = jnp.zeros((B, T), jnp.int32)
    start = jnp.zeros((B,), jnp.int32)
    lengths = jnp.full((B,), T, jnp.int32)
    prec = jax.lax.Precision("default")

    if "matmul" in probes or "all" == args.probe:
        @jax.jit
        def matmul_only(params, x):
            def mm(a, w):
                return matmul_any(a, w, prec)

            def layer(x, lp):
                qkv = mm(x, lp.wq)
                att = qkv[..., :config.dim]  # stand-in, same shape as wo in
                x = x + mm(att, lp.wo)
                gu = mm(x, lp.w1)
                h = gu[..., :config.hidden_dim]
                x = x + mm(h, lp.w2)
                return x, None

            x, _ = jax.lax.scan(layer, x, params.layers)
            return jnp.sum(x)

        x = jnp.zeros((B * T, config.dim), jnp.bfloat16)
        ms = timed(lambda: matmul_only(params, x), args.reps)
        print(f"matmul-only 32L: {ms:.1f} ms", flush=True)

    if "glue" in probes or "all" == args.probe:
        @jax.jit
        def glue(params, x):
            def mm(a, w):
                return matmul_any(a, w, prec)

            def layer(x, lp):
                h = rmsnorm(x, lp.rms_att)
                q, k, v = _project_qkv(h, lp, config, mm)
                att = q  # skip attention; right shape for wo
                x = x + mm(att, lp.wo)
                h = rmsnorm(x, lp.rms_ffn)
                g, u = _project_gate_up(h, lp, config, mm)
                x = x + mm(jax.nn.silu(g) * u, lp.w2)
                return x, None

            x, _ = jax.lax.scan(layer, x, params.layers)
            return jnp.sum(x)

        x = jnp.zeros((B * T, config.dim), jnp.bfloat16)
        ms = timed(lambda: glue(params, x), args.reps)
        print(f"matmul+glue 32L: {ms:.1f} ms", flush=True)

    if "full" in probes or "all" == args.probe:
        def full():
            cache = make_kv_cache(config, B, "int8", seq_len=args.seq_len)
            logits, cache = forward_prefill(
                params, cache, tokens, start, lengths, config,
                precision="default", logits_mode="last", max_keys=T,
                attn="flash")
            return jnp.argmax(logits, -1)

        ms = timed(full, args.reps)
        print(f"full prefill (flash): {ms:.1f} ms", flush=True)

        def fresh():
            cache = make_kv_cache(config, B, "int8", seq_len=args.seq_len)
            logits, cache = forward_prefill(
                params, cache, tokens, start, lengths, config,
                precision="default", logits_mode="last",
                attn="flash", assume_fresh=True)
            return jnp.argmax(logits, -1)

        ms = timed(fresh, args.reps)
        print(f"fresh prefill (flash): {ms:.1f} ms", flush=True)

        def fresh_xla():
            cache = make_kv_cache(config, B, "int8", seq_len=args.seq_len)
            logits, cache = forward_prefill(
                params, cache, tokens, start, lengths, config,
                precision="default", logits_mode="last",
                attn="xla", assume_fresh=True)
            return jnp.argmax(logits, -1)

        ms = timed(fresh_xla, args.reps)
        print(f"fresh prefill (xla):   {ms:.1f} ms", flush=True)

    if "attn" in probes or "all" == args.probe:
        from tpu_llama.ops.attention import flash_prefill_attention

        KVH, hd = config.n_kv_heads, config.head_dim
        S = args.seq_len
        kc = jnp.zeros((B, KVH, S, hd), jnp.int8)
        ks = jnp.ones((B, KVH, S), jnp.float32)
        q = jnp.zeros((B, T, config.n_heads, hd), jnp.float32)

        @jax.jit
        def attn32(q, kc, ks):
            def body(acc, _):
                att = flash_prefill_attention(q, kc, kc, jnp.zeros(
                    (B,), jnp.int32), ks, ks, max_keys=T)
                return acc + att[:, 0, 0], None

            out, _ = jax.lax.scan(body, jnp.zeros((B,), jnp.float32),
                                  None, length=32)
            return out

        ms = timed(lambda: attn32(q, kc, ks), args.reps)
        print(f"flash-prefill-attn x32 (max_keys={T}): {ms:.1f} ms",
              flush=True)

        @jax.jit
        def attn32_nocap(q, kc, ks):
            def body(acc, _):
                att = flash_prefill_attention(q, kc, kc, jnp.zeros(
                    (B,), jnp.int32), ks, ks)
                return acc + att[:, 0, 0], None

            out, _ = jax.lax.scan(body, jnp.zeros((B,), jnp.float32),
                                  None, length=32)
            return out

        ms = timed(lambda: attn32_nocap(q, kc, ks), args.reps)
        print(f"flash-prefill-attn x32 (no cap):      {ms:.1f} ms",
              flush=True)

    if "write" in probes or "all" == args.probe:
        from tpu_llama.ops.attention import quantize_kv

        KVH, hd = config.n_kv_heads, config.head_dim
        S = args.seq_len
        kt = jnp.zeros((B, KVH, T, hd), jnp.float32)

        @jax.jit
        def quant32(kt):
            def body(acc, _):
                kq, ks = quantize_kv(kt)
                return acc + kq[0, 0, 0, 0].astype(jnp.int32), None

            out, _ = jax.lax.scan(body, jnp.int32(0), None, length=64)
            return out

        ms = timed(lambda: quant32(kt), args.reps)
        print(f"quantize_kv x64: {ms:.1f} ms", flush=True)

        L = config.n_layers
        b_ix = jnp.arange(B)[:, None, None]
        h_ix = jnp.arange(KVH)[None, :, None]
        p_ix = jnp.broadcast_to(jnp.arange(T)[None, None, :], (B, 1, T))

        @jax.jit  # NO donation: timed reps reuse the input buffer
        def scatter32(cache_k, kq):
            def body(ck, _):
                return ck.at[b_ix, h_ix, p_ix].set(kq), None

            ck, _ = jax.lax.scan(body, cache_k, None, length=64)
            return ck

        cache_k = jnp.zeros((B, KVH, S, hd), jnp.int8)
        kq = jnp.zeros((B, KVH, T, hd), jnp.int8)
        ms = timed(lambda: scatter32(cache_k, kq)[0, 0, 0, 0], args.reps)
        print(f"advanced-index scatter x64 [B,KVH,S,hd]: {ms:.1f} ms",
              flush=True)

    if "qact" in probes:
        from tpu_llama.ops.quant import quantize_activations

        for dt in (jnp.float32, jnp.bfloat16):
            x = jnp.zeros((B * T, config.dim), dt)

            @jax.jit
            def qact(x):
                def body(acc, _):
                    q, s = quantize_activations(x)
                    return acc + q[0, 0].astype(jnp.int32), None

                out, _ = jax.lax.scan(body, jnp.int32(0), None, length=128)
                return out

            ms = timed(lambda: qact(x), args.reps)
            print(f"quantize_activations x128 [{B*T},{config.dim}] "
                  f"{jnp.dtype(dt).name}: {ms:.1f} ms", flush=True)

    if "kernels" in probes or "all" == args.probe:
        from tpu_llama.ops.matmul import w8a8_matmul

        lp = params.layers
        shapes = {"qkv": (config.dim, config.dim + 2 * config.kv_dim),
                  "wo": (config.dim, config.dim),
                  "w13": (config.dim, 2 * config.hidden_dim),
                  "w2": (config.hidden_dim, config.dim)}
        from tpu_llama.ops.quant import ChannelQuantTensor

        for name, (IN, OUT) in shapes.items():
            w = {"qkv": lp.wq, "wo": lp.wo, "w13": lp.w1,
                 "w2": lp.w2}[name]
            w0 = ChannelQuantTensor(q=w.q[0], s=w.s[0],
                                    logical_in=IN, logical_out=OUT)
            x = jnp.zeros((B * T, IN), jnp.bfloat16)

            def mkrun(blocks):
                def run(w0=w0, x=x, blocks=blocks):
                    reps = 8
                    def body(acc, _):
                        return acc + w8a8_matmul(
                            x, w0, out_dtype=jnp.bfloat16, **blocks)[:, 0], None
                    out, _ = jax.lax.scan(
                        body, jnp.zeros((B * T,), jnp.bfloat16),
                        None, length=reps)
                    return out
                return jax.jit(run)

            new = timed(mkrun({}), args.reps) / 8
            old = timed(mkrun({"block_out": 768 if OUT % 768 == 0 else 256,
                               "block_in": IN}), args.reps) / 8
            bw = (IN * OUT / 1e9) / (new / 1e3)
            print(f"kernel {name} [{IN}x{OUT}] M={B*T}: rows-tiling "
                  f"{new:.2f} ms vs old {old:.2f} ms ({bw:.0f} GB/s eff)",
                  flush=True)


if __name__ == "__main__":
    main()
