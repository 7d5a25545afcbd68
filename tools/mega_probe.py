#!/usr/bin/env python
"""A/B the merged whole-layer kernel (ops/fused_step.py) against the
two-launch composition it replaces (DMA attention + XLA glue + fused linear),
at the 7B layer shape, isolated from the rest of the decode step.

    python tools/mega_probe.py [--layers 8] [--iters 16] [--batch 8]
        [--pos 512] [--seq 2048] [--budget-mb 13]

Timing rule (CLAUDE.md): >=100 in-program kernel invocations per timed
dispatch, and the window ends with a host readback.
"""

from __future__ import annotations

import argparse
import os
from functools import partial
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/tpu_llama_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=8)
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--pos", type=int, default=512)
    ap.add_argument("--seq", type=int, default=2048)
    ap.add_argument("--budget-mb", type=float, default=None,
                    help="override the merged kernel's VMEM budget")
    ap.add_argument("--variant", default="both",
                    choices=["both", "all", "mega", "mega2", "composed"])
    ap.add_argument("--ts", type=int, default=None,
                    help="force the mega2 S-block size (else step2_plan)")
    ap.add_argument("--reps", type=int, default=5,
                    help="interleaved timing repetitions per variant")
    args = ap.parse_args()

    if args.budget_mb is not None:
        import functools

        import tpu_llama.ops.fused_step as fs
        import tpu_llama.ops.fused_step2 as fs2
        budget = int(args.budget_mb * (1 << 20))
        orig = fs._pick_step_blocks.__wrapped__
        orig2 = fs2._pick_step2_blocks.__wrapped__

        def patched(Bp, D, H, QO, KVH, G, hd, TS, b=budget):
            return orig(Bp, D, H, QO, KVH, G, hd, TS, b)

        def patched2(Bp, D, H, QO, KVH, G, hd, TS, b=budget):
            return orig2(Bp, D, H, QO, KVH, G, hd, TS, b)

        fs._pick_step_blocks = functools.lru_cache(maxsize=64)(patched)
        fs2._pick_step2_blocks = functools.lru_cache(maxsize=64)(patched2)
        import tpu_llama.models.llama  # noqa: F401 — pickers resolved lazily

    from tpu_llama.ops.attention import (
        flash_decode_attention_dma,
        quantize_kv,
    )
    from tpu_llama.ops.fused_layer import fused_layer_linear
    from tpu_llama.ops.fused_step import _pick_step_tiling, fused_step_layer
    from tpu_llama.ops.fused_step2 import (
        decode_dma_descs,
        fused_step2_layer,
        rope_tables,
        step2_plan,
    )
    from tpu_llama.ops.quant import quantize_activations

    L, B, S = args.layers, args.batch, args.seq
    D, H, KVH, G, hd = 4096, 11008, 32, 1, 128
    QO = D + 2 * KVH * hd
    Bp = max(32, -(-B // 32) * 32)
    plan2 = step2_plan(Bp, D, H, QO, KVH, G, hd, S, block_s=args.ts)
    TS2 = plan2[0] if plan2 else None
    print("tiling:", _pick_step_tiling(Bp, D, H, QO, KVH, G, hd, S),
          "| mega2 plan:", plan2, flush=True)

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 16)

    def qw(k, IN, OUT):
        # L+1 stacked layers: the probes pass n_layers=L+1 so phase D never
        # hits its last-layer skip, which makes l2=l+1 index row L — an OOB
        # index map on [L,...] weights is a hard TPU fault.
        q = jax.random.randint(k, (L + 1, IN, OUT), -127, 128, jnp.int8)
        s = jnp.full((L + 1, OUT), 0.01, jnp.float32)
        return q, s

    wo_q, wo_s = qw(ks[0], D, D)
    w13_q, w13_s = qw(ks[1], D, 2 * H)
    w2_q, w2_s = qw(ks[2], H, D)
    qkv_q, qkv_s = qw(ks[3], D, QO)
    rms_ffn = jnp.ones((L + 1, D), jnp.float32)
    rms_att = jnp.ones((L + 1, D), jnp.float32)

    x = jax.random.normal(ks[4], (Bp, D), jnp.float32)
    q = jax.random.normal(ks[5], (B, KVH, G, hd), jnp.float32)
    # L+1 cache layers: mega2's trailing cells read layer l+1 (up to L when
    # the probe pins n_layers=L+1 to keep phase D live on every call)
    kc = jax.random.randint(ks[6], (L + 1, B, KVH, S, hd), -127, 128, jnp.int8)
    vc = jax.random.randint(ks[7], (L + 1, B, KVH, S, hd), -127, 128, jnp.int8)
    kss = jnp.full((L + 1, B, KVH, S), 0.01, jnp.float32)
    vss = jnp.full((L + 1, B, KVH, S), 0.01, jnp.float32)
    nk, nks = quantize_kv(jax.random.normal(ks[8], (B, KVH, hd)))
    nv, nvs = quantize_kv(jax.random.normal(ks[9], (B, KVH, hd)))
    pos = jnp.full((B,), args.pos, jnp.int32)

    layer_ix = jnp.arange(L, dtype=jnp.int32)
    # All arrays travel as jit ARGUMENTS — closing over them would capture
    # ~2.7 GB of constants into the HLO and stall the remote compile service
    # for >30 min serializing the program.
    env = dict(q=q, nk=nk, nv=nv, nks=nks, nvs=nvs, kc=kc, vc=vc, kss=kss,
               vss=vss, pos=pos, wo_q=wo_q, wo_s=wo_s, w13_q=w13_q,
               w13_s=w13_s, w2_q=w2_q, w2_s=w2_s, qkv_q=qkv_q, qkv_s=qkv_s,
               rms_ffn=rms_ffn, rms_att=rms_att)

    @partial(jax.jit, static_argnames=("n",))
    def run_mega(x, e, n):
        def iter_body(x, _):
            def step(x, l):
                xn, _ = fused_step_layer(
                    x, e["q"], e["nk"], e["nv"], e["nks"], e["nvs"],
                    e["kc"], e["vc"], e["kss"], e["vss"], e["pos"],
                    e["wo_q"], e["wo_s"], e["w13_q"], e["w13_s"],
                    e["w2_q"], e["w2_s"], e["qkv_q"], e["qkv_s"],
                    e["rms_ffn"], e["rms_att"], l, L + 1)  # never skip D
                return xn * 1e-3, None

            x, _ = jax.lax.scan(step, x, layer_ix)
            return x, None

        x, _ = jax.lax.scan(iter_body, x, None, length=n)
        return x

    # mega2 extras: rope tables, DMA descriptor chain, an attq/satt carry
    cosr = jax.random.normal(ks[10], (B, hd // 2), jnp.float32) * 0.1
    sinr = jax.random.normal(ks[11], (B, hd // 2), jnp.float32) * 0.1
    rc, rsa, rsb = rope_tables(cosr, sinr, Bp)
    base, dcell, doff, total = decode_dma_descs(pos, B, S, TS2 or 128)
    attq0 = jax.random.randint(ks[12], (Bp, D), -127, 128, jnp.int8)
    satt0 = jnp.full((Bp,), 0.01, jnp.float32)
    env.update(rc=rc, rsa=rsa, rsb=rsb, base=base, dcell=dcell, doff=doff,
               total=total, attq0=attq0, satt0=satt0)

    @partial(jax.jit, static_argnames=("n",))
    def run_mega2(x, e, n):
        def iter_body(x, _):
            def step(carry, l):
                xc, attq, satt = carry
                xn, attq_n, satt_n, *_ = fused_step2_layer(
                    xc, attq, satt, e["kc"], e["vc"], e["kss"], e["vss"],
                    e["pos"], e["rc"], e["rsa"], e["rsb"],
                    e["base"], e["dcell"], e["doff"], e["total"],
                    e["wo_q"], e["wo_s"], e["w13_q"], e["w13_s"],
                    e["w2_q"], e["w2_s"], e["qkv_q"], e["qkv_s"],
                    e["rms_ffn"], e["rms_att"], l, L + 1, KVH * G,
                    block_s=TS2)
                return (xn * 1e-3, attq_n, satt_n), None

            (x, _, _), _ = jax.lax.scan(
                step, (x, e["attq0"], e["satt0"]), layer_ix)
            return x, None

        x, _ = jax.lax.scan(iter_body, x, None, length=n)
        return x

    @partial(jax.jit, static_argnames=("n",))
    def run_composed(x, e, n):
        def iter_body(x, _):
            def step(x, l):
                att = flash_decode_attention_dma(
                    e["q"], e["kc"], e["vc"], e["pos"], e["nk"], e["nv"],
                    e["kss"], e["vss"], e["nks"], e["nvs"], layer=l)
                att2 = att.reshape(B, D).astype(jnp.float32)
                att2 = jnp.pad(att2, ((0, Bp - B), (0, 0)))
                attq, satt = quantize_activations(att2)
                xn, _ = fused_layer_linear(
                    x, attq, satt, e["wo_q"], e["wo_s"], e["w13_q"],
                    e["w13_s"], e["w2_q"], e["w2_s"], e["qkv_q"], e["qkv_s"],
                    e["rms_ffn"], e["rms_att"], l, L + 1)
                return xn * 1e-3, None

            x, _ = jax.lax.scan(step, x, layer_ix)
            return x, None

        x, _ = jax.lax.scan(iter_body, x, None, length=n)
        return x

    n = args.iters
    calls = n * L
    variants = []
    for name, fn in (("mega", run_mega), ("mega2", run_mega2),
                     ("composed", run_composed)):
        if args.variant == "both" and name == "mega2":
            continue  # legacy pairing: mega vs composed
        if args.variant not in ("both", "all", name):
            continue
        try:
            np.asarray(fn(x, env, n))  # compile + warm
            variants.append((name, fn))
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}",
                  flush=True)
    # The chip is time-shared and drifts ~40% between windows — interleave
    # the variants' repetitions round-robin so each rep pair shares the same
    # contention, and report per-variant medians.
    times = {name: [] for name, _ in variants}
    for _ in range(args.reps):
        for name, fn in list(variants):
            try:
                t0 = time.perf_counter()
                np.asarray(fn(x, env, n))
                times[name].append(time.perf_counter() - t0)
            except Exception as e:
                # a variant dying mid-probe (OOM, relay timeout) must not
                # lose the survivors' results
                print(f"{name}: DROPPED after {len(times[name])} reps "
                      f"{type(e).__name__}: {str(e)[:200]}", flush=True)
                variants = [(nm, f) for nm, f in variants if nm != name]
    for name, _ in variants:
        ts = times[name]
        t = float(np.median(ts))
        print(f"{name}: {t*1e3:.1f} ms med of {len(ts)} "
              f"(spread {(max(ts)-min(ts))/t:.2f}), "
              f"{t/calls*1e6:.1f} us/layer-call ({calls} calls)",
              flush=True)


if __name__ == "__main__":
    main()
