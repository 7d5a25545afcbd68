#!/usr/bin/env python
"""Manual-DMA decode-attention cost ladder.

flash_decode_attention_dma at b64/L4/S2048 shows a ~60 us per-cell floor
independent of pos (tools/kernel_bench.py --dyn).  This ladder isolates it
with stripped variants of the same (B,)-grid manual-DMA structure:

  nodma   loop runs, buffers never DMA'd, dot-only compute  -> loop+compute
  dmaonly DMA + trivial reduce (no dots, no softmax)        -> DMA stall
  dots    DMA + per-head dots (no softmax/scales)           -> + MXU
  nosm    DMA + dots + scale muls (no exp/mask/normalize)   -> + scales
  full    everything (the production kernel's math)         -> + softmax

All cases: 32 scan iters with a data dependency, L cycling, pos sweep.
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

_NEG_INF = -1e30


def make_fn(case, L, B, KVH, S, hd, TS):
    G8 = 8

    def kern(s_ref, q_ref, k_hbm, v_hbm, ks_hbm, vs_hbm, o_ref,
             kbuf, vbuf, ksbuf, vsbuf, sem):
        b = pl.program_id(0)
        pos = s_ref[0, b]
        row = s_ref[1, 0] * B + b
        nb = jax.lax.div(pos + TS - 1, TS)

        def copies(j, slot):
            return [
                pltpu.make_async_copy(
                    k_hbm.at[row, :, pl.ds(j * TS, TS), :], kbuf.at[slot],
                    sem.at[slot, 0]),
                pltpu.make_async_copy(
                    v_hbm.at[row, :, pl.ds(j * TS, TS), :], vbuf.at[slot],
                    sem.at[slot, 1]),
                pltpu.make_async_copy(
                    ks_hbm.at[row, :, pl.ds(j * TS, TS)], ksbuf.at[slot],
                    sem.at[slot, 2]),
                pltpu.make_async_copy(
                    vs_hbm.at[row, :, pl.ds(j * TS, TS)], vsbuf.at[slot],
                    sem.at[slot, 3]),
            ]

        dma = case != "nodma"
        if dma:
            @pl.when(nb > 0)
            def _():
                for cp in copies(0, 0):
                    cp.start()

        init = tuple((jnp.full((G8, 1), _NEG_INF, jnp.float32),
                      jnp.zeros((G8, 1), jnp.float32),
                      jnp.zeros((G8, hd), jnp.float32))
                     for _ in range(KVH))

        def body(j, carry):
            slot = jax.lax.rem(j, 2)
            if dma:
                @pl.when(j + 1 < nb)
                def _():
                    for cp in copies(j + 1, jax.lax.rem(j + 1, 2)):
                        cp.start()
                for cp in copies(j, slot):
                    cp.wait()
            base = j * TS
            out = []
            for h in range(KVH):
                m, l, acc = carry[h]
                if case == "dmaonly":
                    acc = acc + (kbuf[slot, h, :G8, :].astype(jnp.float32)
                                 + vbuf[slot, h, :G8, :].astype(jnp.float32))
                    out.append((m, l, acc))
                    continue
                q = q_ref[0, h]
                s = jax.lax.dot_general(
                    q.astype(jnp.bfloat16), kbuf[slot, h].astype(jnp.bfloat16),
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)  # [G8, TS]
                if case in ("nosm", "full"):
                    s = s * ksbuf[slot, h][None, :]
                if case == "full":
                    kpos = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + base
                    mask = kpos < pos
                    m_new = jnp.maximum(m, jnp.max(
                        jnp.where(mask, s, _NEG_INF), axis=-1, keepdims=True))
                    corr = jnp.exp(m - m_new)
                    p = jnp.where(mask, jnp.exp(s - m_new), 0.0)
                    l = l * corr + jnp.sum(p, axis=-1, keepdims=True)
                    p = (p * vsbuf[slot, h][None, :]).astype(jnp.bfloat16)
                    acc = acc * corr + jax.lax.dot_general(
                        p, vbuf[slot, h].astype(jnp.bfloat16),
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    m = m_new
                else:
                    p = (s * 1e-4).astype(jnp.bfloat16)
                    if case == "nosm":
                        p = p * vsbuf[slot, h][None, :].astype(jnp.bfloat16)
                    acc = acc + jax.lax.dot_general(
                        p, vbuf[slot, h].astype(jnp.bfloat16),
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                out.append((m, l, acc))
            return tuple(out)

        carry = jax.lax.fori_loop(0, nb, body, init)
        for h in range(KVH):
            m, l, acc = carry[h]
            if case == "full":
                o_ref[0, h] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
            else:
                o_ref[0, h] = acc.astype(o_ref.dtype)

    def small_index(b, *_):
        return (b, 0, 0, 0)

    qspec = pl.BlockSpec((1, KVH, G8, hd), small_index,
                         memory_space=pltpu.VMEM)
    hbmspec = pl.BlockSpec(memory_space=pltpu.ANY)
    ospec = pl.BlockSpec((1, KVH, G8, hd), small_index,
                         memory_space=pltpu.VMEM)
    scratch = [
        pltpu.VMEM((2, KVH, TS, hd), jnp.int8),
        pltpu.VMEM((2, KVH, TS, hd), jnp.int8),
        pltpu.VMEM((2, KVH, TS), jnp.float32),
        pltpu.VMEM((2, KVH, TS), jnp.float32),
        pltpu.SemaphoreType.DMA((2, 4)),
    ]

    def fn(scal, q, k4, v4, ks3, vs3):
        return pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(B,),
                in_specs=[qspec, hbmspec, hbmspec, hbmspec, hbmspec],
                out_specs=ospec,
                scratch_shapes=scratch,
            ),
            out_shape=jax.ShapeDtypeStruct((B, KVH, G8, hd), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )(scal, q, k4, v4, ks3, vs3)

    return fn


def run(case, L, B, KVH, S, hd, TS, pos_fill, iters, reps):
    key = jax.random.PRNGKey(0)
    G8 = 8
    q = jax.random.normal(key, (B, KVH, G8, hd), jnp.float32)
    k4 = jax.random.randint(key, (L * B, KVH, S, hd), -127, 127, jnp.int8)
    v4 = jax.random.randint(key, (L * B, KVH, S, hd), -127, 127, jnp.int8)
    ks3 = jnp.full((L * B, KVH, S), 1e-2, jnp.float32)
    vs3 = jnp.full((L * B, KVH, S), 1e-2, jnp.float32)
    pos = jnp.full((B,), pos_fill, jnp.int32)
    fn = make_fn(case, L, B, KVH, S, hd, TS)

    @jax.jit
    def loop(q, k4, v4, ks3, vs3, pos):
        def body(carry, l):
            scal = jnp.stack([pos, jnp.full((B,), l % L, jnp.int32)])
            out = fn(scal, carry, k4, v4, ks3, vs3)
            return carry + out * 1e-30, out[0, 0, 0, :1]
        return jax.lax.scan(body, q, jnp.arange(iters, dtype=jnp.int32))

    q1, outs = loop(q, k4, v4, ks3, vs3, pos)
    np.asarray(outs)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _, outs = loop(q, k4, v4, ks3, vs3, pos)
        np.asarray(outs)
        times.append(time.perf_counter() - t0)
    med = float(np.median(times)) / iters
    nb = -(-pos_fill // TS)
    touched = 2 * B * KVH * nb * TS * (hd + 4)
    print(json.dumps({
        "case": f"{case}_ts{TS}", "pos": pos_fill, "B": B,
        "ms_per_iter": round(med * 1e3, 4),
        "us_per_cell": round(med / B * 1e6, 2),
        "touched_GB_s": round(touched / med / 1e9, 1),
        "spread": round((max(times) - min(times)) / (med * iters), 3),
    }), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cases", default="dmaonly,dots,full")
    ap.add_argument("--L", type=int, default=4)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--kvh", type=int, default=32)
    ap.add_argument("--S", type=int, default=2048)
    ap.add_argument("--hd", type=int, default=128)
    ap.add_argument("--TS", type=int, default=256)
    ap.add_argument("--pos", default="64,512,2048")
    ap.add_argument("--iters", type=int, default=32)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    for case in args.cases.split(","):
        for p in map(int, args.pos.split(",")):
            try:
                run(case, args.L, args.batch, args.kvh, args.S, args.hd,
                    args.TS, p, args.iters, args.reps)
            except Exception as e:
                print(json.dumps({"case": case, "pos": p,
                                  "error": f"{type(e).__name__}: {e}"[:300]}),
                      flush=True)


if __name__ == "__main__":
    main()
