"""Mosaic feasibility probes for the mega2 (trailing-attention) kernel.

Round-2 NEXT.md #1: folding RoPE + fresh-KV quant into the fused decode
launch needs three Mosaic capabilities that have never been exercised on
this chip's remote compile service:

  P1  lane roll by +-1 on a multi-register [32, 4096] f32 vector
      (interleaved-pair swap for in-kernel RoPE)
  P2  lane-split reshape [32, D] -> [32, D//hd, hd] + reduce + broadcast
      (per-head absmax for in-kernel KV quantization)
  P3  dynamic sublane read q_sc[pl.ds(b, 1), h*hd:(h+1)*hd] with b from
      program_id (trailing attention cells reading the roped q scratch)
  P4  pair swap via reshape [32, D] -> [32, D//2, 2] -> flip -> back
      (fallback for P1)

Each probe compiles one tiny kernel, checks numerics vs XLA, and reports
PASS/FAIL — run them BEFORE building the kernel (remote Mosaic compiles
that hang have to be killed by timeout, CLAUDE.md).

Usage:  timeout 300 python tools/mega2_probe.py p1  (one probe per process;
a hang must not block the others)
"""

from __future__ import annotations

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/tpu_llama_jax_cache")

B, D, HD = 32, 4096, 128


def _swap_ref(x):
    """XLA reference: swap interleaved pairs (2j, 2j+1)."""
    r = x.reshape(x.shape[0], -1, 2)
    return jnp.stack([r[..., 1], r[..., 0]], axis=-1).reshape(x.shape)


def p1():
    def kernel(x_ref, o_ref):
        x = x_ref[:]
        # pltpu.roll requires non-negative shift; roll(x, s)[i] = x[i - s]
        left = pltpu.roll(x, D - 1, axis=1)   # y[i] = x[i+1]
        right = pltpu.roll(x, 1, axis=1)      # y[i] = x[i-1]
        lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        o_ref[:] = jnp.where(lane % 2 == 0, left, right)

    x = jnp.asarray(np.random.default_rng(0).normal(size=(B, D)), jnp.float32)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, D), jnp.float32),
    )(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(_swap_ref(x)))
    print("P1 PASS: pltpu.roll lane swap on [32, 4096]")


def p4():
    def kernel(x_ref, o_ref):
        x = x_ref[:]
        r = x.reshape(B, D // 2, 2)
        o_ref[:] = jnp.stack([r[..., 1], r[..., 0]], axis=-1).reshape(B, D)

    x = jnp.asarray(np.random.default_rng(0).normal(size=(B, D)), jnp.float32)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, D), jnp.float32),
    )(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(_swap_ref(x)))
    print("P4 PASS: reshape-flip lane swap on [32, 4096]")


def p2():
    def kernel(x_ref, o_ref):
        x = x_ref[:]
        g = x.reshape(B, D // HD, HD)
        am = jnp.max(jnp.abs(g), axis=-1, keepdims=True)  # [B, nh, 1]
        o_ref[:] = jnp.broadcast_to(am, g.shape).reshape(B, D)

    x = jnp.asarray(np.random.default_rng(0).normal(size=(B, D)), jnp.float32)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, D), jnp.float32),
    )(x)
    ref = np.abs(np.asarray(x)).reshape(B, D // HD, HD).max(-1, keepdims=True)
    ref = np.broadcast_to(ref, (B, D // HD, HD)).reshape(B, D)
    np.testing.assert_allclose(np.asarray(out), ref)
    print("P2 PASS: lane-split reshape + per-head absmax on [32, 4096]")


def p3():
    def kernel(x_ref, o_ref):
        b = pl.program_id(0)
        # dynamic sublane row read + static lane slice (head 3), then a
        # dynamic sublane write — the trailing-cell access pattern
        row = x_ref[pl.ds(b, 1), 3 * HD:4 * HD]  # [1, HD]
        o_ref[pl.ds(b, 1), :] = row * 2.0

    x = jnp.asarray(np.random.default_rng(0).normal(size=(B, D)), jnp.float32)
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[pl.BlockSpec((B, D), lambda b: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((B, HD), lambda b: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, HD), jnp.float32),
    )(x)
    np.testing.assert_allclose(np.asarray(out),
                               2 * np.asarray(x[:, 3 * HD:4 * HD]))
    print("P3 PASS: dynamic sublane read [pl.ds(b,1), lane slice]")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    probes = {"p1": p1, "p2": p2, "p3": p3, "p4": p4}
    if which == "all":
        for name, fn in probes.items():
            fn()
    else:
        probes[which]()
