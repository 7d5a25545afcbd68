"""W4A8 feasibility probe: int4-packed weights, unpacked in-kernel, int8 MXU.

The decode headline is weight-stream-bound (~6.7 GB int8 / ~750 GB/s floor,
CLAUDE.md); halving weight bytes is the only remaining >10% decode lever
(NEXT r3 #1 epilogue).  Before building a w4a8 layer stack, this probe
answers two questions on the REAL chip:

1. does Mosaic compile the nibble unpack (shift/mask on int8 lanes, or an
   int32 round-trip) inside the matmul kernel at all?
2. what effective HBM rate does the packed stream achieve vs the production
   w8a8 kernel on the same logical shape — i.e. is the VPU unpack free
   behind the DMA or does it become the bottleneck?

Packing layout: byte (i, o) of the packed [IN, OUT/2] array holds logical
column o in its LOW nibble and column o + OUT/2 in its HIGH nibble, so the
in-kernel unpack is concat(lo, hi) along lanes — no interleave reshape
(Mosaic rejects sub-128-lane collapses, CLAUDE.md).  Scales stay per-channel
[OUT] f32 in logical order.

Run:  python tools/w4a8_probe.py [--rows 32] [--iters 256]
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/tpu_llama_jax_cache")
if "--cpu" in sys.argv:
    sys.argv.remove("--cpu")
    # the axon sitecustomize force-registers the TPU backend; env vars
    # alone do not switch to CPU (CLAUDE.md)
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pack_w4(w_int4: np.ndarray) -> np.ndarray:
    """[IN, OUT] int4-valued int8 -> [IN, OUT/2] packed bytes (lo | hi<<4)."""
    IN, OUT = w_int4.shape
    lo = w_int4[:, : OUT // 2].astype(np.int8)
    hi = w_int4[:, OUT // 2 :].astype(np.int8)
    return ((lo & 0xF) | ((hi & 0xF) << 4)).astype(np.int8)


def _w4a8_kernel(x_ref, sx_ref, p_ref, sw_ref, o_ref, acc_ref, *, n_in: int,
                 unpack: str):
    i = pl.program_id(2)

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    b = p_ref[:]  # [TI, TO/2] packed int8
    if unpack == "int8":
        # MEASURED r3: Mosaic fails to legalize 'arith.shli' on int8 lanes
        # — kept for re-testing on newer toolchains
        lo = jnp.left_shift(b, 4) >> 4  # arithmetic: sign-extend low nibble
        hi = b >> 4
    elif unpack == "int32":
        b32 = b.astype(jnp.int32)
        lo = ((b32 << 28) >> 28).astype(jnp.int8)
        hi = (b32 >> 4).astype(jnp.int8)
    else:  # "mask": shift-free (and/select/sub + f32 scale)
        lo4 = jnp.bitwise_and(b, jnp.int8(0xF))  # 0..15
        lo = lo4 - jnp.where(lo4 >= 8, jnp.int8(16), jnp.int8(0))
        hi = ((b - lo4).astype(jnp.float32) * 0.0625).astype(jnp.int8)
    w = jnp.concatenate([lo, hi], axis=1)  # [TI, TO] int8 in logical order
    acc_ref[:] += jnp.dot(x_ref[:], w, preferred_element_type=jnp.int32)

    @pl.when(i == n_in - 1)
    def _():
        o_ref[:] = (
            acc_ref[:].astype(jnp.float32) * sx_ref[:] * sw_ref[:]
        ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("TI", "TO", "unpack"))
def w4a8_matmul_probe(xq, sx, packed, sw, TI=512, TO=512, unpack="int8"):
    Bp, IN = xq.shape
    OUT = packed.shape[1] * 2
    TI, TO = min(TI, IN), min(TO, OUT)
    n_in, n_out = IN // TI, OUT // TO
    kern = functools.partial(_w4a8_kernel, n_in=n_in, unpack=unpack)
    return pl.pallas_call(
        kern,
        grid=(1, n_out, n_in),
        in_specs=[
            pl.BlockSpec((Bp, TI), lambda m, o, i: (m, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Bp, 1), lambda m, o, i: (m, 0),
                         memory_space=pltpu.VMEM),
            # packed block: both nibble halves of output tile o
            pl.BlockSpec((TI, TO // 2), lambda m, o, i: (i, o),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TO), lambda m, o, i: (0, o),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((Bp, TO), lambda m, o, i: (m, o),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, OUT), jnp.float32),
        scratch_shapes=[pltpu.VMEM((Bp, TO), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=jax.default_backend() != "tpu",
    )(xq, sx[:, None], packed, sw[None, :])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=32)
    ap.add_argument("--iters", type=int, default=256)
    ap.add_argument("--size", type=int, default=4096)
    ap.add_argument("--unpack", default="int32",
                    choices=["int8", "int32", "mask"])
    args = ap.parse_args()

    IN = OUT = args.size
    rng = np.random.default_rng(0)
    w4 = rng.integers(-8, 8, (IN, OUT)).astype(np.int8)
    packed = jnp.asarray(pack_w4(w4))
    # scale columns so unpacked@scales reproduces a float weight
    sw = jnp.asarray(rng.random(OUT).astype(np.float32) * 0.02)
    xq = jnp.asarray(rng.integers(-127, 128, (args.rows, IN)), jnp.int8)
    sx = jnp.asarray(rng.random(args.rows).astype(np.float32) * 0.05)

    # correctness vs numpy
    out = np.asarray(w4a8_matmul_probe(xq, sx, packed, sw,
                                       unpack=args.unpack))
    ref = (np.asarray(xq).astype(np.int32) @ w4.astype(np.int32)
           ).astype(np.float32) * np.asarray(sx)[:, None] * np.asarray(sw)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-4)
    print("correctness: OK", file=sys.stderr)

    # throughput: iterate the matmul in-program (dispatch floor is ~27 ms)
    @jax.jit
    def loop(xq, sx):
        def body(c, _):
            o = w4a8_matmul_probe(xq, sx, packed, sw, unpack=args.unpack)
            return c + o[0, :8], None
        acc, _ = jax.lax.scan(body, jnp.zeros((8,), jnp.float32),
                              length=args.iters)
        return acc

    np.asarray(loop(xq, sx))  # warm
    reps = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(loop(xq, sx))
        reps.append(time.perf_counter() - t0)
    dt = float(np.median(reps)) / args.iters
    packed_bytes = IN * OUT // 2
    print(json.dumps({
        "shape": [IN, OUT], "rows": args.rows, "unpack": args.unpack,
        "us_per_matmul": round(dt * 1e6, 1),
        "packed_gbps": round(packed_bytes / dt / 1e9, 1),
        "effective_int8_gbps": round(IN * OUT / dt / 1e9, 1),
    }))


if __name__ == "__main__":
    main()
