"""Minimal repro harness for the B=2 trailing-cell kernel fault (r4).

Reproduces ops/fused_step2.py's structural pattern in ~80 lines: a grid of
NPH dummy "phase" steps followed by B per-slot "cells", each running a
fori_loop over a DEPTH-slot manual-DMA ring driven by a global descriptor
chain, ending in a dynamic-offset store.  forward_decode(fused="mega2"/
"mega") kernel-faults at B=2 on the real chip while B=1/4/8/16 pass
(b2_probe_r4.log); this strips the pattern to its skeleton so the faulting
ingredient can be isolated with fast compiles.

Usage: python tools/cell_micro_repro.py <B> [--depth 2] [--no-dma]
       [--static-store] [--nph 8]
Prints MICRO_OK <B> and the max |kernel - reference| on success.
"""
import argparse
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/tpu_llama_jax_cache")

KVH, S, hd, TS = 32, 2048, 128, 128


def kernel(meta_ref, pos_ref, base_ref, dcell_ref, doff_ref,
           x_ref, k_hbm, ks_hbm, o_ref, acc_ref,
           kbuf, ksbuf, sem, *, B, NPH, DEPTH, dma, static_store):
    o = pl.program_id(0)
    tot = meta_ref[3]

    def copies(g, slot):
        bb = dcell_ref[g]
        off = doff_ref[g]
        row = meta_ref[1] * B + bb
        return [
            pltpu.make_async_copy(
                k_hbm.at[row, :, pl.ds(off * TS, TS), :],
                kbuf.at[slot], sem.at[slot, 0]),
            pltpu.make_async_copy(
                ks_hbm.at[row, :, pl.ds(off * TS, TS)],
                ksbuf.at[slot], sem.at[slot, 1]),
        ]

    if dma:
        for _i in range(DEPTH):
            @pl.when(jnp.logical_and(o == _i, tot > _i))
            def _(i=_i):
                for cp in copies(i, i):
                    cp.start()

    @pl.when(o < NPH)
    def _phase():
        acc_ref[:] += x_ref[:] * 0.001  # dummy phase work

    @pl.when(o >= NPH)
    def _cell():
        b = o - NPH
        pos = pos_ref[b]
        nb = jax.lax.div(pos + TS - 1, TS)
        g0 = base_ref[b]

        def body(jj, carry):
            g = g0 + jj
            slot = jax.lax.rem(g, DEPTH)
            if dma:
                for cp in copies(g, slot):
                    cp.wait()
            blk = kbuf[slot].astype(jnp.float32)  # [KVH, TS, hd]
            sc = ksbuf[slot]  # [KVH, TS]
            part = jnp.sum(blk * sc[..., None], axis=1)  # [KVH, hd]
            if dma:
                @pl.when(g + DEPTH < tot)
                def _():
                    for cp in copies(g + DEPTH, slot):
                        cp.start()
            return carry + part

        out = jax.lax.fori_loop(0, nb, body, jnp.zeros((KVH, hd), jnp.float32))
        if static_store:
            o_ref[:] += out[None]  # no dynamic offset (all cells accumulate)
        else:
            o_ref[pl.ds(b, 1)] = out[None]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("B", type=int)
    ap.add_argument("--depth", type=int, default=2)
    ap.add_argument("--no-dma", action="store_true")
    ap.add_argument("--static-store", action="store_true")
    ap.add_argument("--nph", type=int, default=8)
    ap.add_argument("--pos", type=int, default=512)
    args = ap.parse_args()
    B, NPH, DEPTH = args.B, args.nph, args.depth
    L = 2
    Bp = 32

    rng = np.random.default_rng(0)
    k = jnp.asarray(rng.integers(-80, 80, (L * B, KVH, S, hd), np.int8))
    ks = jnp.asarray(rng.normal(size=(L * B, KVH, S)).astype(np.float32))
    x = jnp.ones((Bp, hd), jnp.float32)
    pos = jnp.full((B,), args.pos, jnp.int32)

    nbs = (pos + TS - 1) // TS
    cum = jnp.cumsum(nbs)
    base = (cum - nbs).astype(jnp.int32)
    total = cum[-1].astype(jnp.int32)
    maxg = B * (S // TS)
    idx = jnp.arange(maxg, dtype=jnp.int32)
    dcell = jnp.clip(jnp.searchsorted(cum, idx, side="right"), 0, B - 1
                     ).astype(jnp.int32)
    doff = jnp.clip(idx - base[dcell], 0, S // TS - 1).astype(jnp.int32)
    meta = jnp.stack([jnp.int32(0), jnp.int32(1), jnp.int32(0), total])

    kfun = functools.partial(kernel, B=B, NPH=NPH, DEPTH=DEPTH,
                             dma=not args.no_dma,
                             static_store=args.static_store)
    out, acc = pl.pallas_call(
        kfun,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=(NPH + B,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),  # x
                pl.BlockSpec(memory_space=pl.ANY),  # k
                pl.BlockSpec(memory_space=pl.ANY),  # ks
            ],
            out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                       pl.BlockSpec(memory_space=pltpu.VMEM)),
            scratch_shapes=[
                pltpu.VMEM((DEPTH, KVH, TS, hd), jnp.int8),
                pltpu.VMEM((DEPTH, KVH, TS), jnp.float32),
                pltpu.SemaphoreType.DMA((DEPTH, 2)),
            ],
        ),
        out_shape=(jax.ShapeDtypeStruct((Bp, KVH, hd), jnp.float32),
                   jax.ShapeDtypeStruct((Bp, hd), jnp.float32)),
        interpret=jax.default_backend() != "tpu",
    )(meta, pos, base, dcell, doff, x, k, ks)
    got = np.asarray(out)

    # reference: row l2*B+b, first pos rows (TS-block aligned: nb*TS rows)
    kf = np.asarray(k, np.float32)
    ksf = np.asarray(ks)
    nb = -(-args.pos // TS)
    for b in range(B):
        row = 1 * B + b
        ref = (kf[row, :, :nb * TS] * ksf[row, :, :nb * TS, None]).sum(axis=1)
        if args.static_store:
            break
        err = np.abs(got[b] - ref).max()
        rel = err / (np.abs(ref).max() + 1e-9)
        assert rel < 1e-4, (b, err, rel)
    print(f"MICRO_OK B={B} depth={DEPTH} dma={not args.no_dma} "
          f"static_store={args.static_store}", flush=True)


if __name__ == "__main__":
    main()
