#!/usr/bin/env python
"""Benchmark runner — prints ONE JSON line with the headline metric.

Headline: decode tokens/sec/chip on the Llama-2 7B shape (BASELINE.json).
The reference's published 7B number is 0.16 tok/s (fp32, laptop CPU,
/root/reference/README.md:11); ``vs_baseline`` is the ratio against that.

Methodology (hardened in round 2 after tools/kernel_bench.py found a ~27 ms
FIXED overhead per host-visible dispatch on this relay-attached chip):

* the decode loop is ONE jitted lax.scan of ``--steps`` (default 256) steps,
  so fixed dispatch cost is amortized to <0.5%% of the window;
* every timing window ends with a host readback (block_until_ready alone can
  return before device execution completes here);
* N>=5 timed repetitions; the MEDIAN is the headline and the min-max spread
  is reported alongside (the chip is time-shared; single numbers lie);
* TTFT is measured as a full prefill dispatch (prompt length --prompt-len)
  plus the first decode step, p50 over reps.

Weights are synthetic (no checkpoints ship in this environment) — decode
throughput is content-independent.  ``--sweep`` records a batch sweep to
BENCH_sweep.jsonl for the BASELINE batch 1->64 gate.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import jax

# persistent compilation cache: repeat bench runs skip the multi-minute
# remote compiles (cache survives across processes)
jax.config.update("jax_compilation_cache_dir", "/tmp/tpu_llama_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

BASELINE_7B_TOKS = 0.16  # reference README.md:11


def _build(config, dtype, quant, fuse):
    from tpu_llama.models import random_params
    from tpu_llama.models.llama import quantize_params, random_quant_params

    # models whose fp form exceeds HBM (13B+) generate int8 weights directly
    fp_bytes = 2 * sum([
        config.vocab_size * config.dim * 2,
        config.n_layers * (2 * config.dim * config.dim
                           + 2 * config.dim * config.kv_dim
                           + 3 * config.dim * config.hidden_dim),
    ])
    if quant and fp_bytes > 10e9:
        mode = quant if quant in ("w8a8", "w4a8") else "q8_0"
        return jax.block_until_ready(
            random_quant_params(config, mode=mode, fuse=fuse))
    params = random_params(config, dtype=dtype, seed=0)
    if fuse:
        from tpu_llama.models.llama import fuse_projections
        params = fuse_projections(params)
    if quant == "int8":
        params = jax.block_until_ready(quantize_params(params))
    elif quant in ("w8a8", "w4a8"):
        params = jax.block_until_ready(quantize_params(params, mode=quant))
    return params


def _make_cache(config, batch, kv, seq_len, kv_layout="dense", page_size=512):
    from tpu_llama.models import make_kv_cache

    if kv_layout != "paged":
        return make_kv_cache(config, batch=batch, kv_dtype=kv,
                             seq_len=seq_len)
    import dataclasses

    from tpu_llama.runtime.paged import PagePool

    S = seq_len or config.seq_len
    mp = -(-S // page_size)
    pool = PagePool(batch * mp + 1, page_size, batch, mp)
    for s in range(batch):
        assert pool.reserve(s, S) is not None
    cache = make_kv_cache(config, batch=batch, kv_dtype="int8", seq_len=S,
                          paged=True, num_pages=batch * mp + 1,
                          page_size=page_size)
    return dataclasses.replace(cache, page_table=jnp.asarray(pool.table))


def _fused_arg(args):
    return {"true": True, "false": False}.get(args.fused, args.fused)


def bench_decode(params, config, batch, steps, dtype, seq_fill=512,
                 kv_dtype=None, attn="auto", unroll=1, reps=5, seq_len=None,
                 kv_layout="dense", page_size=512, fused="auto"):
    """Decode throughput via the fused on-device greedy loop.  Returns
    (median tok/s, spread, [times])."""
    from tpu_llama.models.llama import greedy_decode_loop

    kv = kv_dtype or dtype
    cache = _make_cache(config, batch, kv, seq_len, kv_layout, page_size)

    tokens = jnp.zeros((batch,), jnp.int32)
    pos = jnp.full((batch,), seq_fill, jnp.int32)

    out, cache = greedy_decode_loop(params, cache, tokens, pos, steps, config,
                                    attn=attn, unroll=unroll, fused=fused)
    np.asarray(out)  # compile + warm; HOST READBACK forces real completion
    times = []
    for i in range(reps):
        t0 = time.perf_counter()
        out, cache = greedy_decode_loop(
            params, cache, tokens, pos, steps, config,
            attn=attn, unroll=unroll, fused=fused)
        np.asarray(out)  # sync
        times.append(time.perf_counter() - t0)
    med = float(np.median(times))
    spread = (max(times) - min(times)) / med
    return batch * steps / med, spread, times


def bench_decode_ab(params, config, batch, steps, dtype, variants,
                    seq_fill=512, kv_dtype=None, reps=5, seq_len=None,
                    kv_layout="dense", page_size=512):
    """INTERLEAVED end-to-end A/B of fused-path variants.

    The chip is time-shared with ~40% window-to-window drift (CLAUDE.md),
    so sequential per-variant timing windows can't resolve a 5% delta —
    tools/mega_probe.py interleaves per-layer reps for exactly this reason,
    and VERDICT r2 (weak #2) demands the END-TO-END A/B do the same.  Each
    rep round runs every variant back-to-back so they share the same
    contention; the per-variant MEDIANS are comparable."""
    from tpu_llama.models.llama import greedy_decode_loop

    kv = kv_dtype or dtype
    # ONE cache shared by every variant (same shapes; greedy_decode_loop
    # donates it and returns the successor) — three dense 7B caches at
    # once OOM the chip
    cache = _make_cache(config, batch, kv, seq_len, kv_layout, page_size)
    tokens = jnp.zeros((batch,), jnp.int32)
    pos = jnp.full((batch,), seq_fill, jnp.int32)
    modes = {v: {"true": True, "false": False}.get(v, v) for v in variants}
    for v in variants:  # compile + warm each program
        out, cache = greedy_decode_loop(params, cache, tokens, pos, steps,
                                        config, fused=modes[v])
        np.asarray(out)
    times = {v: [] for v in variants}
    for _ in range(reps):
        for v in variants:
            t0 = time.perf_counter()
            out, cache = greedy_decode_loop(params, cache, tokens, pos,
                                            steps, config, fused=modes[v])
            np.asarray(out)
            times[v].append(time.perf_counter() - t0)
    result = {}
    for v in variants:
        ts = times[v]
        med = float(np.median(ts))
        result[v] = {"toks": round(batch * steps / med, 3),
                     "spread": round((max(ts) - min(ts)) / med, 3)}
    return result


def bench_ttft(params, config, batch, prompt_len, dtype, kv_dtype=None,
               reps=5, seq_len=None, kv_layout="dense", page_size=512,
               info=None):
    """p50 time-to-first-token: one batched prefill (logits_mode=last) plus
    one decode step, timed with readback.

    kv_layout="paged" prefills through the engine's compact-prefill +
    page-scatter path (runtime/engine.py) — a dense bench cache alongside
    the decode working set OOMs at b64 on 7B, the page pool does not.

    If the prompt fills the cache to CAPACITY (prompt_len >= seq_len), the
    decode step is skipped: decoding at pos == capacity is an out-of-bounds
    cache write (paged: pt[b, pos//ps] reads past the page table — the
    zero-headroom geometry behind the r3 b64 'Internal' error, ADVICE r3).
    ``info`` (dict) gets ``ttft_no_decode: True`` so records stay honest."""
    from tpu_llama.models import make_kv_cache
    from tpu_llama.models.llama import forward_decode, forward_prefill

    kv = kv_dtype or dtype
    S = seq_len or config.seq_len
    capacity = -(-S // page_size) * page_size if kv_layout == "paged" else S
    with_decode = prompt_len < capacity
    if not with_decode:
        print(f"bench_ttft: prompt_len {prompt_len} >= cache capacity "
              f"{capacity} — no decode headroom; skipping the decode step",
              file=sys.stderr)
        if info is not None:
            info["ttft_no_decode"] = True
    tokens = jnp.zeros((batch, prompt_len), jnp.int32)
    start = jnp.zeros((batch,), jnp.int32)
    lengths = jnp.full((batch,), prompt_len, jnp.int32)
    # very large B*T one-shot prefill OOMs on activations; the fresh path
    # (cache out of the loop) made one-shot safe and faster up to ~8k rows
    # (b16 T512: chunked 904 ms vs projected ~600 one-shot)
    # >= 8192 rows go chunked with rows-per-chunk capped at 4096: the
    # one-shot fused program at M=8192 reproducibly kills the remote
    # compile helper (HTTP 500, both service ports — r4 sweep), while
    # every M<=4096 kernel shape compiles fine
    chunk = 256
    while batch * chunk > 4096 and chunk % 2 == 0 and prompt_len % (
            chunk // 2) == 0:
        chunk //= 2
    chunked = [batch * prompt_len >= 8192 and prompt_len % chunk == 0
               and batch * chunk <= 4096]

    host_chunks = [False]  # flipped on in-jit chunked compile failure
    # ONE cache threaded through every rep via the donation chain: per-rep
    # creation keeps the previous rep's buffers alive while the next
    # allocates (transient 2x cache = runtime ResourceExhausted at b32
    # dense, 6.45 GB each — b32_ttft_r5b.log); prefill overwrites the full
    # prompt span each rep, so reuse is semantically identical
    cache_box = [None]

    def once():
        if kv_layout == "paged":
            from tpu_llama.runtime.engine import prefill_into_slots_waved

            if cache_box[0] is None:
                cache_box[0] = _make_cache(config, batch, "int8", seq_len,
                                           "paged", page_size)
            cache, cache_box[0] = cache_box[0], None
            slots = jnp.arange(batch, dtype=jnp.int32)
            # large admissions go pool-direct in host-dispatched waves —
            # the only b64-feasible path (see engine.py)
            logits, _, cache = prefill_into_slots_waved(
                params, cache, tokens, lengths, slots, config,
                precision="default", logits_mode="last")
        else:
            from tpu_llama.models.llama import (
                _prefill_chunked_carry_ok, forward_prefill_chunked_carry)

            if cache_box[0] is None:
                cache_box[0] = make_kv_cache(config, batch=batch,
                                             kv_dtype=kv, seq_len=seq_len)
            cache, cache_box[0] = cache_box[0], None
            if chunked[0] and _prefill_chunked_carry_ok(
                    params, config, cache, batch, chunk) \
                    and not host_chunks[0]:
                # cache in the layer-scan CARRY + aliased chunk writes: the
                # only b32-dense-feasible ONE-dispatch form on the r5
                # toolchain (the xs/ys bodies charge 2 extra cache-sized
                # HBM temps — b32_full_err.log)
                logits, cache = forward_prefill_chunked_carry(
                    params, cache, tokens, lengths, config,
                    precision="default", chunk=chunk)
            elif chunked[0] and host_chunks[0]:
                # host-dispatched chunk loop: each chunk is ONE donated
                # forward_prefill program (its scan-ys cache staging
                # aliases the donated input).  The in-jit chunk forms keep
                # n-1 extra full-cache temps alive — HBM-infeasible at b32
                # dense (19.4 G > 15.75, b32_full_err.log) — and the r5
                # toolchain broke the lax.scan chunk form outright
                # (CLAUDE.md r5 envelope).  ~27 ms dispatch per extra
                # chunk is the price of a number that exists.
                n = prompt_len // chunk
                logits = None
                for i in range(n):
                    tok_c = tokens[:, i * chunk:(i + 1) * chunk]
                    start_c = jnp.full((batch,), i * chunk, jnp.int32)
                    len_c = jnp.clip(lengths - i * chunk, 1, chunk)
                    logits, cache = forward_prefill(
                        params, cache, tok_c, start_c, len_c, config,
                        precision="default", logits_mode="last",
                        max_keys=prompt_len)
                # uniform prompt_len: every row's final token is in the
                # last chunk, so the final call's logits are the answer
            elif chunked[0]:
                from tpu_llama.models.llama import \
                    forward_prefill_chunked_unrolled

                logits, cache = forward_prefill_chunked_unrolled(
                    params, cache, tokens, lengths, config,
                    precision="default", chunk=chunk)
            else:
                logits, cache = forward_prefill(
                    params, cache, tokens, start, lengths, config,
                    precision="default", logits_mode="last",
                    assume_fresh=True)  # start==0: cache out of the loop
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        if not with_decode:
            cache_box[0] = cache
            return nxt
        # the engine's decode step DONATES the cache — the plain
        # forward_decode would hold a second multi-GB copy, which pushed
        # the b8 S2048 TTFT program over HBM (tpu_smoke r3)
        from tpu_llama.runtime.engine import _decode_step

        logits2, cache = _decode_step(
            params, cache, nxt, lengths, config, "default")
        cache_box[0] = cache
        return jnp.argmax(logits2, axis=-1)

    retry = None
    try:
        np.asarray(once())  # warm/compile
    except Exception as e:
        if kv_layout == "paged":
            raise
        # Retry ladder, each arm OUTSIDE this handler (the exception's
        # traceback pins the failed attempt's frames and their multi-GB
        # cache until the handler exits — b32_ttft_r5b.log):
        #  * one-shot fresh failed (13B: its cache-wide temps OOM the
        #    AOT assignment, probe_13b.log) -> carry-chunked, which
        #    compiles at every probed geometry;
        #  * in-jit chunked failed (b32 dense: n-1 unaliased cache
        #    temps, b32_full_err.log) -> host-dispatched per-chunk
        #    programs (their scan-ys staging aliases the donated cache).
        retry = "host_chunks" if chunked[0] else "carry"
        print(f"bench_ttft: prefill warm failed ({type(e).__name__}); "
              f"retrying via {retry}", file=sys.stderr)
    if retry:
        import gc

        cache_box[0] = None
        gc.collect()
        if retry == "carry":
            # chunk 256 matches the probed carry geometries
            # (probe_13b.log, env_probe10.log); fall back to the largest
            # 128-multiple inside the fused-stage envelope
            if batch * 256 <= 4096 and prompt_len % 256 == 0:
                c = 256
            else:
                c = max(128, (4096 // batch) // 128 * 128)
                while prompt_len % c and c > 128:
                    c -= 128
            if prompt_len % c == 0 and batch * c <= 4096:
                chunk = c
                chunked[0] = True
        else:
            host_chunks[0] = True
        if info is not None:
            info["ttft_prefill"] = retry
        try:
            np.asarray(once())
        except Exception as e2:
            if retry != "carry":
                raise
            print(f"bench_ttft: carry retry failed ({type(e2).__name__}); "
                  f"retrying with host-dispatched chunks", file=sys.stderr)
            retry = "host_chunks"
    if retry == "host_chunks" and not host_chunks[0]:
        import gc

        cache_box[0] = None
        gc.collect()
        host_chunks[0] = True
        if info is not None:
            info["ttft_prefill"] = "host_chunks"
        np.asarray(once())
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(once())
        times.append(time.perf_counter() - t0)
    return float(np.median(times)), times


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=256)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--config", default="7b", choices=["7b", "13b", "110m", "15m"])
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--quant", default="w8a8",
                    choices=["none", "int8", "w8a8", "w4a8"],
                    help="w4a8: packed-int4 weight storage — measured r5: "
                         "a checkpoint-density format, NOT a runtime mode "
                         "on this toolchain (XLA materializes byte-expanded "
                         "unpacks; 9.5x slower than w8a8 — W4A8_PROBE.json)")
    # "auto" resolves to the measured winner per config (models/llama.py):
    # manual-DMA flash_dma everywhere except dense B=1 (389.7 vs 307.4 tok/s
    # on the b8 headline; see kernel_bench --dyn/--fresh/--paged A/Bs)
    ap.add_argument("--fused", default="auto",
                    choices=["auto", "true", "false", "mega", "mega2",
                             "mega3"],
                    help="decode path: auto | true (two-launch fused) | "
                         "false (unfused) | mega (one-launch, leading "
                         "attention) | mega2 (one-launch, trailing attention "
                         "+ in-kernel rope) | mega3 (one launch per layer "
                         "PAIR, in-kernel seam merge)")
    ap.add_argument("--attn", default="auto",
                    choices=["auto", "flash", "flash_dma", "xla"])
    ap.add_argument("--kv", default="int8", choices=["same", "float32", "bfloat16", "int8"],
                    help="KV cache dtype (default: int8)")
    ap.add_argument("--fuse", action=argparse.BooleanOptionalAction, default=True,
                    help="fuse qkv and gate/up projections (default on)")
    ap.add_argument("--unroll", type=int, default=1, help="layer-scan unroll")
    ap.add_argument("--seq-fill", type=int, default=512,
                    help="context length at which decode is measured")
    ap.add_argument("--prompt-len", type=int, default=512,
                    help="prompt length for the TTFT measurement")
    ap.add_argument("--ttft", action=argparse.BooleanOptionalAction, default=True)
    ap.add_argument("--sweep", default=None,
                    help="comma list of batch sizes; writes BENCH_sweep.jsonl")
    ap.add_argument("--ab", default=None,
                    help="comma list of fused modes (mega2,true,...) timed "
                         "INTERLEAVED round-robin — the only A/B method that "
                         "resolves <5%% deltas on this time-shared chip")
    ap.add_argument("--seq-len", type=int, default=None,
                    help="KV cache capacity (default: model seq_len)")
    ap.add_argument("--kv-layout", default="dense", choices=["dense", "paged"],
                    help="paged: page-pool INT8 KV (A/B the paged kernels)")
    ap.add_argument("--page-size", type=int, default=512)
    args = ap.parse_args()

    from tpu_llama.config import LLAMA2_7B, LLAMA2_13B, STORIES15M, STORIES110M

    configs = {"7b": LLAMA2_7B, "13b": LLAMA2_13B, "110m": STORIES110M, "15m": STORIES15M}
    dtype = jnp.dtype(args.dtype)
    if args.quant == "none":
        args.quant = None
    if args.kv == "same":
        args.kv = None

    name = args.config
    config = configs[name]
    try:
        params = _build(config, dtype, args.quant, args.fuse)
    except Exception as e:  # OOM etc. — fall back, report honestly
        print(f"bench {name} failed ({type(e).__name__}: {e}); falling back to 110m",
              file=sys.stderr)
        name = "110m"
        config = configs[name]
        params = _build(config, dtype, args.quant, args.fuse)

    qtag = f"_{args.quant}" if args.quant else ""
    if args.kv:
        qtag += f"_kv{args.kv}"
    if args.kv_layout == "paged":
        qtag += "_paged"

    if args.ab:
        variants = args.ab.split(",")
        res = bench_decode_ab(
            params, config, args.batch, args.steps, dtype, variants,
            seq_fill=args.seq_fill, kv_dtype=args.kv, reps=args.reps,
            seq_len=args.seq_len, kv_layout=args.kv_layout,
            page_size=args.page_size)
        print(json.dumps({"metric": f"ab_{name}_b{args.batch}", "ab": res,
                          "steps": args.steps, "reps": args.reps,
                          "seq_fill": args.seq_fill}))
        return

    if args.sweep:
        batches = [int(b) for b in args.sweep.split(",")]
        with open("BENCH_sweep.jsonl", "a") as f:
            for b in batches:
                try:
                    toks, spread, _ = bench_decode(
                        params, config, b, args.steps, dtype,
                        seq_fill=args.seq_fill, kv_dtype=args.kv,
                        attn=args.attn, unroll=args.unroll, reps=args.reps,
                        seq_len=args.seq_len, kv_layout=args.kv_layout,
                        page_size=args.page_size, fused=_fused_arg(args))
                    rec = {"metric": f"decode_tokens_per_sec_{name}_{args.dtype}{qtag}_b{b}",
                           "value": round(toks, 3), "unit": "tok/s/chip",
                           "spread": round(spread, 3),
                           "steps": args.steps, "seq_fill": args.seq_fill,
                           "prompt_len": args.prompt_len}
                    if args.seq_len:
                        rec["seq_len"] = args.seq_len
                    # TTFT failing (e.g. prefill OOM at a batch the decode
                    # path handles) must not discard the decode number; a
                    # dense-cache OOM retries through the paged pool (the
                    # serving path) before giving up
                    try:
                        ttft_s, _ = bench_ttft(
                            params, config, b, args.prompt_len, dtype,
                            kv_dtype=args.kv, reps=max(3, args.reps - 2),
                            seq_len=args.seq_len, kv_layout=args.kv_layout,
                            page_size=args.page_size, info=rec)
                        rec["p50_ttft_ms"] = round(ttft_s * 1e3, 1)
                    except Exception as e:
                        rec["ttft_error"] = f"{type(e).__name__}: {e}"[:120]
                        # Retry through the paged pool ONLY for memory
                        # exhaustion (dense bench cache + decode working
                        # set > HBM) — any other dense-prefill failure is
                        # a bug that must stay visible, and the dense
                        # error is kept alongside the paged number.
                        emsg = str(e).lower()
                        oom = ("resource_exhausted" in emsg
                               or "out of memory" in emsg
                               or "exhausted" in emsg)
                    # the paged retry runs OUTSIDE the except handler: the
                    # exception's traceback pins the dense attempt's
                    # frames (and their multi-GB cache) until the handler
                    # exits — the pinned buffers OOM'd every retry
                    # (b32_ttft_r5b.log, rows_13b_r5.log)
                    if "ttft_error" in rec and args.kv_layout == "dense" \
                            and oom:
                        import gc

                        gc.collect()
                        try:
                            ttft_s, _ = bench_ttft(
                                params, config, b, args.prompt_len,
                                dtype, kv_dtype=args.kv,
                                reps=max(3, args.reps - 2),
                                seq_len=args.seq_len, kv_layout="paged",
                                page_size=args.page_size, info=rec)
                            rec["p50_ttft_ms"] = round(ttft_s * 1e3, 1)
                            rec["ttft_path"] = "paged"
                            rec["ttft_error_dense"] = rec.pop(
                                "ttft_error")
                        except Exception as e2:
                            rec["ttft_error_paged"] = (
                                f"{type(e2).__name__}: {e2}"[:120])
                except Exception as e:
                    rec = {"metric": f"sweep_b{b}", "error": f"{type(e).__name__}: {e}"[:200]}
                print(json.dumps(rec), flush=True)
                f.write(json.dumps(rec) + "\n")
        return

    toks, spread, _ = bench_decode(
        params, config, args.batch, args.steps, dtype, seq_fill=args.seq_fill,
        kv_dtype=args.kv, attn=args.attn, unroll=args.unroll, reps=args.reps,
        seq_len=args.seq_len, kv_layout=args.kv_layout,
        page_size=args.page_size, fused=_fused_arg(args))
    rec = {
        "metric": f"decode_tokens_per_sec_{name}_{args.dtype}{qtag}_b{args.batch}",
        "value": round(toks, 3),
        "unit": "tok/s/chip",
        "vs_baseline": (round(toks / BASELINE_7B_TOKS, 2) if name == "7b" else None),
        "spread": round(spread, 3),
        "reps": args.reps, "steps": args.steps, "seq_fill": args.seq_fill,
    }
    if args.ttft:
        try:
            ttft_s, _ = bench_ttft(params, config, args.batch, args.prompt_len,
                                   dtype, kv_dtype=args.kv, reps=args.reps,
                                   seq_len=args.seq_len,
                                   kv_layout=args.kv_layout,
                                   page_size=args.page_size, info=rec)
            rec["p50_ttft_ms"] = round(ttft_s * 1e3, 1)
            rec["prompt_len"] = args.prompt_len
        except Exception as e:
            rec["ttft_error"] = f"{type(e).__name__}: {e}"[:120]
            emsg = str(e).lower()
            oom = ("resource_exhausted" in emsg or "out of memory" in emsg
                   or "exhausted" in emsg)
        # retry outside the except handler — see the sweep-path comment
        if "ttft_error" in rec and args.kv_layout == "dense" and oom:
            import gc

            gc.collect()
            try:
                ttft_s, _ = bench_ttft(
                    params, config, args.batch, args.prompt_len, dtype,
                    kv_dtype=args.kv, reps=args.reps,
                    seq_len=args.seq_len, kv_layout="paged",
                    page_size=args.page_size, info=rec)
                rec["p50_ttft_ms"] = round(ttft_s * 1e3, 1)
                rec["prompt_len"] = args.prompt_len
                rec["ttft_path"] = "paged"
                rec["ttft_error_dense"] = rec.pop("ttft_error")
            except Exception as e2:
                rec["ttft_error_paged"] = f"{type(e2).__name__}: {e2}"[:120]
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
