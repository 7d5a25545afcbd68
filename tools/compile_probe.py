"""AOT compile probe: does ONE program geometry survive the remote compile
service?  (VERDICT r4 #1: the b32 chunked-prefill TTFT program kills the
tpu_compile_helper with HTTP 500 while the b16 one compiles — map the crash
envelope.)

Uses ``jax.jit(...).lower(<abstract args>).compile()`` so NO device memory is
touched and no 6.7 GB param build is paid: the probe isolates exactly the
remote-compile step that 500s.  One probe per process (the fused-prefill
gates read env at trace time — CLAUDE.md / ops/matmul.py docstring).

Usage:
  python tools/compile_probe.py --program prefill_chunked --batch 32 \
      --chunk 128 --seq-len 768 --prompt-len 512
Prints one line: ``PROBE_OK <tag> <secs>`` or ``PROBE_FAIL <tag> <err>``.
"""
from __future__ import annotations

import argparse
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp

if "--no-cache" not in sys.argv:
    jax.config.update("jax_compilation_cache_dir", "/tmp/tpu_llama_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--program", required=True,
                    choices=["prefill_chunked", "prefill_chunked_unrolled",
                             "prefill_chunked_carry", "prefill",
                             "prefill_cont", "decode",
                             "prefill_paged_chunked",
                             "prefill_paged_long"])
    ap.add_argument("--config", default="7b")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--chunk", type=int, default=128)
    ap.add_argument("--seq-len", type=int, default=768)
    ap.add_argument("--prompt-len", type=int, default=512)
    ap.add_argument("--precision", default="default")
    ap.add_argument("--no-cache", action="store_true",
                    help="skip the persistent compile cache: distinguishes "
                         "'compiles on this toolchain' from 'cached binary "
                         "from an older toolchain'")
    args = ap.parse_args()

    from tpu_llama.config import LLAMA2_7B, LLAMA2_13B
    from tpu_llama.models.llama import (forward_decode, forward_prefill,
                                        forward_prefill_chunked,
                                        make_kv_cache, random_quant_params)

    config = {"7b": LLAMA2_7B, "13b": LLAMA2_13B}[args.config]
    B, T, S = args.batch, args.prompt_len, args.seq_len
    tag = (f"{args.program}_b{B}_T{T}_S{S}_c{args.chunk}_"
           f"{args.config}")

    params = jax.eval_shape(
        lambda: random_quant_params(config, mode="w8a8", fuse=True))
    cache = jax.eval_shape(
        lambda: make_kv_cache(config, batch=B, kv_dtype="int8", seq_len=S))
    tokens2d = jax.ShapeDtypeStruct((B, T), jnp.int32)
    vec = jax.ShapeDtypeStruct((B,), jnp.int32)

    # .lower() on the ORIGINAL jitted entry points: re-wrapping in a fresh
    # jax.jit drops their donate_argnums and double-counts the KV cache in
    # the AOT memory assignment (measured: a 6.45 GB b32 cache probed as
    # 12.9 GB and OOM'd programs the real donated path fits)
    t0 = time.time()
    try:
        if args.program == "prefill_chunked":
            forward_prefill_chunked.lower(
                params, cache, tokens2d, vec, config=config,
                precision=args.precision, chunk=args.chunk).compile()
        elif args.program == "prefill_chunked_unrolled":
            from tpu_llama.models.llama import \
                forward_prefill_chunked_unrolled
            forward_prefill_chunked_unrolled.lower(
                params, cache, tokens2d, vec, config=config,
                precision=args.precision, chunk=args.chunk).compile()
        elif args.program == "prefill_chunked_carry":
            from tpu_llama.models.llama import forward_prefill_chunked_carry
            forward_prefill_chunked_carry.lower(
                params, cache, tokens2d, vec, config=config,
                precision=args.precision, chunk=args.chunk).compile()
        elif args.program == "prefill":
            forward_prefill.lower(
                params, cache, tokens2d, vec, vec, config=config,
                precision=args.precision, logits_mode="last",
                assume_fresh=True).compile()
        elif args.program == "prefill_cont":
            # one CHUNK of a host-dispatched chunk loop: start_pos > 0
            # continuation body, [B, chunk] tokens, static max_keys = the
            # full prompt bound (one program serves every chunk index)
            tok_c = jax.ShapeDtypeStruct((B, args.chunk), jnp.int32)
            forward_prefill.lower(
                params, cache, tok_c, vec, vec, config=config,
                precision=args.precision, logits_mode="last",
                max_keys=T).compile()
        elif args.program == "prefill_paged_chunked":
            # the serving admission program: engine-jitted pool-direct
            # chunked prefill (chunk loop unrolled since r5 — the scan
            # form is compile-broken at fresh geometries)
            from tpu_llama.runtime.engine import _prefill_into_slots
            ps = 512  # engine default page size
            mp = -(-S // ps)
            pcache = jax.eval_shape(
                lambda: make_kv_cache(config, batch=B, kv_dtype="int8",
                                      paged=True, num_pages=B * mp + 1,
                                      page_size=ps, seq_len=S))
            _prefill_into_slots.lower(
                params, pcache, tokens2d, vec, vec, config=config,
                precision=args.precision, logits_mode="last",
                pool_direct=True).compile()
        elif args.program == "prefill_paged_long":
            # long-prompt single/low-batch pool-direct prefill at a caller
            # chosen --chunk (the longctx TTFT program: B=1 T=7680 c512
            # = 15 unrolled fused chunks); donation matters — a dropped
            # donate double-counts the pool in the AOT memory assignment
            from functools import partial as _partial

            from tpu_llama.models.llama import forward_prefill_paged_chunked
            ps = 512
            mp = -(-S // ps)
            pcache = jax.eval_shape(
                lambda: make_kv_cache(config, batch=B, kv_dtype="int8",
                                      paged=True, num_pages=B * mp + 1,
                                      page_size=ps, seq_len=S))
            fn = jax.jit(_partial(forward_prefill_paged_chunked,
                                  config=config, precision=args.precision,
                                  chunk=args.chunk),
                         donate_argnums=(1,))
            fn.lower(params, pcache, tokens2d, vec, vec).compile()
        else:  # decode
            forward_decode.lower(
                params, cache, vec, vec, config=config,
                precision=args.precision).compile()
    except Exception as e:  # noqa: BLE001 — the probe's whole point
        full = str(e)
        # surface the compile helper's real diagnostic: the HTTP 500 wraps
        # a scoped-vmem (or other) AOT error naming the kernel call site
        keys = []
        for marker in ("Scoped allocation", "source_file=", "Ran out of"):
            i = full.find(marker)
            if i >= 0:
                keys.append(full[i:i + 200].replace("\n", " "))
        msg = f"{type(e).__name__}: {full}".replace("\n", " ")[:160]
        detail = (" || ".join(keys))[:500]
        print(f"PROBE_FAIL {tag} {time.time() - t0:.1f}s {msg} "
              f"DETAIL: {detail}", flush=True)
        sys.exit(1)
    print(f"PROBE_OK {tag} {time.time() - t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
