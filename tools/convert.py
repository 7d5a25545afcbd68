#!/usr/bin/env python
"""Offline checkpoint converter: llama2.c model.bin -> internal engine format.

    python tools/convert.py model.bin out_dir [--int8] [--group 64] \
        [--dtype float32|bfloat16]

The INT8 path performs Q8_0-style groupwise weight-only quantization of the
seven matmul families + classifier (SURVEY §7 step 3); embeddings, norms,
and RoPE tables stay floating point.
"""

from __future__ import annotations

import argparse
import os
import sys

# Allow running from a checkout without `pip install -e .`.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("checkpoint")
    ap.add_argument("out_dir")
    ap.add_argument("--int8", action="store_true",
                    help="groupwise Q8_0-style weight-only INT8")
    ap.add_argument("--w8a8", action="store_true",
                    help="per-channel INT8 weights for the int8-MXU W8A8 path")
    ap.add_argument("--group", type=int, default=None,
                    help="quant group size (default: auto per tensor)")
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"],
                    help="dtype for non-quantized tensors")
    args = ap.parse_args()

    import jax.numpy as jnp

    from tpu_llama.io.checkpoint import load_checkpoint
    from tpu_llama.io.internal import save_params
    from tpu_llama.models import params_from_raw, quantize_params

    raw = load_checkpoint(args.checkpoint)
    params = params_from_raw(raw, dtype=jnp.dtype(args.dtype))
    if args.int8:
        params = quantize_params(params, group_size=args.group)
    elif args.w8a8:
        params = quantize_params(params, mode="w8a8")
    save_params(args.out_dir, params, raw.config)
    print(f"wrote {args.out_dir} (config={raw.config}, "
          f"int8={args.int8}, w8a8={args.w8a8})")


if __name__ == "__main__":
    main()
