#!/usr/bin/env python
"""Fabricate a synthetic llama2.c v0 checkpoint (+ optional tokenizer).

Useful for testing/benchmarking when no real checkpoint is available:

    python tools/make_checkpoint.py out/model.bin --preset 15m --seed 1
    python tools/make_checkpoint.py out/model.bin --dim 288 --layers 6 \
        --heads 6 --hidden 768 --vocab 32000 --seq 256 --tokenizer out/tok.bin
"""

from __future__ import annotations

import argparse
from pathlib import Path


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("out")
    ap.add_argument("--preset", choices=["15m", "110m", "7b", "13b", "70b"])
    ap.add_argument("--dim", type=int)
    ap.add_argument("--hidden", type=int)
    ap.add_argument("--layers", type=int)
    ap.add_argument("--heads", type=int)
    ap.add_argument("--kv-heads", type=int)
    ap.add_argument("--vocab", type=int, default=32000)
    ap.add_argument("--seq", type=int, default=256)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--tokenizer", help="also write a byte-level tokenizer.bin")
    args = ap.parse_args()

    from tpu_llama.config import (
        LLAMA2_7B, LLAMA2_13B, LLAMA2_70B, STORIES15M, STORIES110M, ModelConfig,
    )
    from tpu_llama.io.checkpoint import make_random_weights, write_checkpoint

    presets = {"15m": STORIES15M, "110m": STORIES110M, "7b": LLAMA2_7B,
               "13b": LLAMA2_13B, "70b": LLAMA2_70B}
    if args.preset:
        config = presets[args.preset]
    else:
        config = ModelConfig(
            dim=args.dim, hidden_dim=args.hidden, n_layers=args.layers,
            n_heads=args.heads, n_kv_heads=args.kv_heads or args.heads,
            vocab_size=args.vocab, seq_len=args.seq,
        )

    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    write_checkpoint(args.out, make_random_weights(config, seed=args.seed))
    print(f"wrote {args.out} ({config})")

    if args.tokenizer:
        from tpu_llama.io.tokenizer import make_byte_tokenizer

        pad = config.vocab_size - (3 + 256)
        tok = make_byte_tokenizer([(f"<pad{i}>", -1e5) for i in range(pad)])
        tok.save(args.tokenizer)
        print(f"wrote {args.tokenizer} ({tok.vocab_size} tokens)")


if __name__ == "__main__":
    main()
