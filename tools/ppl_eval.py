#!/usr/bin/env python
"""Perplexity / INT8-regression gate runner (BASELINE: dppl <= 0.1).

    python tools/ppl_eval.py model.bin --tokenizer tokenizer.bin \
        --text corpus.txt [--quant int8|w8a8] [--chunk 256] [--limit 8192]

Prints one JSON line: fp32 ppl, quantized ppl (if --quant), and the delta.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("checkpoint")
    ap.add_argument("--tokenizer", default="tokenizer.bin")
    ap.add_argument("--text", required=True, help="UTF-8 text file to score")
    ap.add_argument("--quant", choices=["int8", "w8a8"])
    ap.add_argument("--chunk", type=int, default=None)
    ap.add_argument("--limit", type=int, default=8192,
                    help="max tokens scored")
    ap.add_argument("--precision", default="default")
    args = ap.parse_args()

    from tpu_llama.eval import perplexity
    from tpu_llama.io import Tokenizer, load_checkpoint
    from tpu_llama.io.tokenizer import BOS
    from tpu_llama.models import params_from_raw, quantize_params

    raw = load_checkpoint(args.checkpoint)
    tok = Tokenizer.load(args.tokenizer, vocab_size=raw.config.vocab_size)
    text = open(args.text, encoding="utf-8").read()
    tokens = [BOS] + tok.encode(text)[: args.limit]

    params = params_from_raw(raw)
    out = {"n_tokens": len(tokens) - 1}
    out["ppl_fp32"] = perplexity(params, raw.config, tokens,
                                 chunk=args.chunk, precision=args.precision)
    if args.quant:
        qparams = quantize_params(
            params, mode="q8_0" if args.quant == "int8" else "w8a8")
        out[f"ppl_{args.quant}"] = perplexity(
            qparams, raw.config, tokens, chunk=args.chunk,
            precision=args.precision)
        out["delta"] = out[f"ppl_{args.quant}"] - out["ppl_fp32"]
        out["gate_delta_le_0.1"] = bool(out["delta"] <= 0.1)
    print(json.dumps({k: (round(v, 4) if isinstance(v, float) else v)
                      for k, v in out.items()}))


if __name__ == "__main__":
    main()
