#!/usr/bin/env python
"""Minimal end-to-end generation example.

    # with a real llama2.c checkpoint:
    python examples/generate.py stories15M.bin tokenizer.bin

    # or fabricate a synthetic one first:
    python tools/make_checkpoint.py /tmp/m.bin --preset 15m --tokenizer /tmp/t.bin
    python examples/generate.py /tmp/m.bin /tmp/t.bin
"""

import sys

from tpu_llama.io import Tokenizer, load_checkpoint
from tpu_llama.models import params_from_raw, quantize_params
from tpu_llama.runtime import ContinuousBatcher, Engine, Request

ckpt, tok_path = sys.argv[1], sys.argv[2]

raw = load_checkpoint(ckpt)
tokenizer = Tokenizer.load(tok_path, vocab_size=raw.config.vocab_size)
params = quantize_params(params_from_raw(raw))  # weight-only INT8

engine = Engine(params, raw.config, max_batch=4, kv_dtype="int8")
batcher = ContinuousBatcher(engine, max_chunk=8)

req = Request(
    prompt_tokens=tokenizer.encode("Once upon a time"),
    steps=128, temperature=0.8, topp=0.9, seed=42,
    device_sampling=True,  # fast path; set False for xorshift64* compat
)
batcher.submit(req)
batcher.run()
print(tokenizer.decode(req.out_tokens))
print(f"[{len(req.out_tokens)} tokens, ttft {req.ttft * 1e3:.0f} ms]")
