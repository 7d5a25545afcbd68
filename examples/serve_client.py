#!/usr/bin/env python
"""Client for the HTTP serving front end.

Server:  tpu-llama-serve --checkpoint stories15M.bin --tokenizer tokenizer.bin
Client:  python examples/serve_client.py "Once upon a time" --port 8000
"""

import argparse
import json
import urllib.request

ap = argparse.ArgumentParser()
ap.add_argument("prompt")
ap.add_argument("--port", type=int, default=8000)
ap.add_argument("--steps", type=int, default=128)
ap.add_argument("--temperature", type=float, default=0.8)
ap.add_argument("--topp", type=float, default=0.9)
ap.add_argument("--seed", type=int, default=1)
args = ap.parse_args()

req = urllib.request.Request(
    f"http://127.0.0.1:{args.port}/generate",
    data=json.dumps({
        "prompt": args.prompt, "steps": args.steps,
        "temperature": args.temperature, "topp": args.topp,
        "seed": args.seed, "stop_on_eos": True,
    }).encode(),
    headers={"Content-Type": "application/json"},
)
with urllib.request.urlopen(req) as r:
    out = json.loads(r.read())
print(out["text"])
print(f"[{out['n_tokens']} tokens, ttft {out['ttft_s'] * 1e3:.0f} ms]")
