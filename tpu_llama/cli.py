"""Flag-compatible CLI (llama2.ts:399-524 surface).

    tpu-llama <checkpoint> [-t temp] [-p topp] [-s seed] [-n steps] [-i prompt]

Same five flags, same defaults-as-code (temp 1.0, topp 1.0, seed=time, steps
256 clamped to seq_len), same strict ``-x value`` pair parsing and usage text
shape (llama2.ts:409-423, 514-524).  Extensions use long flags: --tokenizer,
--quant, --precision, --kv-dtype, --sample-device, --kv-layout.
"""

from __future__ import annotations

import sys
import time


def error_usage() -> "None":
    sys.stderr.write("Usage: tpu-llama <checkpoint> [options]\n")
    sys.stderr.write('Example: tpu-llama model.bin -n 256 -i "Once upon a time"\n')
    sys.stderr.write("Options:\n")
    sys.stderr.write("  -t <float>  temperature, default 1.0\n")
    sys.stderr.write("  -p <float>  p value in top-p (nucleus) sampling. default 1.0 (off)\n")
    sys.stderr.write("  -s <int>    random seed, default time(NULL)\n")
    sys.stderr.write("  -n <int>    number of steps to run for, default 256. 0 = max_seq_len\n")
    sys.stderr.write("  -i <string> input prompt\n")
    sys.stderr.write("  --tokenizer <path>  tokenizer.bin path (default ./tokenizer.bin)\n")
    sys.stderr.write("  --quant int8|w8a8   INT8: groupwise weight-only / int8-MXU W8A8\n")
    sys.stderr.write("  --precision <p>     matmul precision: highest|default (default: highest)\n")
    sys.stderr.write("  --kv-dtype <d>      KV cache dtype: float32|bfloat16|int8\n")
    sys.stderr.write("  --kv-layout <l>     KV layout: dense|paged (paged implies int8)\n")
    sys.stderr.write("  --sample-device on  sample on device (jax.random; fast, NOT\n")
    sys.stderr.write("                      xorshift-compatible — default samples on host)\n")
    sys.exit(1)


def main(argv: list[str] | None = None) -> None:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv:
        error_usage()
    checkpoint = argv[0]
    args = argv[1:]

    temperature = 1.0
    topp = 1.0
    seed = 0
    steps = 256
    prompt: str | None = None
    tokenizer_path = "tokenizer.bin"
    quant: str | None = None
    precision = "highest"
    kv_dtype = "float32"
    kv_layout = "dense"
    sample_device = False

    i = 0
    while i < len(args):
        arg = args[i]
        if arg.startswith("--"):
            if i + 1 >= len(args):
                error_usage()
            val = args[i + 1]
            if arg == "--tokenizer":
                tokenizer_path = val
            elif arg == "--quant":
                quant = val
            elif arg == "--precision":
                precision = val
            elif arg == "--kv-dtype":
                if val not in ("float32", "bfloat16", "int8"):
                    error_usage()
                kv_dtype = val
            elif arg == "--kv-layout":
                if val not in ("dense", "paged"):
                    error_usage()
                kv_layout = val
            elif arg == "--sample-device":
                sample_device = val in ("on", "1", "true")
            else:
                error_usage()
            i += 2
            continue
        # reference-strict short flags: '-x value' pairs (llama2.ts:409-423)
        if i + 1 >= len(args):
            error_usage()
        val = args[i + 1]
        if not arg.startswith("-") or len(arg) != 2:
            error_usage()
        flag = arg[1]
        if flag == "t":
            temperature = float(val)
        elif flag == "p":
            topp = float(val)
        elif flag == "s":
            seed = int(val)
        elif flag == "n":
            steps = int(val)
        elif flag == "i":
            prompt = val
        else:
            error_usage()
        i += 2

    if seed == 0:
        seed = int(time.time() * 1000)  # llama2.ts:424

    # Heavy imports after arg validation so `--help`-style failures are fast.
    from tpu_llama.io import Tokenizer, load_checkpoint
    from tpu_llama.io.tokenizer import BOS
    from tpu_llama.models import params_from_raw
    from tpu_llama.models.llama import quantize_params
    from tpu_llama.runtime import ContinuousBatcher, Engine, Request

    raw = load_checkpoint(checkpoint)
    config = raw.config
    tokenizer = Tokenizer.load(tokenizer_path, vocab_size=config.vocab_size)

    params = params_from_raw(raw)
    if quant == "int8":
        params = quantize_params(params)
    elif quant == "w8a8":
        params = quantize_params(params, mode="w8a8")
    elif quant is not None:
        error_usage()

    engine = Engine(params, config, max_batch=1, precision=precision,
                    kv_dtype=kv_dtype, kv_layout=kv_layout)
    batcher = ContinuousBatcher(engine)

    prompt_tokens = tokenizer.encode(prompt) if prompt else []

    timing = {"start": 0.0, "count": 0}


    req = Request(
        prompt_tokens=prompt_tokens,
        steps=steps,
        temperature=temperature,
        topp=topp,
        seed=seed,
        device_sampling=sample_device,
    )

    # The reference prints prompt tokens as it forces them (llama2.ts:502-503)
    prev = BOS
    emitted = 0
    for t in prompt_tokens:
        sys.stdout.write(tokenizer.decode_token(t, prev_token=prev))
        prev = t
        emitted += 1
    sys.stdout.flush()

    def stream(tok: int) -> None:
        nonlocal prev, emitted
        sys.stdout.write(tokenizer.decode_token(tok, prev_token=prev))
        sys.stdout.flush()
        prev = tok
        emitted += 1
        if timing["start"] == 0.0:
            timing["start"] = time.time()  # after first token (llama2.ts:507)
        timing["count"] += 1

    req.on_token = stream
    batcher.submit(req)
    batcher.run()

    elapsed = max(time.time() - timing["start"], 1e-9) if timing["start"] else 1e-9
    # llama2.ts:511 format (pos-1 semantics: exclude the untimed first token)
    print(f"\n\nachieved tok/s: {max(timing['count'] - 1, 0) / elapsed}\n")


if __name__ == "__main__":
    main()
