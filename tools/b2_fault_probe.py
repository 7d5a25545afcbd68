"""Bisect the B=2 mega/mega2 TPU fault (r4).

Observed: bench.py --ab at 7B b2 dense-int8 crashes the TPU worker on the
mega2 warmup run; a follow-up bisect showed two-launch OK at b2 and mega
faulting too.  B=1 (mega) and B=8/16 (mega2) run fine — only B=2..7 is
unmeasured and apparently faulting.  This probe runs ONE forward_decode step
for a requested variant/batch on an L=2 model at exactly the 7B layer shape
(D=4096 H=11008 NH=KVH=32 hd=128 S=2048) so compiles are fast and a worker
crash poisons little memory.

Usage: python tools/b2_fault_probe.py <variant> <batch> [pos] [layers]
  variant in {mega, mega2, true, attn_only}
Prints "PROBE_OK <variant> b<B> tokens=..." on success; a kernel fault
crashes the process (driver script records the exit code).

[layers] (default 2) grows the probe by DEPTH: the r5 finding is that
mega's L=2 probe passes while the FULL 32-layer 7B b1 decode crashes the
worker (ab_r5_b1.log) — the trigger is depth/program-size dependent, so
bisect L in {2,4,8,16,32} to find where it starts (NEXT r5 #2)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/tpu_llama_jax_cache")

from tpu_llama.config import ModelConfig  # noqa: E402


def main():
    variant, B = sys.argv[1], int(sys.argv[2])
    pos0 = int(sys.argv[3]) if len(sys.argv) > 3 else 512
    L = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    config = ModelConfig(dim=4096, hidden_dim=11008, n_layers=L, n_heads=32,
                         n_kv_heads=32, vocab_size=32000, seq_len=2048,
                         shared_weights=False)
    import bench
    t0 = time.time()
    params = bench._build(config, jnp.dtype("bfloat16"), "w8a8", fuse=True)
    cache = bench._make_cache(config, B, "int8", None, "dense", 512)
    print(f"built L{L} model in {time.time()-t0:.1f}s", flush=True)
    tokens = jnp.zeros((B,), jnp.int32)
    pos = jnp.full((B,), pos0, jnp.int32)

    if variant == "attn_only":
        # standalone manual-DMA decode attention at this batch (the kernel
        # two-launch uses; known good at b2 via the two-launch pass, this
        # is the control for the in-kernel cell logic)
        from tpu_llama.ops.attention import flash_decode_attention_dma
        q = jnp.ones((B, 32, 1, 128), jnp.bfloat16) * 0.01
        nk = jnp.ones((B, 32, 128), jnp.int8)
        ns = jnp.full((B, 32), 0.01, jnp.float32)
        out = flash_decode_attention_dma(
            q, cache.k, cache.v, pos, nk, nk, k_scale=cache.ks,
            v_scale=cache.vs, new_ks=ns, new_vs=ns, layer=0)
        np.asarray(out)
        print(f"PROBE_OK attn_only b{B}", flush=True)
        return

    t0 = time.time()
    if variant in ("mega", "mega2"):
        # call the internals directly: the _mega*_path_ok gates now block
        # these kernels on the TPU backend (r4 faults) and this probe
        # exists precisely to re-test them on a new toolchain
        import functools

        from tpu_llama.models.llama import (
            _forward_decode_fused,
            _forward_decode_mega2,
        )
        fn = jax.jit(
            (functools.partial(_forward_decode_fused, mega=True, attn="flash",
                               unroll=1)
             if variant == "mega" else
             functools.partial(_forward_decode_mega2, unroll=1)),
            static_argnames=("config",), donate_argnums=(1,))
        logits, cache = fn(params, cache, tokens, pos, config=config)
    else:
        from tpu_llama.models.llama import forward_decode

        logits, cache = forward_decode(params, cache, tokens, pos, config,
                                       fused=True)
    tok = np.asarray(jnp.argmax(logits, -1))
    print(f"PROBE_OK {variant} b{B} {time.time()-t0:.1f}s tokens={tok[:4]}",
          flush=True)


if __name__ == "__main__":
    main()
