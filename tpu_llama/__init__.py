"""tpu_llama — a TPU-native (JAX/XLA/Pallas) Llama-2 inference framework.

A brand-new framework with the capabilities of the reference engine
(wizzard0/llama2.ts — a single-file CPU fp32 batch-1 TypeScript port of
llama2.c), re-designed TPU-first:

* ``tpu_llama.config``   — model configuration (llama2.c v0 header compatible).
* ``tpu_llama.io``       — checkpoint (`model.bin`) + `tokenizer.bin` loaders.
* ``tpu_llama.compat``   — bit-exact host-side compatibility engine: the
  xorshift64* RNG, reference sampling semantics, and a float64-accumulating
  oracle forward pass that reproduces the reference token-for-token.
* ``tpu_llama.models``   — the batched, jitted, shardable JAX model.
* ``tpu_llama.ops``      — Pallas TPU kernels (fused INT8 dequant+matmul,
  flash attention) and XLA reference ops.
* ``tpu_llama.parallel`` — device mesh, shardings, collectives.
* ``tpu_llama.runtime``  — engine, continuous-batching scheduler, metrics.
"""

__version__ = "0.1.0"

from tpu_llama.config import ModelConfig  # noqa: F401
