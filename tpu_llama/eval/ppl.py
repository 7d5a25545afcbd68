"""Perplexity harness — the INT8 regression gate (Δppl <= 0.1, BASELINE.json).

The reference has no evaluation tooling; its correctness story is golden
tokens (SURVEY §4).  Quantization needs a graded metric: teacher-forced
negative log-likelihood over a token stream, computed with the batched
prefill in chunks, fp32 log-softmax regardless of weight dtype.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from tpu_llama.config import ModelConfig
from tpu_llama.models import forward_prefill, make_kv_cache
from tpu_llama.models.llama import LlamaParams


def _chunk_nll(params, config, tokens: np.ndarray, precision: str) -> tuple[float, int]:
    """Sum NLL of tokens[1:] given tokens[:-1] for one chunk (<= seq_len)."""
    T = len(tokens)
    cache = make_kv_cache(config, 1, seq_len=T)
    logits, _ = forward_prefill(
        params, cache,
        jnp.asarray(tokens, jnp.int32)[None, :],
        jnp.zeros((1,), jnp.int32), jnp.asarray([T], jnp.int32),
        config, precision=precision,
    )
    logp = jax.nn.log_softmax(logits[0].astype(jnp.float32), axis=-1)
    targets = jnp.asarray(tokens[1:], jnp.int32)
    tok_logp = jnp.take_along_axis(logp[:-1], targets[:, None], axis=-1)[:, 0]
    return float(-jnp.sum(tok_logp)), T - 1


def perplexity(
    params: LlamaParams,
    config: ModelConfig,
    tokens: Sequence[int],
    chunk: int | None = None,
    precision: str = "default",
) -> float:
    """Teacher-forced perplexity over a token stream, chunked to seq_len."""
    tokens = np.asarray(list(tokens), np.int32)
    chunk = min(chunk or config.seq_len, config.seq_len)
    total_nll = 0.0
    total_count = 0
    for start in range(0, len(tokens) - 1, chunk - 1):
        piece = tokens[start : start + chunk]
        if len(piece) < 2:
            break
        nll, n = _chunk_nll(params, config, piece, precision)
        total_nll += nll
        total_count += n
    return math.exp(total_nll / max(total_count, 1))


def ppl_delta(
    params_a: LlamaParams,
    params_b: LlamaParams,
    config: ModelConfig,
    tokens: Sequence[int],
    **kw,
) -> tuple[float, float, float]:
    """Returns (ppl_a, ppl_b, ppl_b - ppl_a)."""
    pa = perplexity(params_a, config, tokens, **kw)
    pb = perplexity(params_b, config, tokens, **kw)
    return pa, pb, pb - pa
