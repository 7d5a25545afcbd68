"""Host-side samplers replicating the reference's exact edge semantics.

These run on fp32 probability arrays with float64 arithmetic — JS numbers are
IEEE float64, so every comparison/accumulation in llama2.ts is f64 over f32
array values.  The quirks below are deliberately preserved (compat first;
see `tpu_llama.ops.sampling` for the "fixed", on-device fast path):

* ``argmax`` — strict ``>`` comparison, ties resolve to the LOWEST index
  (llama2.ts:364-366).
* ``sample`` — multinomial over already-softmaxed probs, re-normalized by
  their f64 sum; CDF walk with ``randValue < cumProb``; falls through to
  token 0 (llama2.ts:368-376).
* ``sample_topp`` — nucleus sampling with the reference's two quirks
  (llama2.ts:378-394, SURVEY §2.1):
    - the final CDF walk is EXCLUSIVE of ``lastIdx`` (``i < lastIdx``), and
    - the fallthrough returns raw token id 0 (NOT ``probindex[lastIdx].index``
      as llama2.c does).  In particular if the top probability alone exceeds
      ``topp``, the walk is empty and token 0 (<unk>) is returned.
  The descending sort is stable (Array.prototype.sort is stable per ES2019;
  Python's sorted is stable too), so equal probabilities keep index order.
"""

from __future__ import annotations

import numpy as np

from tpu_llama.compat.rng import Xorshift64Star


def argmax(arr: np.ndarray) -> int:
    # np.argmax returns the first occurrence of the maximum — same tie rule
    # as the reference's reduce with strict `>` (llama2.ts:365).
    return int(np.argmax(arr))


def sample(probs: np.ndarray, rng: Xorshift64Star) -> int:
    # llama2.ts:369: reduce-sum in f64 over f32 values.
    total = float(np.sum(probs.astype(np.float64)))
    rand_value = rng.random_f32() * total
    cum = 0.0
    for i, p in enumerate(probs.astype(np.float64)):
        cum += p
        if rand_value < cum:
            return i
    return 0


def sample_topp(probs: np.ndarray, topp: float, rng: Xorshift64Star) -> int:
    p64 = probs.astype(np.float64)
    # Stable descending sort == JS sort((a,b) => b.prob - a.prob).
    order = np.argsort(-p64, kind="stable")
    sorted_probs = p64[order]

    # Find cutoff: first index where the running f64 sum exceeds topp.
    cum = 0.0
    last_idx = 0
    for i in range(sorted_probs.shape[0]):
        cum += sorted_probs[i]
        if cum > topp:
            last_idx = i
            break

    rand_value = rng.random_f32() * cum
    cum = 0.0
    for i in range(last_idx):  # EXCLUSIVE bound — llama2.ts:390
        cum += sorted_probs[i]
        if rand_value < cum:
            return int(order[i])
    return 0  # llama2.ts:393 — raw token id 0 fallthrough
