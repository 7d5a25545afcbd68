"""Property-style parity: random configs x random prompts, engine == oracle.

Sweeps structurally diverse tiny configs (MHA/GQA, odd dims, unshared
classifier) and asserts the jitted engine's greedy stream matches the
float64 oracle token-for-token — the cross-implementation contract on shapes
beyond the fixtures.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from tpu_llama.compat.generate import generate_compat
from tpu_llama.compat.oracle import OracleState, oracle_forward
from tpu_llama.config import ModelConfig
from tpu_llama.io.checkpoint import make_random_weights
from tpu_llama.models import KVCache, forward_decode, params_from_raw

CONFIGS = [
    # dim, hidden, L, H, KVH, vocab, seq, shared
    (32, 96, 2, 2, 2, 96, 32, True),     # minimal MHA
    (64, 160, 3, 4, 2, 128, 40, False),  # GQA, unshared classifier
    (80, 112, 1, 5, 1, 300, 24, True),   # MQA (1 kv head), odd dims
    (96, 256, 4, 8, 4, 64, 48, False),   # deeper GQA
]


@pytest.mark.parametrize("spec", CONFIGS)
def test_engine_matches_oracle_any_shape(spec):
    dim, hidden, L, H, KVH, vocab, seq, shared = spec
    c = ModelConfig(dim=dim, hidden_dim=hidden, n_layers=L, n_heads=H,
                    n_kv_heads=KVH, vocab_size=vocab, seq_len=seq,
                    shared_weights=shared)
    w = make_random_weights(c, seed=hash(spec) % 2**31)
    params = params_from_raw(w)

    rng = np.random.default_rng(abs(hash(spec)) % 2**31)
    tokens = [1] + rng.integers(3, vocab, size=6).tolist()

    st = OracleState.create(c)
    cache = KVCache.create(c, 1)
    tok = tokens[0]
    for p in range(min(seq - 1, 14)):
        want = oracle_forward(tok, p, c, st, w)
        got, cache = forward_decode(
            params, cache, jnp.array([tok], jnp.int32),
            jnp.array([p], jnp.int32), c, precision="highest")
        got = np.asarray(got[0])
        np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-5,
                                   err_msg=f"{spec} pos={p}")
        assert int(np.argmax(got)) == int(np.argmax(want)), (spec, p)
        # teacher-force prompt then follow greedy
        tok = tokens[p + 1] if p + 1 < len(tokens) else int(np.argmax(want))
