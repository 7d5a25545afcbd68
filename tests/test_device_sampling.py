"""Device sampler unit tests (greedy/top-p/top-k semantics)."""

import jax
import jax.numpy as jnp
import numpy as np

from tpu_llama.ops.sampling import greedy, sample


def test_greedy_ties_lowest():
    logits = jnp.asarray([[1.0, 3.0, 3.0], [0.0, -1.0, 5.0]])
    np.testing.assert_array_equal(np.asarray(greedy(logits)), [1, 2])


def test_temperature_zero_rows_are_greedy():
    logits = jnp.asarray([[0.0, 10.0, 0.0], [10.0, 0.0, 0.0]])
    out = sample(logits, jax.random.key(0),
                 temperature=jnp.asarray([0.0, 0.8]), topp=1.0)
    assert int(out[0]) == 1  # greedy row


def test_topk_restricts_support():
    logits = jnp.asarray([[5.0, 4.0, 3.0, -10.0, -10.0]] * 4)
    keys = jax.random.split(jax.random.key(1), 4)
    for i in range(4):
        out = sample(logits[i:i+1], keys[i], temperature=1.0, topk=2)
        assert int(out[0]) in (0, 1)


def test_topp_restricts_support():
    probs_logits = jnp.log(jnp.asarray([[0.6, 0.3, 0.05, 0.05]]))
    for i in range(8):
        out = sample(probs_logits, jax.random.fold_in(jax.random.key(2), i),
                     temperature=1.0, topp=0.85)
        assert int(out[0]) in (0, 1)  # 0.6+0.3 crosses 0.85


def test_deterministic_per_key():
    logits = jnp.asarray([[1.0, 1.1, 0.9, 1.05]])
    a = sample(logits, jax.random.key(7), temperature=0.9, topp=0.9)
    b = sample(logits, jax.random.key(7), temperature=0.9, topp=0.9)
    assert int(a[0]) == int(b[0])
