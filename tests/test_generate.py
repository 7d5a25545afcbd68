"""Generation-loop semantics tests (llama2.ts:460-511)."""

import numpy as np

from tpu_llama.compat.generate import generate_compat
from tpu_llama.compat.oracle import OracleState, oracle_forward
from tpu_llama.io.tokenizer import BOS


def oracle_forward_fn(weights):
    c = weights.config
    state = OracleState.create(c)
    return lambda tok, pos: oracle_forward(tok, pos, c, state, weights)


def test_greedy_deterministic(tiny_weights, tiny_tokenizer):
    c = tiny_weights.config
    runs = [
        generate_compat(
            oracle_forward_fn(tiny_weights), tiny_tokenizer,
            prompt="Once upon a time", steps=24, temperature=0.0, seed=1,
            seq_len=c.seq_len,
        )
        for _ in range(2)
    ]
    assert runs[0].tokens == runs[1].tokens
    assert runs[0].text == runs[1].text
    assert len(runs[0].tokens) > 0


def test_prompt_tokens_are_forced(tiny_weights, tiny_tokenizer):
    prompt = "Once upon a time"
    expected_prompt = tiny_tokenizer.encode(prompt)
    res = generate_compat(
        oracle_forward_fn(tiny_weights), tiny_tokenizer,
        prompt=prompt, steps=len(expected_prompt) + 4, temperature=0.0, seed=1,
    )
    # llama2.ts:471-474 — while in prompt, next is the forced prompt token
    assert res.tokens[: len(expected_prompt)] == expected_prompt


def test_sampled_deterministic_per_seed(tiny_weights, tiny_tokenizer):
    kw = dict(prompt="Once", steps=20, temperature=0.8, topp=0.9)
    a = generate_compat(oracle_forward_fn(tiny_weights), tiny_tokenizer, seed=7, **kw)
    b = generate_compat(oracle_forward_fn(tiny_weights), tiny_tokenizer, seed=7, **kw)
    d = generate_compat(oracle_forward_fn(tiny_weights), tiny_tokenizer, seed=8, **kw)
    assert a.tokens == b.tokens
    # different seed should (overwhelmingly likely) diverge somewhere
    assert a.tokens != d.tokens or a.text == d.text


def test_steps_clamped_to_seq_len(tiny_weights, tiny_tokenizer):
    c = tiny_weights.config
    res = generate_compat(
        oracle_forward_fn(tiny_weights), tiny_tokenizer,
        prompt=None, steps=10_000, temperature=0.0, seed=1, seq_len=c.seq_len,
    )
    assert len(res.tokens) <= c.seq_len  # llama2.ts:439


def test_stop_on_bos():
    """A forward fn that immediately produces BOS as argmax stops generation
    with no tokens emitted (llama2.ts:499)."""
    def fwd(tok, pos):
        logits = np.zeros(320, np.float32)
        logits[BOS] = 10.0
        return logits

    from tests.conftest import TINY
    from tpu_llama.io.tokenizer import make_byte_tokenizer
    tok = make_byte_tokenizer([])
    res = generate_compat(fwd, tok, prompt=None, steps=50, temperature=0.0, seed=1)
    assert res.tokens == []
    assert res.text == ""


def test_temp0_ignores_rng(tiny_weights, tiny_tokenizer):
    """RNG must not advance on argmax steps — stream placement contract."""
    a = generate_compat(oracle_forward_fn(tiny_weights), tiny_tokenizer,
                        prompt="On", steps=12, temperature=0.0, seed=1)
    b = generate_compat(oracle_forward_fn(tiny_weights), tiny_tokenizer,
                        prompt="On", steps=12, temperature=0.0, seed=999999)
    assert a.tokens == b.tokens
