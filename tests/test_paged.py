"""Paged KV cache: pool allocator, paged attention parity, engine/scheduler
integration (VERDICT r1 missing #1; generalizes llama2.ts:160-161)."""

import numpy as np
import pytest

from tpu_llama.compat.generate import generate_compat
from tpu_llama.compat.oracle import OracleState, oracle_forward
from tpu_llama.models import params_from_raw
from tpu_llama.runtime import ContinuousBatcher, Engine, PagePool, Request


# ---------------------------------------------------------------------------
# allocator
# ---------------------------------------------------------------------------


def test_pool_reserve_release():
    pool = PagePool(num_pages=9, page_size=4, slots=4, max_pages_per_slot=4)
    assert pool.free_pages == 8  # page 0 reserved as trash
    row = pool.reserve(0, 10)  # 3 pages of 4
    assert row is not None and (row[:3] > 0).all() and row[3] == 0
    assert pool.held(0) == 3 and pool.free_pages == 5
    assert pool.reserve(1, 16) is not None  # 4 pages
    assert pool.free_pages == 1
    assert pool.reserve(2, 8) is None  # needs 2, only 1 free
    assert pool.release(1)
    assert pool.free_pages == 5
    assert not pool.release(1)  # double release is a no-op
    assert pool.reserve(2, 8) is not None


def test_pool_respects_max_pages_per_slot():
    pool = PagePool(num_pages=17, page_size=4, slots=2, max_pages_per_slot=2)
    assert not pool.can_reserve(12)  # 3 pages > max 2
    assert pool.reserve(0, 12) is None
    assert pool.reserve(0, 8) is not None


def test_pool_distinct_pages():
    pool = PagePool(num_pages=9, page_size=4, slots=4, max_pages_per_slot=4)
    rows = [pool.reserve(s, 8) for s in range(4)]
    used = [p for r in rows for p in r[:2]]
    assert len(set(used)) == 8 and 0 not in used


# ---------------------------------------------------------------------------
# paged forward parity vs dense int8
# ---------------------------------------------------------------------------


def test_paged_decode_matches_dense_int8(tiny_weights):
    import jax.numpy as jnp

    from tpu_llama.models.llama import greedy_decode_loop, make_kv_cache

    c = tiny_weights.config
    params = params_from_raw(tiny_weights)
    B, steps = 2, 6
    tokens = jnp.array([3, 5], jnp.int32)
    pos = jnp.zeros((B,), jnp.int32)

    dense = make_kv_cache(c, B, kv_dtype="int8")
    out_dense, _ = greedy_decode_loop(params, dense, tokens, pos, steps, c,
                                      precision="highest")

    ps = 8
    mp = -(-c.seq_len // ps)
    pool = PagePool(num_pages=B * mp + 1, page_size=ps, slots=B,
                    max_pages_per_slot=mp)
    for s in range(B):
        assert pool.reserve(s, c.seq_len) is not None
    paged = make_kv_cache(c, B, kv_dtype="int8", paged=True,
                          num_pages=B * mp + 1, page_size=ps)
    import dataclasses

    paged = dataclasses.replace(paged, page_table=jnp.asarray(pool.table))
    out_paged, _ = greedy_decode_loop(params, paged, tokens, pos, steps, c,
                                      precision="highest")
    assert np.array_equal(np.asarray(out_dense), np.asarray(out_paged))


# ---------------------------------------------------------------------------
# engine + scheduler
# ---------------------------------------------------------------------------


def oracle_tokens(weights, tokenizer, prompt, steps, seed=1):
    c = weights.config
    state = OracleState.create(c)
    res = generate_compat(
        lambda t, p: oracle_forward(t, p, c, state, weights),
        tokenizer, prompt=prompt, steps=steps,
        temperature=0.0, topp=1.0, seed=seed, seq_len=c.seq_len,
    )
    return res.tokens


@pytest.fixture()
def paged_engine(tiny_weights):
    return Engine(params_from_raw(tiny_weights), tiny_weights.config,
                  max_batch=4, precision="highest", kv_layout="paged",
                  page_size=8)


def test_paged_engine_matches_oracle(paged_engine, tiny_weights, tiny_tokenizer):
    prompt = "Once upon a time"
    want = oracle_tokens(tiny_weights, tiny_tokenizer, prompt, steps=24)
    ptoks = tiny_tokenizer.encode(prompt)
    req = Request(prompt_tokens=ptoks, steps=24, temperature=0.0, seed=1)
    b = ContinuousBatcher(paged_engine)
    b.submit(req)
    b.run()
    assert req.out_tokens == want[len(ptoks):]


def test_paged_slot_reuse_and_release(paged_engine, tiny_tokenizer):
    """More requests than slots; pages must recycle through retirement."""
    reqs = [Request(prompt_tokens=tiny_tokenizer.encode("On"), steps=10,
                    temperature=0.0, seed=1) for _ in range(9)]
    b = ContinuousBatcher(paged_engine)
    for r in reqs:
        b.submit(r)
    b.run()
    assert all(r.done for r in reqs)
    outs = {tuple(r.out_tokens) for r in reqs}
    assert len(outs) == 1  # identical runs -> identical streams
    assert paged_engine.pool.free_pages == paged_engine.pool.num_pages - 1


def test_paged_backpressure_small_pool(tiny_weights, tiny_tokenizer):
    """A pool with room for ~one request at a time still serves everyone."""
    c = tiny_weights.config
    eng = Engine(params_from_raw(tiny_weights), c, max_batch=4,
                 precision="highest", kv_layout="paged", page_size=8,
                 num_pages=1 + -(-c.seq_len // 8))  # exactly one full slot
    b = ContinuousBatcher(eng)
    reqs = [Request(prompt_tokens=tiny_tokenizer.encode("On"), steps=12,
                    temperature=0.0, seed=1) for _ in range(3)]
    for r in reqs:
        b.submit(r)
    b.run()
    assert all(r.done for r in reqs)
    outs = {tuple(r.out_tokens) for r in reqs}
    assert len(outs) == 1


def test_paged_concurrent_matches_solo(tiny_weights, tiny_tokenizer):
    prompts = ["Once upon a time", "On", "time time"]
    c = tiny_weights.config
    solos = []
    for p in prompts:
        eng = Engine(params_from_raw(tiny_weights), c, max_batch=4,
                     precision="highest", kv_layout="paged", page_size=8)
        b = ContinuousBatcher(eng)
        r = Request(prompt_tokens=tiny_tokenizer.encode(p), steps=20,
                    temperature=0.0, seed=1)
        b.submit(r)
        b.run()
        solos.append(r.out_tokens)

    eng = Engine(params_from_raw(tiny_weights), c, max_batch=4,
                 precision="highest", kv_layout="paged", page_size=8)
    b = ContinuousBatcher(eng)
    reqs = [Request(prompt_tokens=tiny_tokenizer.encode(p), steps=20,
                    temperature=0.0, seed=1) for p in prompts]
    for r in reqs:
        b.submit(r)
    b.run()
    for r, want in zip(reqs, solos):
        assert r.out_tokens == want
