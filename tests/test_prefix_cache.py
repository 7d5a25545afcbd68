"""Prefix-cache admission: shared-prefix requests restore cached KV and
prefill only the suffix (start_pos > 0) — VERDICT r1 missing #4."""

import numpy as np

from tpu_llama.models import params_from_raw
from tpu_llama.runtime import ContinuousBatcher, Engine, Request


def make_engine(tiny_weights):
    return Engine(params_from_raw(tiny_weights), tiny_weights.config,
                  max_batch=4, precision="highest")


def run_one(batcher, tokenizer, prompt, steps=20, seed=1):
    req = Request(prompt_tokens=tokenizer.encode(prompt), steps=steps,
                  temperature=0.0, seed=seed)
    batcher.submit(req)
    batcher.run()
    return req.out_tokens


def test_identical_prompt_skips_prefill(tiny_weights, tiny_tokenizer):
    eng = make_engine(tiny_weights)
    b = ContinuousBatcher(eng, prefix_cache_size=4)
    calls = {"prefill": 0, "continue": 0}
    orig_prefill, orig_cont = eng.prefill, eng.prefill_continue

    def count_prefill(*a, **k):
        calls["prefill"] += 1
        return orig_prefill(*a, **k)

    def count_cont(*a, **k):
        calls["continue"] += 1
        return orig_cont(*a, **k)

    eng.prefill, eng.prefill_continue = count_prefill, count_cont

    first = run_one(b, tiny_tokenizer, "Once upon a time")
    assert calls == {"prefill": 1, "continue": 0}
    second = run_one(b, tiny_tokenizer, "Once upon a time")
    # whole-prompt hit: no prefill of any kind ran for the second request
    assert calls == {"prefill": 1, "continue": 0}
    assert b.prefix_hits == 1
    assert second == first and first


def test_shared_prefix_continues_with_start_pos(tiny_weights, tiny_tokenizer):
    # reference stream without any caching
    eng0 = make_engine(tiny_weights)
    b0 = ContinuousBatcher(eng0)
    run_one(b0, tiny_tokenizer, "Once")
    want = run_one(b0, tiny_tokenizer, "Once upon a time")

    eng = make_engine(tiny_weights)
    b = ContinuousBatcher(eng, prefix_cache_size=4)
    run_one(b, tiny_tokenizer, "Once")  # seeds the cache with the prefix
    got = run_one(b, tiny_tokenizer, "Once upon a time")
    assert b.prefix_hits == 1
    assert got == want and want


def test_prefix_cache_eviction(tiny_weights, tiny_tokenizer):
    eng = make_engine(tiny_weights)
    b = ContinuousBatcher(eng, prefix_cache_size=2)
    for p in ["On", "ce", "Once", "On"]:
        run_one(b, tiny_tokenizer, p, steps=8)
    assert len(b._prefix) <= 2


def make_paged_engine(tiny_weights, page_size=8, **kw):
    return Engine(params_from_raw(tiny_weights), tiny_weights.config,
                  max_batch=4, precision="highest", kv_layout="paged",
                  page_size=page_size, **kw)


def test_paged_identical_prompt_skips_prefill(tiny_weights, tiny_tokenizer):
    """Paged prefix hit: second identical prompt maps the pinned pages into
    its slot (refcount sharing) and runs no prefill at all."""
    eng = make_paged_engine(tiny_weights)
    b = ContinuousBatcher(eng, prefix_cache_size=4)
    calls = {"prefill": 0, "continue": 0}
    orig_prefill, orig_cont = eng.prefill, eng.prefill_continue
    eng.prefill = lambda *a, **k: (calls.__setitem__(
        "prefill", calls["prefill"] + 1), orig_prefill(*a, **k))[1]
    eng.prefill_continue = lambda *a, **k: (calls.__setitem__(
        "continue", calls["continue"] + 1), orig_cont(*a, **k))[1]

    first = run_one(b, tiny_tokenizer, "Once upon a time")
    assert calls == {"prefill": 1, "continue": 0}
    second = run_one(b, tiny_tokenizer, "Once upon a time")
    assert calls == {"prefill": 1, "continue": 0}
    assert b.prefix_hits == 1
    assert second == first and first


def test_paged_shared_prefix_matches_uncached(tiny_weights, tiny_tokenizer):
    # reference stream: paged engine without any caching
    b0 = ContinuousBatcher(make_paged_engine(tiny_weights))
    run_one(b0, tiny_tokenizer, "Once")
    want = run_one(b0, tiny_tokenizer, "Once upon a time")

    b = ContinuousBatcher(make_paged_engine(tiny_weights),
                          prefix_cache_size=4)
    run_one(b, tiny_tokenizer, "Once")  # seeds the cache with the prefix
    got = run_one(b, tiny_tokenizer, "Once upon a time")
    assert b.prefix_hits == 1
    assert got == want and want


def test_paged_prefix_page_aligned(tiny_weights, tiny_tokenizer):
    """Prefix whose fed length (BOS + prompt) is an exact page multiple:
    pure page sharing, no boundary copy."""
    prompt = "Oncc"  # BOS + ["On", "c", "c"] = 4 fed tokens = page_size
    eng = make_paged_engine(tiny_weights, page_size=4)
    assert len([1] + tiny_tokenizer.encode(prompt)) == 4
    b0 = ContinuousBatcher(make_paged_engine(tiny_weights, page_size=4))
    run_one(b0, tiny_tokenizer, prompt)
    want = run_one(b0, tiny_tokenizer, prompt + " upon")

    b = ContinuousBatcher(eng, prefix_cache_size=4)
    run_one(b, tiny_tokenizer, prompt)
    got = run_one(b, tiny_tokenizer, prompt + " upon")
    assert b.prefix_hits == 1
    assert got == want and want


def test_paged_prefix_concurrent_sharers(tiny_weights, tiny_tokenizer):
    """Two in-flight requests sharing pinned prefix pages decode the same
    streams as solo runs — appends never touch the shared pages."""
    solo = ContinuousBatcher(make_paged_engine(tiny_weights))
    want_a = run_one(solo, tiny_tokenizer, "Once upon")
    want_b = run_one(solo, tiny_tokenizer, "Once upon a time")

    b = ContinuousBatcher(make_paged_engine(tiny_weights),
                          prefix_cache_size=4)
    run_one(b, tiny_tokenizer, "Once upon")  # seed
    ra = Request(prompt_tokens=tiny_tokenizer.encode("Once upon"),
                 steps=20, temperature=0.0, seed=1)
    rb = Request(prompt_tokens=tiny_tokenizer.encode("Once upon a time"),
                 steps=20, temperature=0.0, seed=1)
    b.submit(ra)
    b.submit(rb)
    b.run()
    assert b.prefix_hits >= 2
    assert ra.out_tokens == want_a
    assert rb.out_tokens == want_b


def test_paged_prefix_refcounts_released(tiny_weights, tiny_tokenizer):
    """Eviction + retirement return every pinned page: no page leaks."""
    eng = make_paged_engine(tiny_weights)
    pool = eng.pool
    b = ContinuousBatcher(eng, prefix_cache_size=1)
    run_one(b, tiny_tokenizer, "Once")
    assert len(b._prefix) == 1
    pinned = sum(len(e["snap"]["pages"]) for e in b._prefix.values())
    assert pool.free_pages == pool.num_pages - 1 - pinned
    run_one(b, tiny_tokenizer, "time flies")  # evicts the first entry
    assert len(b._prefix) == 1
    for e in b._prefix.values():
        eng.release_snapshot(e["snap"])
    b._prefix.clear()
    assert pool.free_pages == pool.num_pages - 1  # page 0 stays reserved


def test_mixed_hit_miss_batch(tiny_weights, tiny_tokenizer):
    """One hit and one miss admitted in the same tick."""
    eng = make_engine(tiny_weights)
    b = ContinuousBatcher(eng, prefix_cache_size=4)
    base = run_one(b, tiny_tokenizer, "Once")

    solo = make_engine(tiny_weights)
    bs = ContinuousBatcher(solo)
    want_other = run_one(bs, tiny_tokenizer, "time time")

    r_hit = Request(prompt_tokens=tiny_tokenizer.encode("Once"), steps=20,
                    temperature=0.0, seed=1)
    r_miss = Request(prompt_tokens=tiny_tokenizer.encode("time time"),
                     steps=20, temperature=0.0, seed=1)
    b.submit(r_hit)
    b.submit(r_miss)
    b.run()
    assert r_hit.out_tokens == base
    assert r_miss.out_tokens == want_other
    assert b.prefix_hits == 1
