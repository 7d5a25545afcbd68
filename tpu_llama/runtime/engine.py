"""Inference engine: jitted prefill/decode over a slot-based KV cache.

The reference's "engine" is a sequential single-request loop
(llama2.ts:460-511).  This engine is built for continuous batching from the
start (SURVEY §2.4 "DP / continuous batching"):

* the KV cache has ``max_batch`` slots; requests occupy slots independently
  with their own positions;
* admission runs a *compact* batched prefill (only the new requests, prompt
  length bucketed to limit recompiles) and scatters the resulting KV block
  into the slot cache;
* decode always runs the full slot batch in one jitted step — inactive slots
  compute garbage that is never read (their writes land at their parked
  position and are overwritten by the next admission's prefill);
* the decode step donates the cache, so XLA updates it in place.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from tpu_llama.config import ModelConfig
from tpu_llama.models import KVCache, forward_decode, forward_prefill
from tpu_llama.models.llama import (
    LlamaParams,
    PagedKVCache,
    QuantKVCache,
    forward_prefill_chunked,
    make_kv_cache,
)
from tpu_llama.runtime.paged import PagePool

# Pool-direct admission gate (see _prefill_into_slots): above
# _POOL_DIRECT_ROWS total prompt rows, prefill straight into the page pool
# in waves of <= _WAVE_ROWS rows, _POOL_CHUNK positions at a time.
_POOL_DIRECT_ROWS = 8192  # r4: b64 x 256-token prompts (16384 rows) must go
# pool-direct — the compact duplicate (4.3 GB at 7B) cannot coexist with a
# 129-page pool + params; b16 x 512 (8192 rows) stays compact (known-good)
_POOL_CHUNK = 256
_WAVE_ROWS = 4096


def _pool_direct_ok(cache, Bp: int, T: int, logits_mode: str) -> bool:
    return (isinstance(cache, PagedKVCache) and logits_mode == "last"
            and Bp * T > _POOL_DIRECT_ROWS and T % _POOL_CHUNK == 0
            and cache.k.shape[3] % _POOL_CHUNK == 0)


def prefill_into_slots_waved(params, cache, tokens, lengths, slots, config,
                             precision="default", logits_mode="last"):
    """Admission front door: large paged admissions prefill DIRECTLY INTO
    the pool (no compact duplicate — at 7B b64 x 512 that block is 8.6 GB
    next to an 8.7 GB pool and 6.7 GB of params, NEXT r3 #4b), split into
    HOST-dispatched slot waves of <= _WAVE_ROWS rows so the activation
    working set scales with the wave, not the batch.

    The wave loop lives OUTSIDE the jit on purpose: the in-jit lax.scan
    formulation (pool in the wave-scan carry around the per-layer aliased
    writes) compiled but died with an opaque runtime Internal error on the
    real chip, while the identical per-wave program dispatched from the
    host runs — and separate dispatches localize failures per wave.  Cost:
    one extra ~27 ms dispatch per wave (3 extra at b64), inherent to the
    relay and small against a multi-second b64 TTFT."""
    Bp, T = tokens.shape
    if not _pool_direct_ok(cache, Bp, T, logits_mode):
        return _prefill_into_slots(params, cache, tokens, lengths, slots,
                                   config, precision=precision,
                                   logits_mode=logits_mode)
    # waves of bw slots (bw * chunk <= _WAVE_ROWS rows of chunk working
    # set); the final wave may be smaller — one extra program shape at
    # most, vs. the old exact-divisor rule that degraded awkward batches
    # (prime 17, 61, ...) to bw=1: one ~27 ms dispatch PER SLOT (ADVICE r3)
    bw = max(1, min(Bp, _WAVE_ROWS // _POOL_CHUNK))
    outs = []
    for w in range(0, Bp, bw):
        # pool_direct=True: a 16-slot wave is under the rows threshold, but
        # the compact path's duplicate cache cannot coexist with the pool
        last_w, _, cache = _prefill_into_slots(
            params, cache, tokens[w:w + bw], lengths[w:w + bw],
            slots[w:w + bw], config, precision=precision,
            logits_mode=logits_mode, pool_direct=True)
        outs.append(last_w)
    last = jnp.concatenate(outs, axis=0)
    return last, last, cache


@partial(jax.jit, static_argnames=("config", "precision", "logits_mode",
                                   "pool_direct"),
         donate_argnums=(1,))
def _prefill_into_slots(
    params: LlamaParams,
    cache: KVCache,
    tokens: jax.Array,  # [Bp, T] int32 (fresh prompts, start at pos 0)
    lengths: jax.Array,  # [Bp]
    slots: jax.Array,  # [Bp] slot indices into the cache batch dim
    config: ModelConfig,
    precision: str = "default",
    logits_mode: str = "last",
    pool_direct: bool = False,  # force the pool-direct path (wave calls:
    # each wave is under the rows gate, but the compact duplicate cannot
    # coexist with the full pool)
):
    """Compact prefill + scatter into slot cache.

    Returns (next-token logits [Bp, V], updated cache).  Garbage K/V at
    padding positions is safe: sequential decode overwrites position ``pos``
    before any query attends to it (mask is ``s <= pos``).
    """
    Bp, T = tokens.shape
    if pool_direct:
        # Pool-direct chunked prefill — O(Bp x chunk) temporaries.  ONLY
        # the explicit flag routes here: prefill_into_slots_waved is the
        # documented front door that applies the rows auto-gate AND splits
        # into waves; auto-firing here too sent direct callers above the
        # gate down the UNWAVED path that runs out of activation HBM at
        # b64 (ADVICE r3).
        from tpu_llama.models.llama import forward_prefill_paged_chunked

        last, cache = forward_prefill_paged_chunked(
            params, cache, tokens, lengths, slots, config,
            precision=precision, chunk=_POOL_CHUNK)
        return last, last, cache
    kv_dtype = ("int8" if isinstance(cache, (QuantKVCache, PagedKVCache))
                else cache.k.dtype)
    small = make_kv_cache(config, Bp, kv_dtype=kv_dtype, seq_len=T)
    if logits_mode == "last" and T % 256 == 0 and Bp * T > 8192:
        # very long prompt batches: chunked prefill bounds the activation
        # working set (the fresh path below handles <=8k rows one-shot —
        # its attention never touches more than the compact [B,KVH,T,hd])
        logits, small = forward_prefill_chunked(
            params, small, tokens, lengths, config,
            precision=precision, chunk=256)
    else:
        logits, small = forward_prefill(
            params, small, tokens,
            start_pos=jnp.zeros((Bp,), jnp.int32),
            lengths=lengths, config=config, precision=precision,
            logits_mode=logits_mode,
            assume_fresh=(logits_mode == "last"),  # fresh admissions start
            # at 0; the "all" mode (compat/ppl) keeps the reference path
        )
    if isinstance(cache, PagedKVCache):
        # scatter the compact [L, Bp, KVH, T, hd] block into the page pool
        # by WHOLE pages, aliased in place: position t of slot s lands at
        # (page_table[s, t//ps], head, t%ps); bucket positions beyond a
        # slot's reservation map to trash page 0.  (The previous XLA
        # advanced-index scatter made a full-pool transient per array —
        # four multi-GB copies that OOM'd b8 paged TTFT, tpu_smoke r3.)
        from tpu_llama.ops.attention import kv_pool_scatter_pages

        ck, cv, cks, cvs = kv_pool_scatter_pages(
            small.k, small.v, small.ks, small.vs, slots,
            cache.page_table, cache.k, cache.v, cache.ks, cache.vs)
        cache = PagedKVCache(k=ck, v=cv, ks=cks, vs=cvs,
                             page_table=cache.page_table)
    elif isinstance(cache, QuantKVCache):
        # aliased Pallas slot write when the chunk geometry allows (bucket
        # sizes are 256-multiples in serving); tiny prompts fall back to
        # the XLA scatter (full-operand copy, fine at small T)
        if T % 128 == 0 and T <= cache.k.shape[3]:
            from tpu_llama.ops.attention import kv_cache_scatter_slots

            ck, cv, cks, cvs = kv_cache_scatter_slots(
                small.k, small.v, slots, cache.k, cache.v,
                small.ks, small.vs, cache.ks, cache.vs)
            cache = QuantKVCache(k=ck, v=cv, ks=cks, vs=cvs)
        else:
            cache = QuantKVCache(
                k=cache.k.at[:, slots, :, :T].set(small.k),
                v=cache.v.at[:, slots, :, :T].set(small.v),
                ks=cache.ks.at[:, slots, :, :T].set(small.ks),
                vs=cache.vs.at[:, slots, :, :T].set(small.vs),
            )
    else:
        if T % 128 == 0 and T <= cache.k.shape[3]:
            from tpu_llama.ops.attention import kv_cache_scatter_slots

            ck, cv = kv_cache_scatter_slots(
                small.k, small.v, slots, cache.k, cache.v)
            cache = KVCache(k=ck, v=cv)
        else:
            cache = KVCache(
                k=cache.k.at[:, slots, :, :T].set(small.k),
                v=cache.v.at[:, slots, :, :T].set(small.v),
            )
    if logits_mode == "last":
        last = logits  # already [Bp, V]
    else:
        last = jnp.take_along_axis(
            logits, (lengths - 1)[:, None, None], axis=1)[:, 0]
    return last, logits, cache


@partial(jax.jit, static_argnames=("config", "precision"), donate_argnums=(1,))
def _prefill_continue_slots(
    params: LlamaParams,
    cache,
    tokens: jax.Array,  # [n, T] int32 — suffix tokens
    starts: jax.Array,  # [n] int32 — absolute start positions (> 0)
    lengths: jax.Array,  # [n] valid suffix length per row
    slots: jax.Array,  # [n]
    config: ModelConfig,
    precision: str = "default",
):
    """Prefill a prompt SUFFIX against slots whose cache already holds the
    prefix (restored via Engine.restore_slot) — the prefix-reuse admission
    path (VERDICT r1 missing #4; generalizes llama2.ts:464's always-from-0).

    Unlike the compact fresh-prompt path, the suffix queries must attend to
    the previously cached rows, so this gathers the full per-slot cache,
    prefills in place, and scatters back."""
    sub = jax.tree.map(lambda a: a[:, slots], cache)
    logits, sub = forward_prefill(
        params, sub, tokens, start_pos=starts, lengths=lengths,
        config=config, precision=precision, logits_mode="last")
    cache = jax.tree.map(lambda a, s: a.at[:, slots].set(s), cache, sub)
    return logits, cache


@partial(jax.jit, static_argnames=("config", "precision", "mp_cap"),
         donate_argnums=(1,))
def _prefill_continue_paged(
    params: LlamaParams,
    cache: PagedKVCache,
    tokens: jax.Array,  # [n, T] int32 — suffix tokens
    starts: jax.Array,  # [n] int32 — absolute start positions (> 0)
    lengths: jax.Array,  # [n] valid suffix length per row
    slots: jax.Array,  # [n]
    config: ModelConfig,
    precision: str = "default",
    mp_cap: int | None = None,  # static page bound: ceil((max start+T)/ps)
):
    """Suffix prefill against paged slots (prefix-reuse admission on the
    paged cache).  Gathers each slot's pages into a dense per-slot view,
    prefills from ``starts``, and scatters the written positions back into
    the pool — shared prefix pages are read but never written (suffix
    positions land in the slot's private boundary/fresh pages).

    ``mp_cap`` bounds the dense view to the pages that can actually hold
    attended keys (caller promises start+T <= mp_cap*ps for every row):
    the full-capacity gather was ~0.5 GB PER SLOT at 7B S=2048 — paging
    defeated exactly on the path paging exists for (VERDICT r2 weak #7)."""
    n, T = tokens.shape
    L, _, KVH, ps, hd = cache.k.shape
    MP = cache.page_table.shape[1]
    if mp_cap is not None:
        MP = min(MP, mp_cap)
    S = MP * ps
    pt = cache.page_table[slots][:, :MP]  # [n, MP]

    def gather(pool, has_hd):
        sub = pool[:, pt]  # [L, n, MP, KVH, ps, (hd)]
        if has_hd:
            return sub.transpose(0, 1, 3, 2, 4, 5).reshape(L, n, KVH, S, hd)
        return sub.transpose(0, 1, 3, 2, 4).reshape(L, n, KVH, S)

    sub = QuantKVCache(
        k=gather(cache.k, True), v=gather(cache.v, True),
        ks=gather(cache.ks, False), vs=gather(cache.vs, False))
    logits, sub = forward_prefill(
        params, sub, tokens, start_pos=starts, lengths=lengths,
        config=config, precision=precision, logits_mode="last",
        max_keys=S)  # the capped view holds every attended key

    # scatter positions [start, start+T) back to pool pages; positions past a
    # slot's reservation hit table zeros (the trash page)
    t_abs = jnp.minimum(starts[:, None] + jnp.arange(T)[None, :], S - 1)
    pages = jnp.take_along_axis(pt, t_abs // ps, axis=1)  # [n, T]
    p_ix = pages[:, None, :]  # [n, 1, T]
    h_ix = jnp.arange(KVH)[None, :, None]
    r_ix = (t_abs % ps)[:, None, :]  # [n, 1, T]

    def written(arr, has_hd):
        # rows of the dense view at the absolute suffix positions
        if has_hd:
            idx = t_abs[None, :, None, :, None]
            return jnp.take_along_axis(arr, idx, axis=3)  # [L, n, KVH, T, hd]
        return jnp.take_along_axis(arr, t_abs[None, :, None, :], axis=3)

    cache = PagedKVCache(
        k=cache.k.at[:, p_ix, h_ix, r_ix].set(written(sub.k, True)),
        v=cache.v.at[:, p_ix, h_ix, r_ix].set(written(sub.v, True)),
        ks=cache.ks.at[:, p_ix, h_ix, r_ix].set(written(sub.ks, False)),
        vs=cache.vs.at[:, p_ix, h_ix, r_ix].set(written(sub.vs, False)),
        page_table=cache.page_table,
    )
    return logits, cache


@partial(jax.jit, donate_argnums=(0,))
def _copy_pool_pages(cache: PagedKVCache, src: jax.Array, dst: jax.Array):
    """Device page copy (prefix snapshot/restore boundary pages)."""
    return dataclasses.replace(
        cache,
        k=cache.k.at[:, dst].set(cache.k[:, src]),
        v=cache.v.at[:, dst].set(cache.v[:, src]),
        ks=cache.ks.at[:, dst].set(cache.ks[:, src]),
        vs=cache.vs.at[:, dst].set(cache.vs[:, src]),
    )


@partial(jax.jit, static_argnames=("config", "precision", "attn"),
         donate_argnums=(1,))
def _decode_step(
    params: LlamaParams,
    cache: KVCache,
    tokens: jax.Array,  # [B]
    pos: jax.Array,  # [B]
    config: ModelConfig,
    precision: str = "default",
    attn: str = "auto",
):
    return forward_decode(params, cache, tokens, pos, config,
                          precision=precision, attn=attn)


@partial(jax.jit, static_argnames=("config", "precision", "attn"),
         donate_argnums=(1,))
def _decode_sample_step(
    params: LlamaParams,
    cache: KVCache,
    tokens: jax.Array,  # [B]
    pos: jax.Array,  # [B]
    temps: jax.Array,  # [B]
    topps: jax.Array,  # [B]
    topks: jax.Array,  # [B]
    keys: jax.Array,  # [B] typed PRNG keys
    config: ModelConfig,
    precision: str = "default",
    attn: str = "auto",
):
    """Fused decode + on-device sampling: only [B] int32 tokens leave the
    device (the perf path — no 32k-logit transfer per step)."""
    from tpu_llama.ops.sampling import sample_nosort

    logits, cache = forward_decode(params, cache, tokens, pos, config,
                                   precision=precision, attn=attn)
    next_tokens = sample_nosort(logits, keys, temps, topps, topks)
    return next_tokens, cache


@partial(jax.jit, static_argnames=("config", "precision", "steps", "attn"),
         donate_argnums=(1,))
def _decode_sample_chunk(
    params: LlamaParams,
    cache,
    tokens: jax.Array,  # [B] first token to feed
    pos: jax.Array,  # [B] its position
    temps: jax.Array,
    topps: jax.Array,
    topks: jax.Array,
    base_keys: jax.Array,  # [B] typed keys (per-request seed keys)
    config: ModelConfig,
    steps: int,
    precision: str = "default",
    attn: str = "auto",
):
    """``steps`` fused decode+sample steps in one dispatch.

    Per-step keys derive statelessly as fold_in(base_key, position), so a
    chunked run samples identically to step-at-a-time device sampling.
    Returns (tokens [B, steps], cache)."""
    from tpu_llama.ops.sampling import sample_nosort

    def body(carry, _):
        toks, cache, p = carry
        logits, cache = forward_decode(params, cache, toks, p, config,
                                       precision=precision, attn=attn)
        # same stateless derivation as the single-step path: key = fold_in
        # (seed_key, fed position) — chunked and stepwise runs sample alike
        keys = jax.vmap(jax.random.fold_in)(base_keys, p)
        nxt = sample_nosort(logits, keys, temps, topps, topks)
        return (nxt, cache, p + 1), nxt

    (_, cache, _), out = jax.lax.scan(body, (tokens, cache, pos), length=steps)
    return out.T, cache


@jax.jit
def _sample_rows(logits, base_keys, temps, topps, topks, pos):
    """Stateless one-token sampling over logits rows (admission path)."""
    from tpu_llama.ops.sampling import sample_nosort

    keys = jax.vmap(jax.random.fold_in)(base_keys, pos)
    return sample_nosort(logits, keys, temps, topps, topks)


def _make_page_pool(num_pages: int, page_size: int, slots: int,
                    max_pages_per_slot: int):
    """Prefer the native C++ allocator (native/pagepool.cpp, same
    semantics, zero Python list churn on the admission path); fall back
    to the Python pool when no compiler is available or
    TPU_LLAMA_NO_NATIVE is set."""
    import os

    if not os.environ.get("TPU_LLAMA_NO_NATIVE"):
        try:
            from tpu_llama.runtime.native_pool import NativePagePool

            return NativePagePool(num_pages, page_size, slots,
                                  max_pages_per_slot)
        except Exception:
            pass
    return PagePool(num_pages, page_size, slots, max_pages_per_slot)


def _bucket(n: int, minimum: int = 16) -> int:
    b = minimum
    while b < n:
        b *= 2
    return b


class Engine:
    """Owns params + slot cache; exposes batched prefill/decode with numpy
    in/out at the host boundary."""

    def __init__(
        self,
        params: LlamaParams,
        config: ModelConfig,
        max_batch: int = 8,
        kv_dtype=jnp.float32,
        precision: str = "default",
        seq_len: int | None = None,
        mesh=None,  # jax Mesh: shard the KV cache to match sharded params
        kv_layout: str = "dense",  # "dense" | "paged"
        page_size: int = 512,
        num_pages: int | None = None,  # paged: pool size (default: dense-equiv)
        attn: str = "auto",  # "auto" | "flash" | "flash_dma" | "xla"
        tp_fused: bool = False,  # explicit-TP fused kernel paths (params
        # must be fuse_projections(tp=mesh_model) + W8A8, sharded)
    ):
        self.params = params
        self.config = config
        self.max_batch = max_batch
        self.precision = precision
        self.attn = attn
        self.seq_len = seq_len or config.seq_len
        self.mesh = mesh
        self.tp_fused = tp_fused
        if tp_fused:
            if mesh is None:
                raise ValueError("tp_fused requires a mesh")
            if kv_layout == "paged":
                raise ValueError("tp_fused + paged KV not supported yet")
        self.pool: PagePool | None = None
        if kv_layout == "paged":
            mp = -(-self.seq_len // page_size)
            n_pages = num_pages or max_batch * mp + 1
            self.pool = _make_page_pool(n_pages, page_size, max_batch, mp)
            self.cache = make_kv_cache(
                config, max_batch, kv_dtype="int8", seq_len=self.seq_len,
                paged=True, num_pages=n_pages, page_size=page_size)
        else:
            self.cache = make_kv_cache(config, max_batch, kv_dtype=kv_dtype,
                                       seq_len=self.seq_len)
        if mesh is not None:
            from tpu_llama.parallel.sharding import shard_cache

            self.cache = shard_cache(self.cache, mesh)

    def _sync_page_table(self) -> None:
        """Push the host page-table mirror to the cache (tiny upload that
        rides the next dispatch — no separate device round trip)."""
        self.cache = dataclasses.replace(
            self.cache, page_table=jnp.asarray(self.pool.table))

    def can_admit(self, n_tokens: int) -> bool:
        """Backpressure probe: can a request needing ``n_tokens`` total
        positions be admitted right now?"""
        if self.pool is None:
            return True
        return self.pool.can_reserve(n_tokens)

    def release_slot(self, slot: int) -> None:
        """Return a retired slot's pages to the pool (no-op on dense)."""
        if self.pool is not None:
            self.pool.release(slot)
            self._sync_page_table()

    def prefill(self, prompts: Sequence[Sequence[int]], slots: Sequence[int],
                reserve_tokens: Sequence[int] | None = None,
                return_device: bool = False):
        """Prefill fresh prompts into slots. Returns next-token logits [n, V].

        ``reserve_tokens`` (paged layout): total positions each request may
        ever occupy (prompt + generation budget); that many pages are
        reserved up front so decode never fails mid-flight.

        ``return_device=True`` skips the host readback and returns the
        device array — a [32, 32000] f32 readback costs ~220 ms through
        the relay (~18 MB/s, CLAUDE.md), which dominated the admission
        phase when the scheduler only needed one sampled token per row
        (serving profile r4)."""
        assert len(prompts) == len(slots) and prompts
        lengths = np.array([len(p) for p in prompts], np.int32)
        assert lengths.min() >= 1, "prompts must be non-empty (include BOS)"
        assert int(lengths.max()) <= self.seq_len, "prompt exceeds cache"
        if self.pool is not None:
            reserve = (list(reserve_tokens) if reserve_tokens is not None
                       else [len(p) for p in prompts])
            for slot, p, r in zip(slots, prompts, reserve):
                self.pool.release(slot)  # reclaim any stale holding
                if self.pool.reserve(slot, max(r, len(p))) is None:
                    raise RuntimeError(
                        f"page pool exhausted (slot {slot}: need "
                        f"{self.pool.pages_needed(max(r, len(p)))} pages, "
                        f"{self.pool.free_pages} free) — gate admissions "
                        "with Engine.can_admit")
            self._sync_page_table()
        if self.tp_fused:
            # power-of-two T buckets bound recompiles; cap at the cache
            # length so the scatter never overflows a non-pow2 seq_len
            T = min(_bucket(int(lengths.max())), self.seq_len)
            toks = np.zeros((len(prompts), T), np.int32)
            for i, p in enumerate(prompts):
                toks[i, : len(p)] = p
            from tpu_llama.parallel.tp import tp_prefill_into_slots

            last, self.cache = tp_prefill_into_slots(
                self.params, self.cache, jnp.asarray(toks),
                jnp.asarray(lengths),
                jnp.asarray(np.asarray(slots, np.int32)),
                self.config, self.mesh, self.precision)
            return last if return_device else np.asarray(last)
        # The admission batch splits into power-of-two groups (largest
        # first): the program set is bounded by log2(slots)+1 batch shapes x
        # the T buckets actually served, instead of one program per distinct
        # admission count n — an unwarmed [n, T] shape stalls the admission
        # (and every TTFT in it) by the in-process compile/deserialize
        # (~1.1 s at 7B: the r4 half-occupancy serving deficit,
        # BENCH_serving.jsonl 16-req row).  Each group buckets its own T, so
        # a short-prompt group doesn't pay a long-prompt group's rows.
        outs = []
        start = 0
        n = len(prompts)
        while start < n:
            g = 1 << ((n - start).bit_length() - 1)  # largest pow2 <= rest
            grp = prompts[start:start + g]
            T = min(_bucket(int(lengths[start:start + g].max())),
                    self.seq_len)
            toks = np.zeros((g, T), np.int32)
            for i, p in enumerate(grp):
                toks[i, : len(p)] = p
            last, _, self.cache = prefill_into_slots_waved(
                self.params, self.cache,
                jnp.asarray(toks), jnp.asarray(lengths[start:start + g]),
                jnp.asarray(np.asarray(slots[start:start + g], np.int32)),
                self.config, self.precision, "last",
            )
            outs.append(last)
            start += g
        last = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
        return last if return_device else np.asarray(last)

    def prefill_with_all_logits(self, prompt: Sequence[int], slot: int):
        """Single-row prefill returning logits at EVERY prompt position
        (needed for teacher-forced compat generation and ppl eval)."""
        lengths = np.array([len(prompt)], np.int32)
        if self.pool is not None:
            self.pool.release(slot)
            if self.pool.reserve(slot, len(prompt)) is None:
                raise RuntimeError("page pool exhausted")
            self._sync_page_table()
        T = _bucket(int(lengths[0]))
        toks = np.zeros((1, T), np.int32)
        toks[0, : len(prompt)] = prompt
        last, full, self.cache = _prefill_into_slots(
            self.params, self.cache, jnp.asarray(toks), jnp.asarray(lengths),
            jnp.asarray([slot], np.int32), self.config, self.precision, "all",
        )
        return np.asarray(full)[0, : len(prompt)]

    def prefill_continue(self, suffixes: Sequence[Sequence[int]],
                         slots: Sequence[int], starts: Sequence[int],
                         return_device: bool = False):
        """Prefill prompt suffixes into slots whose caches already hold the
        prefix (prefix-reuse admission).  Returns next-token logits [n, V]."""
        assert len(suffixes) == len(slots) == len(starts) and suffixes
        lengths = np.array([len(s) for s in suffixes], np.int32)
        assert lengths.min() >= 1
        T = min(_bucket(int(lengths.max())), self.seq_len)
        toks = np.zeros((len(suffixes), T), np.int32)
        for i, s in enumerate(suffixes):
            toks[i, : len(s)] = s
        if self.pool is not None:
            # bound the dense gather at the pages that can hold attended
            # keys (bucketed so the jit cache stays small)
            ps = self.cache.page_size
            need = int(max(starts)) + T
            mp_cap = min(-(-_bucket(need) // ps),
                         self.cache.page_table.shape[1])
            logits, self.cache = _prefill_continue_paged(
                self.params, self.cache, jnp.asarray(toks),
                jnp.asarray(np.asarray(starts, np.int32)),
                jnp.asarray(lengths),
                jnp.asarray(np.asarray(slots, np.int32)),
                self.config, self.precision, mp_cap=mp_cap)
        else:
            logits, self.cache = _prefill_continue_slots(
                self.params, self.cache, jnp.asarray(toks),
                jnp.asarray(np.asarray(starts, np.int32)),
                jnp.asarray(lengths),
                jnp.asarray(np.asarray(slots, np.int32)),
                self.config, self.precision)
        return logits if return_device else np.asarray(logits)

    def _tp_decode(self, tokens, pos):
        from tpu_llama.parallel.tp import tp_forward_decode_fused

        logits, self.cache = tp_forward_decode_fused(
            self.params, self.cache, jnp.asarray(tokens, jnp.int32),
            jnp.asarray(pos, jnp.int32), self.config, self.mesh)
        return logits

    def decode(self, tokens: np.ndarray, pos: np.ndarray) -> np.ndarray:
        """One decode step over ALL slots. tokens/pos: [max_batch]."""
        if self.tp_fused:
            return np.asarray(self._tp_decode(tokens, pos))
        logits, self.cache = _decode_step(
            self.params, self.cache,
            jnp.asarray(tokens, jnp.int32), jnp.asarray(pos, jnp.int32),
            self.config, self.precision, self.attn,
        )
        return np.asarray(logits)

    def decode_device(self, tokens: jax.Array, pos: jax.Array):
        """Device-resident decode step (no host transfer) for tight loops."""
        if self.tp_fused:
            return self._tp_decode(tokens, pos)
        logits, self.cache = _decode_step(
            self.params, self.cache, tokens, pos, self.config,
            self.precision, self.attn,
        )
        return logits

    def decode_sample(self, tokens, pos, temps, topps, keys,
                      topks=None) -> np.ndarray:
        """Decode + on-device per-slot sampling; returns [max_batch] int32."""
        if topks is None:
            topks = np.zeros(len(np.asarray(tokens)), np.int32)
        if self.tp_fused:
            # two dispatches (decode + sample): the vocab-sharded logits
            # stay on device; GSPMD partitions the sampling reductions
            from tpu_llama.ops.sampling import sample_nosort as _sample

            logits = self._tp_decode(tokens, pos)
            return np.asarray(_sample(
                logits, keys, jnp.asarray(temps, jnp.float32),
                jnp.asarray(topps, jnp.float32),
                jnp.asarray(topks, jnp.int32)))
        next_tokens, self.cache = _decode_sample_step(
            self.params, self.cache,
            jnp.asarray(tokens, jnp.int32), jnp.asarray(pos, jnp.int32),
            jnp.asarray(temps, jnp.float32), jnp.asarray(topps, jnp.float32),
            jnp.asarray(topks, jnp.int32), keys, self.config,
            self.precision, self.attn,
        )
        return np.asarray(next_tokens)

    def sample_logits(self, logits, temps, topps, topks, base_keys,
                      pos) -> np.ndarray:
        """Sample one token per row from logits rows ON DEVICE; returns
        [n] int32.  Keys derive as fold_in(base_key, pos) — the admission
        token uses the last PROMPT position, so it never collides with the
        decode steps' keys (those fold in positions >= pos+1).  Rows pad to
        a power-of-two bucket to bound the jit shape count."""
        rows = [jnp.asarray(lg) for lg in logits]
        keys = list(base_keys)
        n = len(rows)
        nb = _bucket(n, minimum=1)
        rows += [rows[0]] * (nb - n)
        keys += [keys[0]] * (nb - n)

        def pad(a, fill):
            a = np.asarray(a)
            return jnp.asarray(np.concatenate(
                [a, np.full(nb - n, fill, a.dtype)]))

        out = _sample_rows(
            jnp.stack(rows), jnp.stack(keys), pad(temps, 0.0),
            pad(topps, 1.0), pad(topks, 0), pad(pos, 0))
        return np.asarray(out)[:n]

    def decode_sample_chunk_async(self, tokens, pos, temps, topps, base_keys,
                                  steps: int, topks=None) -> jax.Array:
        """Dispatch-only variant of ``decode_sample_chunk``: returns the
        device array WITHOUT blocking on the result.  The scheduler reads it
        after dispatching admission prefill, so the device never idles
        between the chunk and the prefill program and the host's emit loop
        overlaps device execution (VERDICT r3 next #6)."""
        if topks is None:
            topks = np.zeros(len(np.asarray(tokens)), np.int32)
        if self.tp_fused:
            return jnp.asarray(self.decode_sample_chunk(
                tokens, pos, temps, topps, base_keys, steps, topks))
        out, self.cache = _decode_sample_chunk(
            self.params, self.cache,
            jnp.asarray(tokens, jnp.int32), jnp.asarray(pos, jnp.int32),
            jnp.asarray(temps, jnp.float32), jnp.asarray(topps, jnp.float32),
            jnp.asarray(topks, jnp.int32), base_keys, self.config, steps,
            self.precision, self.attn,
        )
        return out

    def decode_sample_chunk(self, tokens, pos, temps, topps, base_keys,
                            steps: int, topks=None) -> np.ndarray:
        """`steps` fused decode+sample steps, one dispatch. [max_batch, steps]."""
        if topks is None:
            topks = np.zeros(len(np.asarray(tokens)), np.int32)
        if self.tp_fused:
            # stepwise fallback (2 dispatches/step); keys derive exactly as
            # the fused chunk does: fold_in(base_key, fed position)
            out = []
            t = np.asarray(tokens, np.int32)
            p = np.asarray(pos, np.int32)
            for _ in range(steps):
                keys = jax.vmap(jax.random.fold_in)(base_keys, jnp.asarray(p))
                t = self.decode_sample(t, p, temps, topps, keys, topks)
                out.append(t)
                p = p + 1
            return np.stack(out, axis=1)
        out, self.cache = _decode_sample_chunk(
            self.params, self.cache,
            jnp.asarray(tokens, jnp.int32), jnp.asarray(pos, jnp.int32),
            jnp.asarray(temps, jnp.float32), jnp.asarray(topps, jnp.float32),
            jnp.asarray(topks, jnp.int32), base_keys, self.config, steps,
            self.precision, self.attn,
        )
        return np.asarray(out)

    def warmup(self, max_bucket: int | None = None, sample: bool = True,
               chunk: int = 1) -> list[int]:
        """Pre-compile the per-bucket prefill programs plus the decode step(s)
        so the first real requests don't pay the 30-120 s remote compile per
        shape (VERDICT r1 weak #9).  Returns the warmed bucket sizes."""
        import jax.numpy as jnp  # local: keep module import surface small

        max_bucket = min(max_bucket or self.seq_len, self.seq_len)
        buckets, b = [], 16
        while b < max_bucket:
            buckets.append(b)
            b *= 2
        buckets.append(max_bucket)
        for T in buckets:
            self.prefill([[1] * T], [0], reserve_tokens=[T])
        B = self.max_batch
        zeros = np.zeros(B, np.int32)
        self.decode(zeros, zeros)
        if sample:
            keys = jnp.stack([jax.random.key(0)] * B)
            self.decode_sample(zeros, zeros, np.zeros(B, np.float32),
                               np.ones(B, np.float32), keys)
            k = 2
            while k <= chunk:  # every power-of-two chunk the scheduler uses
                self.decode_sample_chunk(zeros, zeros, np.zeros(B, np.float32),
                                         np.ones(B, np.float32), keys, k)
                k *= 2
        self.reset()
        return buckets

    def reset(self):
        self.cache = jax.tree.map(lambda x: jnp.zeros_like(x), self.cache)
        if self.pool is not None:
            self.pool = PagePool(self.pool.num_pages, self.pool.page_size,
                                 self.max_batch, self.pool.max_pages_per_slot)

    # ---- KV snapshot / prefix reuse (SURVEY §5.4c, capability extension) ----
    def snapshot_slot(self, slot: int, length: int) -> dict | None:
        """Pin one slot's KV prefix (positions [0, length)) for reuse across
        requests sharing a prompt prefix.

        Dense layout: copies the rows to host arrays.  Paged layout: zero-copy
        — pins the prefix's full pages by refcount (vLLM-style sharing) and
        device-copies only the partial boundary page (the original slot keeps
        appending into its own copy).  Returns None if the page pool can't
        spare the boundary page right now (caller should simply not cache)."""
        if self.pool is not None:
            pool = self.pool
            n_pages = pool.pages_needed(length)
            row = [int(p) for p in pool.table[slot, :n_pages]]
            n_shared = length // pool.page_size
            pin = row[:n_shared]
            boundary = length % pool.page_size != 0
            if boundary:
                bp = pool.alloc_page()
                if bp is None:
                    return None
                pool.retain(pin)
                pin = pin + [bp]
                self.cache = _copy_pool_pages(
                    self.cache, jnp.asarray([row[n_shared]], jnp.int32),
                    jnp.asarray([bp], jnp.int32))
            else:
                pool.retain(pin)
            return {"paged": True, "length": int(length), "pages": pin}
        snap = {"length": int(length)}
        for name in ("k", "v", "ks", "vs"):
            arr = getattr(self.cache, name, None)
            if arr is None:
                continue
            snap[name] = np.asarray(arr[:, slot, :, :length])
        return snap

    def release_snapshot(self, snap: dict | None) -> None:
        """Drop a snapshot's page pins (no-op for dense host-copy snapshots).
        MUST be called when a prefix-cache entry is evicted, or its pages
        leak until Engine.reset."""
        if snap and snap.get("paged") and self.pool is not None:
            self.pool.release_pages(snap["pages"])

    def restore_slot(self, slot: int, snap: dict,
                     reserve_tokens: int | None = None) -> None:
        """Write a snapshot back into a slot; the caller then decodes from
        pos == snap['length'] without re-running prefill.

        Paged layout: maps the pinned full pages straight into the slot's
        page-table row (shared, copy-on-nothing — decode only appends) and
        copies the boundary page into a private fresh page; ``reserve_tokens``
        sizes the slot's total reservation (prompt + generation budget)."""
        length = snap["length"]
        if snap.get("paged"):
            pool = self.pool
            pool.release(slot)  # reclaim any stale holding
            need = max(reserve_tokens or length, length)
            res = pool.reserve_with_prefix(slot, need, snap["pages"], length)
            if res is None:
                raise RuntimeError(
                    "page pool exhausted on prefix restore — gate admissions "
                    "with Engine.can_admit")
            _, copies = res
            if copies:
                self.cache = _copy_pool_pages(
                    self.cache,
                    jnp.asarray([c[0] for c in copies], jnp.int32),
                    jnp.asarray([c[1] for c in copies], jnp.int32))
            self._sync_page_table()
            return
        updates = {}
        for name in ("k", "v", "ks", "vs"):
            arr = getattr(self.cache, name, None)
            if arr is None:
                continue
            updates[name] = arr.at[:, slot, :, :length].set(
                jnp.asarray(snap[name], arr.dtype))
        self.cache = dataclasses.replace(self.cache, **updates)
