"""Watchdog + request-log recovery tests (fault injection, SURVEY §5.3)."""

import time

from tpu_llama.runtime.health import RequestLog, Watchdog
from tpu_llama.runtime.scheduler import Request


def test_watchdog_fires_on_stall():
    fired = []
    wd = Watchdog(threshold_s=0.2, on_stall=lambda: fired.append(1),
                  poll_s=0.05).start()
    wd.beat(active=True)
    time.sleep(0.6)  # no beats while active -> stall
    wd.stop()
    assert fired == [1]
    assert wd.fired


def test_watchdog_quiet_when_beating():
    fired = []
    wd = Watchdog(threshold_s=0.3, on_stall=lambda: fired.append(1),
                  poll_s=0.05).start()
    for _ in range(10):
        wd.beat(active=True)
        time.sleep(0.05)
    wd.stop()
    assert fired == []


def test_watchdog_quiet_when_idle():
    fired = []
    wd = Watchdog(threshold_s=0.2, on_stall=lambda: fired.append(1),
                  poll_s=0.05).start()
    wd.beat(active=False)  # idle: no work in flight
    time.sleep(0.5)
    wd.stop()
    assert fired == []


def test_request_log_replay(tmp_path):
    path = tmp_path / "requests.jsonl"
    log = RequestLog(path)
    reqs = [Request(prompt_tokens=[1, 2, 3], steps=10, seed=s) for s in (1, 2, 3)]
    for i, r in enumerate(reqs):
        r.id = i
        log.log_submit(r)
    reqs[1].out_tokens = [7, 8]
    log.log_done(reqs[1])  # only request 1 completed before the "crash"
    log.close()

    pending = RequestLog.replay_incomplete(path)
    assert len(pending) == 2
    assert [p.seed for p in pending] == [1, 3]
    assert pending[0].prompt_tokens == [1, 2, 3]


def test_request_log_empty(tmp_path):
    assert RequestLog.replay_incomplete(tmp_path / "nope.jsonl") == []


def test_crash_recovery_end_to_end(tmp_path, tiny_weights, tiny_tokenizer):
    """Kill a run mid-decode; a fresh engine re-serves the journaled request
    and produces the same tokens."""
    from tpu_llama.models import params_from_raw
    from tpu_llama.runtime import ContinuousBatcher, Engine

    path = tmp_path / "requests.jsonl"
    ptoks = tiny_tokenizer.encode("Once upon a time")

    # original run: journal the submit, then "crash" before finishing
    log = RequestLog(path)
    req = Request(prompt_tokens=ptoks, steps=20, temperature=0.0, seed=1)
    req.id = 0
    log.log_submit(req)
    log.close()  # crash: no 'done' record

    # recovery run
    engine = Engine(params_from_raw(tiny_weights), tiny_weights.config,
                    max_batch=2, precision="highest")
    batcher = ContinuousBatcher(engine)
    pending = RequestLog.replay_incomplete(path)
    assert len(pending) == 1
    for r in pending:
        batcher.submit(r)
    batcher.run()
    assert pending[0].done

    # equals a never-crashed run
    engine.reset()
    b2 = ContinuousBatcher(engine)
    fresh = Request(prompt_tokens=ptoks, steps=20, temperature=0.0, seed=1)
    b2.submit(fresh)
    b2.run()
    assert pending[0].out_tokens == fresh.out_tokens


def test_replay_preserves_sampling_and_stop_semantics(tmp_path):
    """Journal must round-trip device_sampling/topk/stop_tokens (ADVICE r1)."""
    from tpu_llama.runtime.health import RequestLog
    from tpu_llama.runtime.scheduler import Request

    log = RequestLog(tmp_path / "req.jsonl")
    req = Request(prompt_tokens=[5, 6], steps=12, temperature=0.8, topp=0.9,
                  seed=7, device_sampling=True, topk=4, stop_tokens=(2,))
    req.id = 0
    log.log_submit(req)
    log.close()
    (replayed,) = RequestLog.replay_incomplete(tmp_path / "req.jsonl")
    assert replayed.device_sampling is True
    assert replayed.topk == 4
    assert replayed.stop_tokens == (2,)
