"""HTTP serving front-end tests (in-process, ephemeral port)."""

import json
import threading
import urllib.request

import pytest

from tpu_llama.models import params_from_raw
from tpu_llama.runtime import Engine
from tpu_llama.runtime.server import LlamaServer


@pytest.fixture()
def server(tiny_weights, tiny_tokenizer):
    engine = Engine(params_from_raw(tiny_weights), tiny_weights.config,
                    max_batch=2, precision="highest")
    srv = LlamaServer(engine, tiny_tokenizer, port=0).start()
    yield srv
    srv.stop()


def _post(port, path, payload):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=120) as r:
        return r.status, json.loads(r.read())


def _get(port, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}", timeout=30) as r:
        return r.status, json.loads(r.read())


def test_healthz(server):
    status, body = _get(server.port, "/healthz")
    assert status == 200 and body["ok"] is True


def test_generate_deterministic(server):
    payload = dict(prompt="Once upon a time", steps=16, temperature=0.0, seed=1)
    s1, r1 = _post(server.port, "/generate", payload)
    s2, r2 = _post(server.port, "/generate", payload)
    assert s1 == s2 == 200
    assert r1["tokens"] == r2["tokens"]
    assert r1["n_tokens"] == len(r1["tokens"])
    assert r1["ttft_s"] >= 0


def test_concurrent_requests(server):
    results = {}

    def call(i):
        results[i] = _post(server.port, "/generate",
                           dict(prompt="On", steps=12, temperature=0.0, seed=1))

    threads = [threading.Thread(target=call, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    toks = [results[i][1]["tokens"] for i in range(4)]
    assert all(t == toks[0] for t in toks)  # same request -> same answer


def test_metrics_endpoint(server):
    _post(server.port, "/generate", dict(prompt="On", steps=8, temperature=0.0))
    status, body = _get(server.port, "/metrics")
    assert status == 200
    assert body["n_requests"] >= 1
    assert body["tokens_per_sec"] >= 0


def test_bad_request(server):
    req = urllib.request.Request(
        f"http://127.0.0.1:{server.port}/generate",
        data=b'{"steps": "NaN-ish"}',
        headers={"Content-Type": "application/json"},
    )
    try:
        urllib.request.urlopen(req, timeout=30)
        raise AssertionError("expected 400")
    except urllib.error.HTTPError as e:
        assert e.code == 400


def test_server_journal_and_recovery(tmp_path, tiny_weights, tiny_tokenizer):
    """Server journals requests; a restarted server re-serves unfinished ones."""
    import json as _json
    from tpu_llama.models import params_from_raw

    log_path = tmp_path / "reqlog.jsonl"
    engine = Engine(params_from_raw(tiny_weights), tiny_weights.config,
                    max_batch=2, precision="highest")
    srv = LlamaServer(engine, tiny_tokenizer, port=0,
                      request_log=str(log_path), watchdog_s=30).start()
    _post(srv.port, "/generate",
          dict(prompt="Once", steps=10, temperature=0.0, seed=1))
    srv.stop()
    lines = [_json.loads(l) for l in log_path.read_text().splitlines()]
    assert {l["type"] for l in lines} == {"submit", "done"}

    # simulate a crash: append a submit with no done, restart the server
    with open(log_path, "a") as f:
        f.write(_json.dumps({"type": "submit", "id": 999,
                             "prompt_tokens": tiny_tokenizer.encode("On"),
                             "steps": 8, "temperature": 0.0, "topp": 1.0,
                             "seed": 1}) + "\n")
    engine.reset()
    srv2 = LlamaServer(engine, tiny_tokenizer, port=0,
                       request_log=str(log_path)).start()
    import time as _t
    deadline = _t.time() + 60
    while _t.time() < deadline:
        if len(srv2.batcher.finished) >= 1:
            break
        _t.sleep(0.05)
    srv2.stop()
    assert len(srv2.batcher.finished) >= 1  # the crashed request was re-served
    assert srv2.batcher.finished[0].out_tokens


def test_streaming_generate(server):
    """stream=true yields ndjson piece events then a done summary, and the
    concatenated pieces equal the non-streaming text."""
    plain = _post(server.port, "/generate",
                  dict(prompt="Once", steps=14, temperature=0.0, seed=1))[1]

    req = urllib.request.Request(
        f"http://127.0.0.1:{server.port}/generate",
        data=json.dumps(dict(prompt="Once", steps=14, temperature=0.0,
                             seed=1, stream=True)).encode(),
        headers={"Content-Type": "application/json"},
    )
    pieces, done = [], None
    with urllib.request.urlopen(req, timeout=120) as r:
        assert r.headers["Content-Type"] == "application/x-ndjson"
        for line in r:
            event = json.loads(line)
            if event.get("done"):
                done = event
            else:
                pieces.append(event["piece"])
    assert done is not None and done["n_tokens"] == plain["n_tokens"]
    assert "".join(pieces) == plain["text"]


def test_streaming_logprobs(server):
    """stream=true + logprobs: each piece event carries the sampled token's
    logprob and top-N alternatives, matching the non-streaming response."""
    plain = _post(server.port, "/generate",
                  dict(prompt="Once", steps=12, temperature=0.0, seed=1,
                       logprobs=2))[1]

    req = urllib.request.Request(
        f"http://127.0.0.1:{server.port}/generate",
        data=json.dumps(dict(prompt="Once", steps=12, temperature=0.0,
                             seed=1, stream=True, logprobs=2)).encode(),
        headers={"Content-Type": "application/json"},
    )
    events, done = [], None
    with urllib.request.urlopen(req, timeout=120) as r:
        for line in r:
            event = json.loads(line)
            if event.get("done"):
                done = event
            else:
                events.append(event)
    assert done is not None and done["n_tokens"] == plain["n_tokens"]
    assert [e["token"] for e in events] == plain["tokens"]
    assert [e["logprob"] for e in events] == plain["logprobs"]
    for e in events:
        assert len(e["top_logprobs"]) == 2
        assert e["top_logprobs"][0]["token"] == e["token"]  # greedy == top-1


def test_generate_logprobs(server):
    status, body = _post(server.port, "/generate", {
        "prompt": "Once", "steps": 10, "temperature": 0.0, "seed": 1,
        "logprobs": 2,
    })
    assert status == 200
    assert len(body["logprobs"]) == body["n_tokens"] > 0
    assert len(body["top_logprobs"]) == body["n_tokens"]
    for tok, lp, alts in zip(body["tokens"], body["logprobs"],
                             body["top_logprobs"]):
        assert lp <= 0.0 and len(alts) == 2
        assert alts[0]["token"] == tok  # greedy == top-1


def test_warmup_compiles_buckets(tiny_weights, tiny_tokenizer):
    """Server warmup pre-runs every prompt bucket + decode programs and
    leaves the engine clean for real traffic."""
    engine = Engine(params_from_raw(tiny_weights), tiny_weights.config,
                    max_batch=2, precision="highest")
    buckets = engine.warmup(chunk=2)
    assert buckets and buckets[-1] == engine.seq_len
    assert all(b2 > b1 for b1, b2 in zip(buckets, buckets[1:]))
    srv = LlamaServer(engine, tiny_tokenizer, port=0, warmup=True).start()
    try:
        status, body = _post(srv.port, "/generate", {
            "prompt": "Once", "steps": 8, "temperature": 0.0, "seed": 1})
        assert status == 200 and body["n_tokens"] >= 0
    finally:
        srv.stop()


def test_warmup_paged_engine(tiny_weights):
    engine = Engine(params_from_raw(tiny_weights), tiny_weights.config,
                    max_batch=2, precision="highest", kv_layout="paged",
                    page_size=8)
    engine.warmup(sample=False)
    assert engine.pool.free_pages == engine.pool.num_pages - 1
