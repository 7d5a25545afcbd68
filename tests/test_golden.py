"""Golden-token regression anchor (SURVEY §4 item 2).

The vendored fixture (tests/golden/tiny_golden.json) pins the oracle's token
output for four sampling configurations on the deterministic tiny checkpoint.
This is the build's analog of the reference's `npm run deterministic` pinned
config (package.json:10): any change to RNG, samplers, tokenizer merges, or
forward-pass numerics that alters tokens fails here.

The jitted engine must match the greedy case token-for-token (temp-0 is the
cross-implementation compatibility contract); sampled cases pin the oracle
path (engine sampled tokens depend on f32-vs-f64 logit rounding).
"""

import json
from pathlib import Path

import pytest

from tpu_llama.compat.generate import generate_compat
from tpu_llama.compat.oracle import OracleState, oracle_forward

FIXTURE = Path(__file__).parent / "golden" / "tiny_golden.json"


@pytest.fixture(scope="module")
def golden():
    return json.loads(FIXTURE.read_text())


@pytest.mark.parametrize("case", [
    "greedy_seed1", "sampled_t08_seed7", "topp_t09_p09_seed3", "no_prompt_seed5",
])
def test_oracle_matches_golden(golden, tiny_weights, tiny_tokenizer, case):
    cfg = golden[case]["config"]
    c = tiny_weights.config
    st = OracleState.create(c)
    res = generate_compat(
        lambda t, p: oracle_forward(t, p, c, st, tiny_weights),
        tiny_tokenizer, seq_len=c.seq_len, **cfg,
    )
    assert res.tokens == golden[case]["tokens"], case
    assert res.text == golden[case]["text"], case


def test_engine_matches_golden_greedy(golden, tiny_weights, tiny_tokenizer):
    """The jitted engine reproduces the golden GREEDY stream exactly."""
    from tpu_llama.models import params_from_raw
    from tpu_llama.runtime import ContinuousBatcher, Engine, Request

    cfg = golden["greedy_seed1"]["config"]
    engine = Engine(params_from_raw(tiny_weights), tiny_weights.config,
                    max_batch=1, precision="highest")
    b = ContinuousBatcher(engine)
    ptoks = tiny_tokenizer.encode(cfg["prompt"])
    r = Request(prompt_tokens=ptoks, steps=cfg["steps"],
                temperature=cfg["temperature"], seed=cfg["seed"])
    b.submit(r)
    b.run()
    want = golden["greedy_seed1"]["tokens"]
    assert ptoks + r.out_tokens == want
