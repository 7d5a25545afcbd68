"""Oracle forward-pass tests.

The oracle is itself the golden reference for the JAX engine, so it is
validated here against an independent, structurally different "textbook"
numpy implementation (vectorized, no per-store f32 rounding) within fp32
tolerance, plus invariants.
"""

import math

import numpy as np
import pytest

from tpu_llama.compat.oracle import OracleState, oracle_forward


def textbook_forward_sequence(tokens, c, w):
    """Straightforward fp64 implementation processing a whole sequence at
    once with standard formulas; returns logits at every position."""
    T = len(tokens)
    hd, gs = c.head_dim, c.group_size
    x = w.token_embedding[np.array(tokens)].astype(np.float64)  # (T, dim)

    def rms(v, g):
        return g * v / np.sqrt(1e-5 + np.mean(v * v, axis=-1, keepdims=True))

    fcr = w.freq_cis_real[:T].astype(np.float64)  # (T, hd/2)
    fci = w.freq_cis_imag[:T].astype(np.float64)

    def rope(v):  # v: (T, n, hd)
        p = v.reshape(T, -1, hd // 2, 2)
        r = np.empty_like(p)
        r[..., 0] = p[..., 0] * fcr[:, None, :] - p[..., 1] * fci[:, None, :]
        r[..., 1] = p[..., 0] * fci[:, None, :] + p[..., 1] * fcr[:, None, :]
        return r.reshape(v.shape)

    mask = np.tril(np.ones((T, T), bool))
    for layer in range(c.n_layers):
        h = rms(x, w.rms_att[layer].astype(np.float64))
        q = (h @ w.wq[layer].T.astype(np.float64)).reshape(T, c.n_heads, hd)
        k = (h @ w.wk[layer].T.astype(np.float64)).reshape(T, c.n_kv_heads, hd)
        v = (h @ w.wv[layer].T.astype(np.float64)).reshape(T, c.n_kv_heads, hd)
        q, k = rope(q), rope(k)
        kq = np.repeat(k, gs, axis=1)  # GQA expand
        vq = np.repeat(v, gs, axis=1)
        att = np.einsum("tnh,snh->nts", q, kq) / math.sqrt(hd)
        att = np.where(mask[None], att, -np.inf)
        att = np.exp(att - att.max(-1, keepdims=True))
        att /= att.sum(-1, keepdims=True)
        o = np.einsum("nts,snh->tnh", att, vq).reshape(T, c.dim)
        x = x + o @ w.wo[layer].T.astype(np.float64)
        h = rms(x, w.rms_ffn[layer].astype(np.float64))
        g = h @ w.w1[layer].T.astype(np.float64)
        u = h @ w.w3[layer].T.astype(np.float64)
        x = x + (g / (1 + np.exp(-g)) * u) @ w.w2[layer].T.astype(np.float64)
    x = rms(x, w.rms_final.astype(np.float64))
    return x @ w.wcls.T.astype(np.float64)  # (T, vocab)


@pytest.mark.parametrize("weights_fixture", ["tiny_weights", "tiny_gqa_weights"])
def test_oracle_matches_textbook(request, weights_fixture):
    w = request.getfixturevalue(weights_fixture)
    c = w.config
    tokens = [1, 5, 17, 300, 42, 7]
    want = textbook_forward_sequence(tokens, c, w)

    s = OracleState.create(c)
    for pos, tok in enumerate(tokens):
        got = oracle_forward(tok, pos, c, s, w)
        np.testing.assert_allclose(
            got, want[pos], rtol=2e-4, atol=2e-5,
            err_msg=f"pos={pos} ({weights_fixture})",
        )


def test_oracle_deterministic(tiny_weights):
    c = tiny_weights.config
    runs = []
    for _ in range(2):
        s = OracleState.create(c)
        out = [oracle_forward(t, p, c, s, tiny_weights).copy()
               for p, t in enumerate([1, 9, 250])]
        runs.append(out)
    for a, b in zip(*runs):
        np.testing.assert_array_equal(a, b)


def test_oracle_logits_dtype_and_state(tiny_weights):
    c = tiny_weights.config
    s = OracleState.create(c)
    logits = oracle_forward(1, 0, c, s, tiny_weights)
    assert logits.dtype == np.float32
    assert logits.shape == (c.vocab_size,)
    assert np.isfinite(logits).all()
    # KV cache written at pos 0, still zero beyond
    assert np.abs(s.key_cache[:, 0]).sum() > 0
    assert np.abs(s.key_cache[:, 1:]).sum() == 0


def test_oracle_position_dependence(tiny_weights):
    """Same token at different positions must differ (RoPE + cache)."""
    c = tiny_weights.config
    s = OracleState.create(c)
    l0 = oracle_forward(5, 0, c, s, tiny_weights).copy()
    l1 = oracle_forward(5, 1, c, s, tiny_weights).copy()
    assert not np.array_equal(l0, l1)
