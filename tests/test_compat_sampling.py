"""Sampler edge-semantics tests (llama2.ts:364-394)."""

import numpy as np

from tpu_llama.compat.rng import Xorshift64Star
from tpu_llama.compat.sampling import argmax, sample, sample_topp


class FixedRng(Xorshift64Star):
    """RNG stub returning scripted f32 draws (still counts consumption)."""

    def __init__(self, values):
        super().__init__(1)
        self.values = list(values)
        self.draws = 0

    def random_f32(self):
        self.draws += 1
        return self.values.pop(0)


def test_argmax_tie_lowest_index():
    assert argmax(np.array([1.0, 3.0, 3.0, 2.0], np.float32)) == 1
    assert argmax(np.array([5.0], np.float32)) == 0


def test_sample_cdf_walk():
    probs = np.array([0.1, 0.2, 0.3, 0.4], np.float32)
    assert sample(probs, FixedRng([0.05])) == 0
    assert sample(probs, FixedRng([0.15])) == 1
    assert sample(probs, FixedRng([0.95])) == 3


def test_sample_fallthrough_returns_zero():
    # randValue == sum exactly -> never < cumProb -> fallthrough 0
    probs = np.array([0.5, 0.5], np.float32)
    rng = FixedRng([1.0])  # can't happen from random_f32 ([0,1)), but pins semantics
    assert sample(probs, rng) == 0


def test_sample_topp_exclusive_walk_quirk():
    """llama2.ts:390-393: walk is `i < lastIdx` EXCLUSIVE with fallthrough 0.

    If the single top probability already exceeds topp, lastIdx == 0, the walk
    body never runs, and the function returns raw token id 0 — NOT the top
    token.  This is the reference quirk we must replicate, diverging from
    llama2.c (SURVEY §2.1 sample_topp)."""
    probs = np.array([0.01, 0.95, 0.04], np.float32)
    got = sample_topp(probs, topp=0.9, rng=FixedRng([0.0]))
    assert got == 0  # NOT 1


def test_sample_topp_normal_path():
    probs = np.array([0.05, 0.5, 0.4, 0.05], np.float32)
    # sorted desc: [0.5(id1), 0.4(id2), 0.05(id0), 0.05(id3)]
    # cumsum: 0.5, 0.9, ... > 0.85 at i=1 -> lastIdx=1, cum=0.9
    # walk i in {0}: cum=0.5; draw*0.9 < 0.5 -> id 1
    assert sample_topp(probs, 0.85, FixedRng([0.5])) == 1  # 0.45 < 0.5
    # draw*0.9 = 0.81 >= 0.5 -> exits walk (i=1 excluded) -> fallthrough 0
    assert sample_topp(probs, 0.85, FixedRng([0.9])) == 0


def test_sample_topp_stable_sort_on_ties():
    probs = np.array([0.25, 0.25, 0.25, 0.25], np.float32)
    # stable descending sort keeps original order: ids 0,1,2,3
    # topp=0.6: cumsum 0.25, 0.5, 0.75 > 0.6 at i=2 -> lastIdx=2, cum=0.75
    # draw 0.0 -> walk i=0: 0 < 0.25 -> id 0
    assert sample_topp(probs, 0.6, FixedRng([0.0])) == 0
    # draw 0.4 -> 0.3: i=0 cum 0.25 (no), i=1 cum 0.5 (0.3<0.5) -> id 1
    assert sample_topp(probs, 0.6, FixedRng([0.4])) == 1


def test_rng_draw_count():
    """Each sampled step consumes exactly ONE f32 draw (SURVEY §3.5)."""
    probs = np.array([0.5, 0.5], np.float32)
    rng = FixedRng([0.3, 0.3, 0.3])
    sample(probs, rng)
    assert rng.draws == 1
    rng = FixedRng([0.3, 0.3])
    sample_topp(probs, 0.6, rng)
    assert rng.draws == 1
