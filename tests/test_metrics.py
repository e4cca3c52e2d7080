"""BLEU / Self-BLEU metric tests.

The production scorer (`_RefProfile`) precomputes the per-gram clipping
maxima over the reference set; the per-hypothesis oracle is the naive
`sentence_bleu` (reference model/utils/bleu.py semantics: per-reference
clipping, closest-length brevity penalty, method1 smoothing). The two
must agree exactly — same floats, not just close."""

import random

import numpy as np
import pytest

from transformer_gan_tpu.metrics.bleu import (BLEU, _RefProfile,
                                              sentence_bleu)


def _rand_texts(rng, n, lo=5, hi=60, vocab=30):
    return [[int(rng.integers(0, vocab)) for _ in range(rng.integers(lo, hi))]
            for _ in range(n)]


@pytest.mark.parametrize("ngram", [2, 3, 5])
def test_ref_profile_matches_naive_sentence_bleu(ngram):
    rng = np.random.default_rng(0)
    refs = _rand_texts(rng, 24)
    hyps = _rand_texts(rng, 40)
    weight = tuple(1.0 / ngram for _ in range(ngram))
    profile = _RefProfile(refs, ngram)
    for hyp in hyps:
        assert profile.sentence_bleu(hyp, weight) == \
            sentence_bleu(refs, hyp, weight)


def test_ref_profile_exact_on_degenerate_inputs():
    # empty hypothesis, hypothesis shorter than n, single-token refs
    refs = [[1], [2, 2], [3, 1, 2]]
    profile = _RefProfile(refs, 3)
    weight = (1 / 3, 1 / 3, 1 / 3)
    for hyp in ([], [1], [2, 2], [9, 9, 9, 9]):
        assert profile.sentence_bleu(hyp, weight) == \
            sentence_bleu(refs, hyp, weight)


def test_bleu_score_semantics():
    rng = np.random.default_rng(1)
    corpus = _rand_texts(rng, 30, lo=20, hi=40)
    # hypotheses copied from the corpus -> near-perfect BLEU
    m = BLEU("BLEU", gram=[2, 3], if_use=True)
    m.reset(test_text=[list(c) for c in corpus[:10]], real_text=corpus)
    random.seed(0)
    scores = m.get_score()
    assert len(scores) == 2 and all(s > 0.99 for s in scores)
    # disjoint-vocab hypotheses -> only method1 smoothing mass
    m.reset(test_text=[[99] * 30 for _ in range(10)], real_text=corpus)
    low = m.get_score()
    assert all(s < 0.05 for s in low)


def test_bleu_disabled_returns_zero():
    m = BLEU("BLEU", gram=3, if_use=False)
    assert m.get_score() == 0


def test_is_fast_subset_draw_semantics(monkeypatch):
    """Reference contract (bleu.py:107-145): get_bleu_fast draws ONE
    shuffled reference subset shared across grams; the slow path draws a
    fresh subset per gram. Only distinguishable at portion < 1 (ADVICE
    r4); assert via the number of subset draws."""
    rng = np.random.default_rng(2)
    corpus = _rand_texts(rng, 20, lo=10, hi=20)
    m = BLEU("BLEU", gram=[2, 3], portion=0.5, if_use=True)
    m.reset(test_text=corpus[:5], real_text=corpus)

    draws = []
    orig = BLEU.get_reference

    def counting(self):
        draws.append(1)
        return orig(self)

    monkeypatch.setattr(BLEU, "get_reference", counting)
    random.seed(3)
    m.get_score(is_fast=True)
    fast_draws = len(draws)   # is_first init draw + one shared draw
    assert fast_draws == 2

    draws.clear()
    m.get_score(is_fast=False)
    assert len(draws) == 2    # one fresh subset per gram

    # portion < 1 fast path must produce valid scores from its single
    # half-corpus subset
    random.seed(4)
    scores = m.get_score(is_fast=True)
    assert len(scores) == 2 and all(0.0 <= s <= 1.0 for s in scores)
