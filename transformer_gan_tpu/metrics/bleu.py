"""BLEU / Self-BLEU over generated token sequences.

Counterpart of reference model/utils/bleu.py (TextGAN lineage): per-
hypothesis sentence BLEU against the (shuffled, optionally sub-sampled)
real corpus, uniform n-gram weights, NLTK method-1 smoothing, sample_size
200, multiprocessing fan-out. The BLEU math is implemented here directly
(no nltk dependency): modified n-gram precision with per-reference clipping,
closest-length brevity penalty, and method1 smoothing (zero numerators
replaced by 0.1).
"""

from __future__ import annotations

import math
import os
import random
from abc import abstractmethod
from collections import Counter
from multiprocessing import Pool


class Metrics:
    def __init__(self, name="Metric"):
        self.name = name

    def get_name(self):
        return self.name

    def set_name(self, name):
        self.name = name

    @abstractmethod
    def get_score(self):
        pass

    @abstractmethod
    def reset(self):
        pass


def _ngram_counts(tokens, n):
    return Counter(tuple(tokens[i:i + n]) for i in range(len(tokens) - n + 1))


def sentence_bleu(references, hypothesis, weights,
                  smoothing_eps: float = 0.1) -> float:
    """sentence_bleu with SmoothingFunction().method1 semantics."""
    hyp_len = len(hypothesis)
    if hyp_len == 0:
        return 0.0

    log_p_sum = 0.0
    for n, w in enumerate(weights, start=1):
        if w == 0:
            continue
        hyp_counts = _ngram_counts(hypothesis, n)
        total = max(sum(hyp_counts.values()), 1)
        max_ref = Counter()
        for ref in references:
            ref_counts = _ngram_counts(ref, n)
            for g, c in ref_counts.items():
                if g in hyp_counts and c > max_ref[g]:
                    max_ref[g] = c
        clipped = sum(min(c, max_ref[g]) for g, c in hyp_counts.items())
        if clipped == 0:
            clipped = smoothing_eps  # method1
        log_p_sum += w * math.log(clipped / total)

    # brevity penalty with closest reference length
    ref_len = min((abs(len(r) - hyp_len), len(r)) for r in references)[1]
    bp = 1.0 if hyp_len > ref_len else math.exp(1 - ref_len / max(hyp_len, 1))
    return bp * math.exp(log_p_sum)


def _cal_bleu(args):
    reference, hypothesis, weight = args
    return sentence_bleu(reference, hypothesis, weight)


class BLEU(Metrics):
    """API-compatible with the reference BLEU metric (bleu.py:64-155)."""

    def __init__(self, name=None, test_text=None, real_text=None, gram=3,
                 portion=1, if_use=False):
        assert isinstance(gram, (int, list)), "Gram format error!"
        super().__init__("%s-%s" % (name, gram))
        self.if_use = if_use
        self.test_text = test_text
        self.real_text = real_text
        self.gram = [gram] if isinstance(gram, int) else gram
        self.sample_size = 200
        self.reference = None
        self.is_first = True
        self.portion = portion

    def reset(self, test_text=None, real_text=None):
        self.test_text = test_text
        self.real_text = real_text

    def get_reference(self):
        reference = list(self.real_text)
        random.shuffle(reference)
        return reference[:int(self.portion * len(reference))]

    def get_score(self, is_fast=True, given_gram=None):
        if not self.if_use:
            return 0
        if self.is_first:
            self.reference = self.get_reference()
            self.is_first = False
        grams = [given_gram] if given_gram is not None else self.gram
        all_bleu = []
        for ngram in grams:
            reference = self.get_reference()
            weight = tuple(1.0 / ngram for _ in range(ngram))
            jobs = [(reference, hyp, weight)
                    for hyp in self.test_text[:self.sample_size]]
            if is_fast and len(jobs) > 8:
                with Pool(os.cpu_count()) as pool:
                    scores = pool.map(_cal_bleu, jobs)
            else:
                scores = [_cal_bleu(j) for j in jobs]
            all_bleu.append(round(sum(scores) / max(len(scores), 1), 3))
        return all_bleu[0] if given_gram is not None else all_bleu
