"""Real-vs-generated discriminability metric.

Counterpart of reference model/utils/classifier.py: a pretrained BERT MLM's
logits are max-pooled over the sequence into per-block features, normalized
with StandardScaler, and a LinearSVC is trained to separate real from
generated blocks; the metric is held-out accuracy (near 0.5 = generator
indistinguishable from data). The BERT forward runs jitted on device; the
SVM stays on host (sklearn).
"""

from __future__ import annotations

import numpy as np

from .bleu import Metrics


class Classifier(Metrics):
    """API-compatible with the reference Classifier (classifier.py:101-222):
    reset(test_text, real_text) then get_score() -> eval accuracy."""

    def __init__(self, name=None, test_text=None, real_text=None,
                 device=None, if_use=False, seq_len=128, batch_size=20,
                 model_name_or_path=""):
        super().__init__(name)
        self.if_use = if_use
        if not if_use:
            return
        self.test_text = test_text
        self.real_text = real_text
        self.train_size = 5000
        self.eval_size = 1000
        self.batch_size = batch_size
        self.block_size = seq_len
        self.model_name_or_path = model_name_or_path
        self._fwd = None
        self.last_timing = {}

    def _load_model(self):
        import jax
        from ..models import bert as bert_mod
        from ..train import checkpoint as ckpt

        # Size the BERT from the checkpoint's recorded config when
        # available (the reference reads the HF config.json next to the
        # weights, classifier.py:136-147); defaults otherwise.
        kw = {}
        try:
            meta = ckpt.load_metadata(self.model_name_or_path)
            for key in ("vocab_size", "hidden_size", "num_hidden_layers",
                        "num_attention_heads", "intermediate_size"):
                if key in meta.get("config", {}):
                    kw[key] = int(meta["config"][key])
        except Exception:
            pass
        cfg = bert_mod.BertConfig(**kw)
        params = bert_mod.init_bert_params(cfg, seed=0)
        self.load_failed = False
        try:
            params = ckpt.load_generator_params(self.model_name_or_path,
                                                params)
        except Exception as e:
            # A typo'd model_path must not silently yield a plausible
            # accuracy from random-init features (reference would crash;
            # ADVICE r1 medium).
            import logging
            self.load_failed = True
            logging.getLogger(__name__).error(
                "Classifier metric: FAILED to load BERT checkpoint %r (%s); "
                "scores will be reported as invalid (-1.0)",
                self.model_name_or_path, e)

        @jax.jit
        def fwd(params, input_ids):
            hidden = bert_mod.bert_encode(params, cfg, input_ids=input_ids)
            logits = bert_mod.bert_mlm_logits(params, cfg, hidden)
            # max over sequence axis (reference classifier.py:160)
            return logits.max(axis=1)

        # Place the params on device ONCE: load_generator_params returns
        # host numpy, and numpy operands are re-transferred on every
        # jitted call — measured 4.4 s/feature-batch through the tunnel
        # (169 MB of BERT weights per dispatch) before this device_put.
        self._params = jax.device_put(params)
        self._fwd = fwd

    def _blocks(self, texts, label):
        xs, ys = [], []
        for seq in texts:
            seq = np.asarray(seq)
            for i in range(0, len(seq) - self.block_size + 1,
                           self.block_size):
                xs.append(seq[i:i + self.block_size])
                ys.append(label)
        return xs, ys

    def _features(self, blocks):
        """Per-block BERT features, dispatched asynchronously.

        All batches are enqueued before any result is fetched: a per-batch
        host fetch (np.asarray on each output) costs a full dispatch+fetch
        round trip on the tunnel-backed TPU runtime (~33 ms each) and
        serializes the whole feature pass; one device_get at the end lets
        the dispatches pipeline."""
        import jax
        import jax.numpy as jnp
        outs, keep = [], []
        for i in range(0, len(blocks), self.batch_size):
            batch = np.stack(blocks[i:i + self.batch_size]).astype(np.int32)
            pad = self.batch_size - batch.shape[0]
            if pad:
                batch = np.concatenate(
                    [batch, np.zeros((pad, batch.shape[1]), np.int32)])
            outs.append(self._fwd(self._params, jnp.asarray(batch)))
            keep.append(self.batch_size - pad)
        fetched = jax.device_get(outs)
        return np.concatenate(
            [o[:k] for o, k in zip(fetched, keep)], 0)

    def reset(self, test_text=None, real_text=None):
        if test_text is not None:
            self.test_text = [np.asarray(t) for t in test_text]
        if real_text is not None:
            self.real_text = [np.asarray(t) for t in real_text]

    def get_score(self):
        if not self.if_use:
            return 0
        import logging
        import time

        from sklearn import svm
        from sklearn.metrics import accuracy_score
        from sklearn.preprocessing import StandardScaler

        # Cost attribution (self.last_timing): the one-shot 423.9 s
        # recorded in EVAL_BREAKDOWN_TPU.json bundled model init, the
        # first jit compile, feature passes, and the SVM fit into a
        # single number; subsequent evals reuse the cached jitted
        # forward (self._fwd persists across reset()), so the split
        # matters for eval-cadence accounting.
        timing = {}
        pc = time.perf_counter
        if self._fwd is None:
            t0 = pc()
            self._load_model()
            timing["load_model_s"] = round(pc() - t0, 2)
            if not self.load_failed:
                import jax.numpy as jnp
                t0 = pc()
                dummy = np.zeros((self.batch_size, self.block_size),
                                 np.int32)
                np.asarray(self._fwd(self._params, jnp.asarray(dummy)))
                timing["first_compile_s"] = round(pc() - t0, 2)
        if self.load_failed:
            return -1.0  # invalid marker: checkpoint didn't load

        t0 = pc()
        real_x, real_y = self._blocks(self.real_text, 0)
        gen_x, gen_y = self._blocks(self.test_text, 1)
        timing["blocks_s"] = round(pc() - t0, 2)

        def split(xs, ys):
            k = int(0.8 * len(xs))
            return (xs[:k], ys[:k]), (xs[k:], ys[k:])

        (rtr, rtry), (rev, revy) = split(real_x, real_y)
        (gtr, gtry), (gev, gevy) = split(gen_x, gen_y)
        train_x = rtr[:self.train_size] + gtr[:self.train_size]
        train_y = rtry[:self.train_size] + gtry[:self.train_size]
        eval_x = rev[:self.eval_size] + gev[:self.eval_size]
        eval_y = revy[:self.eval_size] + gevy[:self.eval_size]
        if not train_x or not eval_x:
            return 0.0

        t0 = pc()
        X = self._features(train_x)
        Xe = self._features(eval_x)
        timing["features_s"] = round(pc() - t0, 2)
        timing["n_blocks"] = len(train_x) + len(eval_x)

        t0 = pc()
        scaler = StandardScaler().fit(X)
        clf = svm.LinearSVC(max_iter=10000, dual=False)
        clf.fit(scaler.transform(X), train_y)
        acc = accuracy_score(eval_y, clf.predict(scaler.transform(Xe)))
        timing["svm_s"] = round(pc() - t0, 2)
        self.last_timing = timing
        logging.getLogger(__name__).info("classifier timing: %s", timing)
        return acc
