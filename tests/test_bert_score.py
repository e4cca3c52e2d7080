"""bert_score tests (reference metrics/bert_score.py:105-137): per-block
masked pseudo-log-likelihood under a pretrained BERT MLM, verified
against an independent one-row-at-a-time oracle, plus the 512-token
block segmentation contract and the run_score CLI surface."""

import os
import tempfile

import numpy as np
import pytest

from transformer_gan_tpu.metrics import bert_score as bs


@pytest.fixture(scope="module")
def tiny_bert():
    from transformer_gan_tpu.models import bert as bert_mod
    cfg = bert_mod.BertConfig(vocab_size=50, hidden_size=16,
                              num_hidden_layers=2, num_attention_heads=2,
                              intermediate_size=32)
    params = bert_mod.init_bert_params(cfg, seed=7)
    return params, cfg


def test_block_scorer_matches_one_row_oracle(tiny_bert):
    """The vectorized (diagonal-mask, sub-batched) scorer must equal the
    obvious formulation: for each position i, forward ONE copy of the
    block with position i masked and read log softmax(logits)[i, true_i];
    the score is the mean (reference get_bert_embedding, :105-137)."""
    import jax
    import jax.numpy as jnp

    from transformer_gan_tpu.models import bert as bert_mod

    params, cfg = tiny_bert
    mask_id = cfg.vocab_size - 1
    rng = np.random.RandomState(0)
    block = rng.randint(0, 40, size=(10,)).astype(np.int32)

    # independent oracle: one masked copy at a time, no sub-batching
    expected = []
    for i in range(len(block)):
        row = block.copy()
        row[i] = mask_id
        hidden = bert_mod.bert_encode(params, cfg,
                                      input_ids=jnp.asarray(row[None, :]))
        logits = bert_mod.bert_mlm_logits(params, cfg, hidden)
        logp = jax.nn.log_softmax(
            np.asarray(logits, np.float32)[0, i])
        expected.append(float(logp[block[i]]))
    expected = float(np.mean(expected))

    # sub_batch 4 < 10 forces the sub-batching path
    scorer = bs.make_block_scorer(params, cfg, mask_id, sub_batch=4)
    got = scorer(block)
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)


def test_sent_encode_block_boundaries():
    """Only FULL blocks are scored; the tail shorter than block_size is
    dropped, and len_tokens_evaluated truncates first (reference
    sent_encode, :63-70)."""
    d = tempfile.mkdtemp()
    path = os.path.join(d, "t.npy")
    np.save(path, np.arange(1100, dtype=np.int32))

    blocks = bs.sent_encode(path, len_tokens_evaluated=2048,
                            block_size=512)
    assert len(blocks) == 2
    assert blocks[0] == list(range(512))
    assert blocks[1] == list(range(512, 1024))  # 1024..1099 dropped

    # truncation happens before segmentation
    assert len(bs.sent_encode(path, len_tokens_evaluated=600,
                              block_size=512)) == 1
    # sequence shorter than one block -> nothing to score
    assert bs.sent_encode(path, len_tokens_evaluated=100,
                          block_size=512) == []
    # exact multiple -> no drop
    np.save(path, np.zeros(1024, np.int32))
    assert len(bs.sent_encode(path, block_size=512)) == 2


def test_run_score_end_to_end(tiny_bert, monkeypatch, capsys):
    """run_score over a directory of generated npy files against a saved
    checkpoint: sizes the BERT from the checkpoint's recorded config and
    returns the mean over files of the per-file block-mean scores."""
    from transformer_gan_tpu.models import bert as bert_mod
    from transformer_gan_tpu.train import checkpoint as ckpt

    params, cfg = tiny_bert
    d = tempfile.mkdtemp()
    ckpt_path = ckpt.save_checkpoint(
        d, "checkpoint-9", {"params": params},
        {"config": {"vocab_size": cfg.vocab_size,
                    "hidden_size": cfg.hidden_size,
                    "num_hidden_layers": cfg.num_hidden_layers,
                    "num_attention_heads": cfg.num_attention_heads,
                    "intermediate_size": cfg.intermediate_size}})

    gen_dir = tempfile.mkdtemp()
    rng = np.random.RandomState(1)
    for i in range(2):
        np.save(os.path.join(gen_dir, f"g{i}.npy"),
                rng.randint(0, 40, size=(40,)).astype(np.int32))
    np.save(os.path.join(gen_dir, "short.npy"),
            np.zeros(3, np.int32))  # shorter than a block: skipped

    # shrink the block for CPU (512-wide diagonals are a TPU-scale cost)
    def small_sent_encode(p, n=2048, block_size=16):
        toks = np.load(p)[:n].tolist()
        return [toks[i:i + 16]
                for i in range(0, len(toks) - 16 + 1, 16)]

    monkeypatch.setattr(bs, "sent_encode", small_sent_encode)

    score = bs.run_score(ckpt_path, gen_dir)
    assert np.isfinite(score)
    assert score < 0.0  # mean log-probability
    out = capsys.readouterr().out
    assert "mean pseudo-log-likelihood over 2 files" in out

    # per-file means of per-block means, averaged over files: check
    # against the direct scorer composition
    scorer = bs.make_block_scorer(params, cfg, cfg.vocab_size - 1)
    per_file = []
    for i in range(2):
        toks = np.load(os.path.join(gen_dir, f"g{i}.npy"))
        blocks = [toks[j:j + 16] for j in range(0, len(toks) - 15, 16)]
        per_file.append(np.mean([scorer(b) for b in blocks]))
    np.testing.assert_allclose(score, np.mean(per_file), rtol=1e-6)


def test_run_score_requires_checkpoint():
    """Random-init pseudo-likelihoods look plausible but mean nothing —
    a missing checkpoint must raise, not score."""
    with pytest.raises(FileNotFoundError, match="checkpoint"):
        bs.run_score("/nonexistent/ckpt", "/tmp")
