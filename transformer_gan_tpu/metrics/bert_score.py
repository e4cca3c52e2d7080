"""BERT pseudo-log-likelihood scorer for generated token files.

Counterpart of reference metrics/bert_score.py: split each token sequence
into 512-token blocks, and for each block build block_size copies with one
position replaced by [MASK]; the score is the mean log-probability of the
true token at each masked position under the pretrained BERT MLM
(reference :83-137). The mask-diagonal construction and scoring run as one
jitted program per block; sub-batching bounds memory.
"""

from __future__ import annotations

import argparse
import functools
import glob
import os

import numpy as np

BLOCK_SIZE = 512


def sent_encode(path, len_tokens_evaluated=2048, block_size=BLOCK_SIZE):
    """npy token file -> list of full blocks (reference :63-70)."""
    tokens = np.load(path)[:len_tokens_evaluated].tolist()
    return [tokens[i:i + block_size]
            for i in range(0, len(tokens) - block_size + 1, block_size)]


def make_block_scorer(params, bert_cfg, mask_token_id: int,
                      sub_batch: int = 64):
    import jax
    import jax.numpy as jnp

    from ..models import bert as bert_mod

    @functools.partial(jax.jit, static_argnames=())
    def score_rows(params, rows, positions, targets):
        hidden = bert_mod.bert_encode(params, bert_cfg, input_ids=rows)
        logits = bert_mod.bert_mlm_logits(params, bert_cfg, hidden)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        picked = logp[jnp.arange(rows.shape[0]), positions, targets]
        return picked

    def score_block(block):
        block = np.asarray(block, np.int32)
        n = block.shape[0]
        outs = []
        # enqueue every sub-batch before fetching: a per-sub-batch host
        # fetch serializes dispatch on the tunnel-backed TPU runtime
        for j in range(0, n, sub_batch):
            pos = np.arange(j, min(j + sub_batch, n), dtype=np.int32)
            rows = np.tile(block, (len(pos), 1))
            rows[np.arange(len(pos)), pos] = mask_token_id
            outs.append(score_rows(params, rows, pos, block[pos]))
        vals = jax.device_get(outs)
        return float(np.concatenate(vals).mean())

    return score_block


def run_score(model_path: str, input_dir: str,
              len_tokens_evaluated: int = 2048) -> float:
    """Mean pseudo-log-likelihood over all npy files in input_dir.

    The BERT is sized from the checkpoint's recorded config (the
    reference's BertConfig.from_pretrained equivalent,
    bert_score.py:226-229): a default-shaped template would silently
    half-load a differently-sized checkpoint through the non-strict
    restore. A missing/unloadable checkpoint raises — random-init
    pseudo-likelihoods look plausible but mean nothing."""
    from ..models import bert as bert_mod
    from ..train import checkpoint as ckpt

    if not (model_path and os.path.isdir(model_path)):
        raise FileNotFoundError(
            f"bert_score needs a pretrained BERT checkpoint; "
            f"{model_path!r} is not a checkpoint directory")
    kw = {}
    meta = ckpt.load_metadata(model_path)
    for key in ("vocab_size", "hidden_size", "num_hidden_layers",
                "num_attention_heads", "intermediate_size"):
        if key in meta.get("config", {}):
            kw[key] = int(meta["config"][key])
    import jax

    cfg = bert_mod.BertConfig(**kw)
    params = bert_mod.init_bert_params(cfg, seed=0)
    # device_put once: load_generator_params returns host numpy, which
    # a jitted call re-transfers on EVERY dispatch (measured 4.4 s per
    # batch through the tunnel for these weights in the classifier)
    params = jax.device_put(ckpt.load_generator_params(model_path, params))
    mask_token_id = cfg.vocab_size - 1  # [MASK] appended last
    scorer = make_block_scorer(params, cfg, mask_token_id)

    files = sorted(glob.glob(os.path.join(input_dir, "*.npy")))
    scores = []
    for path in files:
        blocks = sent_encode(path, len_tokens_evaluated)
        if not blocks:
            continue
        scores.append(float(np.mean([scorer(b) for b in blocks])))
        print(f"{os.path.basename(path)}: {scores[-1]:.4f}")
    mean = float(np.mean(scores)) if scores else float("nan")
    print(f"mean pseudo-log-likelihood over {len(scores)} files: {mean:.4f}")
    return mean


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_path", type=str, required=True,
                        help="BERT MLM checkpoint directory")
    parser.add_argument("--input_dir", type=str, required=True,
                        help="directory of generated token .npy files")
    parser.add_argument("--len_tokens_evaluated", type=int, default=2048)
    args = parser.parse_args()
    run_score(args.model_path, args.input_dir, args.len_tokens_evaluated)


if __name__ == "__main__":
    main()
