"""Convergence-trajectory parity: our JAX trainer vs the torch reference.

Trains BOTH frameworks from identical initial weights on an identical
recorded batch stream (same synthetic corpus, same optimizer family, same
inv_sqrt schedule, same clipping and pad-masked micro-chunk loss semantics,
dropout 0) and records the train-NLL and val-NLL trajectories side by side.

This is the evidence BASELINE.md's "matched validation NLL" asks for
beyond init-time parity: optimizer + schedule + loss scaling + memory
carry all have silent-divergence potential (reference hot loop
model/train.py:831-1334, eval loop :747-829).

Run as a script to regenerate the PARITY.md table:
    python tools/convergence_parity.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = "/root/reference"

# tiny-but-learnable operating point (CPU-friendly)
N_TOKEN = 310
N_LAYER, N_HEAD, D_MODEL, D_INNER = 2, 4, 64, 128
TGT, MEM, BSZ, BC = 32, 32, 8, 2
LR, WARMUP, CLIP, LR_MIN = 1e-3, 10, 0.25, 1e-6
EVAL_TGT, EVAL_MEM = 32, 32


def make_corpus(seed=0, n_train=30, n_val=8):
    """Markov-structured token sequences (learnable, unlike uniform noise):
    next ~ current + {1,2,3} with occasional jumps, over ids [2, 310)."""
    rng = np.random.RandomState(seed)

    def piece(length):
        toks = [int(rng.randint(2, N_TOKEN))]
        for _ in range(length - 1):
            if rng.rand() < 0.05:
                toks.append(int(rng.randint(2, N_TOKEN)))
            else:
                step = rng.choice([1, 2, 3], p=[0.6, 0.3, 0.1])
                toks.append(2 + (toks[-1] - 2 + step) % (N_TOKEN - 2))
        return np.asarray(toks, np.int64)

    train = [piece(int(rng.randint(200, 600))) for _ in range(n_train)]
    val = [piece(int(rng.randint(200, 400))) for _ in range(n_val)]
    return train, val


def record_batches(train_pieces, val_pieces, n_steps, seed=1):
    """Record identical streams for both frameworks using our iterators
    (contract-tested against data_utils.py:210-435)."""
    import tempfile

    from transformer_gan_tpu.config import get_default_cfg_training
    from transformer_gan_tpu.data.codec import build_performance_vocab
    from transformer_gan_tpu.data.dataset import MusicDataset

    d = tempfile.mkdtemp()
    with open(os.path.join(d, "vocab.txt"), "w") as f:
        f.write("\n".join(build_performance_vocab()))
    for split, pieces in [("train", train_pieces), ("valid", val_pieces),
                          ("test", val_pieces[:2])]:
        os.makedirs(os.path.join(d, split))
        for i, p in enumerate(pieces):
            np.save(os.path.join(d, split, f"p{i:03d}.npy"),
                    p.astype(np.int32))

    cfg = get_default_cfg_training()
    ds = MusicDataset(d, cfg)
    stream = ds.get_iterator(BSZ, TGT, split="train", do_shuffle=True,
                             seed=seed)()
    train_batches = []
    for _ in range(n_steps):
        data, target, reset, _, _ = next(stream)
        train_batches.append((data.copy(), target.copy(), reset.copy()))

    val_batches = list(ds.eval_iterator(4, EVAL_TGT, split="valid")())
    pad_id = ds.vocab.pad_id
    return train_batches, val_batches, pad_id


# ---------------------------------------------------------------------------
# our side
# ---------------------------------------------------------------------------

def make_cfg():
    from transformer_gan_tpu.config import get_default_cfg_training
    cfg = get_default_cfg_training()
    cfg.defrost()
    cfg.MODEL.num_layers = N_LAYER
    cfg.MODEL.num_heads = N_HEAD
    cfg.MODEL.units = D_MODEL
    cfg.MODEL.inner_size = D_INNER
    cfg.MODEL.dropout = 0.0
    cfg.MODEL.attention_dropout = 0.0
    cfg.TRAIN.tgt_length = TGT
    cfg.TRAIN.mem_length = MEM
    cfg.TRAIN.clip = CLIP
    cfg.TPU.compute_dtype = "float32"
    cfg.TPU.cache_kv = False  # reference-semantics memory layout
    cfg.freeze()
    return cfg


def run_ours(train_batches, val_batches, pad_id, eval_every,
             optim="adam"):
    import jax
    import jax.numpy as jnp

    from transformer_gan_tpu.models import xl
    from transformer_gan_tpu.train import optim as topt
    from transformer_gan_tpu.train import step as tstep

    cfg = make_cfg()
    xcfg = xl.XLConfig.from_cfg(cfg, N_TOKEN)
    params = xl.init_xl_params(xcfg, seed=7)

    sched = topt.make_schedule("inv_sqrt", LR, len(train_batches), LR_MIN,
                               WARMUP)
    # make_optimizer defaults to the FUSED [P]-vector update — the
    # production path, so LAMB parity here covers the fused segment-sum
    # trust ratios against the reference model/lamb.py directly
    optimizer = topt.make_optimizer(optim, LR, sched, CLIP)
    state = tstep.init_train_state(params, optimizer, xcfg, BC, MEM,
                                   BSZ // BC, seed=0)
    step_fn = tstep.make_mle_train_step(xcfg, optimizer, BC, pad_id,
                                        donate=False)
    eval_fn = tstep.make_eval_step(xcfg, pad_id)

    def run_eval(params):
        tot, cnt = 0.0, 0
        mems = xl.init_mems(xcfg, EVAL_MEM, 4)
        for data, target, reset_all, _, _ in val_batches:
            if reset_all:
                mems = tstep.reset_eval_mems(mems)
            s, c, mems = eval_fn(params, jnp.asarray(data),
                                 jnp.asarray(target), mems)
            tot += float(s)
            cnt += int(c)
        return tot / max(cnt, 1)

    train_nll, val_nll = [], []
    for data, target, reset in train_batches:
        batch = (jnp.asarray(tstep.chunk_batch(data, BC)),
                 jnp.asarray(tstep.chunk_batch(target, BC)),
                 jnp.asarray(tstep.chunk_rows(reset, BC)))
        state, metrics = step_fn(state, *batch)
        train_nll.append(float(metrics["loss_weighted"])
                         / max(1, int(metrics["tokens"])))
        if len(train_nll) % eval_every == 0:
            val_nll.append(run_eval(state.params))
    return train_nll, val_nll, params  # initial params for the torch copy


# ---------------------------------------------------------------------------
# reference side (torch, CPU)
# ---------------------------------------------------------------------------

def run_reference(train_batches, val_batches, pad_id, eval_every,
                  init_params, optim="adam"):
    import torch
    sys.path.insert(0, os.path.join(REF, "model"))
    from mem_transformer import MemTransformerLM

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests"))
    from test_xl_parity import _copy_params_to_torch

    cfg = make_cfg()
    model = MemTransformerLM(cfg, N_TOKEN, 0)
    _copy_params_to_torch(init_params, model)
    model.train()

    if optim == "lamb":
        # the ACTUAL reference optimizer, deprecated add_ call order and
        # all (model/lamb.py:52-118; train.py:396-398)
        import lamb as ref_lamb
        optimizer = ref_lamb.Lamb(model.parameters(), lr=LR)
    else:
        optimizer = torch.optim.Adam(model.parameters(), lr=LR)

    def lr_lambda(step):
        # reference train.py:469-486
        if step == 0 and WARMUP == 0:
            return 1.0
        return (max((WARMUP ** 0.5) / (step ** 0.5), LR_MIN / LR)
                if step > WARMUP else step / WARMUP)

    scheduler = torch.optim.lr_scheduler.LambdaLR(optimizer,
                                                  lr_lambda=lr_lambda)

    def run_eval():
        model.eval()
        model.same_length = True
        tot, cnt = 0.0, 0
        mems = None
        with torch.no_grad():
            for data, target, reset_all, _, _ in val_batches:
                if reset_all:
                    mems = None
                loss, mems = model(torch.from_numpy(data),
                                   torch.from_numpy(target), None, mems)
                mask = torch.from_numpy(target) != pad_id
                tot += float(loss[mask].sum())
                cnt += int(mask.sum())
        model.same_length = False
        model.train()
        return tot / max(cnt, 1)

    train_nll, val_nll = [], []
    mems = [None] * BC
    for step, (data, target, reset) in enumerate(train_batches):
        optimizer.zero_grad()
        d_ch = [np.ascontiguousarray(c) for c in np.split(data, BC, axis=1)]
        t_ch = [np.ascontiguousarray(c) for c in np.split(target, BC, axis=1)]
        r_ch = [np.ascontiguousarray(c) for c in np.split(reset, BC, axis=0)]
        tot, cnt = 0.0, 0
        for i in range(BC):   # reference train.py:874-904
            loss, mems[i] = model(
                torch.from_numpy(d_ch[i]), torch.from_numpy(t_ch[i]),
                torch.from_numpy(r_ch[i]), mems[i])
            mask = torch.from_numpy(t_ch[i]) != pad_id
            chunk_mean = loss[mask].float().mean() / BC
            # log the masked SUM (an all-pad chunk makes the mean nan in
            # the forward value only; its backward contributes zero grads)
            tot += float(loss[mask].float().sum())
            cnt += int(mask.sum())
            chunk_mean.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), CLIP)
        optimizer.step()
        scheduler.step()
        train_nll.append(tot / max(cnt, 1))
        if (step + 1) % eval_every == 0:
            val_nll.append(run_eval())
    return train_nll, val_nll


def run_comparison(n_steps=150, eval_every=25, seed=0, optim="adam"):
    train_pieces, val_pieces = make_corpus(seed)
    train_batches, val_batches, pad_id = record_batches(
        train_pieces, val_pieces, n_steps)
    ours_train, ours_val, init_params = run_ours(
        train_batches, val_batches, pad_id, eval_every, optim)
    ref_train, ref_val = run_reference(
        train_batches, val_batches, pad_id, eval_every, init_params, optim)
    return {
        "steps": n_steps, "eval_every": eval_every, "optim": optim,
        "ours_train": ours_train, "ref_train": ref_train,
        "ours_val": ours_val, "ref_val": ref_val,
    }


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    res = run_comparison(n_steps=200, eval_every=25)
    print("| step | ref train NLL | ours train NLL | ref val NLL |"
          " ours val NLL | val diff |")
    print("|---|---|---|---|---|---|")
    ee = res["eval_every"]
    for k in range(len(res["ours_val"])):
        s = (k + 1) * ee
        print(f"| {s} | {res['ref_train'][s-1]:.5f} |"
              f" {res['ours_train'][s-1]:.5f} |"
              f" {res['ref_val'][k]:.5f} | {res['ours_val'][k]:.5f} |"
              f" {abs(res['ref_val'][k]-res['ours_val'][k]):.5f} |")
    tdiff = np.abs(np.asarray(res["ours_train"])
                   - np.asarray(res["ref_train"]))
    vdiff = np.abs(np.asarray(res["ours_val"]) - np.asarray(res["ref_val"]))
    print(f"\nmax |train NLL diff| over {res['steps']} steps:"
          f" {tdiff.max():.6f}")
    print(f"max |val NLL diff|: {vdiff.max():.6f}")
    import json
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "PARITY_CONVERGENCE.json"),
            "w") as f:
        json.dump(res, f, indent=1)


if __name__ == "__main__":
    main()
