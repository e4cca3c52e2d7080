#!/usr/bin/env python
"""Time one full quality-metrics eval on the chip, section by section.

The soak evals cost 280-380s each with the fast BLEU scorer, far more
than the measured generation + scoring costs. This runs a real Trainer
(restored from a finished run's checkpoint_last) and times each piece of
`evaluate()` once: val pass, BLEU gen, self-BLEU gen, classifier gen,
classifier scoring, BLEU scores — before/after the `_generate_tokens`
rng-impl + wave-size fixes (train/loop.py).

Usage: python tools/eval_breakdown_tpu.py [--work_dir DIR] [--data DIR]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--work_dir",
                    default="/tmp/runs/soak2/20260820-180158")
    ap.add_argument("--data", default="/tmp/synth_corpus")
    ap.add_argument("--cfg",
                    default="training_config/synth_soak2.yml")
    ap.add_argument("--out", default="/tmp/eval_breakdown.json")
    args = ap.parse_args()

    import jax

    from transformer_gan_tpu.config import get_default_cfg_training
    from transformer_gan_tpu.train.loop import Trainer

    jax.devices()  # claim at start

    cfg = get_default_cfg_training()
    cfg.defrost()
    cfg.merge_from_file(args.cfg)
    cfg.freeze()
    tr = Trainer(cfg, data_dir=args.data, work_dir=args.work_dir,
                 restart=True)

    rep = {}

    def clock(name, fn):
        t0 = time.time()
        r = fn()
        rep[name] = round(time.time() - t0, 2)
        print(f"{name}: {rep[name]}s", flush=True)
        return r

    # warm the compile caches with a tiny first generation so section
    # timings reflect steady state (the soak process pays these once)
    clock("warmup_gen_compile", lambda: tr._generate_tokens(
        16, 1.0, batch_size=16, seq_len=512))

    # val NLL pass
    it = tr.dataset.eval_iterator(cfg.EVALUATE.batch_size,
                                  cfg.EVALUATE.tgt_length)
    clock("val_pass_first", lambda: _val(tr, it))
    it = tr.dataset.eval_iterator(cfg.EVALUATE.batch_size,
                                  cfg.EVALUATE.tgt_length)
    clock("val_pass_steady", lambda: _val(tr, it))

    gen = clock("bleu_gen_512x512", lambda: tr._generate_tokens(
        512, 1.0, batch_size=128, seq_len=512))
    clock("self_bleu_gen_512x512", lambda: tr._generate_tokens(
        512, 1.0, batch_size=128, seq_len=512))
    m = cfg.METRICS.CLASSIFIER
    cgen = clock("clf_gen", lambda: tr._generate_tokens(
        m.gen_num_samples, 1.0, batch_size=m.gen_batch_size,
        seq_len=m.gen_seq_len))

    corpus = [x.tolist() for x in tr.dataset.valid_data]
    tr.bleu.reset(test_text=gen.tolist(), real_text=corpus)
    clock("bleu_score", tr.bleu.get_score)
    tr.self_bleu.reset(test_text=gen.tolist(), real_text=gen.tolist())
    clock("self_bleu_score", tr.self_bleu.get_score)
    tr.classifier.reset(test_text=list(cgen),
                        real_text=tr.dataset.valid_data)
    clock("clf_score", tr.classifier.get_score)

    print(json.dumps(rep))
    with open(args.out, "w") as f:
        json.dump(rep, f, indent=1)


def _val(tr, it):
    # mirrors evaluate()'s NLL loop without the metrics tail
    import jax.numpy as jnp

    from transformer_gan_tpu.models import xl
    from transformer_gan_tpu.train import step as tstep
    cfg = tr.cfg
    total = jnp.zeros((), jnp.int32)
    nll = jnp.zeros((), jnp.float32)
    mems = xl.init_mems(tr.xcfg, cfg.EVALUATE.mem_length,
                        cfg.EVALUATE.batch_size)
    for (data, target, reset_all, n, sv) in it():
        if reset_all:
            mems = tstep.reset_eval_mems(mems)
        s, c, mems = tr.eval_step_fn(
            tr.state.params, jnp.asarray(data), jnp.asarray(target), mems,
            jnp.asarray(sv) if sv is not None else None)
        nll = nll + s
        total = total + c
    return float(nll), int(total)


if __name__ == "__main__":
    main()
