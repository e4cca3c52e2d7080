"""GAN training-trajectory parity: our jitted GAN phases vs the torch
reference's adversarial loop.

Both frameworks start from identical generator + discriminator weights,
consume identical recorded discriminator batches, and — the key device —
identical injected gumbel noise: our sampling scans take the recorded
uniform draws through ``dis_phase/gen_phase(noise=...)`` and the torch
reference's ``forward_generate_gumbel`` (mem_transformer.py:609-628) is
monkeypatched at the ``torch.rand`` level to pop the same stream. N
dis+gen phase pairs (cnn/rsgan, truncate_backprop both ways) are then run
through BOTH stacks and the per-phase dis/gen losses and final parameter
drift are compared.

This is the adversarial twin of tools/convergence_parity.py (MLE) and
covers the silent-divergence surface of reference
transformer_gan.py:232-533 (sampling chunk semantics, loss scaling,
detach boundaries) and train.py:924-1090 (phase driving, three-optimizer
wiring, clipping).

Determinism note: both sides run with all dropouts zeroed. The reference
keeps the whole model in train() during GAN phases, so its discriminator
dropout (fixed 0.25) fires even when scoring for the GENERATOR loss and
its generator dropout fires during sampling; our production phases apply
discriminator dropout only when training the discriminator and sample
with dropout off. With nonzero dropout the two stacks draw from different
RNGs anyway, so the trajectories are only comparable at dropout 0 — which
is exactly the regime that isolates the GAN math.

Run as a script to regenerate the PARITY.md table:
    python tools/gan_parity.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = "/root/reference"

# tiny-but-adversarial operating point (CPU-friendly)
N_TOKEN = 310
N_LAYER, N_HEAD, D_MODEL, D_INNER = 2, 2, 32, 64
DIS_TGT, DIS_MEM, CTX, SCM, BC = 16, 16, 3, 2, 2
BSZ = 4
GEN_LR, DIS_LR = 1e-3, 1e-3
GEN_F, DIS_F = 2.0, 1.0
CLIP = 0.25
EMB_DIM, NUM_REP = 64, 64   # the torch-parity-verified RelGAN_D shape
N_GEN_STEPS = DIS_TGT - CTX  # gumbel draws per micro-batch


def make_cfg(truncate_backprop: bool):
    from transformer_gan_tpu.config import get_default_cfg_training
    cfg = get_default_cfg_training()
    cfg.defrost()
    cfg.MODEL.num_layers = N_LAYER
    cfg.MODEL.num_heads = N_HEAD
    cfg.MODEL.units = D_MODEL
    cfg.MODEL.inner_size = D_INNER
    cfg.MODEL.dropout = 0.0
    cfg.MODEL.attention_dropout = 0.0
    cfg.TRAIN.batch_size = BSZ
    cfg.TRAIN.batch_chunk = 1
    cfg.TRAIN.tgt_length = DIS_TGT
    cfg.TRAIN.mem_length = DIS_MEM
    cfg.TRAIN.clip = CLIP
    cfg.EVALUATE.batch_size = 2
    cfg.EVALUATE.tgt_length = DIS_TGT
    cfg.EVALUATE.mem_length = DIS_MEM
    d = cfg.DISCRIMINATOR
    d.type = "cnn"
    d.start_iter = 0
    d.dis_loss_freq = 1
    d.gen_loss_freq = 1
    d.dis_steps = 1
    d.freeze_discriminator = False
    d.tgt_len = DIS_TGT
    d.mem_len = DIS_MEM
    d.context_len = CTX
    d.sample_chunks_mem = SCM
    d.batch_chunk = BC
    d.truncate_backprop = truncate_backprop
    d.backprop_outside = False
    d.gen_loss_factor = GEN_F
    d.dis_loss_factor = DIS_F
    d.gen_lr = GEN_LR
    d.gen_scheduler = "constant"
    d.gen_warmup_step = 0
    d.dis_scheduler = "constant"
    d.dis_warmup_step = 0
    d.CNN.learning_rate = DIS_LR
    d.CNN.embed_dim = EMB_DIM
    d.CNN.num_rep = NUM_REP
    d.CNN.init = "uniform"
    d.CNN.loss_type = "rsgan"
    cfg.TPU.compute_dtype = "float32"
    cfg.TPU.cache_kv = False          # rolling oracle path (noise-injectable)
    cfg.TPU.use_pallas_attention = False
    cfg.TPU.rng_impl = "threefry2x32"
    cfg.TPU.gan_parallel_chunks = False
    cfg.freeze()
    return cfg


def make_data(n_phases: int, seed: int = 0):
    """Temp dataset + recorded dis batches (2 per phase pair: one for the
    dis phase, one for the gen phase — reference train.py:933,1023) +
    pre-drawn uniform gumbel noise per phase."""
    import tempfile

    from transformer_gan_tpu.data.codec import build_performance_vocab
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools"))
    from convergence_parity import make_corpus

    train_pieces, val_pieces = make_corpus(seed, n_train=24, n_val=4)
    d = tempfile.mkdtemp()
    with open(os.path.join(d, "vocab.txt"), "w") as f:
        f.write("\n".join(build_performance_vocab()))
    for split, pieces in [("train", train_pieces), ("valid", val_pieces),
                          ("test", val_pieces[:2])]:
        os.makedirs(os.path.join(d, split))
        for i, p in enumerate(pieces):
            np.save(os.path.join(d, split, f"p{i:03d}.npy"),
                    p.astype(np.int32))

    from transformer_gan_tpu.config import get_default_cfg_training
    from transformer_gan_tpu.data.dataset import MusicDataset
    ds = MusicDataset(d, get_default_cfg_training())
    stream = ds.get_dis_iterator(BSZ, DIS_TGT, split="train",
                                 do_shuffle=True, seed=seed + 1)()
    recorded = [next(stream)[0].copy() for _ in range(2 * n_phases)]

    rs = np.random.RandomState(seed + 2)
    noises = [
        (rs.uniform(size=(BC, N_GEN_STEPS, BSZ // BC, N_TOKEN))
         .astype(np.float32),
         rs.uniform(size=(BC, N_GEN_STEPS, BSZ // BC, N_TOKEN))
         .astype(np.float32))
        for _ in range(n_phases)]
    return d, recorded, noises


# ---------------------------------------------------------------------------
# our side: the production GanPhases (jitted dis/gen steps) with noise
# ---------------------------------------------------------------------------

def run_ours(cfg, data_dir, recorded, noises):
    import dataclasses
    import tempfile

    import jax
    import jax.numpy as jnp

    from transformer_gan_tpu.parallel import mesh as pmesh
    from transformer_gan_tpu.train.loop import Trainer

    mesh = pmesh.make_mesh(1, devices=jax.devices("cpu")[:1])
    with tempfile.TemporaryDirectory() as wd:
        trainer = Trainer(cfg, data_dir=data_dir, work_dir=wd, debug=True,
                          mesh=mesh)
        gan = trainer.gan
        # determinism: zero the RelGAN dropout (see module docstring)
        gan.dis_cfg = dataclasses.replace(gan.dis_cfg, dropout=0.0)
        gan._build_steps()
        gan._dis_stream = iter([(b, None) for b in recorded])

        gen_init = jax.tree.map(np.asarray, trainer.state.params)
        dis_init = jax.tree.map(np.asarray, gan.dis_params)

        dis_losses, gen_losses = [], []
        for k, (dn, gn) in enumerate(noises):
            d0 = gan.log_dis_loss
            gan.dis_phase(k + 1, noise=jnp.asarray(dn))
            dis_losses.append(float(gan.log_dis_loss - d0))
            g0 = gan.log_gen_loss
            gan.gen_phase(k + 1, noise=jnp.asarray(gn))
            gen_losses.append(float(gan.log_gen_loss - g0))

        gen_final = jax.tree.map(np.asarray, trainer.state.params)
        dis_final = jax.tree.map(np.asarray, gan.dis_params)
    return (dis_losses, gen_losses, gen_init, dis_init, gen_final,
            dis_final)


# ---------------------------------------------------------------------------
# reference side (torch, CPU, patched gumbel noise)
# ---------------------------------------------------------------------------

def _copy_relgan_to_torch(params, module):
    import torch

    def t(x):
        return torch.from_numpy(np.asarray(x))

    sd = module.state_dict()
    sd["embeddings.weight"] = t(params["embeddings"]).T.contiguous()
    for i, conv in enumerate(params["convs"]):
        sd[f"convs.{i}.weight"] = t(conv["w"])
        sd[f"convs.{i}.bias"] = t(conv["b"])
    sd["highway.weight"] = t(params["highway_w"]).T.contiguous()
    sd["highway.bias"] = t(params["highway_b"])
    sd["feature2out.weight"] = t(params["feature2out_w"]).T.contiguous()
    sd["feature2out.bias"] = t(params["feature2out_b"])
    sd["out2logits.weight"] = t(params["out2logits_w"]).T.contiguous()
    sd["out2logits.bias"] = t(params["out2logits_b"])
    module.load_state_dict(sd)


def _relgan_from_torch(module):
    """Inverse of _copy_relgan_to_torch, for final-drift comparison."""
    sd = {k: v.detach().numpy() for k, v in module.state_dict().items()}
    out = {
        "embeddings": sd["embeddings.weight"].T,
        "highway_w": sd["highway.weight"].T,
        "highway_b": sd["highway.bias"],
        "feature2out_w": sd["feature2out.weight"].T,
        "feature2out_b": sd["feature2out.bias"],
        "out2logits_w": sd["out2logits.weight"].T,
        "out2logits_b": sd["out2logits.bias"],
        "convs": [],
    }
    i = 0
    while f"convs.{i}.weight" in sd:
        out["convs"].append({"w": sd[f"convs.{i}.weight"],
                             "b": sd[f"convs.{i}.bias"]})
        i += 1
    return out


def _gen_from_torch(model):
    """Generator params back in our layout (for final-drift comparison)."""
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    out = {
        "word_emb": sd["word_emb.emb_layers.0.weight"],
        "crit_bias": sd["crit.out_layers.0.bias"],
        "r_w_bias": sd["r_w_bias"],
        "r_r_bias": sd["r_r_bias"],
        "layers": [],
    }
    i = 0
    while f"layers.{i}.dec_attn.qkv_net.weight" in sd:
        p = f"layers.{i}."
        out["layers"].append({
            "qkv_w": sd[p + "dec_attn.qkv_net.weight"].T,
            "r_w": sd[p + "dec_attn.r_net.weight"].T,
            "o_w": sd[p + "dec_attn.o_net.weight"].T,
            "attn_ln_scale": sd[p + "dec_attn.layer_norm.weight"],
            "attn_ln_bias": sd[p + "dec_attn.layer_norm.bias"],
            "ff_w1": sd[p + "pos_ff.CoreNet.0.weight"].T,
            "ff_b1": sd[p + "pos_ff.CoreNet.0.bias"],
            "ff_w2": sd[p + "pos_ff.CoreNet.3.weight"].T,
            "ff_b2": sd[p + "pos_ff.CoreNet.3.bias"],
            "ff_ln_scale": sd[p + "pos_ff.layer_norm.weight"],
            "ff_ln_bias": sd[p + "pos_ff.layer_norm.bias"],
        })
        i += 1
    return out


def run_reference(cfg, gen_init, dis_init, recorded, noises):
    import torch
    import transformers
    if not hasattr(transformers, "AdamW"):
        transformers.AdamW = torch.optim.AdamW
    sys.path.insert(0, os.path.join(REF, "model"))
    sys.path.insert(0, os.path.join(REF, "model", "utils"))
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests"))
    from test_xl_parity import _copy_params_to_torch
    from transformer_gan import TransformerGAN

    class _Vocab:
        vec_len = 0

        def __len__(self):
            return N_TOKEN

    # CPU run: the reference hardcodes .cuda() on the gumbel draw
    # (mem_transformer.py:610); neutralize it for the duration
    old_cuda = torch.Tensor.cuda
    old_rand = torch.rand
    queue: list[np.ndarray] = []

    def patched_rand(*shape, **kw):
        if len(shape) == 1 and not isinstance(shape[0], int):
            shape = tuple(shape[0])
        if not queue:
            raise RuntimeError("gumbel noise queue empty — consumption "
                               "order diverged from the recording")
        arr = queue.pop(0)
        assert arr.shape == tuple(shape), (arr.shape, shape)
        return torch.from_numpy(arr)

    try:
        torch.Tensor.cuda = lambda self, *a, **k: self
        model = TransformerGAN(cfg, _Vocab())
        _copy_params_to_torch(gen_init, model.generator)
        _copy_relgan_to_torch(dis_init, model.discriminator)
        for m in model.modules():
            if isinstance(m, torch.nn.Dropout):
                m.p = 0.0
        model.train()
        for p in model.discriminator.parameters():
            p.requires_grad = False

        dis_opt = torch.optim.Adam(model.discriminator.parameters(),
                                   lr=DIS_LR)
        gen_opt = torch.optim.Adam(model.generator.parameters(), lr=GEN_LR)

        torch.rand = patched_rand
        rec = iter(recorded)
        dis_losses, gen_losses = [], []
        for dn, gn in noises:
            # ---- dis phase (train.py:924-1014, backprop_outside=False) --
            dis_data = torch.from_numpy(next(rec))
            chunks = torch.chunk(dis_data, BC, 1)
            for p in model.discriminator.parameters():
                p.requires_grad = True
            phase = 0.0
            for i in range(BC):
                queue.extend(dn[i, t][None] for t in range(N_GEN_STEPS))
                ret = model(chunks[i].contiguous(), None, None, "dis_loss")
                assert not queue, "unconsumed gumbel noise (dis)"
                phase += float(ret["dis_loss"])
                (ret["dis_loss"].float().mean() / BC).backward()
            torch.nn.utils.clip_grad_norm_(
                model.discriminator.parameters(), CLIP)
            dis_opt.step()
            dis_opt.zero_grad()
            for p in model.discriminator.parameters():
                p.requires_grad = False
            dis_losses.append(phase)

            # ---- gen phase (train.py:1016-1090) ----
            gen_data = torch.from_numpy(next(rec))
            chunks = torch.chunk(gen_data, BC, 1)
            phase = 0.0
            for i in range(BC):
                queue.extend(gn[i, t][None] for t in range(N_GEN_STEPS))
                ret = model(chunks[i].contiguous(), None, None, "gen_loss")
                assert not queue, "unconsumed gumbel noise (gen)"
                phase += float(ret["gen_loss"])
                (ret["gen_loss"].float().mean() / BC).backward()
            torch.nn.utils.clip_grad_norm_(
                model.generator.parameters(), CLIP)
            gen_opt.step()
            gen_opt.zero_grad()
            gen_losses.append(phase)

        gen_final = _gen_from_torch(model.generator)
        dis_final = _relgan_from_torch(model.discriminator)
    finally:
        torch.rand = old_rand
        torch.Tensor.cuda = old_cuda
    return dis_losses, gen_losses, gen_final, dis_final


# ---------------------------------------------------------------------------

def _max_drift(a, b):
    import jax
    la = jax.tree.leaves(a)
    lb = jax.tree.leaves(b)
    assert len(la) == len(lb)
    return max(float(np.abs(np.asarray(x) - np.asarray(y)).max())
               for x, y in zip(la, lb))


def run_comparison(n_phases: int = 12, truncate_backprop: bool = False,
                   seed: int = 0):
    cfg = make_cfg(truncate_backprop)
    data_dir, recorded, noises = make_data(n_phases, seed)
    (ours_dis, ours_gen, gen_init, dis_init, ours_gen_final,
     ours_dis_final) = run_ours(cfg, data_dir, recorded, noises)
    ref_dis, ref_gen, ref_gen_final, ref_dis_final = run_reference(
        cfg, gen_init, dis_init, recorded, noises)
    return {
        "n_phases": n_phases,
        "truncate_backprop": truncate_backprop,
        "ours_dis": ours_dis, "ref_dis": ref_dis,
        "ours_gen": ours_gen, "ref_gen": ref_gen,
        "max_dis_loss_diff": float(np.abs(
            np.asarray(ours_dis) - np.asarray(ref_dis)).max()),
        "max_gen_loss_diff": float(np.abs(
            np.asarray(ours_gen) - np.asarray(ref_gen)).max()),
        "gen_param_drift": _max_drift(ours_gen_final, ref_gen_final),
        "dis_param_drift": _max_drift(ours_dis_final, ref_dis_final),
    }


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import json
    out = {}
    for truncate in (False, True):
        res = run_comparison(n_phases=12, truncate_backprop=truncate)
        out["truncate" if truncate else "full_backprop"] = res
        tag = "truncate_backprop" if truncate else "full backprop"
        print(f"\n== cnn/rsgan, {tag} ==")
        print("| phase | ref dis loss | ours dis loss | ref gen loss |"
              " ours gen loss |")
        print("|---|---|---|---|---|")
        for k in range(res["n_phases"]):
            print(f"| {k+1} | {res['ref_dis'][k]:.6f} |"
                  f" {res['ours_dis'][k]:.6f} |"
                  f" {res['ref_gen'][k]:.6f} | {res['ours_gen'][k]:.6f} |")
        print(f"max |dis loss diff| = {res['max_dis_loss_diff']:.2e}, "
              f"max |gen loss diff| = {res['max_gen_loss_diff']:.2e}")
        print(f"final param drift: gen {res['gen_param_drift']:.2e}, "
              f"dis {res['dis_param_drift']:.2e}")
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "PARITY_GAN.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
