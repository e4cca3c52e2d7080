"""GAN training phases: discriminator / generator / PPO classifier.

Counterpart of the reference GAN sections of train.py (dis phase
:924-1014, gen phase :1016-1090, three optimizers :407-449, per-phase
schedulers :497-568). Each phase is ONE jitted XLA program: a lax.scan over
the discriminator batch_chunk micro-batches, each sampling fakes with the
gumbel-ST scan and scoring real vs fake, gradients accumulated, clip + the
phase's optimizer applied.

Freezing (reference requires_grad toggling + calculate_unfreeze_idx,
transformer_gan.py:568-585, train.py:942-950) maps to an optax.masked
trainable mask over the discriminator tree.
"""

from __future__ import annotations

import logging
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import is_null
from ..models import bert as bert_mod
from ..models import discriminator as disc_mod
from ..models import gan as gan_mod

from . import checkpoint as ckpt
from . import optim as topt
from . import step as tstep


def _bert_dis_cfg(cfg, vocab_len: int) -> "bert_mod.BertConfig":
    """BertConfig for the discriminator/critic: sized from the
    DISCRIMINATOR.BERT knobs, overridden by the checkpoint's recorded
    config when model_path is loadable — the TPU equivalent of the
    reference sizing its BERT from the HF checkpoint dir
    (BertConfig.from_pretrained, transformer_gan.py:537-538). Computes
    in TPU.compute_dtype like the generator."""
    b = cfg.DISCRIMINATOR.BERT
    kw = dict(vocab_size=vocab_len + 1,
              hidden_size=int(b.hidden_size),
              num_hidden_layers=int(b.num_hidden_layers),
              num_attention_heads=int(b.num_attention_heads),
              intermediate_size=int(b.intermediate_size),
              compute_dtype=cfg.TPU.compute_dtype)
    if not b.random_weights and not is_null(b.model_path) and \
            os.path.isdir(b.model_path):
        meta = ckpt.load_metadata(b.model_path).get("config", {})
        for key in ("vocab_size", "hidden_size", "num_hidden_layers",
                    "num_attention_heads", "intermediate_size"):
            if key in meta:
                kw[key] = int(meta[key])
    assert kw["vocab_size"] >= vocab_len + 1, (
        f"BERT checkpoint vocab {kw['vocab_size']} cannot embed the "
        f"{vocab_len}-token music vocab (+1 for [MASK])")
    return bert_mod.BertConfig(**kw)


def _bert_trainable_mask(params, freeze_layers, random_weights: bool):
    """True = trainable. Embeddings frozen unless random init; encoder
    layers whose index is in freeze_layers frozen
    (reference calculate_unfreeze_idx, transformer_gan.py:568-585)."""
    frozen_layers = {int(i) for i in freeze_layers}

    def emb_mask(_):
        return bool(random_weights)

    mask = {}
    for key, val in params.items():
        if key == "layers":
            mask["layers"] = [
                jax.tree.map(lambda _: li not in frozen_layers, layer)
                for li, layer in enumerate(val)]
        elif "embedding" in key or key.startswith("emb_ln"):
            mask[key] = jax.tree.map(emb_mask, val)
        else:
            mask[key] = jax.tree.map(lambda _: True, val)
    return mask


def _masked(optimizer, mask):
    """Exact freeze for mask==False leaves, matching the reference's
    requires_grad=False semantics (no .grad -> no contribution to the
    clip norm, no Adam state motion, no weight decay, zero update).

    NOT plain ``optax.masked(optimizer, mask)``: that leaves masked-out
    leaves' updates UNTRANSFORMED — the raw gradient would be ADDED to
    frozen params by apply_updates (caught by
    tests/test_gan_mesh.py::test_spanbert_gan_mesh_matches_single_device)."""
    if mask is None:
        return optimizer
    frozen = jax.tree.map(lambda t: not t, mask)
    zero_frozen = optax.masked(optax.set_to_zero(), frozen)
    return optax.chain(zero_frozen, optimizer, zero_frozen)


def _make_dis_optimizer(cfg, dis_params):
    """AdamW with no-decay on bias/LN for bert (train.py:413-439), plain
    Adam for cnn (:441-444), with the dis scheduler (:534-568)."""
    d = cfg.DISCRIMINATOR
    sched = topt.make_schedule(d.dis_scheduler, d.dis_lr, cfg.TRAIN.max_step,
                               d.dis_lr_min, d.dis_warmup_step)
    if d.type == "bert":
        base_lr = d.BERT.learning_rate

        def decay_mask(params):
            def is_decay(path, _):
                last = path[-1]
                name = getattr(last, "key", getattr(last, "idx", ""))
                return not (str(name).endswith("_b")
                            or "ln" in str(name) or "bias" in str(name))
            return jax.tree_util.tree_map_with_path(is_decay, params)

        direction = optax.chain(
            optax.scale_by_adam(b1=0.9, b2=0.999,
                                eps=d.BERT.adam_epsilon),
            optax.masked(optax.add_decayed_weights(d.BERT.weight_decay),
                         decay_mask(dis_params))
            if d.BERT.weight_decay else optax.identity(),
        )
        trainable = _bert_trainable_mask(dis_params, d.BERT.freeze_layers,
                                         d.BERT.random_weights)
    else:
        base_lr = d.CNN.learning_rate
        direction = optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8)
        trainable = None

    # The reference steps the dis scheduler every TRAIN step
    # (train.py:1122-1133), not per dis update: the multiplier slot is set
    # from the host with sched(train_step) before each phase.
    opt = optax.chain(
        optax.clip_by_global_norm(cfg.TRAIN.clip),
        direction,
        optax.scale(base_lr),
        topt.scale_by_mutable_lr(),
        optax.scale(-1.0),
    )
    return _masked(opt, trainable), trainable, sched


class GanPhases:
    """Owns discriminator(s), the gen/dis/dis_D optimizers, P0, and the
    jitted phase steps. Wired into Trainer (train/loop.py)."""

    def __init__(self, trainer, cfg):
        self.cfg = cfg
        self.trainer = trainer
        self.xcfg = trainer.xcfg
        self.temperature = 1.0
        d = cfg.DISCRIMINATOR
        self.gcfg = gan_mod.GanConfig.from_cfg(cfg, len(trainer.vocab))

        # ---- discriminator params (reference train.py:366,377-387) ----
        if d.type == "bert":
            self.dis_cfg = _bert_dis_cfg(cfg, len(trainer.vocab))
            self.dis_params = self._init_bert(
                self.dis_cfg, d.BERT.model_path, d.BERT.random_weights,
                seed=17)
        elif d.type == "cnn":
            self.dis_cfg = disc_mod.RelganConfig(
                embed_dim=d.CNN.embed_dim, num_rep=d.CNN.num_rep,
                vocab_size=len(trainer.vocab), init=d.CNN.init,
                compute_dtype=cfg.TPU.compute_dtype)
            self.dis_params = disc_mod.init_relgan_params(self.dis_cfg,
                                                          seed=17)
        else:
            raise NotImplementedError(d.type)

        self.dis_optimizer = None
        self.dis_opt_state = None
        self.dis_sched = None
        if not d.freeze_discriminator:
            (self.dis_optimizer, self._dis_mask,
             self.dis_sched) = _make_dis_optimizer(cfg, self.dis_params)
            self.dis_opt_state = self.dis_optimizer.init(self.dis_params)

        # ---- generator GAN optimizer (train.py:407-410,497-532);
        # scheduler advances per TRAIN step (train.py:1108-1120), so the
        # multiplier is host-set before each phase ----
        self.gen_sched = topt.make_schedule(
            d.gen_scheduler, d.gen_lr, cfg.TRAIN.max_step, d.gen_lr_min,
            d.gen_warmup_step)
        gen_lr = d.gen_lr / max(1, int(trainer.n_devices))
        self.gen_optimizer = optax.chain(
            optax.clip_by_global_norm(cfg.TRAIN.clip),
            optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
            optax.scale(gen_lr),
            topt.scale_by_mutable_lr(),
            optax.scale(-1.0),
        )
        self.gen_opt_state = self.gen_optimizer.init(trainer.state.params)

        # ---- PPO auxiliary classifier (train.py:448-449) ----
        self.disD_params = None
        self.disD_cfg = None
        self.disD_opt_state = None
        if self.gcfg.ppo:
            if cfg.PPO.dis_D_type == "bert":
                self.disD_cfg = _bert_dis_cfg(cfg, len(trainer.vocab))
                self.disD_params = self._init_bert(
                    self.disD_cfg, d.BERT.model_path, d.BERT.random_weights,
                    seed=23)
            else:
                self.disD_cfg = disc_mod.RelganConfig(
                    embed_dim=d.CNN.embed_dim, num_rep=cfg.PPO.dis_D_num_rep,
                    vocab_size=len(trainer.vocab), init=d.CNN.init,
                    compute_dtype=cfg.TPU.compute_dtype)
                self.disD_params = disc_mod.init_relgan_params(
                    self.disD_cfg, seed=23)
            self.disD_optimizer = optax.chain(
                optax.clip_by_global_norm(cfg.TRAIN.clip),
                optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
                optax.scale(cfg.PPO.dis_D_lr),
                optax.scale(-1.0),
            )
            self.disD_opt_state = self.disD_optimizer.init(self.disD_params)

        # dis_D scores one value per batch row (PPO.dis_D_num_rep == 1)
        bsz_chunk_dis = trainer.batch_size // self.gcfg.batch_chunk
        self.P0 = jnp.zeros((bsz_chunk_dis,), jnp.float32)
        self.P0_initialized = False

        # Mesh placement: the reference DDP-wraps the WHOLE TransformerGAN
        # (train.py:649-655) so dis/gen-GAN gradients are all-reduced too.
        # Here: dis/disD params + the three opt states replicate, GAN
        # batches shard their row axis, and GSPMD inserts the grad psums.
        self.mesh = trainer.mesh if trainer.multi_device else None
        if self.mesh is not None:
            from ..parallel import sharding as psh
            n_dev = int(trainer.n_devices)
            assert bsz_chunk_dis % n_dev == 0, (
                f"GAN micro-batch rows {bsz_chunk_dis} must divide the "
                f"{n_dev}-device mesh")
            self.dis_params = psh.place_replicated(self.mesh,
                                                   self.dis_params)
            if self.dis_opt_state is not None:
                self.dis_opt_state = psh.place_replicated(
                    self.mesh, self.dis_opt_state)
            self.gen_opt_state = psh.place_replicated(self.mesh,
                                                      self.gen_opt_state)
            if self.disD_params is not None:
                self.disD_params = psh.place_replicated(self.mesh,
                                                        self.disD_params)
                self.disD_opt_state = psh.place_replicated(
                    self.mesh, self.disD_opt_state)
            self.P0 = psh.place_rows(self.mesh, self.P0)

        # typed key with the configured impl: rbg on TPU — threefry mask
        # generation for the BERT scoring dropout alone costs ~40 ms of
        # the ~250 ms dis phase at the spanbert op-point (PERF.md)
        self.rng = jax.random.key(cfg.TRAIN.seed + 777,
                                  impl=cfg.TPU.rng_impl)
        self._dis_stream = trainer.dis_iter()
        self._build_steps()

        # logging accumulators (reference log_gen/dis_train_loss)
        self.log_gen_loss = 0.0
        self.log_gen_num = 0
        self.log_dis_loss = 0.0
        self.log_dis_num = 0

    # ------------------------------------------------------------------
    def _init_bert(self, dis_cfg, model_path, random_weights, seed):
        """Init + optional trunk warm start. With a loadable MLM
        checkpoint this matches the reference "bert_lm" path (load
        BertForMaskedLM, graft its .bert trunk into a fresh
        classification head, transformer_gan.py:540-553): the non-strict
        restore copies every matching trunk leaf and keeps the fresh
        random cls/pooler head (and skips the checkpoint's MLM head)."""
        params = bert_mod.init_bert_params(dis_cfg, seed=seed)
        if not random_weights and not is_null(model_path) and \
                os.path.isdir(model_path):
            logging.info("Loading BERT discriminator weights from %s",
                         model_path)
            params = ckpt.load_generator_params(model_path, params)
        elif not random_weights:
            logging.warning(
                "BERT discriminator checkpoint %s not found; starting from"
                " random weights", model_path)
        else:
            logging.info("Starting BERT discriminator from random weights")
        return params

    # ------------------------------------------------------------------
    def _build_steps(self):
        cfg, gcfg, xcfg = self.cfg, self.gcfg, self.xcfg
        dis_cfg, disD_cfg = self.dis_cfg, self.disD_cfg
        bc = gcfg.batch_chunk
        scale = 1.0 / (gcfg.batch_chunk * gcfg.sample_chunks_mem)
        # vmap micro-chunks (one wide sampling scan) unless PPO chains P0.
        # The getattr fallback matches the declared config default (False):
        # a stale config snapshot without the key must NOT activate the
        # vmap path, which OOMs the gen backward at real op-points.
        par = bool(getattr(cfg.TPU, "gan_parallel_chunks", False))
        par_gen = par and not gcfg.ppo

        def chunk_data(data):
            # [tgt, bsz] -> [bc, tgt, bsz/bc]
            return tstep.chunk_batch(data, bc)

        self._chunk_data = chunk_data

        # ---------- discriminator phase ----------
        def dis_loss_fn(dis_params, gen_params, d, temp, rng, noise=None):
            losses, _ = gan_mod.gan_losses_for_batch(
                jax.lax.stop_gradient(gen_params), dis_params, dis_cfg,
                xcfg, gcfg, d, temp, rng, train_dis=True,
                sample_noise=noise)
            total = (losses["dis_loss"] + losses["gp_loss"]) * \
                gcfg.dis_loss_factor * scale
            return total, losses

        dis_grad = jax.grad(dis_loss_fn, has_aux=True)

        def dis_step(gen_params, dis_params, dis_opt_state, data_c, temp,
                     rng, noise_c=None):
            # noise_c: optional [bc, n_steps, bsz_c, V] injected gumbel
            # draws (trajectory-parity harness; scan path only)
            rngs = jax.random.split(rng, bc)

            if par:
                assert noise_c is None, (
                    "noise injection requires the sequential chunk scan")
                grads_c, losses_c = jax.vmap(
                    dis_grad, in_axes=(None, None, 0, None, 0))(
                        dis_params, gen_params, data_c, temp, rngs)
                grads = jax.tree.map(lambda g: g.sum(0), grads_c)
                dsum = losses_c["dis_loss"].sum()
                gsum = losses_c["gp_loss"].sum()
            else:
                def body(carry, xs):
                    grads_acc, dsum, gsum = carry
                    if noise_c is None:
                        d, rng_c = xs
                        n_c = None
                    else:
                        d, rng_c, n_c = xs
                    grads, losses = dis_grad(dis_params, gen_params, d,
                                             temp, rng_c, n_c)
                    grads_acc = jax.tree.map(jnp.add, grads_acc, grads)
                    return (grads_acc,
                            dsum + losses["dis_loss"],
                            gsum + losses["gp_loss"]), None

                xs = ((data_c, rngs) if noise_c is None
                      else (data_c, rngs, noise_c))
                zero = jax.tree.map(jnp.zeros_like, dis_params)
                (grads, dsum, gsum), _ = jax.lax.scan(
                    body, (zero, jnp.zeros(()), jnp.zeros(())), xs)
            updates, new_opt = self.dis_optimizer.update(
                grads, dis_opt_state, dis_params)
            new_params = optax.apply_updates(dis_params, updates)
            # logged like reference ret["dis_loss"] (transformer_gan.py:516)
            logged = dsum * gcfg.dis_loss_factor / gcfg.sample_chunks_mem
            return new_params, new_opt, logged, gsum

        # ---------- generator phase ----------
        def gen_loss_fn(gen_params, dis_params, disD_params, d, temp, rng,
                        P0, update_P0, noise=None):
            losses, newP0 = gan_mod.gan_losses_for_batch(
                gen_params, jax.lax.stop_gradient(dis_params), dis_cfg,
                xcfg, gcfg, d, temp, rng, train_dis=False,
                disD_params=disD_params, disD_cfg=disD_cfg, P0=P0,
                update_P0=update_P0, sample_noise=noise)
            total = losses["gen_loss"] * gcfg.gen_loss_factor * scale
            return total, (losses, newP0)

        def make_gen_step(update_P0):
            gen_grad = jax.grad(
                lambda gp, dp, ddp, d, t, r, P0, n=None: gen_loss_fn(
                    gp, dp, ddp, d, t, r, P0, update_P0, n), has_aux=True)

            def gen_step(gen_params, gen_opt_state, dis_params, disD_params,
                         data_c, temp, rng, P0, noise_c=None):
                rngs = jax.random.split(rng, bc)

                if par_gen:
                    assert noise_c is None, (
                        "noise injection requires the sequential chunk "
                        "scan")
                    grads_c, (losses_c, _) = jax.vmap(
                        gen_grad,
                        in_axes=(None, None, None, 0, None, 0, None))(
                            gen_params, dis_params, disD_params, data_c,
                            temp, rngs, P0)
                    grads = jax.tree.map(lambda g: g.sum(0), grads_c)
                    gsum = losses_c["gen_loss"].sum()
                    newP0 = P0
                else:
                    def body(carry, xs):
                        grads_acc, gsum, P0c = carry
                        if noise_c is None:
                            d, rng_c = xs
                            n_c = None
                        else:
                            d, rng_c, n_c = xs
                        grads, (losses, newP0) = gen_grad(
                            gen_params, dis_params, disD_params, d, temp,
                            rng_c, P0c, n_c)
                        grads_acc = jax.tree.map(jnp.add, grads_acc, grads)
                        return (grads_acc, gsum + losses["gen_loss"],
                                newP0), None

                    xs = ((data_c, rngs) if noise_c is None
                          else (data_c, rngs, noise_c))
                    zero = jax.tree.map(jnp.zeros_like, gen_params)
                    (grads, gsum, newP0), _ = jax.lax.scan(
                        body, (zero, jnp.zeros(()), P0), xs)
                updates, new_opt = self.gen_optimizer.update(
                    grads, gen_opt_state, gen_params)
                new_params = optax.apply_updates(gen_params, updates)
                logged = gsum * gcfg.gen_loss_factor / gcfg.sample_chunks_mem
                return new_params, new_opt, logged, newP0

            return jax.jit(gen_step, donate_argnums=(0, 1))

        # ---------- PPO classifier phase ----------
        def clf_loss_fn(disD_params, gen_params, d, temp, rng):
            return gan_mod.classifier_loss_for_batch(
                gen_params, disD_params, disD_cfg, xcfg, gcfg, d, temp, rng)

        clf_grad = jax.grad(clf_loss_fn)

        def clf_step(gen_params, disD_params, disD_opt_state, data_c, temp,
                     rng):
            rngs = jax.random.split(rng, bc)

            def body(grads_acc, xs):
                d, rng_c = xs
                grads = clf_grad(disD_params, gen_params, d, temp, rng_c)
                return jax.tree.map(jnp.add, grads_acc, grads), None

            zero = jax.tree.map(jnp.zeros_like, disD_params)
            grads, _ = jax.lax.scan(body, zero, (data_c, rngs))
            updates, new_opt = self.disD_optimizer.update(
                grads, disD_opt_state, disD_params)
            return optax.apply_updates(disD_params, updates), new_opt

        self._dis_step = jax.jit(dis_step, donate_argnums=(1, 2))
        self._gen_step = {True: make_gen_step(True),
                          False: make_gen_step(False)}
        self._clf_step = jax.jit(clf_step, donate_argnums=(1, 2)) \
            if self.gcfg.ppo else None

    # ------------------------------------------------------------------
    def _next_dis_batch(self):
        data, _ = next(self._dis_stream)
        chunked = self._chunk_data(data)
        if self.mesh is not None:
            from ..parallel import sharding as psh
            return psh.place_gan_batch(self.mesh, chunked)
        return jnp.asarray(chunked)

    def _split_rng(self):
        self.rng, r = jax.random.split(self.rng)
        return r

    def dis_phase(self, train_step_num: int = 0, noise=None):
        """Reference train.py:924-1014: dis_steps optimizer updates over
        fresh real batches (no-op when the discriminator is frozen).
        ``noise``: optional injected gumbel draws [bc, n_steps, bsz_c, V]
        (trajectory-parity harness)."""
        if self.dis_optimizer is None:
            return
        t0 = time.perf_counter()
        self.dis_opt_state = topt.set_lr_multiplier(
            self.dis_opt_state, float(self.dis_sched(train_step_num)))
        for _ in range(self.cfg.DISCRIMINATOR.dis_steps):
            data_c = self._next_dis_batch()
            self.dis_params, self.dis_opt_state, dloss, gp = self._dis_step(
                self.trainer.state.params, self.dis_params,
                self.dis_opt_state, data_c, self.temperature,
                self._split_rng(), noise)
            # accumulate ON DEVICE (lazy add) — a float() here would cost
            # a ~33 ms host round trip per phase and serialize the
            # dispatch pipeline (same rule as the MLE loop's log_acc);
            # pop_log_stats fetches once per log interval
            self.log_dis_loss = self.log_dis_loss + dloss
            self.log_dis_num += self.gcfg.batch_chunk
        # dispatch time only: the phase runs async on device (losses are
        # fetched at log interval); steady-state phase cost shows up in
        # the train loop's tokens/s, and bench.py measures it exactly
        logging.info("dis_phase step %d: dispatched in %.2fs",
                     train_step_num, time.perf_counter() - t0)

    def gen_phase(self, train_step_num: int, noise=None):
        """Reference train.py:1016-1090: optional PPO classifier update,
        then the adversarial generator update."""
        t0 = time.perf_counter()
        self.gen_opt_state = topt.set_lr_multiplier(
            self.gen_opt_state, float(self.gen_sched(train_step_num)))
        data_c = self._next_dis_batch()
        update_D0 = (train_step_num % self.cfg.PPO.dis_D_update_D0_freq
                     == 0) or not self.P0_initialized

        if self.gcfg.ppo:
            self.disD_params, self.disD_opt_state = self._clf_step(
                self.trainer.state.params, self.disD_params,
                self.disD_opt_state, data_c, self.temperature,
                self._split_rng())

        gen_step = self._gen_step[bool(update_D0) if self.gcfg.ppo
                                  else False]
        new_params, self.gen_opt_state, gloss, self.P0 = gen_step(
            self.trainer.state.params, self.gen_opt_state, self.dis_params,
            self.disD_params, data_c, self.temperature, self._split_rng(),
            self.P0, noise)
        self.P0_initialized = True
        self.trainer.state = self.trainer.state._replace(params=new_params)
        self.log_gen_loss = self.log_gen_loss + gloss  # device-side, lazy
        self.log_gen_num += self.gcfg.batch_chunk
        logging.info("gen_phase step %d: dispatched in %.2fs",
                     train_step_num, time.perf_counter() - t0)

    # ------------------------------------------------------------------
    def pop_log_stats(self):
        g = (float(self.log_gen_loss) / self.log_gen_num
             if self.log_gen_num else 0.0)
        d = (float(self.log_dis_loss) / self.log_dis_num
             if self.log_dis_num else 0.0)
        self.log_gen_loss = self.log_gen_num = 0
        self.log_dis_loss = self.log_dis_num = 0
        return g, d

    def ckpt_payload(self):
        payload = {"dis_params": self.dis_params,
                   "gen_opt_state": self.gen_opt_state}
        if self.dis_opt_state is not None:
            payload["dis_opt_state"] = self.dis_opt_state
        if self.disD_params is not None:
            payload["disD_params"] = self.disD_params
            payload["disD_opt_state"] = self.disD_opt_state
        return payload

    def restore(self, payload):
        self.dis_params = payload.get("dis_params", self.dis_params)
        self.gen_opt_state = payload.get("gen_opt_state",
                                         self.gen_opt_state)
        if "dis_opt_state" in payload:
            self.dis_opt_state = payload["dis_opt_state"]
        if "disD_params" in payload:
            self.disD_params = payload["disD_params"]
            self.disD_opt_state = payload["disD_opt_state"]
