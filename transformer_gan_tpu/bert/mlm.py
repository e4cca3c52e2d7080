"""BERT masked-language-model pretrainer over token shards.

Counterpart of reference BERT/main.py: block the npy token corpus into
fixed windows (:63-127), 80/10/10 BERT masking at 15% (:179-210), AdamW
with no-decay on bias/LayerNorm + cosine warmup schedule (:236-248),
periodic eval perplexity and rotated ``checkpoint-{step}`` saves
(:143-176,355-390). The produced checkpoints are what the GAN loads as its
BERT discriminator/critic and what the classifier / bert_score metrics
consume.

The whole masking + forward + backward + update is one jitted XLA program;
masking randomness comes from the JAX PRNG on device.
"""

from __future__ import annotations

import glob
import logging
import os
import re
import shutil
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models import bert as bert_mod
from ..train import checkpoint as ckpt
from .tokenizer import MIDITokenizer


def load_block_dataset(data_dir: str, tokenizer: MIDITokenizer,
                       block_size: int = 512) -> np.ndarray:
    """All npy shards -> [N, block_size] int32 blocks; the tail shorter
    than a block is padded with [PAD] (reference TextDataset:105-127)."""
    files = sorted(glob.glob(os.path.join(data_dir, "*.npy")))
    examples = []
    for path in files:
        toks = np.load(path)
        for i in range(0, len(toks), block_size):
            sample = toks[i:i + block_size]
            if len(sample) == block_size:
                examples.append(sample)
            else:
                pad = np.full((block_size,), tokenizer.pad_token_id,
                              toks.dtype)
                pad[:len(sample)] = sample
                examples.append(pad)
    if not examples:
        raise ValueError(f"no npy shards under {data_dir}")
    return np.stack(examples).astype(np.int32)


def mask_tokens_jax(rng, inputs, mask_token_id: int, vocab_size: int,
                    pad_token_id: int, mlm_probability: float = 0.15):
    """80/10/10 masking (reference mask_tokens, BERT/main.py:179-210).
    Returns (masked_inputs, labels) with labels == -100 on unmasked."""
    r1, r2, r3, r4 = jax.random.split(rng, 4)
    prob = jnp.where(inputs == pad_token_id, 0.0, mlm_probability)
    masked = jax.random.bernoulli(r1, prob)
    labels = jnp.where(masked, inputs, -100)
    replaced = jax.random.bernoulli(r2, 0.8, inputs.shape) & masked
    random_sel = (jax.random.bernoulli(r3, 0.5, inputs.shape)
                  & masked & ~replaced)
    random_words = jax.random.randint(r4, inputs.shape, 0, vocab_size)
    out = jnp.where(replaced, mask_token_id, inputs)
    out = jnp.where(random_sel, random_words, out)
    return out, labels


def mlm_loss(params, cfg, batch, labels, rng, train):
    hidden = bert_mod.bert_encode(params, cfg, input_ids=batch,
                                  train=train, rng=rng)
    logits = bert_mod.bert_mlm_logits(params, cfg, hidden)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    tgt = jnp.clip(labels, 0)
    nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    mask = labels >= 0
    cnt = jnp.maximum(mask.sum(), 1)
    return jnp.where(mask, nll, 0.0).sum() / cnt


class MlmTrainer:
    def __init__(self, data_dir: str, output_dir: str, vocab_file: str,
                 num_hidden_layers: int = 5, hidden_size: int = 768,
                 block_size: int = 512, batch_size: int = 16,
                 learning_rate: float = 5e-5, weight_decay: float = 0.0,
                 adam_epsilon: float = 1e-8, warmup_steps: int = 0,
                 max_steps: int = 10000, max_grad_norm: float = 1.0,
                 mlm_probability: float = 0.15, seed: int = 42,
                 logging_steps: int = 100, save_steps: int = 1000,
                 save_total_limit: int = 2, eval_steps: int = 1000,
                 mesh=None, rng_impl: str = "rbg",
                 compute_dtype: str = "float32"):
        self.output_dir = output_dir
        os.makedirs(output_dir, exist_ok=True)
        self.tokenizer = MIDITokenizer(vocab_file)
        self.cfg = bert_mod.BertConfig(
            vocab_size=len(self.tokenizer),
            num_hidden_layers=num_hidden_layers, hidden_size=hidden_size,
            max_position_embeddings=max(block_size, 512),
            compute_dtype=compute_dtype)
        self.block_size = block_size
        self.batch_size = batch_size
        self.max_steps = max_steps
        self.logging_steps = logging_steps
        self.save_steps = save_steps
        self.save_total_limit = save_total_limit
        self.eval_steps = eval_steps
        self.mlm_probability = mlm_probability

        self.train_blocks = load_block_dataset(
            os.path.join(data_dir, "train"), self.tokenizer, block_size)
        valid_dir = os.path.join(data_dir, "valid")
        self.valid_blocks = (load_block_dataset(valid_dir, self.tokenizer,
                                                block_size)
                             if os.path.isdir(valid_dir) else None)
        logging.info("MLM corpus: %d train blocks, %s valid blocks",
                     len(self.train_blocks),
                     len(self.valid_blocks)
                     if self.valid_blocks is not None else 0)

        params = bert_mod.init_bert_params(self.cfg, seed=seed)

        def decay_mask(p):
            def is_decay(path, _):
                name = str(path[-1])
                return not ("_b" in name or "ln" in name or "bias" in name)
            return jax.tree_util.tree_map_with_path(is_decay, p)

        def cosine_warmup(step):
            # get_cosine_schedule_with_warmup (BERT/main.py:246-248)
            step = jnp.asarray(step, jnp.float32)
            warm = step / jnp.maximum(warmup_steps, 1)
            progress = (step - warmup_steps) / jnp.maximum(
                max_steps - warmup_steps, 1)
            cos = 0.5 * (1.0 + jnp.cos(jnp.pi * progress))
            return jnp.where(step < warmup_steps, warm, jnp.maximum(cos, 0))

        self.optimizer = optax.chain(
            optax.clip_by_global_norm(max_grad_norm),
            optax.scale_by_adam(b1=0.9, b2=0.999, eps=adam_epsilon),
            optax.masked(optax.add_decayed_weights(weight_decay),
                         decay_mask(params))
            if weight_decay else optax.identity(),
            optax.scale_by_schedule(cosine_warmup),
            optax.scale(learning_rate),
            optax.scale(-1.0),
        )
        self.params = params
        self.opt_state = self.optimizer.init(params)

        # Data-parallel mesh (reference BERT/main.py:267-275 wraps the
        # model in DDP/DataParallel): params/opt replicated, block batches
        # sharded on their row axis, GSPMD all-reduces the gradients.
        self.mesh = mesh if (mesh is not None
                             and int(np.prod(mesh.devices.shape)) > 1) \
            else None
        if self.mesh is not None:
            from ..parallel import sharding as psh
            n_dev = int(np.prod(self.mesh.devices.shape))
            assert batch_size % n_dev == 0, (
                f"batch_size {batch_size} must divide the {n_dev}-device "
                f"mesh")
            self.params = psh.place_replicated(self.mesh, self.params)
            self.opt_state = psh.place_replicated(self.mesh, self.opt_state)

        self.rng = jax.random.key(seed, impl=rng_impl)
        self.step = 0
        self._build_steps()

    def _place(self, batch: np.ndarray):
        """[rows, block] batch onto the mesh (rows sharded) or device."""
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            return jax.device_put(
                jnp.asarray(batch), NamedSharding(self.mesh, P("data")))
        return jnp.asarray(batch)

    def _build_steps(self):
        cfg = self.cfg
        tok = self.tokenizer
        mlm_p = self.mlm_probability
        optimizer = self.optimizer

        def loss_fn(params, batch, rng):
            r_mask, r_drop = jax.random.split(rng)
            masked, labels = mask_tokens_jax(
                r_mask, batch, tok.mask_token_id, len(tok),
                tok.pad_token_id, mlm_p)
            return mlm_loss(params, cfg, masked, labels, r_drop, True)

        @jax.jit
        def train_step(params, opt_state, batch, rng):
            loss, grads = jax.value_and_grad(loss_fn)(params, batch, rng)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        @jax.jit
        def eval_step(params, batch, rng):
            masked, labels = mask_tokens_jax(
                rng, batch, tok.mask_token_id, len(tok),
                tok.pad_token_id, mlm_p)
            return mlm_loss(params, cfg, masked, labels, None, False)

        self._train_step = train_step
        self._eval_step = eval_step

    # ------------------------------------------------------------------
    def _rotate_checkpoints(self):
        """save_total_limit rotation (reference BERT/main.py:143-176)."""
        pat = re.compile(r"checkpoint-(\d+)$")
        dirs = []
        for d in glob.glob(os.path.join(self.output_dir, "checkpoint-*")):
            m = pat.search(d)
            if m:
                dirs.append((int(m.group(1)), d))
        dirs.sort()
        while len(dirs) > self.save_total_limit:
            _, victim = dirs.pop(0)
            logging.info("Deleting older checkpoint %s", victim)
            shutil.rmtree(victim, ignore_errors=True)

    def save(self):
        name = f"checkpoint-{self.step}"
        ckpt.save_checkpoint(self.output_dir, name,
                             {"params": self.params},
                             {"step": self.step,
                              "config": {
                                  "vocab_size": self.cfg.vocab_size,
                                  "num_hidden_layers":
                                      self.cfg.num_hidden_layers,
                                  "hidden_size": self.cfg.hidden_size}})
        self._rotate_checkpoints()

    def evaluate(self) -> float:
        if self.valid_blocks is None:
            return float("nan")
        losses = []
        rng = jax.random.PRNGKey(0)
        for i in range(0, len(self.valid_blocks) - self.batch_size + 1,
                       self.batch_size):
            batch = self._place(self.valid_blocks[i:i + self.batch_size])
            rng, r = jax.random.split(rng)
            losses.append(float(self._eval_step(self.params, batch, r)))
        return float(np.mean(losses)) if losses else float("nan")

    def train(self):
        n = len(self.train_blocks)
        order = np.random.RandomState(0).permutation(n)
        pos = 0
        t0 = time.time()
        while self.step < self.max_steps:
            if pos + self.batch_size > n:
                order = np.random.RandomState(self.step).permutation(n)
                pos = 0
            batch = self._place(self.train_blocks[order[
                pos:pos + self.batch_size]])
            pos += self.batch_size
            self.rng, r = jax.random.split(self.rng)
            self.params, self.opt_state, loss = self._train_step(
                self.params, self.opt_state, batch, r)
            self.step += 1
            if self.step % self.logging_steps == 0:
                loss_v = float(loss)
                logging.info(
                    "MLM step %d/%d loss=%.4f ppl=%.2f (%.1f blk/s)",
                    self.step, self.max_steps, loss_v,
                    float(np.exp(min(loss_v, 30))),
                    self.logging_steps * self.batch_size
                    / (time.time() - t0))
                t0 = time.time()
            if self.step % self.eval_steps == 0:
                eval_loss = self.evaluate()
                logging.info("MLM eval step %d loss=%.4f ppl=%.2f",
                             self.step, eval_loss,
                             float(np.exp(min(eval_loss, 30)))
                             if eval_loss == eval_loss else float("nan"))
            if self.step % self.save_steps == 0:
                self.save()
        self.save()
