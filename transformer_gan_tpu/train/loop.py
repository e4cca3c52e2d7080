"""Training driver: the counterpart of reference model/train.py.

Owns work-dir/layout, seeding, iterators, the jitted step functions, the
phase schedule (MLE every step; discriminator/generator GAN phases on their
frequencies once DISCRIMINATOR.type != Null), logging (all-reduced tokens/s
line, train.py:1135-1182), evaluation (train.py:1184-1215), and
last/best/step checkpointing (train.py:1219-1272).

TPU-native differences: one process drives a whole device mesh (the
reference runs one process per GPU), steps are single fused XLA programs,
scalars cross hosts via multihost allgather instead of NCCL all_reduce.
"""

from __future__ import annotations

import logging
import math
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..config import is_null
from ..data.dataset import MusicDataset
from ..models import xl
from ..parallel import mesh as pmesh
from . import checkpoint as ckpt
from . import optim as topt
from . import step as tstep
from .losses import get_fixed_temperature


class Trainer:
    def __init__(self, cfg, data_dir: str, work_dir: str,
                 restart: bool = False, debug: bool = False,
                 save_all: bool = False, mesh=None):
        self.cfg = cfg
        self.debug = debug
        self.save_all = save_all
        self.restart = restart

        # ---- work dir (reference train.py:156-166) ----
        if not restart:
            stamp = time.strftime("%Y%m%d-%H%M%S", time.localtime())
            work_dir = os.path.join(work_dir, stamp)
        os.makedirs(work_dir, exist_ok=True)
        self.work_dir = work_dir
        if jax.process_index() == 0 and not restart:
            # config.yml snapshot — generate.py requires it later
            # (train.py:163-166, generate.py:91,114)
            with open(os.path.join(work_dir, "config.yml"), "w") as f:
                f.write(str(cfg))

        from ..utils.logging import logging_config
        logging_config(work_dir, f"train_rank{jax.process_index()}",
                       console=jax.process_index() == 0)

        # ---- devices / mesh ----
        self.mesh = (mesh if mesh is not None
                     else pmesh.make_mesh_from_cfg(cfg))
        self.n_devices = np.prod([d for d in self.mesh.devices.shape])
        self.n_processes = jax.process_count()
        self.process_index = jax.process_index()

        # ---- data (reference train.py:218-269) ----
        seed = cfg.TRAIN.seed
        np.random.seed(seed)
        self.dataset = MusicDataset(data_dir, cfg)
        self.vocab = self.dataset.vocab
        local_seed = seed + self.process_index * 1000

        assert cfg.TRAIN.batch_size % self.n_processes == 0
        self.batch_size = cfg.TRAIN.batch_size // self.n_processes
        assert self.batch_size % cfg.TRAIN.batch_chunk == 0
        self.bsz_chunk = self.batch_size // cfg.TRAIN.batch_chunk

        self.train_iter = self.dataset.get_iterator(
            self.batch_size, cfg.TRAIN.tgt_length, split="train",
            do_shuffle=True, seed=local_seed)
        self.val_iter = self.dataset.eval_iterator(
            cfg.EVALUATE.batch_size, cfg.EVALUATE.tgt_length, split="valid",
            local_rank=self.process_index, world_size=self.n_processes)
        self.test_iter = self.dataset.eval_iterator(
            cfg.EVALUATE.batch_size, cfg.EVALUATE.tgt_length, split="test",
            local_rank=self.process_index, world_size=self.n_processes)

        self.has_gan = not is_null(cfg.DISCRIMINATOR.type)
        if self.has_gan:
            self.dis_iter = self.dataset.get_dis_iterator(
                self.batch_size, cfg.DISCRIMINATOR.tgt_len, split="train",
                do_shuffle=True, seed=local_seed)
        else:
            self.dis_iter = None
            if cfg.DISCRIMINATOR.start_iter < cfg.TRAIN.max_step:
                raise ValueError(
                    "DISCRIMINATOR.start_iter < max_step but no "
                    "discriminator configured (reference train.py:204-207)")

        # ---- model / optimizer (reference train.py:366-459) ----
        self.xcfg = xl.XLConfig.from_cfg(cfg, len(self.vocab),
                                         self.vocab.vec_len)
        params = xl.init_xl_params(
            self.xcfg, seed=seed,
            base_init=tuple(cfg.INITIALIZER.base_init),
            embed_init=tuple(cfg.INITIALIZER.embed_init))

        # reference: per-rank lr = global lr / num_gpus (train.py:392)
        self.local_lr = cfg.TRAIN.lr / max(1, int(self.n_devices))
        schedule = topt.make_schedule(
            cfg.TRAIN.scheduler, cfg.TRAIN.lr, cfg.TRAIN.max_step,
            cfg.TRAIN.lr_min, cfg.TRAIN.warmup_step)
        self.schedule = schedule
        self.optimizer = topt.make_optimizer(
            cfg.TRAIN.optim, self.local_lr, schedule, cfg.TRAIN.clip,
            cfg.TRAIN.weight_decay)
        self.plateau = topt.PlateauTracker(
            cfg.TRAIN.decay_rate, cfg.TRAIN.patience, cfg.TRAIN.lr_min,
            cfg.TRAIN.lr) if cfg.TRAIN.scheduler == "dev_perf" else None

        self.state = tstep.init_train_state(
            params, self.optimizer, self.xcfg, cfg.TRAIN.batch_chunk,
            cfg.TRAIN.mem_length, self.bsz_chunk, seed,
            rng_impl=cfg.TPU.rng_impl)

        # warm start from a previous run's generator (train.py:591-609)
        if not is_null(cfg.TRAIN.load_from_previous) and not restart:
            logging.info("Warm starting generator from %s",
                         cfg.TRAIN.load_from_previous)
            params = ckpt.load_generator_params(
                cfg.TRAIN.load_from_previous, self.state.params)
            self.state = self.state._replace(params=params)

        # place state/batches on the data mesh (GSPMD shards the batch
        # axis; params replicate; gradient all-reduce is implicit)
        self.multi_device = int(self.n_devices) > 1
        if self.multi_device:
            assert self.bsz_chunk % int(self.n_devices) == 0, (
                f"micro-batch rows ({self.bsz_chunk} = batch_size "
                f"{cfg.TRAIN.batch_size} / processes {self.n_processes} / "
                f"batch_chunk {cfg.TRAIN.batch_chunk}) must divide the "
                f"{int(self.n_devices)}-device mesh")
            from ..parallel import sharding as psh
            self.state = psh.place_train_state(self.state, self.mesh)
            self._place_batch = lambda d, t, r: psh.place_batch(
                self.mesh, d, t, r)
        else:
            self._place_batch = lambda d, t, r: (
                jnp.asarray(d), jnp.asarray(t), jnp.asarray(r))

        self.train_step_fn = tstep.make_mle_train_step(
            self.xcfg, self.optimizer, cfg.TRAIN.batch_chunk,
            self.vocab.pad_id, use_mle=cfg.TRAIN.use_mle,
            remat=cfg.TPU.remat, donate=cfg.TPU.donate,
            same_length=cfg.MODEL.same_length)
        self.eval_step_fn = tstep.make_eval_step(self.xcfg,
                                                 self.vocab.pad_id)

        # ---- quality metrics (reference train.py:276-282) ----
        from ..metrics.bleu import BLEU
        from ..metrics.classifier import Classifier
        self.bleu = BLEU("BLEU", gram=[2, 3, 4, 5],
                         if_use=cfg.METRICS.use_bleu)
        self.self_bleu = BLEU("Self-BLEU", gram=[2, 3, 4],
                              if_use=cfg.METRICS.use_self_bleu)
        self.classifier = Classifier(
            "Classifier", if_use=cfg.METRICS.CLASSIFIER.use_classifier,
            seq_len=cfg.METRICS.CLASSIFIER.block_size,
            batch_size=cfg.METRICS.CLASSIFIER.bert_batch_size,
            model_name_or_path=cfg.METRICS.CLASSIFIER.model_path)

        # independent-stream counter for the metric generation waves
        # (see _generate_tokens)
        self._gen_wave = 0

        self.gan = None
        if self.has_gan:
            from .gan_loop import GanPhases
            self.gan = GanPhases(self, cfg)

        self.train_step_num = 0
        self.best_val_nll = np.inf

        # ---- restart (reference train.py:614-646) ----
        if restart:
            self._restore_last()

        n_params = xl.count_params(self.state.params)
        logging.info("=" * 100)
        logging.info("#total generator params = %d", n_params)
        logging.info("work_dir = %s, devices = %s, processes = %d",
                     self.work_dir, int(self.n_devices), self.n_processes)

    # ------------------------------------------------------------------
    def _ckpt_payload(self):
        payload = {
            "params": self.state.params,
            "opt_state": self.state.opt_state,
        }
        if self.gan is not None:
            payload.update(self.gan.ckpt_payload())
        return payload

    def _save(self, name: str, val_nll: float):
        meta = {
            "train_step": int(self.train_step_num),
            "best_val_loss": float(val_nll),
            "vocab": self.vocab.all_tokens,
        }
        path = ckpt.save_checkpoint(self.work_dir, name,
                                    self._ckpt_payload(), meta)
        logging.info("Saved checkpoint to %s", path)

    def _restore_last(self):
        path = os.path.join(self.work_dir, "checkpoint_last")
        logging.info("Restarting from %s", path)
        payload = ckpt.load_checkpoint(path, self._ckpt_payload())
        meta = ckpt.load_metadata(path)
        self.state = self.state._replace(
            params=payload["params"], opt_state=payload["opt_state"])
        if self.gan is not None:
            self.gan.restore(payload)
        self.train_step_num = int(meta.get("train_step", 0))
        self.best_val_nll = float(meta.get("best_val_loss", np.inf))
        # fast-forward the schedule counter
        self.state = self.state._replace(
            step=jnp.asarray(self.train_step_num, jnp.int32))

    # ------------------------------------------------------------------
    def evaluate(self, eval_iter, mode: str = "eval"):
        """Masked-NLL evaluation over rank-sharded piece windows
        (reference evaluate(), train.py:747-829). On a local mesh the
        batch axis of every eval window (and of the XL memory) is sharded
        so eval parallelizes over devices instead of serializing on one."""
        cfg = self.cfg
        # accumulate on device, fetch once after the loop (a per-batch
        # float() costs a full dispatch+fetch round trip on the
        # tunnel-backed TPU runtime and serializes batch dispatch).
        # The NLL total uses Kahan compensation: a long eval sums many
        # ~1e4-sized per-batch nll_sums into one fp32 scalar, and the
        # reference accumulated in host float64 (train.py:766-779); the
        # compensated fp32 pair keeps the total's error at the one-ulp
        # level without a per-batch host fetch. Token counts stay int32:
        # 2^31 tokens per eval pass is far beyond any real split here.
        total_token_num = jnp.zeros((), jnp.int32)
        total_nll = jnp.zeros((), jnp.float32)
        nll_comp = jnp.zeros((), jnp.float32)  # Kahan compensation term
        mems = xl.init_mems(self.xcfg, cfg.EVALUATE.mem_length,
                            cfg.EVALUATE.batch_size)
        shard_eval = (self.multi_device
                      and cfg.EVALUATE.batch_size % self.n_devices == 0)
        if shard_eval:
            from ..parallel import sharding as psh
            mems = psh.place_eval_mems(self.mesh, mems)
        for (data, target, reset_all, batch_token_num,
             status_vec) in eval_iter():
            if reset_all:
                mems = tstep.reset_eval_mems(mems)
            if shard_eval:
                data, target, sv = psh.place_eval_batch(
                    self.mesh, data, target, status_vec)
            else:
                data, target = jnp.asarray(data), jnp.asarray(target)
                sv = (jnp.asarray(status_vec) if status_vec is not None
                      else None)
            nll_sum, cnt, mems = self.eval_step_fn(
                self.state.params, data, target, mems, sv)
            y = nll_sum - nll_comp
            t = total_nll + y
            nll_comp = (t - total_nll) - y
            total_nll = t
            total_token_num = total_token_num + cnt

        results = self._generation_metrics(mode)
        return int(total_token_num), float(total_nll), results

    def _generate_tokens(self, num_samples, temperature, batch_size=128,
                         seq_len=2048):
        """Argmax-gumbel sampling for the quality metrics (reference
        generate_tokens, train.py:694-744): tgt_len=1 incremental decode
        with mem_len=seq_len, starting from <S>."""
        from ..infer.sample import generate_tokens_gumbel
        from ..ops import pallas_generate as pgen
        from ..infer.sample import DECODE_CHUNK, SamplingConfig
        # wave-size selection (tools/metrics_gen_tpu.py, real chip):
        # fused waves beat one wide jnp dispatch — at mem=seq=512, 16
        # fused lanes sustain 79.1k tok/s aggregate vs 37.9k for a
        # 128-lane jnp wave. The fused kernel's VMEM gate shrinks the
        # feasible wave as seq_len grows (16 lanes fit at 512; only <=4
        # at the reference op-point 2048), so probe descending widths
        # and take the widest supported one.
        scfg_g = SamplingConfig(technique="gumbel", temperature=1.0,
                                exclude_bos=False, num_empty_to_ignore=0)
        C = min(DECODE_CHUNK, seq_len - 1, seq_len)
        for wave in (16, 8, 4):
            if (batch_size > wave and num_samples % wave == 0
                    and pgen.supports_fused_generate(self.xcfg, scfg_g,
                                                     wave, seq_len, C)):
                batch_size = wave
                break
        assert num_samples % batch_size == 0
        out = []
        # the configured fast TPU PRNG (TPU.rng_impl): the gumbel draws
        # are [seq_len, bsz, V] uniforms per wave — threefry here cost
        # ~250s/eval across the three metric generations on the chip vs
        # 8.5s total with rbg + wave 16 (tools/eval_breakdown_tpu.py)
        #
        # Each call consumes an INDEPENDENT stream: the reference draws
        # its two self-BLEU sample sets from torch's advancing global RNG
        # (train.py:794-803), so the hypothesis and reference waves are
        # decorrelated — seeding from train_step_num alone made every
        # wave in one eval identical and self-BLEU degenerate (== 1.0,
        # round-4 verdict). The monotonically increasing wave counter
        # keeps the draw reproducible per (step, call-index).
        rng = jax.random.key(1234 + self.train_step_num,
                             impl=self.cfg.TPU.rng_impl)
        rng = jax.random.fold_in(rng, self._gen_wave)
        self._gen_wave += 1
        # enqueue every wave before fetching: a per-wave host fetch
        # serializes the waves on the tunnel runtime, and at the 2048
        # op-point an eval runs hundreds of narrow fused waves
        # (640+2560+256 samples / wave 4)
        for _ in range(num_samples // batch_size):
            rng, r = jax.random.split(rng)
            mems = xl.init_mems(self.xcfg, seq_len, batch_size)
            first = jnp.zeros((batch_size,), jnp.int32)
            out.append(generate_tokens_gumbel(
                self.state.params, self.xcfg, float(temperature), seq_len,
                first, mems, r))
        return np.concatenate(
            [np.asarray(t).T for t in jax.device_get(out)], axis=0)

    def _generation_metrics(self, mode):
        """BLEU / self-BLEU / classifier accuracy on generated samples
        (reference evaluate(), train.py:781-819).

        Op-point mirrors the reference: 2048-token samples, a first wave
        used both as BLEU hypotheses and self-BLEU references, and a 4x
        larger second wave as self-BLEU hypotheses (625/2500 at
        train.py:794-803,785). The reference's literal 625 would trip its
        own ``assert num_samples % batch_size == 0`` (train.py:697 with
        batch_size 128) — the shipped defaults round both waves up to the
        nearest multiple of the wave width (640/2560), keeping the 1:4
        ratio. All four knobs are config (METRICS.gen_seq_len /
        gen_batch_size / bleu_num_samples / self_bleu_num_samples)."""
        cfg = self.cfg
        temperature = self.gan.temperature if self.gan is not None else 1.0
        n1 = cfg.METRICS.bleu_num_samples
        n2 = cfg.METRICS.self_bleu_num_samples
        bsz = cfg.METRICS.gen_batch_size
        slen = cfg.METRICS.gen_seq_len
        gen_tokens = None
        if cfg.METRICS.use_bleu:
            gen_tokens = self._generate_tokens(n1, temperature,
                                               batch_size=bsz,
                                               seq_len=slen).tolist()
            corpus = (self.dataset.valid_data if mode == "eval"
                      else self.dataset.test_data)
            self.bleu.reset(test_text=gen_tokens,
                            real_text=[x.tolist() for x in corpus])
        if cfg.METRICS.use_self_bleu and mode == "eval":
            if gen_tokens is None:
                gen_tokens = self._generate_tokens(n1, temperature,
                                                   batch_size=bsz,
                                                   seq_len=slen).tolist()
            gen_tokens_s = self._generate_tokens(n2, temperature,
                                                 batch_size=bsz,
                                                 seq_len=slen).tolist()
            self.self_bleu.reset(test_text=gen_tokens_s,
                                 real_text=gen_tokens)
        if cfg.METRICS.CLASSIFIER.use_classifier and mode == "eval":
            m = cfg.METRICS.CLASSIFIER
            gen = self._generate_tokens(m.gen_num_samples, temperature,
                                        batch_size=m.gen_batch_size,
                                        seq_len=m.gen_seq_len)
            self.classifier.reset(test_text=list(gen),
                                  real_text=self.dataset.valid_data)
        if mode == "eval":
            return [self.bleu.get_score(), self.self_bleu.get_score(),
                    self.classifier.get_score()]
        return [self.bleu.get_score()]

    def _all_reduce_eval(self, token_num, nll):
        reduced = pmesh.host_allreduce_sum(
            np.asarray([token_num, nll / 1e4], np.float64))
        return float(reduced[0]), float(reduced[1]) * 1e4

    # ------------------------------------------------------------------
    def train(self):
        cfg = self.cfg
        log_interval = cfg.TRAIN.log_interval
        eval_interval = cfg.TRAIN.eval_interval

        # Per-step scalar metrics accumulate ON DEVICE and are fetched
        # once per log interval: a host fetch per step (float()) would
        # force a ~33ms dispatch+fetch round trip on the tunnel-backed
        # TPU runtime and serialize the step dispatches.
        log_acc = None
        log_start = time.time()

        train_stream = self.train_iter()
        logging.info("Start training")

        # jax.profiler trace capture (reference had only commented-out
        # TensorBoard wiring, train.py:54-60; SURVEY 5.1 asks for this)
        profile_dir = cfg.TPU.profile_dir
        profile_start, profile_stop = 10, 15

        for (data, target, reset_mems, batch_token_num,
             status_vec) in train_stream:
            # temperature annealing (reference train.py:862-868)
            if self.gan is not None:
                beta = get_fixed_temperature(
                    cfg.DISCRIMINATOR.beta_max, self.train_step_num,
                    cfg.TRAIN.max_step, cfg.DISCRIMINATOR.adapt)
                self.gan.temperature = 1.0 / beta

            bc = cfg.TRAIN.batch_chunk
            batch = self._place_batch(
                tstep.chunk_batch(data, bc),
                tstep.chunk_batch(target, bc),
                tstep.chunk_rows(reset_mems, bc))
            if status_vec is not None:
                # [tgt, bsz, 88] -> [C, tgt, bsz_c, 88]
                sv = status_vec.reshape(
                    status_vec.shape[0], bc, -1, status_vec.shape[2]
                ).swapaxes(0, 1)
                self.state, metrics = self.train_step_fn(
                    self.state, *batch, jnp.asarray(sv))
            else:
                self.state, metrics = self.train_step_fn(
                    self.state, *batch)

            # GAN phases (reference train.py:924-1090)
            if (self.gan is not None
                    and self.train_step_num > cfg.DISCRIMINATOR.start_iter):
                if self.train_step_num % cfg.DISCRIMINATOR.dis_loss_freq == 0:
                    self.gan.dis_phase(self.train_step_num)
                if self.train_step_num % cfg.DISCRIMINATOR.gen_loss_freq == 0:
                    self.gan.gen_phase(self.train_step_num)

            self.train_step_num += 1
            if profile_dir and self.train_step_num == profile_start:
                jax.profiler.start_trace(profile_dir)
                logging.info("profiler trace started -> %s", profile_dir)
            if profile_dir and self.train_step_num == profile_stop:
                jax.profiler.stop_trace()
                logging.info("profiler trace saved -> %s", profile_dir)
                profile_dir = ""
            keep = {k: metrics[k] for k in
                    ("loss_weighted", "tokens", "grad_norm")}
            log_acc = keep if log_acc is None else jax.tree.map(
                jnp.add, log_acc, keep)

            if self.train_step_num % log_interval == 0:
                fetched = jax.device_get(log_acc)
                log_acc = None
                log_loss_w = float(fetched["loss_weighted"])
                log_tokens = int(fetched["tokens"])
                log_grad_norm = float(fetched["grad_norm"])
                reduced = pmesh.host_allreduce_sum(np.asarray(
                    [log_loss_w, log_tokens, log_grad_norm], np.float64))
                r_loss, r_tokens, r_gnorm = reduced
                nll = r_loss / max(r_tokens, 1.0)
                elapsed = time.time() - log_start
                lr_mult = float(self.schedule(self.train_step_num))
                gan_stats = (self.gan.pop_log_stats()
                             if self.gan is not None else (0.0, 0.0))
                if self.process_index == 0:
                    logging.info(
                        "Train Step %d/%d, lr=%f, tokens/s=%.1f, nll=%.4f,"
                        " ppl=%.2f, grad norm=%.4f, gen_loss=%5.4f,"
                        " dis_loss=%5.4f",
                        self.train_step_num, cfg.TRAIN.max_step,
                        self.local_lr * lr_mult,
                        r_tokens / elapsed, nll,
                        math.exp(min(nll, 50.0)),
                        r_gnorm / (log_interval * max(1, self.n_devices)),
                        gan_stats[0], gan_stats[1])
                log_start = time.time()

            if self.train_step_num % eval_interval == 0:
                self._eval_and_checkpoint()

            if self.train_step_num >= cfg.TRAIN.max_step:
                logging.info("-" * 100)
                logging.info("End of training")
                break

    # ------------------------------------------------------------------
    def final_best_eval(self) -> float:
        """Post-training best-checkpoint test evaluation (reference
        train.py:1337-1371): reload checkpoint_best's generator and run
        the test eval, logging the end-of-training line the paper's
        tables are built from. The reference rebuilds the model with
        DISCRIMINATOR=Null and same_length=True; here neither needs a
        rebuild — the masked-NLL eval never touches the discriminator,
        and make_eval_step always applies the same_length banded mask."""
        best = os.path.join(self.work_dir, "checkpoint_best")
        if os.path.isdir(best):
            payload = ckpt.load_checkpoint(best, self._ckpt_payload())
            params = payload["params"]
            if self.multi_device:
                # normalize placement: restore follows the template's
                # leaf placements, which the caller may have perturbed
                params = jax.device_put(
                    params, jax.sharding.NamedSharding(
                        self.mesh, jax.sharding.PartitionSpec()))
            self.state = self.state._replace(params=params)
        else:
            # debug runs write no checkpoints (reference would crash on
            # the missing file); fall back to the live weights
            logging.warning(
                "checkpoint_best not found under %s; final test eval uses "
                "the current (last-step) weights", self.work_dir)
        tok, nll, _ = self.evaluate(self.test_iter, mode="test")
        tok, nll = self._all_reduce_eval(tok, nll)
        test_nll = nll / max(tok, 1.0)
        if self.process_index == 0:
            logging.info("=" * 100)
            logging.info(
                "| End of training | test nll %5.2f | test ppl %9.3f",
                test_nll, math.exp(min(test_nll, 50.0)))
            logging.info("=" * 100)
        return test_nll

    # ------------------------------------------------------------------
    def _eval_and_checkpoint(self):
        cfg = self.cfg
        eval_start = time.time()
        tok, nll, val_metrics = self.evaluate(self.val_iter, mode="eval")
        tok, nll = self._all_reduce_eval(tok, nll)
        val_nll = nll / max(tok, 1.0)
        if self.process_index == 0:
            logging.info(
                "Eval step %d, time=%.1fs, val nll=%.5f, val ppl=%.3f,"
                " #evaluated tokens=%d, bleu=%s, self_bleu=%s,"
                " class_acc=%s", self.train_step_num,
                time.time() - eval_start, val_nll,
                math.exp(min(val_nll, 50.0)), int(tok),
                val_metrics[0], val_metrics[1], val_metrics[2])

        if not self.debug and self.save_all:
            self._save(f"checkpoint_{self.train_step_num}", val_nll)
        if not self.debug and not self.save_all:
            self._save("checkpoint_last", val_nll)

        if val_nll < self.best_val_nll:
            self.best_val_nll = val_nll
            if not self.debug:
                self._save("checkpoint_best", self.best_val_nll)
            test_start = time.time()
            ttok, tnll, test_metrics = self.evaluate(self.test_iter, mode="test")
            ttok, tnll = self._all_reduce_eval(ttok, tnll)
            test_nll = tnll / max(ttok, 1.0)
            if self.process_index == 0:
                logging.info(
                    "Test step %d, time=%.1fs, test nll=%.5f,"
                    " test ppl=%.3f, #evaluated tokens=%d, test_bleu=%s",
                    self.train_step_num, time.time() - test_start,
                    test_nll, math.exp(min(test_nll, 50.0)), int(ttok),
                    test_metrics[0])

        if self.plateau is not None:
            mult = self.plateau.step(val_nll)
            self.state = self.state._replace(
                opt_state=topt.set_lr_multiplier(self.state.opt_state, mult))
