"""YAML-backed hierarchical configuration.

Drop-in replacement for the yacs ``CfgNode`` surface used by the reference
(``model/utils/config_helper.py``, ``model/utils/config_inference.py``):
attribute access, ``merge_from_file``, ``freeze``/``defrost``, ``clone`` and a
``str()`` that round-trips through YAML.  The schemas below preserve every key
of the reference's training/inference config trees so that the shipped
experiment YAMLs (``model/training_config/*.yml``,
``model/inference_config/*.yml``) load unchanged.
"""

from __future__ import annotations

import copy
import io
from typing import Any

import yaml


class CfgNode(dict):
    """A dict with attribute access, freezing, and YAML merge support."""

    _FROZEN = "__frozen__"

    def __init__(self, init: dict | None = None):
        super().__init__()
        object.__setattr__(self, CfgNode._FROZEN, False)
        if init:
            for k, v in init.items():
                self[k] = CfgNode(v) if isinstance(v, dict) else v

    # -- attribute protocol -------------------------------------------------
    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:  # pragma: no cover - error path
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        if self.is_frozen():
            raise AttributeError(
                f"Attempted to set {name} on a frozen CfgNode")
        self[name] = value

    # -- freezing ------------------------------------------------------------
    def is_frozen(self) -> bool:
        return object.__getattribute__(self, CfgNode._FROZEN)

    def freeze(self) -> "CfgNode":
        object.__setattr__(self, CfgNode._FROZEN, True)
        for v in self.values():
            if isinstance(v, CfgNode):
                v.freeze()
        return self

    def defrost(self) -> "CfgNode":
        object.__setattr__(self, CfgNode._FROZEN, False)
        for v in self.values():
            if isinstance(v, CfgNode):
                v.defrost()
        return self

    def clone(self) -> "CfgNode":
        node = CfgNode()
        for k, v in self.items():
            node[k] = v.clone() if isinstance(v, CfgNode) else copy.deepcopy(v)
        return node

    # -- merging -------------------------------------------------------------
    def merge_from_file(self, path: str) -> None:
        with open(path, "r") as f:
            other = yaml.safe_load(f)
        if other is None:
            return
        self._merge_dict(other, [])

    def merge_from_other_cfg(self, other: "CfgNode") -> None:
        self._merge_dict(other, [])

    def merge_from_list(self, opts: list) -> None:
        assert len(opts) % 2 == 0, "override list must be key/value pairs"
        for key, value in zip(opts[0::2], opts[1::2]):
            node = self
            parts = key.split(".")
            for p in parts[:-1]:
                node = node[p]
            node._set_checked(parts[-1], value, key)

    def _merge_dict(self, other: dict, trail: list) -> None:
        for k, v in other.items():
            full = ".".join(trail + [str(k)])
            if k not in self:
                raise KeyError(f"Non-existent config key: {full}")
            if isinstance(v, dict):
                if not isinstance(self[k], CfgNode):
                    raise TypeError(f"Cannot merge dict into leaf key: {full}")
                self[k]._merge_dict(v, trail + [str(k)])
            else:
                self._set_checked(k, v, full)

    def _set_checked(self, key: str, value: Any, full: str) -> None:
        old = self[key]
        if old is not None and value is not None:
            # yacs-style light type coercion: int -> float is allowed.
            if isinstance(old, float) and isinstance(value, int):
                value = float(value)
            elif isinstance(old, bool) and not isinstance(value, bool):
                raise TypeError(f"Type mismatch for {full}: bool expected")
            elif (type(old) is not type(value)
                  and not isinstance(value, type(old))
                  and not (isinstance(old, (list, tuple))
                           and isinstance(value, (list, tuple)))):
                raise TypeError(
                    f"Type mismatch for {full}: {type(old).__name__} vs"
                    f" {type(value).__name__}")
        dict.__setitem__(self, key, value)

    # -- serialization -------------------------------------------------------
    def to_dict(self) -> dict:
        return {
            k: (v.to_dict() if isinstance(v, CfgNode) else v)
            for k, v in self.items()
        }

    def dump(self) -> str:
        buf = io.StringIO()
        yaml.safe_dump(self.to_dict(), buf, default_flow_style=None,
                       sort_keys=True)
        return buf.getvalue()

    def __str__(self) -> str:  # yacs prints YAML-compatible text
        return self.dump()

    def __repr__(self) -> str:
        return f"CfgNode({self.to_dict()!r})"


# ---------------------------------------------------------------------------
# Training schema — key-for-key with reference model/utils/config_helper.py
# ---------------------------------------------------------------------------

def _model(cfg: CfgNode) -> CfgNode:
    cfg.MODEL = CfgNode()
    cfg.MODEL.num_layers = 6
    cfg.MODEL.num_heads = 10
    cfg.MODEL.units = 500
    cfg.MODEL.inner_size = 1000
    cfg.MODEL.dropout = 0.1
    # tie_embedding=False unties the softmax weight from the token
    # embedding (separate crit_w parameter; mem_transformer.py:411-418).
    # tie_proj is a structural no-op in the reference too: projections
    # exist only when d_embed != d_model, which no config can produce
    # (mem_transformer.py:416-418).
    cfg.MODEL.tie_embedding = True
    cfg.MODEL.tie_proj = False
    cfg.MODEL.attention_dropout = 0.1
    cfg.MODEL.pre_lnorm = False
    cfg.MODEL.clamp_len = -1
    cfg.MODEL.same_length = False
    return cfg


def _train(cfg: CfgNode) -> CfgNode:
    cfg.TRAIN = CfgNode()
    cfg.TRAIN.load_from_previous = "Null"
    cfg.TRAIN.batch_size = 200
    cfg.TRAIN.batch_chunk = 1
    cfg.TRAIN.tgt_length = 500
    cfg.TRAIN.mem_length = 50
    cfg.TRAIN.seed = 1111
    cfg.TRAIN.optim = "adam"
    cfg.TRAIN.lr = 0.00025 / 4.0
    cfg.TRAIN.lr_min = 0.0
    cfg.TRAIN.scheduler = "cosine"
    cfg.TRAIN.warmup_step = 0
    cfg.TRAIN.decay_rate = 0.5
    cfg.TRAIN.patience = 10
    cfg.TRAIN.clip = 0.25
    cfg.TRAIN.max_step = 200000
    cfg.TRAIN.log_interval = 200
    cfg.TRAIN.eval_interval = 4000
    cfg.TRAIN.pad_type = "model"
    cfg.TRAIN.use_mle = True
    cfg.TRAIN.random_crop = False
    cfg.TRAIN.replace_start_with_pad = False
    cfg.TRAIN.weight_decay = 0.0
    cfg.TRAIN.append_note_status = False
    return cfg


def _discriminator(cfg: CfgNode) -> CfgNode:
    cfg.DISCRIMINATOR = CfgNode()
    cfg.DISCRIMINATOR.start_iter = 100
    cfg.DISCRIMINATOR.dis_loss_freq = 50
    cfg.DISCRIMINATOR.gen_loss_freq = 10
    # accepted for YAML parity, dead in the reference too: eval_loss_freq
    # and src_mem_len are read by no reference code path, and
    # backprop_outside only moves WHERE .backward() runs in torch
    # (train.py:987,1071 vs transformer_gan.py:487-504) — gradients are
    # identical; our per-chunk scan realizes the backprop_outside=True
    # structure exactly.
    cfg.DISCRIMINATOR.eval_loss_freq = 10
    cfg.DISCRIMINATOR.freeze_discriminator = True
    cfg.DISCRIMINATOR.truncate_backprop = False
    cfg.DISCRIMINATOR.sample_chunks_mem = 1
    cfg.DISCRIMINATOR.beta_max = 100.0
    cfg.DISCRIMINATOR.adapt = "no"
    cfg.DISCRIMINATOR.type = "Null"
    cfg.DISCRIMINATOR.dis_steps = 1
    cfg.DISCRIMINATOR.tgt_len = 64
    cfg.DISCRIMINATOR.mem_len = 64
    cfg.DISCRIMINATOR.gen_loss_factor = 30
    cfg.DISCRIMINATOR.dis_loss_factor = 1
    cfg.DISCRIMINATOR.batch_chunk = 1
    cfg.DISCRIMINATOR.context_len = 5
    cfg.DISCRIMINATOR.backprop_outside = True
    cfg.DISCRIMINATOR.src_mem_len = 200

    # gen/dis dev_perf: the reference CREATES ReduceLROnPlateau
    # schedulers from *_decay_rate/*_patience (train.py:524-531,560-567)
    # but never steps them with a metric (only the MLE scheduler steps
    # on val_nll, train.py:1329; the per-step dispatch at :1109-1133
    # skips the dev_perf branch) — so dev_perf gen/dis LRs are constant
    # in the reference, and the decay/patience keys are dead. Matched:
    # make_schedule maps dev_perf to constant for these two.
    cfg.DISCRIMINATOR.gen_scheduler = "constant"
    cfg.DISCRIMINATOR.gen_lr_min = 0.0
    cfg.DISCRIMINATOR.gen_warmup_step = 0
    cfg.DISCRIMINATOR.gen_decay_rate = 0.5
    cfg.DISCRIMINATOR.gen_patience = 10
    cfg.DISCRIMINATOR.gen_lr = 0.00025 / 4.0

    cfg.DISCRIMINATOR.dis_scheduler = "constant"
    cfg.DISCRIMINATOR.dis_lr_min = 0.0
    cfg.DISCRIMINATOR.dis_warmup_step = 0
    cfg.DISCRIMINATOR.dis_decay_rate = 0.5
    cfg.DISCRIMINATOR.dis_patience = 10
    cfg.DISCRIMINATOR.dis_lr = 0.00025 / 4.0

    cfg.DISCRIMINATOR.BERT = CfgNode()
    cfg.DISCRIMINATOR.BERT.learning_rate = 1e-5
    cfg.DISCRIMINATOR.BERT.weight_decay = 0.0
    cfg.DISCRIMINATOR.BERT.adam_epsilon = 1e-8
    # max_grad_norm: dead in the reference (dis grads clip by TRAIN.clip,
    # train.py:1002-1007). model_type only selects which HF class reads
    # the checkpoint (transformer_gan.py:535-566); our orbax checkpoints
    # are bare param trees, so the trunk load is format-independent.
    cfg.DISCRIMINATOR.BERT.max_grad_norm = 1.0
    cfg.DISCRIMINATOR.BERT.model_type = "bert_lm"
    cfg.DISCRIMINATOR.BERT.loss_type = "rsgan"
    cfg.DISCRIMINATOR.BERT.model_path = "../BERT/checkpoint-1969000"
    cfg.DISCRIMINATOR.BERT.freeze_layers = []
    cfg.DISCRIMINATOR.BERT.random_weights = False
    # Architecture: the reference sizes its BERT from the HF checkpoint
    # dir (BertConfig.from_pretrained, transformer_gan.py:537-538). Here
    # these default to the reference op-point (BERT/main.py pretrainer
    # defaults) and are overridden by the orbax checkpoint's
    # metadata.json "config" entry when model_path is loadable.
    cfg.DISCRIMINATOR.BERT.hidden_size = 768
    cfg.DISCRIMINATOR.BERT.num_hidden_layers = 5
    cfg.DISCRIMINATOR.BERT.num_attention_heads = 12
    cfg.DISCRIMINATOR.BERT.intermediate_size = 3072

    cfg.DISCRIMINATOR.CNN = CfgNode()
    cfg.DISCRIMINATOR.CNN.learning_rate = 1e-4
    cfg.DISCRIMINATOR.CNN.embed_dim = 64
    cfg.DISCRIMINATOR.CNN.hidden_dim = 64
    cfg.DISCRIMINATOR.CNN.num_rep = 64
    cfg.DISCRIMINATOR.CNN.init = "uniform"
    cfg.DISCRIMINATOR.CNN.loss_type = "rsgan"
    return cfg


def _metric(cfg: CfgNode) -> CfgNode:
    cfg.METRICS = CfgNode()
    cfg.METRICS.use_bleu = False
    cfg.METRICS.use_self_bleu = False
    # BLEU/self-BLEU generation op-point (reference train.py:785,794-803:
    # seq_len 2048, wave 625 as BLEU hyps + self-BLEU refs, wave 2500 as
    # self-BLEU hyps). 625 would trip the reference's own
    # num_samples % batch_size assert (train.py:697) — a reference bug;
    # defaults here round to the nearest batch multiples keeping the 1:4
    # wave ratio. New keys (absent from the reference schema), so
    # reference YAMLs still load unchanged.
    cfg.METRICS.gen_seq_len = 2048
    cfg.METRICS.gen_batch_size = 128
    cfg.METRICS.bleu_num_samples = 640
    cfg.METRICS.self_bleu_num_samples = 2560
    cfg.METRICS.CLASSIFIER = CfgNode()
    cfg.METRICS.CLASSIFIER.use_classifier = False
    cfg.METRICS.CLASSIFIER.gen_batch_size = 128
    cfg.METRICS.CLASSIFIER.gen_seq_len = 2048
    cfg.METRICS.CLASSIFIER.gen_num_samples = 256
    cfg.METRICS.CLASSIFIER.block_size = 128
    cfg.METRICS.CLASSIFIER.bert_batch_size = 20
    cfg.METRICS.CLASSIFIER.model_path = "../BERT/checkpoint-1969000"
    return cfg


def _init(cfg: CfgNode) -> CfgNode:
    cfg.INITIALIZER = CfgNode()
    cfg.INITIALIZER.base_init = ["normal", 0.01]
    cfg.INITIALIZER.embed_init = ["normal", 0.01]

    cfg.EVALUATE = CfgNode()
    cfg.EVALUATE.batch_size = 10
    cfg.EVALUATE.tgt_length = 128
    cfg.EVALUATE.mem_length = 128

    # event_type/trim_padding: accepted for YAML parity; no reference
    # code path reads either (performance_event_repo's event_type is an
    # unrelated note_seq field).
    cfg.DATASET = CfgNode()
    cfg.DATASET.event_type = "magenta"
    cfg.DATASET.trim_padding = False
    # TPU extension: refill the train iterator's shuffled epoch queue the
    # moment it drains instead of letting finished lanes emit pad-only
    # columns until the slowest lane ends the epoch. Default False =
    # reference drain semantics (shared next_idx counter,
    # data_utils.py:247-307). On a 200-piece corpus feeding 128 lanes the
    # drain tail costs a measured 37.5% of batch slots (PERF.md).
    cfg.DATASET.continuous_refill = False

    cfg.PPO = CfgNode()
    cfg.PPO.dis_D_lr = 0.00025 / 4.0
    cfg.PPO.dis_D_update_D0_freq = 20
    cfg.PPO.dis_D_type = "bert"
    cfg.PPO.clip_param = 0.4
    cfg.PPO.dis_D_num_rep = 1

    cfg.PROBLEM = CfgNode()
    cfg.PROBLEM.type = "Null"
    cfg.PROBLEM.melody_len = 1024  # dead in the reference (never read)
    return cfg


def _tpu(cfg: CfgNode) -> CfgNode:
    """TPU-native additions (absent from the reference schema; all optional).

    Keys the reference delegated to the runtime (precision policy, mesh
    layout, pallas toggles) live here so a single YAML drives the full stack.
    """
    cfg.TPU = CfgNode()
    cfg.TPU.compute_dtype = "bfloat16"  # matmul/activation dtype on device
    cfg.TPU.param_dtype = "float32"     # master parameter dtype
    cfg.TPU.softmax_dtype = "float32"   # attention softmax accumulation dtype
    cfg.TPU.use_pallas_attention = True
    cfg.TPU.cache_kv = True             # memory stores projected K/V
    cfg.TPU.rng_impl = "rbg"            # fast TPU PRNG for dropout/gumbel
    cfg.TPU.mesh_shape = [-1]           # data-parallel axis; -1 = all devices
    cfg.TPU.mesh_axes = ["data"]
    cfg.TPU.remat = False               # jax.checkpoint over decoder layers
    # GAN phases: vmap the micro-chunks (one sampling scan at full batch
    # width) instead of lax.scan-ing them sequentially. Numerically
    # identical (chunks are independent; per-chunk RNG keys unchanged) but
    # costs batch_chunk x the activation memory. Measured on v5e at the
    # spanbert op-point: the gen phase's backward-through-scan then needs
    # ~62 GB HBM (OOM) and the dis phase gets SLOWER (1316 vs 821 ms), so
    # the default stays off. Ignored (scan kept) for PPO, whose P0
    # snapshot chains across chunks.
    cfg.TPU.gan_parallel_chunks = False
    # GAN sampling memory implementation: "auto" (and its explicit alias
    # "chunked") resolves to the two-level chunked decode cache under
    # cache_kv (the production path) and falls back to the rolling scan
    # when cache_kv is off (the cache stores projected K/V, which only
    # exists under cache_kv); "rolling" forces the small-shape oracle
    # scan unconditionally (debug / equivalence runs).
    cfg.TPU.gan_decode_cache = "auto"
    # Fused sampling kernels in the GAN phases (ops/pallas_decode.py):
    # "auto" uses them whenever the chunked cache is active and shapes
    # qualify; "on" asserts the fused path is taken; "off" is the full
    # debug/oracle switch — it forces the sequential jnp sampling scan
    # in EVERY phase, which also bypasses the gen phase's batched
    # recompute + chain-backward machinery (orders of magnitude slower
    # at real op-points; setting chain_bwd="kernel" together with this
    # is rejected as contradictory).
    cfg.TPU.gan_fused_decode = "auto"
    # Gen-phase backward through the FULL sample chain (DISCRIMINATOR.
    # truncate_backprop False): "auto" samples forward-only, batched-
    # recomputes, and runs the chain adjoint on the fused chain-backward
    # kernel when shapes qualify (ops/pallas_chain_bwd.py), else the jnp
    # reverse scan; "jnp" forces the scan-of-VJPs oracle; "kernel"
    # asserts the residual-streaming kernel; "kernel_recompute" asserts
    # the self-recomputing kernel variant (A/B/debug); "off" keeps the
    # sequential sampling scan backward. Gradient-exact in every mode
    # (tests/test_gan_fullchain).
    cfg.TPU.gan_chain_bwd = "auto"
    cfg.TPU.donate = True
    cfg.TPU.profile_dir = ""            # jax.profiler trace dir ("" = off)
    return cfg


def get_default_cfg_training() -> CfgNode:
    """Mirror of reference ``get_default_cfg_training``
    (model/utils/config_helper.py:155-163) plus the TPU group."""
    cfg = CfgNode()
    cfg = _init(cfg)
    cfg = _model(cfg)
    cfg = _train(cfg)
    cfg = _discriminator(cfg)
    cfg = _metric(cfg)
    cfg = _tpu(cfg)
    cfg.freeze()
    return cfg


def get_default_cfg_inference() -> CfgNode:
    """Mirror of reference ``get_default_cfg_inference``
    (model/utils/config_inference.py:3-54)."""
    cfg = CfgNode()

    cfg.EVENT = CfgNode()
    cfg.EVENT.event_representation = "magenta"
    cfg.EVENT.vocab_file_path = "../data/performance_vocab.txt"

    cfg.MODEL = CfgNode()
    cfg.MODEL.model_directory = ""
    cfg.MODEL.memory_length = 100
    cfg.MODEL.src_mem_len = 100
    cfg.MODEL.checkpoint_name = "checkpoint.pt"
    cfg.MODEL.device = "tpu"
    cfg.MODEL.debug = False

    cfg.SAMPLING = CfgNode()
    cfg.SAMPLING.technique = "topk"
    cfg.SAMPLING.threshold = 32.0
    cfg.SAMPLING.temperature = 0.95

    cfg.GENERATION = CfgNode()
    cfg.GENERATION.generation_length = 100
    cfg.GENERATION.duration_based = False
    cfg.GENERATION.generation_duration = 30
    cfg.GENERATION.max_generation_length = 10000

    cfg.INPUT = CfgNode()
    cfg.INPUT.time_extension = True
    cfg.INPUT.conditional_input_melody = ""
    cfg.INPUT.num_conditional_tokens = 100
    cfg.INPUT.conditional_duration = 10
    cfg.INPUT.harmonization = ""
    cfg.INPUT.exclude_bos_token = True
    cfg.INPUT.num_midi_files = 5
    cfg.INPUT.num_empty_tokens_to_ignore = 0

    cfg.OUTPUT = CfgNode()
    cfg.OUTPUT.output_txt_directory = ""

    cfg.freeze()
    return cfg


def is_null(value: str) -> bool:
    """The reference uses the string "Null" (or "") as a stand-in for None in
    YAML configs (train.py:193-207, README.md:69)."""
    return value is None or value == "Null" or value == ""
