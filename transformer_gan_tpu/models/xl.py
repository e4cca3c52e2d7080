"""Transformer-XL language model as pure functions over a parameter pytree.

TPU-native counterpart of the reference ``MemTransformerLM``
(model/mem_transformer.py:344-670): relative-position attention with
segment-level recurrence memory, tied embedding/softmax, and three heads
(per-token NLL, logits for incremental decoding, straight-through
Gumbel-softmax sampling).

Design departures from the reference, for XLA:

* **Static-shape memory.** The reference grows ``mems`` from empty and
  mutates ``tgt_len``/``mem_len`` at runtime (mem_transformer.py:432-482).
  Here memory is a fixed ring buffer ``[n_layer+1, mem_len, bsz, d]`` plus a
  valid-count scalar; invalid slots sit on the left and are masked. Because
  valid slots always occupy the buffer tail, a key at static index ``j`` is
  at relative distance ``mem_len + i - j`` from query ``i`` regardless of
  fill count, so a single compiled program covers the whole growing phase
  and matches the dynamic reference exactly (masked softmax equivalence).
* Functional RNG (dropout/gumbel take explicit keys), explicit
  ``same_length``/``train`` switches instead of module mutation.
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .attention import layer_norm, rel_attention


@dataclasses.dataclass(frozen=True)
class XLConfig:
    """Static model hyperparameters (hashable; safe as a jit static arg)."""

    n_token: int = 310
    n_layer: int = 6
    n_head: int = 10
    d_model: int = 500
    d_inner: int = 1000
    dropout: float = 0.1
    dropatt: float = 0.1
    pre_lnorm: bool = False
    clamp_len: int = -1
    # MODEL.tie_embedding: share the softmax weight with the token
    # embedding (reference mem_transformer.py:411-418). Untied adds a
    # separate "crit_w" parameter (out_layers[0].weight).
    tie_embedding: bool = True
    append_note_status: bool = False
    vec_len: int = 0
    compute_dtype: str = "float32"
    softmax_dtype: str = "float32"
    cache_kv: bool = False  # memory holds projected K/V instead of hiddens
    use_pallas: bool = False  # fused attention kernel (needs cache_kv)

    @property
    def d_head(self) -> int:
        return self.d_model // self.n_head

    @property
    def cdtype(self):
        return jnp.dtype(self.compute_dtype)

    @property
    def sdtype(self):
        return jnp.dtype(self.softmax_dtype)

    @classmethod
    def from_cfg(cls, cfg, n_token: int, vec_len: int = 0) -> "XLConfig":
        pd = str(getattr(cfg.TPU, "param_dtype", "float32"))
        if pd != "float32":
            # master params are fp32 by design (the fused optimizer's
            # raveled [P] state and the checkpoint schema assume it);
            # fail loud instead of silently ignoring the key
            raise NotImplementedError(
                f"TPU.param_dtype={pd!r}: only float32 master parameters "
                "are implemented (compute dtype is TPU.compute_dtype)")
        return cls(
            n_token=n_token,
            n_layer=cfg.MODEL.num_layers,
            n_head=cfg.MODEL.num_heads,
            d_model=cfg.MODEL.units,
            d_inner=cfg.MODEL.inner_size,
            dropout=cfg.MODEL.dropout,
            dropatt=cfg.MODEL.attention_dropout,
            pre_lnorm=cfg.MODEL.pre_lnorm,
            clamp_len=cfg.MODEL.clamp_len,
            tie_embedding=cfg.MODEL.tie_embedding,
            append_note_status=cfg.TRAIN.append_note_status,
            vec_len=vec_len,
            compute_dtype=cfg.TPU.compute_dtype,
            softmax_dtype=cfg.TPU.softmax_dtype,
            cache_kv=cfg.TPU.cache_kv,
            # the fused kernel is TPU-only; CPU (tests, dryruns) falls back
            use_pallas=(cfg.TPU.use_pallas_attention and cfg.TPU.cache_kv
                        and jax.default_backend() == "tpu"),
        )


class XLMems(NamedTuple):
    """Segment-recurrence state: ring buffer + number of valid tail slots.

    hids layout depends on XLConfig.cache_kv:
      False: [n_layer+1, mem_len, bsz, d_model]  (reference semantics:
             raw hidden states, QKV recomputed over them each step)
      True:  [n_layer, 2, n_head, bsz, mem_len, d_head]  (projected K/V,
             h-major so the fused kernels read per-(h, b) memory blocks
             directly; mathematically identical to the raw path, ~9x less
             memory-side QKV compute at train shapes)
    """

    hids: jnp.ndarray
    count: jnp.ndarray  # int32 scalar


def init_mems(cfg: XLConfig, mem_len: int, bsz: int,
              dtype=None) -> XLMems:
    """Empty memory (reference init_mems, mem_transformer.py:436-443)."""
    dtype = dtype or cfg.cdtype
    if cfg.cache_kv:
        # h-major [L, 2, h, b, M, dh]: the Pallas kernels read per-(h, b)
        # memory blocks straight from this layout (no transpose/concat)
        buf = jnp.zeros((cfg.n_layer, 2, cfg.n_head, bsz, mem_len,
                         cfg.d_head), dtype=dtype)
    else:
        buf = jnp.zeros((cfg.n_layer + 1, mem_len, bsz, cfg.d_model),
                        dtype=dtype)
    return XLMems(hids=buf, count=jnp.zeros((), dtype=jnp.int32))


# ---------------------------------------------------------------------------
# Parameters
# ---------------------------------------------------------------------------

def init_xl_params(cfg: XLConfig, seed: int = 0,
                   base_init=("normal", 0.01),
                   embed_init=("normal", 0.01)) -> dict:
    """Initialization mirroring reference weights_init (train.py:291-350)
    with the INITIALIZER config surface honored:

    * ``base_init`` = ("normal", std) | ("uniform", range) dispatches
      init_weight (train.py:291-297) over every Linear weight, the token
      embedding (the reference's nn.Embedding hits the generic
      "Embedding" classname branch -> init_weight, :325-327), and
      r_w_bias/r_r_bias (:341-347).
    * Biases are 0 (:308-309); LayerNorm weight ~ N(1, base_init[1])
      unconditionally — the reference's LayerNorm branch draws normal
      around 1.0 with std = base_init[1] even when base_init[0] is
      "uniform" (:337-340); replicated as-is.
    * ``embed_init`` (train.py:299-305) only ever reaches
      AdaptiveEmbedding.emb_projs / out_projs, which exist only when
      d_proj != d_embed — never true here (single-cutoff, d_proj ==
      d_embed == d_model); accepted and validated for config parity, a
      structural no-op at these shapes.
    """
    for name, (kind, _) in (("base_init", tuple(base_init)),
                            ("embed_init", tuple(embed_init))):
        if kind not in ("normal", "uniform"):
            raise ValueError(f"INITIALIZER.{name}[0] must be 'normal' or "
                             f"'uniform', got {kind!r}")
    rng = np.random.RandomState(seed)
    init_kind, init_scale = base_init[0], float(base_init[1])

    def weight(shape):
        """init_weight dispatch (train.py:291-297)."""
        if init_kind == "uniform":
            return jnp.asarray(
                rng.uniform(-init_scale, init_scale, size=shape),
                dtype=jnp.float32)
        return jnp.asarray(
            rng.normal(0.0, init_scale, size=shape), dtype=jnp.float32)

    def normal(shape, mean=0.0):
        return jnp.asarray(
            rng.normal(mean, init_scale, size=shape), dtype=jnp.float32)

    def zeros(shape):
        return jnp.zeros(shape, dtype=jnp.float32)

    d, h, dh, di = cfg.d_model, cfg.n_head, cfg.d_head, cfg.d_inner
    params: dict[str, Any] = {
        "word_emb": weight((cfg.n_token, d)),
        "crit_bias": zeros((cfg.n_token,)),
        # MODEL.tie_embedding=False: a separate softmax weight
        # (reference out_layers[0] nn.Linear, initialized through the
        # same Linear init_weight branch, train.py:306-315)
        **({} if cfg.tie_embedding else {"crit_w": weight((cfg.n_token,
                                                           d))}),
        "r_w_bias": weight((h, dh)),
        "r_r_bias": weight((h, dh)),
        "layers": [],
    }
    if cfg.append_note_status:
        params["status_emb"] = weight((cfg.vec_len, d))
    for _ in range(cfg.n_layer):
        params["layers"].append({
            "qkv_w": weight((d, 3 * h * dh)),
            "r_w": weight((d, h * dh)),
            "o_w": weight((h * dh, d)),
            "attn_ln_scale": normal((d,), mean=1.0),
            "attn_ln_bias": zeros((d,)),
            "ff_w1": weight((d, di)),
            "ff_b1": zeros((di,)),
            "ff_w2": weight((di, d)),
            "ff_b2": zeros((d,)),
            "ff_ln_scale": normal((d,), mean=1.0),
            "ff_ln_bias": zeros((d,)),
        })
    return params


def count_params(params) -> int:
    return sum(int(np.prod(x.shape))
               for x in jax.tree_util.tree_leaves(params))


# ---------------------------------------------------------------------------
# Building blocks
# ---------------------------------------------------------------------------

def _dropout(rng, x, rate, train):
    if not train or rate <= 0.0:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), jnp.zeros_like(x))


def positional_embedding(cfg: XLConfig, klen: int) -> jnp.ndarray:
    """Sinusoidal embedding of relative distances klen-1 .. 0
    (reference mem_transformer.py:7-23,550-555)."""
    pos_seq = jnp.arange(klen - 1, -1, -1.0, dtype=jnp.float32)
    if cfg.clamp_len > 0:
        pos_seq = jnp.clip(pos_seq, a_max=float(cfg.clamp_len))
    inv_freq = 1.0 / (10000.0 ** (
        jnp.arange(0.0, cfg.d_model, 2.0, dtype=jnp.float32) / cfg.d_model))
    sinusoid = jnp.outer(pos_seq, inv_freq)
    return jnp.concatenate([jnp.sin(sinusoid), jnp.cos(sinusoid)], axis=-1)


def embed_input(params, cfg: XLConfig, inp, status_vec=None) -> jnp.ndarray:
    """Token embedding accepting int ids [q,b] or soft one-hots [q,b,V]
    (the soft path carries Gumbel-softmax gradients; reference
    mem_transformer.py:319-341)."""
    emb_w = params["word_emb"].astype(cfg.cdtype)
    if inp.ndim == 2:
        embed = emb_w[inp]
    else:
        embed = inp.astype(cfg.cdtype) @ emb_w
    if cfg.append_note_status and status_vec is not None:
        embed = embed + status_vec.astype(cfg.cdtype) @ params[
            "status_emb"].astype(cfg.cdtype)
    return embed * (cfg.d_model ** 0.5)


def build_attn_mask(qlen: int, mem_len: int, count, reset_mems,
                    same_length: bool, bsz: int) -> jnp.ndarray:
    """True = masked. [rows, qlen, mem_len+qlen] with rows = bsz if
    ``reset_mems`` given else 1.

    Reproduces the reference mask construction (mem_transformer.py:495-547)
    in the static-buffer index space: causal band, invalid left slots, the
    ``same_length`` constant-history band, and per-row full-memory masking
    for reset rows (pad_type == "model")."""
    klen = mem_len + qlen
    i = jnp.arange(qlen)[:, None]
    j = jnp.arange(klen)[None, :]

    causal = j > (mem_len + i)
    invalid = j < (mem_len - count)
    mask = causal | invalid

    if same_length:
        # Dynamic-space band: masked where j_dyn <= i - mask_shift_len.
        j_dyn = j - (mem_len - count)
        mask_len = count + qlen - mem_len
        mask_shift_len = jnp.where(mask_len > 0, qlen - mask_len, qlen)
        mask = mask | (j_dyn <= (i - mask_shift_len))

    mask = mask[None, :, :]
    if reset_mems is not None:
        row_reset = reset_mems[:, None, None] & (j < mem_len)[None, :, :]
        mask = mask | row_reset
    else:
        mask = jnp.broadcast_to(mask, (1, qlen, klen))
    return mask


def decoder_layer(layer, cfg: XLConfig, core_out, mems_i, pos_emb,
                  r_w_bias, r_r_bias, attn_mask, rng, train,
                  attn_count=None, reset_mems=None, same_length=False):
    """One RelPartialLearnableDecoderLayer (attention + position-wise FF;
    reference mem_transformer.py:261-281)."""
    r_att, r_o, r_f1, r_f2 = (jax.random.split(rng, 4) if train
                              else (None,) * 4)
    kv_cur = None
    use_fused = (cfg.cache_kv and cfg.use_pallas
                 and core_out.shape[0] >= 8)
    if use_fused:
        from ..ops import pallas_attention_v2 as _v2
        if _v2.supports_v2(core_out.shape[0], mems_i.shape[-2],
                           interpret=_v2.INTERPRET):
            # v2: position term computed in-kernel (no HBM score
            # tensors), memory read in its storage layout
            from ..ops.pallas_attention_v2 import (
                rel_attention_kv_fused_v2 as rel_attention_kv_fused)
        else:
            from ..ops.pallas_attention import rel_attention_kv_fused
        if cfg.pre_lnorm:
            w_in = layer_norm(core_out, layer["attn_ln_scale"],
                              layer["attn_ln_bias"])
        else:
            w_in = core_out
        attn_vec, k_cur, v_cur = rel_attention_kv_fused(
            w_in, mems_i[0], mems_i[1], pos_emb,
            layer["qkv_w"].astype(cfg.cdtype),
            layer["r_w"].astype(cfg.cdtype),
            r_w_bias, r_r_bias, attn_count, reset_mems,
            cfg.n_head, cfg.d_head, same_length=same_length,
            dropatt=cfg.dropatt,
            dropatt_rng=r_att if train else None)
        kv_cur = (k_cur, v_cur)
    elif cfg.cache_kv:
        from .attention import rel_attention_kv
        if cfg.pre_lnorm:
            w_in = layer_norm(core_out, layer["attn_ln_scale"],
                              layer["attn_ln_bias"])
        else:
            w_in = core_out
        attn_vec, k_cur, v_cur = rel_attention_kv(
            w_in, mems_i[0], mems_i[1], pos_emb,
            layer["qkv_w"].astype(cfg.cdtype),
            layer["r_w"].astype(cfg.cdtype),
            r_w_bias, r_r_bias, attn_mask,
            cfg.n_head, cfg.d_head,
            softmax_dtype=cfg.sdtype,
            dropatt_rng=r_att if train else None,
            dropatt_rate=cfg.dropatt,
        )
        kv_cur = (k_cur, v_cur)
    else:
        cat = jnp.concatenate([mems_i, core_out], axis=0)
        if cfg.pre_lnorm:
            w_in = layer_norm(core_out, layer["attn_ln_scale"],
                              layer["attn_ln_bias"])
            cat_in = layer_norm(cat, layer["attn_ln_scale"],
                                layer["attn_ln_bias"])
        else:
            w_in, cat_in = core_out, cat

        attn_vec = rel_attention(
            w_in, cat_in, pos_emb,
            layer["qkv_w"].astype(cfg.cdtype),
            layer["r_w"].astype(cfg.cdtype),
            layer["o_w"].astype(cfg.cdtype),
            r_w_bias, r_r_bias, attn_mask,
            cfg.n_head, cfg.d_head,
            softmax_dtype=cfg.sdtype,
            dropatt_rng=r_att if train else None,
            dropatt_rate=cfg.dropatt,
        )
    attn_out = attn_vec @ layer["o_w"].astype(cfg.cdtype)
    attn_out = _dropout(r_o, attn_out, cfg.dropout, train)
    if cfg.pre_lnorm:
        out = core_out + attn_out
    else:
        out = layer_norm(core_out + attn_out, layer["attn_ln_scale"],
                         layer["attn_ln_bias"])

    # Position-wise FF (reference mem_transformer.py:26-60)
    if cfg.pre_lnorm:
        ff_in = layer_norm(out, layer["ff_ln_scale"], layer["ff_ln_bias"])
    else:
        ff_in = out
    h = jax.nn.relu(ff_in @ layer["ff_w1"].astype(cfg.cdtype)
                    + layer["ff_b1"].astype(cfg.cdtype))
    h = _dropout(r_f1, h, cfg.dropout, train)
    h = h @ layer["ff_w2"].astype(cfg.cdtype) + layer["ff_b2"].astype(
        cfg.cdtype)
    h = _dropout(r_f2, h, cfg.dropout, train)
    if cfg.pre_lnorm:
        return out + h, kv_cur
    return layer_norm(out + h, layer["ff_ln_scale"],
                      layer["ff_ln_bias"]), kv_cur


# ---------------------------------------------------------------------------
# Core forward
# ---------------------------------------------------------------------------

def xl_forward(params, cfg: XLConfig, inp, mems: XLMems,
               reset_mems=None, status_vec=None, *, same_length: bool = False,
               train: bool = False, rng=None, detach_mems: bool = True,
               remat: bool = False, pos_emb=None, r_heads=None):
    """Run the decoder stack. Returns (core_out [q,b,d], new_mems).

    Mirrors reference ``_forward`` + ``_update_mems``
    (mem_transformer.py:484-576,445-482) over the static memory buffer.

    ``r_heads`` [n_layer, klen, n_head, d_head]: pre-projected positional
    heads (precompute_r_heads), hoisting the per-layer r @ r_w projection
    out of decode scans. cache_kv eval/decode paths only (the Pallas
    kernels and the raw-hiddens path project internally); gradients to
    r_w flow through the hoisted projection — identical math.
    """
    qlen, bsz = inp.shape[0], inp.shape[1]
    mem_len = mems.hids.shape[4] if cfg.cache_kv else mems.hids.shape[1]
    if r_heads is not None:
        assert cfg.cache_kv and not train, \
            "r_heads hoisting is for cache_kv decode paths"
        assert not (cfg.use_pallas and qlen >= 8), \
            "fused-kernel path projects positions internally"

    if train:
        rng, r_emb, r_pos = jax.random.split(rng, 3)
        rngs = jax.random.split(rng, cfg.n_layer)
    else:
        r_emb = r_pos = None
        rngs = [None] * cfg.n_layer

    word_emb = embed_input(params, cfg, inp, status_vec)
    attn_mask = build_attn_mask(qlen, mem_len, mems.count, reset_mems,
                                same_length, bsz)
    if pos_emb is None and r_heads is None:
        # constant for fixed (qlen, mem_len); decoding scans hoist it
        pos_emb = positional_embedding(cfg, mem_len + qlen).astype(
            cfg.cdtype)

    core_out = _dropout(r_emb, word_emb, cfg.dropout, train)
    pos_emb = _dropout(r_pos, pos_emb, cfg.dropout, train)

    r_w_bias = params["r_w_bias"].astype(cfg.cdtype)
    r_r_bias = params["r_r_bias"].astype(cfg.cdtype)

    hids = [core_out]
    kvs = []
    layer_fn = decoder_layer
    if remat:
        # cfg, train flag and same_length stay static (they gate python
        # branches and pallas cache keys)
        layer_fn = jax.checkpoint(
            decoder_layer, static_argnums=(1, 9, 12), policy=None)
    for i in range(cfg.n_layer):
        mems_i = mems.hids[i].astype(cfg.cdtype)
        pos_i = pos_emb if r_heads is None else r_heads[i]
        core_out, kv_cur = layer_fn(
            params["layers"][i], cfg, core_out, mems_i, pos_i,
            r_w_bias, r_r_bias, attn_mask, rngs[i], train,
            mems.count, reset_mems, same_length)
        hids.append(core_out)
        kvs.append(kv_cur)

    final_rng = None
    if train:
        final_rng = jax.random.fold_in(rng, 12345)
    out = _dropout(final_rng, core_out, cfg.dropout, train)

    # Memory update: roll the ring buffer (reference _update_mems).
    if mem_len > 0:
        if cfg.cache_kv:
            # [n_layer, 2, h, bsz, qlen, dh]
            stacked = jnp.stack(
                [jnp.stack(kv, axis=0) for kv in kvs]).astype(
                    mems.hids.dtype)
            new_hids = jnp.concatenate(
                [mems.hids, stacked], axis=4)[..., -mem_len:, :]
        else:
            stacked = jnp.stack(hids).astype(mems.hids.dtype)
            new_hids = jnp.concatenate(
                [mems.hids, stacked], axis=1)[:, -mem_len:]
        if detach_mems:
            new_hids = jax.lax.stop_gradient(new_hids)
        new_count = jnp.minimum(mems.count + qlen, mem_len)
        new_mems = XLMems(hids=new_hids, count=new_count)
    else:
        new_mems = mems
    return out, new_mems


# ---------------------------------------------------------------------------
# Chunked two-level incremental decoding
# ---------------------------------------------------------------------------
#
# The general path above reproduces the reference memory semantics by
# shifting the whole K/V buffer every step (the functional analogue of
# mem_transformer.py:445-482's torch.cat window). For token-by-token
# decoding that shift is pure HBM traffic: at the reference generation
# operating point (mem_len 4146) it copies ~50 MB per generated token, and
# re-projecting the positional embeddings (r @ r_w, mem_transformer.py:160)
# would cost ~2 GFLOP per layer per token even though they are constant.
#
# A naive in-place ring is NOT faster on TPU: XLA's copy insertion cannot
# alias a loop-carried buffer that is dynamically updated AND read in the
# same iteration, so every step still materializes full K/V copies
# (measured: pad+select lowering, ~2x slower than the shift). The design
# that does map to the hardware is a TWO-LEVEL cache:
#
#   * big buffer  [bsz, mem_len, n_head*d_head] per layer — tail-aligned,
#     READ-ONLY inside a decode chunk (a closure constant of the inner
#     scan, so XLA never copies it);
#   * staging     [bsz, C, n_head*d_head] per layer — holds the current
#     chunk's K/V; tiny, so its per-step copies are ~KBs;
#   * one merge per C tokens (static shift-left + append) in the outer
#     scan, amortizing the big-buffer copy to 1/C per token.
#
# The dense minor dimension n_head*d_head (= d_model, ~512 lanes) also
# avoids the 2.56x HBM padding of a [.., mem, d_head=50] layout (50 lanes
# pad to 128 on TPU). Positional projections are precomputed once
# (`precompute_r_heads`); the per-step relative-position alignment is a
# jnp.roll / dynamic_slice of score-sized vectors, never a gather.
# Mathematically identical to forward_generate with qlen=1 (tests assert
# logit equality through growth, chunk boundaries, and merges).


# Batch-size threshold between the two decode score formulations:
#   bsz <= this: ONE fused matmul over the K‖R buffer computes AC and BD
#     together via a block-diagonal query matrix. The matmul does h x more
#     FLOPs than needed, but single/few-stream decoding is op-issue-latency
#     bound (~15us per serialized op), so halving the op count wins
#     (measured 2.7x single-stream).
#   bsz > this: per-head einsums (no FLOP inflation). Batched lanes (GAN
#     sampling at bsz 32+, multi-lane generation) are compute-bound, where
#     the block-diagonal trick's h x FLOP waste dominates.
FUSED_SCORE_MAX_BSZ = 4


class DecodeState(NamedTuple):
    """Big (chunk-level) decode K/V cache. Two layouts (see
    FUSED_SCORE_MAX_BSZ); the kr row count tells them apart.

    FUSED (kr rows = 2*mem_len+1):
    kv:    tuple over layers of (kr, v):
           kr [bsz, mem_len + mem_len+1, n_head*d_head] — rows 0..M-1 the
              keys (tail-aligned like XLMems, slot M-1 = most recent), rows
              M..2M the layer's projected positional embeddings (row M+j =
              distance M-j). Keys and positional rows share one buffer so
              the content (AC) and position (BD) score terms come out of a
              SINGLE batched matmul — one HBM pass + one op-issue latency
              instead of two.
           v  [bsz, mem_len, n_head*d_head].

    PER-HEAD (kr rows = mem_len):
    kv:    tuple over layers of (k [bsz, mem_len, n_head*d_head], v same);
    r_heads: [n_layer, mem_len+1, n_head, d_head] positional projections
           (constant, shared across lanes — not tiled per batch row).

    count: int32 — number of valid tail slots (capped at mem_len).
    """

    kv: tuple
    count: jnp.ndarray
    r_heads: Any = None


def _r_rows(params, cfg: XLConfig, mem_len: int, bsz: int, dtype):
    """Per-layer positional rows [bsz, M+1, h*dh] (row j = distance M-j),
    tiled per lane so they can live inside the fused K‖R buffer."""
    r_heads = precompute_r_heads(params, cfg, mem_len + 1)  # [L, M+1, h, dh]
    hd = cfg.n_head * cfg.d_head
    return [jnp.broadcast_to(
        r_heads[i].reshape(mem_len + 1, hd).astype(dtype),
        (bsz, mem_len + 1, hd)) for i in range(cfg.n_layer)]


def _use_fused_rows(bsz: int, fused_rows) -> bool:
    if fused_rows is None:
        return bsz <= FUSED_SCORE_MAX_BSZ
    return bool(fused_rows)


def init_decode_state(params, cfg: XLConfig, mem_len: int, bsz: int,
                      dtype=None, fused_rows=None) -> DecodeState:
    dtype = dtype or cfg.cdtype
    hd = cfg.n_head * cfg.d_head
    if _use_fused_rows(bsz, fused_rows):
        rr = _r_rows(params, cfg, mem_len, bsz, dtype)
        kv = tuple(
            (jnp.concatenate(
                [jnp.zeros((bsz, mem_len, hd), dtype=dtype), rr[i]],
                axis=1),
             jnp.zeros((bsz, mem_len, hd), dtype=dtype))
            for i in range(cfg.n_layer))
        return DecodeState(kv=kv, count=jnp.zeros((), jnp.int32))
    kv = tuple(
        (jnp.zeros((bsz, mem_len, hd), dtype=dtype),
         jnp.zeros((bsz, mem_len, hd), dtype=dtype))
        for _ in range(cfg.n_layer))
    return DecodeState(kv=kv, count=jnp.zeros((), jnp.int32),
                       r_heads=precompute_r_heads(params, cfg, mem_len + 1))


def decode_state_from_mems(params, cfg: XLConfig, mems: XLMems,
                           fused_rows=None) -> DecodeState:
    """cache_kv memory [L, 2, h, b, M, dh] -> per-layer dense K(+R) + V."""
    if not cfg.cache_kv:
        raise ValueError("chunked decode requires cache_kv memory layout")
    b = mems.hids.shape[3]
    M = mems.hids.shape[4]
    hd = cfg.n_head * cfg.d_head

    def dense(x):  # [h, b, M, dh] -> [b, M, h*dh]
        return x.transpose(1, 2, 0, 3).reshape(b, M, hd)

    if _use_fused_rows(b, fused_rows):
        rr = _r_rows(params, cfg, M, b, mems.hids.dtype)
        kv = tuple(
            (jnp.concatenate([dense(mems.hids[i, 0]), rr[i]], axis=1),
             dense(mems.hids[i, 1]))
            for i in range(cfg.n_layer))
        return DecodeState(kv=kv, count=mems.count.astype(jnp.int32))
    kv = tuple((dense(mems.hids[i, 0]), dense(mems.hids[i, 1]))
               for i in range(cfg.n_layer))
    return DecodeState(kv=kv, count=mems.count.astype(jnp.int32),
                       r_heads=precompute_r_heads(params, cfg, M + 1))


def mems_from_decode_state(cfg: XLConfig, state: DecodeState) -> XLMems:
    """Inverse of decode_state_from_mems (drops the positional rows)."""
    b, M, _ = state.kv[0][1].shape

    def heads(x):  # [b, M, h*dh] -> [h, b, M, dh]
        return x.reshape(b, M, cfg.n_head, cfg.d_head).transpose(2, 0, 1, 3)

    hids = jnp.stack([
        jnp.stack([heads(kr[:, :M]), heads(v)], axis=0)
        for kr, v in state.kv])
    return XLMems(hids=hids, count=state.count)


def init_decode_stage(cfg: XLConfig, chunk: int, bsz: int,
                      dtype=None) -> tuple:
    """Per-layer (k, v) staging buffers [bsz, chunk, n_head*d_head]."""
    dtype = dtype or cfg.cdtype
    hd = cfg.n_head * cfg.d_head
    return tuple(
        (jnp.zeros((bsz, chunk, hd), dtype=dtype),
         jnp.zeros((bsz, chunk, hd), dtype=dtype))
        for _ in range(cfg.n_layer))


def merge_decode_state(cfg: XLConfig, state: DecodeState, stage: tuple,
                       n: int) -> DecodeState:
    """Fold the first ``n`` staged tokens into the big buffer (static
    shift-left + append; one big copy per chunk, not per token). The
    positional rows (kr rows M..2M) stay in place."""
    M = state.kv[0][1].shape[1]
    if n > M:
        raise ValueError(
            f"merge of {n} staged tokens exceeds the {M}-slot ring; cap "
            "the decode chunk at mem_len (infer/sample.py DECODE_CHUNK "
            "sites) — positions beyond M have no positional rows")
    kv = tuple(
        (jnp.concatenate([kr[:, n:M], sk[:, :n], kr[:, M:]], axis=1),
         jnp.concatenate([v[:, n:], sv[:, :n]], axis=1))
        for (kr, v), (sk, sv) in zip(state.kv, stage))
    return DecodeState(kv=kv, count=jnp.minimum(state.count + n, M),
                       r_heads=state.r_heads)


def precompute_r_heads(params, cfg: XLConfig, R: int) -> jnp.ndarray:
    """Per-layer positional projections [L, R, h, dh], row j = distance
    R-1-j (the natural positional_embedding order). Constant for a fixed
    memory length — hoist out of the decode loop. Kept distance-REVERSED so
    per-step slot alignment is a jnp.roll / dynamic_slice instead of a
    gather, which TPUs execute far slower."""
    pos = positional_embedding(cfg, R).astype(cfg.cdtype)  # dist R-1 .. 0
    heads = [
        (pos @ layer["r_w"].astype(cfg.cdtype)).reshape(
            R, cfg.n_head, cfg.d_head)
        for layer in params["layers"]
    ]
    return jnp.stack(heads)


def decode_chunk_step(params, cfg: XLConfig, inp, state: DecodeState,
                      stage: tuple, t, *,
                      same_length: bool = True, status_vec=None,
                      detach_kv_writes: bool = False):
    """One-token forward at inner-chunk step ``t`` (traced int32).

    inp: [bsz] int ids or [bsz, V] soft one-hots. ``state`` is the big
    read-only cache (as of chunk start), ``stage`` the chunk staging
    buffers. Returns (logits [bsz, V], new stage). Distance bookkeeping:
    big slot j is at distance M-j+t from the current token; staged slot s
    at t-s.

    ``detach_kv_writes``: write stop_gradient'ed K/V into the carried
    stage while this step's self-attention still sees the live
    projections. That reproduces the rolling path's memory semantics under
    ``jax.grad`` (the reference detaches mems unconditionally in
    _update_mems, mem_transformer.py:461-482, i.e. AFTER the step's own
    attention) — used by the differentiable GAN sampling scan."""
    b, M, hd = state.kv[0][1].shape
    C = stage[0][0].shape[1]
    h, dh = cfg.n_head, cfg.d_head
    scale = 1.0 / (dh ** 0.5)
    sdt = cfg.sdtype
    neg = jnp.asarray(jnp.finfo(sdt).min, dtype=sdt)

    j_big = jnp.arange(M, dtype=jnp.int32)
    j_st = jnp.arange(C, dtype=jnp.int32)
    # same_length caps history at M keys incl. self (the reference masks the
    # oldest slot once memory is full, mem_transformer.py:517-527); without
    # it the window is M+1 keys (M mems + self).
    sl = 1 if same_length else 0
    mask_big = j_big < jnp.maximum(M - state.count, t + sl)     # [M]
    mask_st = j_st > t                                          # [C]

    sv = status_vec[None] if status_vec is not None else None
    x = embed_input(params, cfg, inp[None], sv)[0]              # [b, hd]

    r_w_bias = params["r_w_bias"].astype(cfg.cdtype)
    r_r_bias = params["r_r_bias"].astype(cfg.cdtype)
    eye = jnp.eye(h, dtype=cfg.cdtype)
    zero = jnp.zeros((), jnp.int32)
    new_stage = []

    for i in range(cfg.n_layer):
        layer = params["layers"][i]
        if cfg.pre_lnorm:
            w_in = layer_norm(x, layer["attn_ln_scale"],
                              layer["attn_ln_bias"])
        else:
            w_in = x
        heads = w_in @ layer["qkv_w"].astype(cfg.cdtype)        # [b, 3*hd]
        q, k, v = jnp.split(heads, 3, axis=-1)

        sk, svv = stage[i]
        k_w = jax.lax.stop_gradient(k) if detach_kv_writes else k
        v_w = jax.lax.stop_gradient(v) if detach_kv_writes else v
        sk = jax.lax.dynamic_update_slice(
            sk, k_w[:, None, :].astype(sk.dtype), (zero, t, zero))
        svv = jax.lax.dynamic_update_slice(
            svv, v_w[:, None, :].astype(svv.dtype), (zero, t, zero))
        new_stage.append((sk, svv))
        if detach_kv_writes:
            # self-slot live for THIS step's attention (gradient reaches the
            # current token's K/V exactly once, as in the rolling path)
            sk = jax.lax.dynamic_update_slice(
                sk, k[:, None, :].astype(sk.dtype), (zero, t, zero))
            svv = jax.lax.dynamic_update_slice(
                svv, v[:, None, :].astype(svv.dtype), (zero, t, zero))
        kr, v_big = state.kv[i]
        qw = q.reshape(b, h, dh) + r_w_bias
        qr = q.reshape(b, h, dh) + r_r_bias
        if kr.shape[1] == 2 * M + 1:
            # FUSED layout: content (AC) and position (BD) score terms from
            # ONE batched matmul over the K‖R buffer via a block-diagonal
            # query matrix [hd, 2h] (rows of head h' hit output column h'
            # only). The matmul does h x more FLOPs than needed, but
            # single/few-stream decoding is op-issue-latency bound (~15us
            # per serialized op), so halving the op count wins. Scores stay
            # in [b, h, klen] — klen minor — because [.., klen, h=10] pads
            # 10 lanes to 128 (13x fp32 softmax traffic).
            W2 = jnp.concatenate(
                [(qw[:, :, :, None] * eye[:, None, :]).reshape(b, hd, h),
                 (qr[:, :, :, None] * eye[:, None, :]).reshape(b, hd, h)],
                axis=-1)                                        # [b, hd, 2h]
            S = jnp.einsum("bmk,bkh->bmh", kr.astype(cfg.cdtype), W2)
            AC_big = S[:, :M, :h].transpose(0, 2, 1)            # [b, h, M]
            BD_rev = S[:, M:, h:].transpose(0, 2, 1)            # [b, h, M+1]
        else:
            # PER-HEAD layout (batched lanes): standard multi-head scores,
            # no FLOP inflation; the positional term comes from the shared
            # (non-tiled) r_heads constant.
            AC_big = jnp.einsum(
                "bmhd,bhd->bhm",
                kr.reshape(b, M, h, dh).astype(cfg.cdtype), qw)
            BD_rev = jnp.einsum(
                "jhd,bhd->bhj",
                state.r_heads[i].astype(cfg.cdtype), qr)        # [b, h, M+1]

        AC_st = (sk.astype(cfg.cdtype)
                 * qw.reshape(b, hd)[:, None, :]).reshape(
            b, C, h, dh).sum(-1).transpose(0, 2, 1)             # [b, h, C]

        # align the distance-indexed position term to slots: a roll (big) /
        # dynamic slice (staging)
        BD_big = jnp.roll(BD_rev[..., :M], t, axis=-1)          # [b, h, M]
        BD_ext = jnp.concatenate(
            [BD_rev, jnp.zeros((b, h, C - 1), BD_rev.dtype)],
            axis=-1) if C > 1 else BD_rev
        BD_st = jax.lax.dynamic_slice_in_dim(BD_ext, M - t, C, axis=-1)

        score = jnp.concatenate(
            [AC_big + BD_big, AC_st + BD_st], axis=-1).astype(sdt) * scale
        mask = jnp.concatenate([mask_big, mask_st])[None, None, :]
        score = jnp.where(mask, neg, score)
        prob = jax.nn.softmax(score, axis=-1)                   # [b, h, M+C]

        pt = prob.astype(cfg.cdtype).transpose(0, 2, 1)         # [b, M+C, h]
        pb = jnp.repeat(pt, cfg.d_head, axis=2)                 # fused bcast
        ctx = ((v_big.astype(cfg.cdtype) * pb[:, :M]).sum(axis=1)
               + (svv.astype(cfg.cdtype) * pb[:, M:]).sum(axis=1))  # [b, hd]

        attn_out = ctx @ layer["o_w"].astype(cfg.cdtype)
        if cfg.pre_lnorm:
            out = x + attn_out
        else:
            out = layer_norm(x + attn_out, layer["attn_ln_scale"],
                             layer["attn_ln_bias"])
        if cfg.pre_lnorm:
            ff_in = layer_norm(out, layer["ff_ln_scale"],
                               layer["ff_ln_bias"])
        else:
            ff_in = out
        ff = jax.nn.relu(ff_in @ layer["ff_w1"].astype(cfg.cdtype)
                         + layer["ff_b1"].astype(cfg.cdtype))
        ff = ff @ layer["ff_w2"].astype(cfg.cdtype) + layer["ff_b2"].astype(
            cfg.cdtype)
        if cfg.pre_lnorm:
            x = out + ff
        else:
            x = layer_norm(out + ff, layer["ff_ln_scale"],
                           layer["ff_ln_bias"])

    logits = compute_logits(params, cfg, x)
    return logits, tuple(new_stage)



def decode_recompute_window(params, cfg: XLConfig, inp, k_mem, v_mem,
                            count, *, same_length: bool = False,
                            status_vec=None,
                            collect_residuals: bool = False):
    """Batched recompute of ``n`` sequential ``decode_chunk_step``
    forwards (detach_kv_writes=True semantics) in ONE parallel pass.

    Each decode step's forward depends only on its own input given the
    (detached) cache — the per-token scan is sequential only because of
    the sample chain. When that chain is cut (truncate_backprop), the
    whole window's logits AND gradients are computable batched: queries
    live, every K/V lane stop-gradient'ed except each query's own
    (rel_attention_kv detach_kv_cross), positional term live, sliding
    window of M(+1) keys via the band mask below.

    inp: [n, bsz, V] one-hot inputs each step saw (n <= mem_len).
    k_mem/v_mem: per-layer lists [n_head, bsz, M, d_head] projected
    big-cache K/V at the window start (pass stop-gradient'ed values —
    decode memory is always detached, reference _update_mems,
    mem_transformer.py:461-482). count: valid tail slots.

    Returns (logits [n, bsz, V], k_full, v_full, new_count): k_full/
    v_full are the per-layer FULL lane buffers [n_head, bsz, M+n, d_head]
    = [mem || recomputed K/V] (window part stop-gradient'ed); the
    caller's next-window memory is their last-M tail, and the chain
    backward (full backprop through the sample chain,
    _chunk_st_fullchain in models/gan.py) slices per-step lanes
    [t : t+M] out of them. Gradient oracle: gen_scan_chunked /
    decode_chunk_step (tests/test_gan_recompute.py).
    """
    from .attention import rel_attention_kv

    n, bsz, V = inp.shape
    h, dh = cfg.n_head, cfg.d_head
    M = k_mem[0].shape[2]
    if n > M:
        raise ValueError(f"recompute window n={n} exceeds mem_len={M}")
    sl = 1 if same_length else 0

    x = embed_input(params, cfg, inp, status_vec)         # [n, b, hd]

    # masks in decode_chunk_step's index space: query i sees big lanes
    # j >= max(M - count, i + sl) and window lanes s <= i with
    # i - s <= M - sl
    i_q = jnp.arange(n, dtype=jnp.int32)[:, None]
    j_big = jnp.arange(M, dtype=jnp.int32)[None, :]
    mask_big = j_big < jnp.maximum(M - count, i_q + sl)   # [n, M]
    s_cur = jnp.arange(n, dtype=jnp.int32)[None, :]
    mask_cur = (s_cur > i_q) | ((i_q - s_cur) > (M - sl))
    attn_mask = jnp.concatenate([mask_big, mask_cur], axis=1)[None]

    # distances klen-1..0; rel_shift maps lane j of query i to distance
    # M + i - j, matching the decode slot algebra (big slot j at distance
    # M - j + i, window slot s at i - s). Rows for distances > M touch
    # masked lanes only.
    pos = positional_embedding(cfg, M + n).astype(cfg.cdtype)
    r_w_bias = params["r_w_bias"].astype(cfg.cdtype)
    r_r_bias = params["r_r_bias"].astype(cfg.cdtype)

    new_k, new_v = [], []
    res = {"x": [], "z1": [], "z2": [], "ff_pre": [], "prob": []} \
        if collect_residuals else None
    sg = jax.lax.stop_gradient
    for i, layer in enumerate(params["layers"]):
        if cfg.pre_lnorm:
            w_in = layer_norm(x, layer["attn_ln_scale"],
                              layer["attn_ln_bias"])
        else:
            w_in = x
        attn = rel_attention_kv(
            w_in, k_mem[i], v_mem[i], pos,
            layer["qkv_w"].astype(cfg.cdtype),
            layer["r_w"].astype(cfg.cdtype),
            r_w_bias, r_r_bias, attn_mask, h, dh,
            softmax_dtype=cfg.sdtype, detach_kv_cross=True,
            with_prob=collect_residuals)
        attn_vec, k_cur, v_cur = attn[:3]
        attn_out = attn_vec @ layer["o_w"].astype(cfg.cdtype)
        z1 = x + attn_out
        if cfg.pre_lnorm:
            out = z1
        else:
            out = layer_norm(z1, layer["attn_ln_scale"],
                             layer["attn_ln_bias"])
        if cfg.pre_lnorm:
            ff_in = layer_norm(out, layer["ff_ln_scale"],
                               layer["ff_ln_bias"])
        else:
            ff_in = out
        ff_pre = (ff_in @ layer["ff_w1"].astype(cfg.cdtype)
                  + layer["ff_b1"].astype(cfg.cdtype))
        ff = jax.nn.relu(ff_pre) @ layer["ff_w2"].astype(cfg.cdtype) \
            + layer["ff_b2"].astype(cfg.cdtype)
        z2 = out + ff
        if collect_residuals:
            res["x"].append(sg(x))
            res["z1"].append(sg(z1))
            res["z2"].append(sg(z2))
            res["ff_pre"].append(sg(ff_pre))
            res["prob"].append(attn[3])       # already stop-gradient'ed
        if cfg.pre_lnorm:
            x = z2
        else:
            x = layer_norm(z2, layer["ff_ln_scale"],
                           layer["ff_ln_bias"])
        kc = jax.lax.stop_gradient(k_cur)     # [h, b, n, dh]
        vc = jax.lax.stop_gradient(v_cur)
        new_k.append(jnp.concatenate([k_mem[i], kc], axis=2))
        new_v.append(jnp.concatenate([v_mem[i], vc], axis=2))

    logits = compute_logits(params, cfg, x)
    if collect_residuals:
        # stacked for the chain kernel's per-(token, layer) streaming:
        # x/z1/z2 [L, n, b, hd]; ff_pre [L, n, b, d_inner];
        # prob [L, b, h, n, klen] fp32
        res = {k: jnp.stack(v) for k, v in res.items()}
        return (logits, new_k, new_v, jnp.minimum(count + n, M), res)
    return (logits, new_k, new_v, jnp.minimum(count + n, M))


def compute_logits(params, cfg: XLConfig, hidden) -> jnp.ndarray:
    """Softmax logits (reference ProjectedAdaptiveLogSoftmax
    _compute_logit with n_clusters==0; proj_adaptive_softmax.py:50-84).
    Tied to the token embedding unless the params carry a separate
    "crit_w" (MODEL.tie_embedding=False)."""
    w = params.get("crit_w", params["word_emb"]).astype(cfg.cdtype)
    b = params["crit_bias"].astype(cfg.cdtype)
    return hidden @ w.T + b


# ---------------------------------------------------------------------------
# Heads
# ---------------------------------------------------------------------------

def forward_nll(params, cfg: XLConfig, data, target, reset_mems, mems,
                status_vec=None, *, same_length=False, train=False, rng=None,
                remat=False):
    """Per-token NLL head (reference MemTransformerLM.forward,
    mem_transformer.py:653-670). Returns (loss [q,b], new_mems)."""
    hidden, new_mems = xl_forward(
        params, cfg, data, mems, reset_mems, status_vec,
        same_length=same_length, train=train, rng=rng, remat=remat)
    logits = compute_logits(params, cfg, hidden)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, target[..., None], axis=-1)[..., 0]
    return nll, new_mems


def forward_generate(params, cfg: XLConfig, data, mems, status_vec=None, *,
                     same_length=False, pos_emb=None):
    """Logits head for incremental decoding (reference forward_generate,
    mem_transformer.py:578-600). Returns (logits [q,b,V], new_mems)."""
    hidden, new_mems = xl_forward(
        params, cfg, data, mems, None, status_vec,
        same_length=same_length, train=False, pos_emb=pos_emb)
    logits = compute_logits(params, cfg, hidden)
    return logits, new_mems


def gumbel_softmax_st(logits, temperature, rng, eps: float = 1e-20,
                      u=None):
    """Straight-through Gumbel-softmax (reference
    mem_transformer.py:609-628): hard one-hot forward, soft gradient.

    ``u`` optionally injects the uniform draws (shape = logits.shape)
    instead of drawing from ``rng`` — used by the GAN trajectory-parity
    harness to feed BOTH frameworks identical noise (the torch reference
    is monkeypatched to consume the same recorded stream)."""
    if u is None:
        u = jax.random.uniform(rng, logits.shape, dtype=jnp.float32)
    g = -jnp.log(-jnp.log(u + eps) + eps)
    y = jax.nn.softmax((logits.astype(jnp.float32) + g) / temperature,
                       axis=-1)
    idx = jnp.argmax(y, axis=-1)
    y_hard = jax.nn.one_hot(idx, logits.shape[-1], dtype=y.dtype)
    return jax.lax.stop_gradient(y_hard - y) + y


def forward_generate_gumbel(params, cfg: XLConfig, data, temperature, mems,
                            rng, status_vec=None, *, same_length=False,
                            detach_mems=True, r_heads=None, gumbel_u=None):
    """Gumbel-ST sampling head (reference forward_generate_gumbel,
    mem_transformer.py:602-651).

    Note on memory gradients: the reference toggles ``detach_mems_grad``
    during GAN sampling (transformer_gan.py:295,511) but its ``_update_mems``
    runs under ``torch.no_grad()`` and calls ``.detach()`` on BOTH branches
    (mem_transformer.py:461-482), so gradients never actually flow through
    memory there. ``detach_mems=True`` reproduces that; ``False`` enables
    true backprop-through-memory as an opt-in improvement."""
    hidden, new_mems = xl_forward(
        params, cfg, data, mems, None, status_vec,
        same_length=same_length, train=False, detach_mems=detach_mems,
        r_heads=r_heads)
    logits = compute_logits(params, cfg, hidden)
    onehot = gumbel_softmax_st(logits, temperature, rng, u=gumbel_u)
    return onehot, new_mems
