"""From-scratch BERT encoder with MLM and sequence-classification heads.

The reference consumes a HuggingFace BERT in three roles: pretrained MLM
over token shards (BERT/main.py), GAN discriminator/critic
(transformer_gan.py:535-566 wraps BertForSequenceClassification over the
MLM's encoder), and the real-vs-fake classifier metric
(model/utils/classifier.py). The architecture is the HF default with
num_hidden_layers=5 / hidden_size=768 (BERT/main.py:519-521,702-703) over a
311-token vocab (310 + appended [MASK], BERT/tokenization_midi.py:45-56).

This is a TPU-native functional equivalent: one parameter pytree, pure
forwards, standard post-LN encoder blocks with GELU, learned position +
token-type embeddings, MLM transform head with tied decoder, and a
pooler+classifier head. ``inputs_embeds`` is a first-class input because
the GAN path feeds soft one-hot x embedding-matrix products
(transformer_gan.py:403-426).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from .attention import layer_norm

BERT_LN_EPS = 1e-12  # HF BertConfig default layer_norm_eps


@dataclasses.dataclass(frozen=True)
class BertConfig:
    vocab_size: int = 311          # 310 + [MASK]
    hidden_size: int = 768
    num_hidden_layers: int = 5
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    num_labels: int = 2
    hidden_dropout: float = 0.1
    attention_dropout: float = 0.1
    compute_dtype: str = "float32"

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @property
    def cdtype(self):
        return jnp.dtype(self.compute_dtype)


def init_bert_params(cfg: BertConfig, seed: int = 0,
                     init_std: float = 0.02) -> dict:
    """HF-style init: normal(0, 0.02) weights, zero biases, LN (1, 0)."""
    rng = np.random.RandomState(seed)

    def normal(shape):
        return jnp.asarray(rng.normal(0.0, init_std, size=shape),
                           jnp.float32)

    def zeros(shape):
        return jnp.zeros(shape, jnp.float32)

    def ones(shape):
        return jnp.ones(shape, jnp.float32)

    h, i = cfg.hidden_size, cfg.intermediate_size
    params: dict[str, Any] = {
        "word_embeddings": normal((cfg.vocab_size, h)),
        "position_embeddings": normal((cfg.max_position_embeddings, h)),
        "token_type_embeddings": normal((cfg.type_vocab_size, h)),
        "emb_ln_scale": ones((h,)), "emb_ln_bias": zeros((h,)),
        "layers": [],
        "pooler_w": normal((h, h)), "pooler_b": zeros((h,)),
        "classifier_w": normal((h, cfg.num_labels)),
        "classifier_b": zeros((cfg.num_labels,)),
        # MLM head: transform + LN; decoder tied to word_embeddings
        "mlm_dense_w": normal((h, h)), "mlm_dense_b": zeros((h,)),
        "mlm_ln_scale": ones((h,)), "mlm_ln_bias": zeros((h,)),
        "mlm_bias": zeros((cfg.vocab_size,)),
    }
    for _ in range(cfg.num_hidden_layers):
        params["layers"].append({
            "q_w": normal((h, h)), "q_b": zeros((h,)),
            "k_w": normal((h, h)), "k_b": zeros((h,)),
            "v_w": normal((h, h)), "v_b": zeros((h,)),
            "attn_out_w": normal((h, h)), "attn_out_b": zeros((h,)),
            "attn_ln_scale": ones((h,)), "attn_ln_bias": zeros((h,)),
            "ffn_w1": normal((h, i)), "ffn_b1": zeros((i,)),
            "ffn_w2": normal((i, h)), "ffn_b2": zeros((h,)),
            "ffn_ln_scale": ones((h,)), "ffn_ln_bias": zeros((h,)),
        })
    return params


def _dropout(rng, x, rate, train):
    if not train or rate <= 0.0 or rng is None:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), jnp.zeros_like(x))


def bert_encode(params, cfg: BertConfig, input_ids=None, inputs_embeds=None,
                attention_mask=None, *, train: bool = False, rng=None):
    """Run embeddings + encoder. Returns hidden states [bsz, seq, h].

    attention_mask: [bsz, seq] with 1 = attend, 0 = masked (HF convention).
    """
    cd = cfg.cdtype
    if inputs_embeds is None:
        inputs_embeds = params["word_embeddings"].astype(cd)[input_ids]
    else:
        inputs_embeds = inputs_embeds.astype(cd)
    bsz, seq = inputs_embeds.shape[0], inputs_embeds.shape[1]

    pos = params["position_embeddings"].astype(cd)[None, :seq]
    tok_type = params["token_type_embeddings"].astype(cd)[0][None, None, :]
    x = inputs_embeds + pos + tok_type
    x = layer_norm(x, params["emb_ln_scale"], params["emb_ln_bias"],
                   eps=BERT_LN_EPS)

    if train and rng is not None:
        rng, r = jax.random.split(rng)
        x = _dropout(r, x, cfg.hidden_dropout, train)

    if attention_mask is not None:
        bias = jnp.where(attention_mask[:, None, None, :] > 0, 0.0,
                         jnp.float32(-1e30))
    else:
        bias = None

    nh, hd = cfg.num_attention_heads, cfg.head_dim
    scale = 1.0 / np.sqrt(hd)
    for li, layer in enumerate(params["layers"]):
        if train and rng is not None:
            rng, r_att, r_h1, r_h2 = jax.random.split(rng, 4)
        else:
            r_att = r_h1 = r_h2 = None
        q = (x @ layer["q_w"].astype(cd) + layer["q_b"].astype(cd))
        k = (x @ layer["k_w"].astype(cd) + layer["k_b"].astype(cd))
        v = (x @ layer["v_w"].astype(cd) + layer["v_b"].astype(cd))
        q = q.reshape(bsz, seq, nh, hd).transpose(0, 2, 1, 3)
        k = k.reshape(bsz, seq, nh, hd).transpose(0, 2, 1, 3)
        v = v.reshape(bsz, seq, nh, hd).transpose(0, 2, 1, 3)
        scores = (q @ k.transpose(0, 1, 3, 2)).astype(jnp.float32) * scale
        if bias is not None:
            scores = scores + bias
        probs = jax.nn.softmax(scores, axis=-1)
        probs = _dropout(r_att, probs, cfg.attention_dropout, train)
        ctx = (probs.astype(cd) @ v).transpose(0, 2, 1, 3).reshape(
            bsz, seq, nh * hd)
        attn_out = ctx @ layer["attn_out_w"].astype(cd) + layer[
            "attn_out_b"].astype(cd)
        attn_out = _dropout(r_h1, attn_out, cfg.hidden_dropout, train)
        x = layer_norm(x + attn_out, layer["attn_ln_scale"],
                       layer["attn_ln_bias"], eps=BERT_LN_EPS)

        hmid = jax.nn.gelu(x @ layer["ffn_w1"].astype(cd)
                           + layer["ffn_b1"].astype(cd), approximate=False)
        ffn_out = hmid @ layer["ffn_w2"].astype(cd) + layer[
            "ffn_b2"].astype(cd)
        ffn_out = _dropout(r_h2, ffn_out, cfg.hidden_dropout, train)
        x = layer_norm(x + ffn_out, layer["ffn_ln_scale"],
                       layer["ffn_ln_bias"], eps=BERT_LN_EPS)
    return x


def bert_mlm_logits(params, cfg: BertConfig, hidden) -> jnp.ndarray:
    """MLM head (transform -> LN -> tied decoder + bias)."""
    cd = cfg.cdtype
    h = jax.nn.gelu(hidden @ params["mlm_dense_w"].astype(cd)
                    + params["mlm_dense_b"].astype(cd), approximate=False)
    h = layer_norm(h, params["mlm_ln_scale"], params["mlm_ln_bias"],
                   eps=BERT_LN_EPS)
    return h @ params["word_embeddings"].astype(cd).T + params[
        "mlm_bias"].astype(cd)


def bert_cls_logits(params, cfg: BertConfig, hidden) -> jnp.ndarray:
    """Pooler (tanh of CLS) + classification head -> [bsz, num_labels]."""
    cd = cfg.cdtype
    pooled = jnp.tanh(hidden[:, 0] @ params["pooler_w"].astype(cd)
                      + params["pooler_b"].astype(cd))
    return pooled @ params["classifier_w"].astype(cd) + params[
        "classifier_b"].astype(cd)


def bert_discriminator_score(params, cfg: BertConfig, inputs_embeds,
                             *, train: bool = False, rng=None):
    """The GAN-side scalar score: class-0 logit of the CLS classifier
    (reference transformer_gan.py:412-416 uses outputs[0][:, 0])."""
    hidden = bert_encode(params, cfg, inputs_embeds=inputs_embeds,
                         train=train, rng=rng)
    return bert_cls_logits(params, cfg, hidden)[:, 0]


def count_params(params) -> int:
    return sum(int(np.prod(p.shape))
               for p in jax.tree_util.tree_leaves(params))
