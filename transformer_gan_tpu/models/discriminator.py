"""CNN discriminators (RelGAN family) as pure functions.

Counterparts of reference model/discriminator.py and the RelGAN_D subclass
(model/transformer_gan.py:44-119): multi-representation Conv2d banks over
(filter_size x emb_dim_single) with stride emb_dim_single, max-pool over
time, highway, scalar logits per representation. Consumes one-hot/soft
vocab distributions through a bias-free linear "embedding"
(transformer_gan.py:72).

Filter spec matches the reference module constants
(transformer_gan.py:37-38): sizes [2,3,4,5], 300 filters each.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

DIS_FILTER_SIZES = (2, 3, 4, 5)
DIS_NUM_FILTERS = (300, 300, 300, 300)


@dataclasses.dataclass(frozen=True)
class RelganConfig:
    embed_dim: int = 64
    num_rep: int = 64
    vocab_size: int = 310
    dropout: float = 0.25
    init: str = "uniform"          # uniform | normal | truncated_normal
    filter_sizes: tuple = DIS_FILTER_SIZES
    num_filters: tuple = DIS_NUM_FILTERS
    compute_dtype: str = "float32"

    @property
    def emb_dim_single(self) -> int:
        return self.embed_dim // self.num_rep

    @property
    def feature_dim(self) -> int:
        return sum(self.num_filters)

    @property
    def cdtype(self):
        return jnp.dtype(self.compute_dtype)


def _init_tensor(rng, shape, init: str):
    """Reference init_params (discriminator.py:73-82): fan-in normal /
    U(-0.05, 0.05) / truncated normal, applied to every parameter."""
    stddev = 1.0 / np.sqrt(shape[0]) if len(shape) > 0 else 1.0
    if init == "uniform":
        return jnp.asarray(rng.uniform(-0.05, 0.05, size=shape), jnp.float32)
    elif init == "normal":
        return jnp.asarray(rng.normal(0.0, stddev, size=shape), jnp.float32)
    elif init == "truncated_normal":
        vals = rng.normal(0.0, stddev, size=shape + (4,))
        ok = (np.abs(vals) < 2 * stddev)
        idx = ok.argmax(axis=-1)
        picked = np.take_along_axis(vals, idx[..., None], axis=-1)[..., 0]
        return jnp.asarray(picked, jnp.float32)
    raise ValueError(init)


def init_relgan_params(cfg: RelganConfig, seed: int = 0) -> dict:
    rng = np.random.RandomState(seed)

    def t(shape):
        return _init_tensor(rng, shape, cfg.init)

    params: dict[str, Any] = {
        "embeddings": t((cfg.vocab_size, cfg.embed_dim)),  # Linear, no bias
        "convs": [],
        "highway_w": t((cfg.feature_dim, cfg.feature_dim)),
        "highway_b": t((cfg.feature_dim,)),
        "feature2out_w": t((cfg.feature_dim, 100)),
        "feature2out_b": t((100,)),
        "out2logits_w": t((100, 1)),
        "out2logits_b": t((1,)),
    }
    for n, f in zip(cfg.num_filters, cfg.filter_sizes):
        params["convs"].append({
            # OIHW: [out=n, in=1, kh=f, kw=emb_dim_single]
            "w": t((n, 1, f, cfg.emb_dim_single)),
            "b": t((n,)),
        })
    return params


def relgan_logits(params, cfg: RelganConfig, inp, *, train: bool = False,
                  rng=None):
    """inp: [bsz, seq_len, vocab] one-hot/soft -> logits [bsz * num_rep]
    (reference RelGAN_D.forward, transformer_gan.py:90-119)."""
    cd = cfg.cdtype
    bsz, seq = inp.shape[0], inp.shape[1]
    emb = inp.astype(cd) @ params["embeddings"].astype(cd)
    emb = emb[:, None, :, :]  # NCHW: [bsz, 1, seq, embed_dim]

    pools = []
    for conv in params["convs"]:
        out = jax.lax.conv_general_dilated(
            emb, conv["w"].astype(cd),
            window_strides=(1, cfg.emb_dim_single),
            padding="VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        ) + conv["b"].astype(cd)[None, :, None, None]
        out = jax.nn.relu(out)      # [bsz, n, seq-f+1, num_rep]
        pools.append(jnp.max(out, axis=2))  # [bsz, n, num_rep]
    pred = jnp.concatenate(pools, axis=1)   # [bsz, feature_dim, num_rep]
    pred = pred.transpose(0, 2, 1).reshape(-1, cfg.feature_dim)

    highway = pred @ params["highway_w"].astype(cd) + params[
        "highway_b"].astype(cd)
    gate = jax.nn.sigmoid(highway)
    pred = gate * jax.nn.relu(highway) + (1.0 - gate) * pred

    if train and rng is not None and cfg.dropout > 0:
        keep = jax.random.bernoulli(rng, 1.0 - cfg.dropout, pred.shape)
        pred = jnp.where(keep, pred / (1.0 - cfg.dropout), 0.0)

    pred = pred @ params["feature2out_w"].astype(cd) + params[
        "feature2out_b"].astype(cd)
    logits = pred @ params["out2logits_w"].astype(cd) + params[
        "out2logits_b"].astype(cd)
    return logits[:, 0]  # [bsz * num_rep]


# ---------------------------------------------------------------------------
# Vanilla CNN discriminator/classifier (reference model/discriminator.py
# CNNDiscriminator:26-82 / CNNClassifier:153-208; kept for inventory parity)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class CnnConfig:
    embed_dim: int = 64
    vocab_size: int = 310
    k_label: int = 2
    dropout: float = 0.2
    init: str = "uniform"
    filter_sizes: tuple = DIS_FILTER_SIZES
    num_filters: tuple = DIS_NUM_FILTERS
    padding_idx: int = 1

    @property
    def feature_dim(self) -> int:
        return sum(self.num_filters)


def init_cnn_params(cfg: CnnConfig, seed: int = 0) -> dict:
    rng = np.random.RandomState(seed)

    def t(shape):
        return _init_tensor(rng, shape, cfg.init)

    emb = np.array(t((cfg.vocab_size, cfg.embed_dim)))
    emb[cfg.padding_idx] = 0.0  # nn.Embedding(padding_idx=...) zeroes it
    params: dict[str, Any] = {
        "embeddings": jnp.asarray(emb),
        "convs": [{"w": t((n, 1, f, cfg.embed_dim)), "b": t((n,))}
                  for n, f in zip(cfg.num_filters, cfg.filter_sizes)],
        "highway_w": t((cfg.feature_dim, cfg.feature_dim)),
        "highway_b": t((cfg.feature_dim,)),
        "feature2out_w": t((cfg.feature_dim, cfg.k_label)),
        "feature2out_b": t((cfg.k_label,)),
    }
    return params


def cnn_features(params, cfg: CnnConfig, input_ids):
    """[bsz, seq] ids -> feature [bsz, feature_dim] (reference
    get_feature, discriminator.py:58-71)."""
    emb = params["embeddings"][input_ids][:, None]  # [bsz, 1, seq, emb]
    pools = []
    for conv in params["convs"]:
        out = jax.lax.conv_general_dilated(
            emb, conv["w"], window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        ) + conv["b"][None, :, None, None]
        out = jax.nn.relu(out)[..., 0]            # [bsz, n, seq-f+1]
        pools.append(jnp.max(out, axis=2))        # [bsz, n]
    pred = jnp.concatenate(pools, axis=1)
    highway = pred @ params["highway_w"] + params["highway_b"]
    gate = jax.nn.sigmoid(highway)
    return gate * jax.nn.relu(highway) + (1.0 - gate) * pred


def cnn_logits(params, cfg: CnnConfig, input_ids, *, train=False, rng=None):
    feat = cnn_features(params, cfg, input_ids)
    if train and rng is not None and cfg.dropout > 0:
        keep = jax.random.bernoulli(rng, 1.0 - cfg.dropout, feat.shape)
        feat = jnp.where(keep, feat / (1.0 - cfg.dropout), 0.0)
    return feat @ params["feature2out_w"] + params["feature2out_b"]


# ---------------------------------------------------------------------------
# GRU discriminator (reference model/discriminator.py:85-149 — an unused
# alternative in the reference; provided for inventory completeness)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class GruConfig:
    embedding_dim: int = 64
    vocab_size: int = 310
    hidden_dim: int = 64
    feature_dim: int = 64
    padding_idx: int = 1
    dropout: float = 0.2


def init_gru_params(cfg: GruConfig, seed: int = 0) -> dict:
    rng = np.random.RandomState(seed)

    def t(shape):
        return _init_tensor(rng, shape, "uniform")

    emb = np.array(t((cfg.vocab_size, cfg.embedding_dim)))
    emb[cfg.padding_idx] = 0.0
    h, e = cfg.hidden_dim, cfg.embedding_dim
    params = {"embeddings": jnp.asarray(emb), "layers": []}
    # 2 layers x 2 directions of GRU cells (torch nn.GRU layout:
    # w_ih [3h, in], w_hh [3h, h], gates ordered r, z, n)
    for layer in range(2):
        in_dim = e if layer == 0 else 2 * h
        for _ in range(2):  # fwd, bwd
            params["layers"].append({
                "w_ih": t((3 * h, in_dim)), "b_ih": t((3 * h,)),
                "w_hh": t((3 * h, h)), "b_hh": t((3 * h,)),
            })
    params["gru2hidden_w"] = t((2 * 2 * h, cfg.feature_dim))
    params["gru2hidden_b"] = t((cfg.feature_dim,))
    params["feature2out_w"] = t((cfg.feature_dim, 2))
    params["feature2out_b"] = t((2,))
    return params


def _gru_direction(cell, x, reverse: bool):
    """x: [seq, bsz, in] -> (outputs [seq, bsz, h], final h [bsz, h])."""
    h_dim = cell["w_hh"].shape[1]
    if reverse:
        x = x[::-1]

    def step(h, xt):
        gi = xt @ cell["w_ih"].T + cell["b_ih"]
        gh = h @ cell["w_hh"].T + cell["b_hh"]
        ir, iz, inn = jnp.split(gi, 3, -1)
        hr, hz, hn = jnp.split(gh, 3, -1)
        r = jax.nn.sigmoid(ir + hr)
        z = jax.nn.sigmoid(iz + hz)
        n = jnp.tanh(inn + r * hn)
        h_new = (1 - z) * n + z * h
        return h_new, h_new

    h0 = jnp.zeros((x.shape[1], h_dim), x.dtype)
    h_last, outs = jax.lax.scan(step, h0, x)
    if reverse:
        outs = outs[::-1]
    return outs, h_last


def gru_logits(params, cfg: GruConfig, input_ids, *, train=False, rng=None):
    """[bsz, seq] ids -> [bsz, 2] logits (reference GRUDiscriminator)."""
    emb = params["embeddings"][input_ids].transpose(1, 0, 2)  # [seq,bsz,e]
    finals = []
    x = emb
    for layer in range(2):
        fwd_cell = params["layers"][2 * layer]
        bwd_cell = params["layers"][2 * layer + 1]
        of, hf = _gru_direction(fwd_cell, x, reverse=False)
        ob, hb = _gru_direction(bwd_cell, x, reverse=True)
        x = jnp.concatenate([of, ob], axis=-1)
        finals += [hf, hb]
    hidden = jnp.concatenate(finals, axis=-1)  # [bsz, 4h]
    feature = jnp.tanh(hidden @ params["gru2hidden_w"]
                       + params["gru2hidden_b"])
    if train and rng is not None and cfg.dropout > 0:
        keep = jax.random.bernoulli(rng, 1.0 - cfg.dropout, feature.shape)
        feature = jnp.where(keep, feature / (1.0 - cfg.dropout), 0.0)
    return feature @ params["feature2out_w"] + params["feature2out_b"]
