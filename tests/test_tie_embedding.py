"""MODEL.tie_embedding honoring (reference mem_transformer.py:411-418).

tie_embedding=True (default) shares the softmax weight with the token
embedding; False adds a separate crit_w initialized like any Linear
weight (train.py:306-315). Also covers the TPU.* config keys that must
fail loud rather than be silently ignored (param_dtype, mesh axes).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transformer_gan_tpu.config import get_default_cfg_training
from transformer_gan_tpu.models import xl


def _cfgs(**kw):
    return xl.XLConfig(n_layer=2, n_head=2, d_model=16, d_inner=32,
                       n_token=310, dropout=0.0, dropatt=0.0, **kw)


def test_untied_adds_crit_w():
    tied = xl.init_xl_params(_cfgs(), seed=0)
    untied = xl.init_xl_params(_cfgs(tie_embedding=False), seed=0)
    assert "crit_w" not in tied
    assert untied["crit_w"].shape == (310, 16)
    # drawn through the same init_weight dispatch as other weights
    assert float(jnp.std(untied["crit_w"])) == pytest.approx(0.01, rel=0.3)


def test_untied_with_equal_weights_matches_tied():
    cfg_t, cfg_u = _cfgs(), _cfgs(tie_embedding=False)
    params = xl.init_xl_params(cfg_t, seed=0)
    up = dict(params, crit_w=params["word_emb"])
    rng = np.random.RandomState(0)
    data = jnp.asarray(rng.randint(2, 310, (8, 3)))
    target = jnp.asarray(rng.randint(2, 310, (8, 3)))
    mems = xl.init_mems(cfg_t, 16, 3)
    reset = jnp.zeros((3,), bool)
    nll_t, _ = xl.forward_nll(params, cfg_t, data, target, reset, mems)
    nll_u, _ = xl.forward_nll(up, cfg_u, data, target, reset, mems)
    np.testing.assert_allclose(np.asarray(nll_t), np.asarray(nll_u),
                               rtol=1e-6)


def test_untied_weight_actually_changes_logits_and_grads():
    cfg = _cfgs(tie_embedding=False)
    params = xl.init_xl_params(cfg, seed=0)
    assert not np.allclose(np.asarray(params["crit_w"]),
                           np.asarray(params["word_emb"]))
    rng = np.random.RandomState(1)
    data = jnp.asarray(rng.randint(2, 310, (8, 3)))
    target = jnp.asarray(rng.randint(2, 310, (8, 3)))
    mems = xl.init_mems(cfg, 16, 3)
    reset = jnp.zeros((3,), bool)

    def loss(p):
        nll, _ = xl.forward_nll(p, cfg, data, target, reset, mems)
        return jnp.mean(nll)

    g = jax.grad(loss)(params)
    # softmax gradient lands on crit_w; word_emb only gets the
    # embedding-lookup gradient (rows of used tokens)
    assert float(jnp.abs(g["crit_w"]).max()) > 0
    used = np.unique(np.asarray(data))
    unused = np.setdiff1d(np.arange(310), used)
    assert float(jnp.abs(g["word_emb"][unused]).max()) == 0.0
    assert float(jnp.abs(g["crit_w"][unused]).max()) > 0


def test_from_cfg_propagates_tie_embedding():
    cfg = get_default_cfg_training()
    assert xl.XLConfig.from_cfg(cfg, 310).tie_embedding is True
    cfg.defrost()
    cfg.MODEL.tie_embedding = False
    assert xl.XLConfig.from_cfg(cfg, 310).tie_embedding is False


def test_stack_decode_params_uses_crit_w():
    from transformer_gan_tpu.ops import pallas_decode as pdec
    cfg = _cfgs(tie_embedding=False, cache_kv=True)
    params = xl.init_xl_params(cfg, seed=0)
    stacked = pdec.stack_decode_params(params, cfg)
    np.testing.assert_allclose(np.asarray(stacked["emb_t"]),
                               np.asarray(params["crit_w"]).T, rtol=1e-6)


def test_param_dtype_fails_loud():
    cfg = get_default_cfg_training()
    cfg.defrost()
    cfg.TPU.param_dtype = "bfloat16"
    with pytest.raises(NotImplementedError, match="param_dtype"):
        xl.XLConfig.from_cfg(cfg, 310)


def test_mesh_from_cfg_validates_axes():
    from transformer_gan_tpu.parallel import mesh as pmesh
    cfg = get_default_cfg_training()
    mesh = pmesh.make_mesh_from_cfg(cfg)
    assert mesh.axis_names == ("data",)
    assert mesh.devices.size == len(jax.devices())
    cfg.defrost()
    cfg.TPU.mesh_shape = [2]
    assert pmesh.make_mesh_from_cfg(cfg).devices.size == 2
    cfg.TPU.mesh_axes = ["model"]
    with pytest.raises(NotImplementedError, match="mesh"):
        pmesh.make_mesh_from_cfg(cfg)
