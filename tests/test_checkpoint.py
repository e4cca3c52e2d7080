"""Checkpoint save/restore semantics (orbax layer)."""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from transformer_gan_tpu.models import xl  # noqa: E402
from transformer_gan_tpu.train import checkpoint as ckpt  # noqa: E402


@pytest.fixture
def params():
    cfg = xl.XLConfig(n_layer=2, n_head=2, d_model=16, d_inner=32)
    return xl.init_xl_params(cfg, seed=5)


def _tree_equal(a, b):
    fa = jax.tree_util.tree_leaves(a)
    fb = jax.tree_util.tree_leaves(b)
    return len(fa) == len(fb) and all(
        np.array_equal(np.asarray(x), np.asarray(y))
        for x, y in zip(fa, fb))


def test_save_restore_roundtrip(tmp_path, params):
    payload = {"params": params,
               "aux": {"m": jnp.arange(5), "n": [jnp.ones((2, 2))]}}
    path = ckpt.save_checkpoint(str(tmp_path), "checkpoint_last", payload,
                                {"train_step": 7, "best_val_loss": 1.5,
                                 "vocab": ["<S>", "<PAD>"]})
    assert os.path.isdir(path)
    back = ckpt.load_checkpoint(path, payload)
    assert _tree_equal(back, payload)
    meta = ckpt.load_metadata(path)
    assert meta["train_step"] == 7
    assert meta["vocab"][1] == "<PAD>"


def test_overwrite_same_name(tmp_path, params):
    payload = {"params": params}
    ckpt.save_checkpoint(str(tmp_path), "checkpoint_last", payload,
                         {"train_step": 1})
    p2 = jax.tree.map(lambda x: x + 1.0, params)
    ckpt.save_checkpoint(str(tmp_path), "checkpoint_last", {"params": p2},
                         {"train_step": 2})
    back = ckpt.load_checkpoint(
        os.path.join(str(tmp_path), "checkpoint_last"), {"params": p2})
    assert _tree_equal(back["params"], p2)
    assert ckpt.load_metadata(
        os.path.join(str(tmp_path), "checkpoint_last"))["train_step"] == 2


def test_generator_only_warm_start_nonstrict(tmp_path, params):
    """load_generator_params must copy matching leaves and keep fresh init
    for missing/mismatched ones (reference strict=False trimming,
    train.py:591-609)."""
    full = {"params": params, "opt_state": {"junk": jnp.zeros((3,))}}
    path = ckpt.save_checkpoint(str(tmp_path), "checkpoint_best", full)

    cfg_big = xl.XLConfig(n_layer=3, n_head=2, d_model=16, d_inner=32)
    template = xl.init_xl_params(cfg_big, seed=9)
    restored = ckpt.load_generator_params(path, template)
    # shared leaves copied
    assert np.array_equal(np.asarray(restored["word_emb"]),
                          np.asarray(params["word_emb"]))
    assert np.array_equal(
        np.asarray(restored["layers"][1]["qkv_w"]),
        np.asarray(params["layers"][1]["qkv_w"]))
    # extra layer kept from the fresh template
    assert np.array_equal(
        np.asarray(restored["layers"][2]["qkv_w"]),
        np.asarray(template["layers"][2]["qkv_w"]))


def test_checkpoint_exists(tmp_path, params):
    assert not ckpt.checkpoint_exists(str(tmp_path), "checkpoint_last")
    ckpt.save_checkpoint(str(tmp_path), "checkpoint_last",
                         {"params": params})
    assert ckpt.checkpoint_exists(str(tmp_path), "checkpoint_last")
