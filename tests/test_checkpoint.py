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


def test_restore_on_different_topology(tmp_path, params):
    """Checkpoints are topology-independent (the reference's torch
    checkpoints are): a run saved from an 8-device mesh must restore in
    a 1-device process for generation (generate.py) and warm starts.
    Regression: orbax restore previously failed with "available devices
    are different from the devices used to save"."""
    import subprocess
    import sys

    from transformer_gan_tpu.parallel import mesh as pmesh
    from transformer_gan_tpu.parallel import sharding as psh

    mesh = pmesh.make_mesh()
    assert mesh.devices.size == 8
    placed = jax.device_put(
        {"params": params},
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec()))
    path = ckpt.save_checkpoint(str(tmp_path), "checkpoint_best", placed)
    del psh

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = f"""
import os, sys
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from transformer_gan_tpu.models import xl
from transformer_gan_tpu.train import checkpoint as ckpt
assert len(jax.devices()) == 1, jax.devices()
cfg = xl.XLConfig(n_layer=2, n_head=2, d_model=16, d_inner=32)
template = xl.init_xl_params(cfg, seed=0)
# template path (trainer restart / generate)
back = ckpt.load_checkpoint({path!r}, {{"params": template}})
# no-template path (load_generator_params)
full = ckpt.load_checkpoint({path!r})
w = np.load(os.path.join({str(tmp_path)!r}, "ref_word_emb.npy"))
assert np.array_equal(np.asarray(back["params"]["word_emb"]), w)
assert np.array_equal(np.asarray(full["params"]["word_emb"]), w)
print("OK")
"""
    np.save(os.path.join(str(tmp_path), "ref_word_emb.npy"),
            np.asarray(params["word_emb"]))
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=1")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=240)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "OK" in out.stdout


def test_checkpoint_exists(tmp_path, params):
    assert not ckpt.checkpoint_exists(str(tmp_path), "checkpoint_last")
    ckpt.save_checkpoint(str(tmp_path), "checkpoint_last",
                         {"params": params})
    assert ckpt.checkpoint_exists(str(tmp_path), "checkpoint_last")
