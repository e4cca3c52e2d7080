"""Config system: reference YAML compatibility + merge semantics."""

import glob
import os

import pytest

from transformer_gan_tpu.config import (CfgNode, get_default_cfg_inference,
                                        get_default_cfg_training, is_null)

REF = "/root/reference"


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference unavailable")
@pytest.mark.parametrize("yml", sorted(glob.glob(
    os.path.join(REF, "model", "training_config", "*.yml"))))
def test_reference_training_yamls_load(yml):
    cfg = get_default_cfg_training()
    cfg.defrost()
    cfg.merge_from_file(yml)
    cfg.freeze()
    assert cfg.MODEL.units == 500
    assert cfg.TRAIN.batch_size in (256, 512)


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference unavailable")
@pytest.mark.parametrize("yml", sorted(glob.glob(
    os.path.join(REF, "model", "inference_config", "*.yml"))))
def test_reference_inference_yamls_load(yml):
    cfg = get_default_cfg_inference()
    cfg.defrost()
    cfg.merge_from_file(yml)
    cfg.freeze()
    assert cfg.GENERATION.generation_length == 4096
    assert cfg.MODEL.memory_length == 4146


@pytest.mark.parametrize("yml", sorted(glob.glob(os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "training_config", "*.yml"))))
def test_shipped_training_yamls_load(yml):
    cfg = get_default_cfg_training()
    cfg.defrost()
    cfg.merge_from_file(yml)
    cfg.freeze()


def test_unknown_key_rejected():
    cfg = get_default_cfg_training()
    cfg.defrost()
    with pytest.raises(KeyError):
        cfg._merge_dict({"TRAIN": {"nope": 1}}, [])


def test_frozen_rejects_set():
    cfg = get_default_cfg_training()
    with pytest.raises(AttributeError):
        cfg.TRAIN.lr = 1.0


def test_str_roundtrips_through_yaml(tmp_path):
    # config.yml written by the trainer must merge back (generate.py flow)
    cfg = get_default_cfg_training()
    p = tmp_path / "config.yml"
    p.write_text(str(cfg))
    cfg2 = get_default_cfg_training()
    cfg2.defrost()
    cfg2.merge_from_file(str(p))
    assert cfg2.to_dict() == cfg.to_dict()


def test_is_null():
    assert is_null("Null") and is_null("") and is_null(None)
    assert not is_null("cnn")


def test_schedules_match_reference_semantics():
    """LR multipliers vs the reference's scheduler stepping
    (train.py:462-568,1097-1133)."""
    import numpy as np
    from transformer_gan_tpu.train import optim as topt

    # inv_sqrt with warmup: lambda(k) = k/w for k<=w else sqrt(w/k) floored
    s = topt.make_schedule("inv_sqrt", 0.004, 100000, 0.0001, 4000)
    assert float(s(0)) == 0.0
    np.testing.assert_allclose(float(s(2000)), 0.5)
    np.testing.assert_allclose(float(s(4000)), 1.0)
    np.testing.assert_allclose(float(s(16000)), 0.5)
    np.testing.assert_allclose(float(s(10**9)), 0.0001 / 0.004)

    # cosine: phase runs on (step - warmup)
    c = topt.make_schedule("cosine", 0.004, 1000, 0.0, 100)
    np.testing.assert_allclose(float(c(50)), 0.5)       # warmup
    np.testing.assert_allclose(float(c(100)), 1.0)      # cos(0)
    np.testing.assert_allclose(float(c(600)), 0.5, rtol=1e-5)  # cos(pi/2)

    # constant with warmup
    k = topt.make_schedule("constant", 0.004, 1000, 0.0, 10)
    np.testing.assert_allclose(float(k(5)), 0.5)
    np.testing.assert_allclose(float(k(50)), 1.0)

    # plateau tracker halves after patience non-improving evals
    t = topt.PlateauTracker(0.5, 2, 1e-5, 0.004)
    assert t.step(1.0) == 1.0
    assert t.step(1.1) == 1.0
    assert t.step(1.1) == 1.0
    assert t.step(1.1) == 0.5
