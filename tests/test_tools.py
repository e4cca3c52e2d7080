"""tools/gen_npy_samples.py — the checkpoint -> .npy-sample-dir bridge.

The reference's bert_score CLI consumes per-model directories of
generated .npy token files populated by its inference pipeline
(reference metrics/bert_score.py:141-167); this tool is our producer for
that layout, so its output contract (file count, shape, dtype, vocab
range, seed determinism) is what metrics/bert_score.run_score builds on.
"""

import importlib.util
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_tool(argv):
    spec = importlib.util.spec_from_file_location(
        "gen_npy_samples", os.path.join(REPO, "tools", "gen_npy_samples.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    old = sys.argv
    sys.argv = ["gen_npy_samples.py"] + argv
    try:
        mod.main()
    finally:
        sys.argv = old


def _make_work_dir(tmp_path):
    import jax
    from transformer_gan_tpu.config import get_default_cfg_training
    from transformer_gan_tpu.models import xl
    from transformer_gan_tpu.train import checkpoint as ckpt

    cfg = get_default_cfg_training()
    cfg.defrost()
    cfg.MODEL.num_layers = 2
    cfg.MODEL.num_heads = 2
    cfg.MODEL.units = 32
    cfg.MODEL.inner_size = 64
    cfg.freeze()
    work = tmp_path / "work"
    work.mkdir()
    with open(work / "config.yml", "w") as f:
        f.write(cfg.dump())
    xcfg = xl.XLConfig.from_cfg(cfg, 310, 0)
    params = xl.init_xl_params(xcfg, seed=3)
    ckpt.save_checkpoint(str(work), "checkpoint_best",
                         {"params": jax.tree.map(lambda x: x, params)})
    return work


def test_gen_npy_samples_output_contract(tmp_path):
    work = _make_work_dir(tmp_path)
    out = tmp_path / "npy_out"
    _run_tool(["--model_dir", str(work), "--out", str(out),
               "--num", "4", "--wave", "2", "--seq_len", "16"])
    files = sorted(os.listdir(out))
    assert files == [f"sample_{k:04d}.npy" for k in range(4)]
    arrs = [np.load(out / f) for f in files]
    for a in arrs:
        assert a.shape == (16,) and a.dtype == np.int32
        assert a[0] == 0  # <S> start token
        assert (a >= 0).all() and (a < 310).all()
    # argmax-gumbel at temperature 1 from random params must not emit one
    # constant sequence across all lanes (distinct per-lane draws)
    assert any(not np.array_equal(arrs[0], a) for a in arrs[1:])


def test_gen_npy_samples_seed_determinism(tmp_path):
    work = _make_work_dir(tmp_path)
    out1, out2, out3 = (tmp_path / d for d in ("o1", "o2", "o3"))
    common = ["--model_dir", str(work), "--num", "2", "--wave", "2",
              "--seq_len", "12"]
    _run_tool(common + ["--out", str(out1), "--seed", "7"])
    _run_tool(common + ["--out", str(out2), "--seed", "7"])
    _run_tool(common + ["--out", str(out3), "--seed", "8"])
    a1 = [np.load(out1 / f) for f in sorted(os.listdir(out1))]
    a2 = [np.load(out2 / f) for f in sorted(os.listdir(out2))]
    a3 = [np.load(out3 / f) for f in sorted(os.listdir(out3))]
    assert all(np.array_equal(x, y) for x, y in zip(a1, a2))
    assert any(not np.array_equal(x, y) for x, y in zip(a1, a3))
