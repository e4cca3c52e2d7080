"""BERT MLM pretrainer tests, incl. the data-parallel mesh path
(reference BERT/main.py trains with DDP/DataParallel, :267-275)."""

import glob
import os
import tempfile

import numpy as np
import pytest


@pytest.fixture(scope="module")
def mlm_data():
    from transformer_gan_tpu.data.codec import build_performance_vocab
    rng = np.random.RandomState(5)
    root = tempfile.mkdtemp()
    vocab_file = os.path.join(root, "vocab.txt")
    with open(vocab_file, "w") as f:
        f.write("\n".join(build_performance_vocab()))
    data_dir = os.path.join(root, "corpus")
    for split in ("train", "valid"):
        os.makedirs(os.path.join(data_dir, split))
        for i in range(4):
            arr = rng.randint(2, 310, size=(600,)).astype(np.int32)
            np.save(os.path.join(data_dir, split, f"s{i}.npy"), arr)
    return data_dir, vocab_file


def _make_trainer(mlm_data, out_dir, mesh=None, batch_size=8, seed=42):
    from transformer_gan_tpu.bert.mlm import MlmTrainer
    data_dir, vocab_file = mlm_data
    return MlmTrainer(
        data_dir=data_dir, output_dir=out_dir, vocab_file=vocab_file,
        num_hidden_layers=2, hidden_size=48, block_size=64,
        batch_size=batch_size, learning_rate=1e-3, warmup_steps=2,
        max_steps=4, logging_steps=2, save_steps=4, eval_steps=4,
        seed=seed, mesh=mesh)


def test_mlm_trainer_single_device(mlm_data):
    with tempfile.TemporaryDirectory() as out:
        tr = _make_trainer(mlm_data, out)
        tr.train()
        assert tr.step == 4
        assert np.isfinite(tr.evaluate())
        assert glob.glob(os.path.join(out, "checkpoint-4"))


def test_mlm_trainer_on_8_device_mesh(mlm_data):
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from transformer_gan_tpu.parallel import mesh as pmesh
    with tempfile.TemporaryDirectory() as out:
        tr = _make_trainer(mlm_data, out, mesh=pmesh.make_mesh(8))
        assert tr.mesh is not None
        tr.train()
        assert tr.step == 4
        for leaf in jax.tree.leaves(tr.params):
            assert leaf.sharding.is_fully_replicated
            assert np.isfinite(np.asarray(leaf)).all()
        assert np.isfinite(tr.evaluate())


def test_mlm_mesh_matches_single_device(mlm_data):
    """Sharded-batch GSPMD gradients == full-batch single-device gradients
    for the identical first update."""
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from transformer_gan_tpu.parallel import mesh as pmesh

    def first_update(mesh):
        with tempfile.TemporaryDirectory() as out:
            tr = _make_trainer(mlm_data, out, mesh=mesh)
            batch = tr._place(tr.train_blocks[:tr.batch_size])
            r = jax.random.PRNGKey(9)
            params, _, loss = tr._train_step(tr.params, tr.opt_state,
                                             batch, r)
            return jax.tree.map(np.asarray, params), float(loss)

    p8, l8 = first_update(pmesh.make_mesh(8))
    p1, l1 = first_update(None)
    np.testing.assert_allclose(l8, l1, rtol=1e-5)
    for a, b in zip(jax.tree.leaves(p8), jax.tree.leaves(p1)):
        np.testing.assert_allclose(a, b, atol=2e-6, rtol=2e-5)
