"""Multi-device GAN training: the flagship adversarial configuration on the
8-virtual-device CPU mesh.

The reference wraps the WHOLE TransformerGAN in DDP (model/train.py:649-655)
so discriminator and generator-GAN gradients are all-reduced across ranks.
Here the equivalent is: GAN batches sharded over the data mesh, dis/disD
params + gen/dis opt states replicated, GSPMD-inserted gradient psums.
These tests actually enter dis_phase/gen_phase on the mesh (the plain
trainer test disables GAN) and check the losses move and the state stays
replicated and finite.
"""

import os
import tempfile

import numpy as np
import pytest


@pytest.fixture(scope="module")
def data_dir():
    from transformer_gan_tpu.data.codec import build_performance_vocab
    rng = np.random.RandomState(7)
    d = tempfile.mkdtemp()
    with open(os.path.join(d, "vocab.txt"), "w") as f:
        f.write("\n".join(build_performance_vocab()))
    for split, n in [("train", 24), ("valid", 10), ("test", 10)]:
        os.makedirs(os.path.join(d, split))
        for i in range(n):
            length = rng.randint(80, 400)
            arr = rng.randint(2, 310, size=(length,)).astype(np.int32)
            np.save(os.path.join(d, split, f"p{i:03d}.npy"), arr)
    return d


def _tiny_gan_cfg():
    from transformer_gan_tpu.config import get_default_cfg_training
    cfg = get_default_cfg_training()
    cfg.defrost()
    cfg.MODEL.num_layers = 2
    cfg.MODEL.num_heads = 2
    cfg.MODEL.units = 16
    cfg.MODEL.inner_size = 32
    cfg.TRAIN.batch_size = 16          # 2 rows/device on the MLE step
    cfg.TRAIN.batch_chunk = 2
    cfg.TRAIN.tgt_length = 16
    cfg.TRAIN.mem_length = 16
    cfg.TRAIN.max_step = 4
    cfg.TRAIN.log_interval = 2
    cfg.TRAIN.eval_interval = 4
    cfg.TRAIN.warmup_step = 2
    cfg.TRAIN.scheduler = "inv_sqrt"
    cfg.EVALUATE.batch_size = 8        # sharded eval path
    cfg.EVALUATE.tgt_length = 16
    cfg.EVALUATE.mem_length = 16
    cfg.DISCRIMINATOR.type = "cnn"
    cfg.DISCRIMINATOR.start_iter = 0   # phases fire from step 1
    cfg.DISCRIMINATOR.dis_loss_freq = 1
    cfg.DISCRIMINATOR.gen_loss_freq = 1
    cfg.DISCRIMINATOR.dis_steps = 1
    cfg.DISCRIMINATOR.freeze_discriminator = False
    cfg.DISCRIMINATOR.tgt_len = 16
    cfg.DISCRIMINATOR.mem_len = 16
    cfg.DISCRIMINATOR.context_len = 3
    cfg.DISCRIMINATOR.batch_chunk = 2  # dis micro-batch: 8 rows / 8 devices
    cfg.DISCRIMINATOR.CNN.embed_dim = 16
    cfg.DISCRIMINATOR.CNN.num_rep = 4
    cfg.DISCRIMINATOR.CNN.loss_type = "rsgan"
    cfg.TPU.compute_dtype = "float32"
    cfg.TPU.rng_impl = "threefry2x32"
    cfg.freeze()
    return cfg


def test_gan_trainer_on_8_device_mesh(data_dir):
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from transformer_gan_tpu.train.loop import Trainer

    cfg = _tiny_gan_cfg()
    with tempfile.TemporaryDirectory() as wd:
        trainer = Trainer(cfg, data_dir=data_dir, work_dir=wd, debug=True)
        assert int(trainer.n_devices) == 8
        assert trainer.gan is not None and trainer.gan.mesh is not None

        dis_before = jax.tree.leaves(trainer.gan.dis_params)[0].copy()
        gen_before = np.asarray(trainer.state.params["word_emb"]).copy()
        trainer.train()

        # both adversarial phases actually ran and were logged
        # (pop_log_stats fires at log_interval; re-run one phase to check
        # the accumulators directly)
        trainer.gan.dis_phase(trainer.train_step_num)
        trainer.gan.gen_phase(trainer.train_step_num)
        assert trainer.gan.log_dis_num > 0
        assert trainer.gan.log_gen_num > 0

        # discriminator and generator both moved under the adversarial
        # losses, stayed finite, and stayed replicated on the mesh
        dis_after = jax.tree.leaves(trainer.gan.dis_params)[0]
        assert np.isfinite(np.asarray(dis_after)).all()
        assert not np.allclose(np.asarray(dis_before), np.asarray(dis_after))
        gen_after = np.asarray(trainer.state.params["word_emb"])
        assert np.isfinite(gen_after).all()
        assert not np.allclose(gen_before, gen_after)

        for leaf in jax.tree.leaves(trainer.gan.dis_params):
            assert leaf.sharding.is_fully_replicated


def test_gan_mesh_matches_single_device(data_dir):
    """One dis+gen phase on the 8-device mesh must produce the same
    parameter updates as the identical phase on one device (the GSPMD
    psum-mean of sharded-batch grads == the full-batch grads)."""
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from transformer_gan_tpu.train.loop import Trainer

    cfg = _tiny_gan_cfg()

    def run(mesh_devices):
        from transformer_gan_tpu.parallel import mesh as pmesh
        mesh = pmesh.make_mesh(mesh_devices)
        with tempfile.TemporaryDirectory() as wd:
            trainer = Trainer(cfg, data_dir=data_dir, work_dir=wd,
                              debug=True, mesh=mesh)
            gen0 = jax.tree.map(np.asarray, trainer.state.params)
            trainer.gan.dis_phase(1)
            trainer.gan.gen_phase(1)
            return (jax.tree.map(np.asarray, trainer.gan.dis_params),
                    jax.tree.map(np.asarray, trainer.state.params), gen0)

    dis8, gen8, gen0 = run(8)
    dis1, gen1, _ = run(1)
    # dis optimizer lr is device-count independent: params match up to
    # Adam's step-1 sensitivity on near-zero-gradient coordinates (the
    # sharded-psum vs full-batch reassociation can flip sign(g) there
    # and cost a fraction of lr on that coordinate — the PARITY.md
    # drift note; observed on a single scalar bias leaf)
    for a, b in zip(jax.tree.leaves(dis8), jax.tree.leaves(dis1)):
        np.testing.assert_allclose(a, b, atol=1e-4, rtol=2e-4)
    # the gen GAN optimizer intentionally uses lr/n_devices (reference
    # per-rank lr = global lr / num_gpus, train.py:392,409), so the
    # first-step update directions must match after rescaling by 8
    for a, b, z in zip(jax.tree.leaves(gen8), jax.tree.leaves(gen1),
                       jax.tree.leaves(gen0)):
        np.testing.assert_allclose((a - z) * 8.0, b - z,
                                   atol=2e-5, rtol=2e-4)


def _tiny_spanbert_cfg():
    """The flagship spanbert op-point shrunk to test size: BERT
    discriminator + wgan-gp (second-order gradient-penalty grads — the
    most sharding-sensitive program in the stack) + layer freezing.
    Reference: training_config/experiment_spanbert.yml:43-75."""
    cfg = _tiny_gan_cfg()
    cfg.defrost()
    cfg.DISCRIMINATOR.type = "bert"
    cfg.DISCRIMINATOR.BERT.hidden_size = 32
    cfg.DISCRIMINATOR.BERT.num_hidden_layers = 2
    cfg.DISCRIMINATOR.BERT.num_attention_heads = 2
    cfg.DISCRIMINATOR.BERT.intermediate_size = 64
    cfg.DISCRIMINATOR.BERT.loss_type = "wgan-gp"
    cfg.DISCRIMINATOR.BERT.random_weights = True
    cfg.DISCRIMINATOR.BERT.freeze_layers = ["0"]
    cfg.freeze()
    return cfg


def test_spanbert_gan_mesh_matches_single_device(data_dir):
    """BERT-D + wgan-gp dis/gen phases on the 8-device mesh must match
    the identical phases on one device (GSPMD psum of the sharded-batch
    second-order GP grads == the full-batch grads), with the frozen
    layer actually frozen."""
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from transformer_gan_tpu.train.loop import Trainer

    cfg = _tiny_spanbert_cfg()

    def run(mesh_devices):
        from transformer_gan_tpu.parallel import mesh as pmesh
        mesh = pmesh.make_mesh(mesh_devices)
        with tempfile.TemporaryDirectory() as wd:
            trainer = Trainer(cfg, data_dir=data_dir, work_dir=wd,
                              debug=True, mesh=mesh)
            dis0 = jax.tree.map(np.asarray, trainer.gan.dis_params)
            gen0 = jax.tree.map(np.asarray, trainer.state.params)
            trainer.gan.dis_phase(1)
            trainer.gan.gen_phase(1)
            return (jax.tree.map(np.asarray, trainer.gan.dis_params),
                    jax.tree.map(np.asarray, trainer.state.params),
                    dis0, gen0)

    dis8, gen8, dis0, gen0 = run(8)
    dis1, gen1, _, _ = run(1)

    # the dis update was real (wgan-gp wiring is live on the mesh)
    assert any(
        not np.array_equal(a, z)
        for a, z in zip(jax.tree.leaves(dis8), jax.tree.leaves(dis0)))

    for a, b in zip(jax.tree.leaves(dis8), jax.tree.leaves(dis1)):
        np.testing.assert_allclose(a, b, atol=1e-4, rtol=2e-4)
    for a, b, z in zip(jax.tree.leaves(gen8), jax.tree.leaves(gen1),
                       jax.tree.leaves(gen0)):
        np.testing.assert_allclose((a - z) * 8.0, b - z,
                                   atol=2e-5, rtol=2e-4)

    # frozen encoder layer 0 must not have moved; embeddings (random
    # init) must be trainable (calculate_unfreeze_idx semantics,
    # transformer_gan.py:568-585)
    for a, z in zip(jax.tree.leaves(dis8["layers"][0]),
                    jax.tree.leaves(dis0["layers"][0])):
        np.testing.assert_array_equal(a, z)
    moved = any(
        not np.array_equal(a, z)
        for a, z in zip(jax.tree.leaves(dis8["layers"][1]),
                        jax.tree.leaves(dis0["layers"][1])))
    assert moved, "unfrozen BERT layer did not move over a dis phase"


def test_gan_parallel_chunks_matches_scan(data_dir):
    """TPU.gan_parallel_chunks (vmap'ed micro-chunks, one wide sampling
    scan) produces the same dis/gen updates as the sequential lax.scan
    over chunks: chunks are independent and per-chunk RNG keys identical,
    so only the gradient reduction order differs."""
    import jax
    from transformer_gan_tpu.parallel import mesh as pmesh
    from transformer_gan_tpu.train.loop import Trainer

    def run(parallel):
        cfg = _tiny_gan_cfg()
        cfg.defrost()
        cfg.TPU.gan_parallel_chunks = parallel
        cfg.freeze()
        mesh = pmesh.make_mesh(1)
        with tempfile.TemporaryDirectory() as wd:
            trainer = Trainer(cfg, data_dir=data_dir, work_dir=wd,
                              debug=True, mesh=mesh)
            trainer.gan.dis_phase(1)
            trainer.gan.gen_phase(1)
            return (jax.tree.map(np.asarray, trainer.gan.dis_params),
                    jax.tree.map(np.asarray, trainer.state.params))

    dis_v, gen_v = run(True)
    dis_s, gen_s = run(False)
    for a, b in zip(jax.tree.leaves(dis_v), jax.tree.leaves(dis_s)):
        np.testing.assert_allclose(a, b, atol=2e-5, rtol=2e-4)
    for a, b in zip(jax.tree.leaves(gen_v), jax.tree.leaves(gen_s)):
        np.testing.assert_allclose(a, b, atol=2e-5, rtol=2e-4)
