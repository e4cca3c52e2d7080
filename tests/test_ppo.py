"""PPO branch coverage: surrogate/P0 value parity vs the reference
formulas, and the full clf/dis/gen phase chain end-to-end on 1 and 8
devices (reference transformer_gan.py:351-389,418-426 and
train.py:1031-1049 were previously exercised only through the loss-zoo
value test)."""

import os
import tempfile

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from transformer_gan_tpu.models import discriminator as disc_mod
from transformer_gan_tpu.models import gan as gan_mod


# ---------------------------------------------------------------------------
# Value parity: ppo_surrogate / compute_P0 vs the reference formulas
# ---------------------------------------------------------------------------

def _torch_reference_surrogate(torch, d1_logits, d_out_fake, P0, clip):
    """Transcription of transformer_gan.py:376-389,418-422: D1/P1 ratio,
    clamp, clipped surrogate with the min/max sign split."""
    D1 = torch.sigmoid(d1_logits)
    P1 = 1.0 - D1
    ratio = P1 / torch.clamp(D1 * P0, min=1e-7)
    ratio_clipped = torch.clamp(ratio, 1.0 - clip, 1.0 + clip)
    surr1 = ratio * d_out_fake
    surr2 = ratio_clipped * d_out_fake
    return torch.where(d_out_fake > 0, torch.min(surr1, surr2),
                       torch.max(surr1, surr2))


@pytest.mark.parametrize("num_rep_main", [1, 4])
def test_ppo_surrogate_matches_reference_formula(num_rep_main):
    """Same dis_D (copied-weight RelGAN, num_rep=1) on both sides; the
    num_rep_main=4 case covers the rep-tiling branch the reference would
    crash on (models/gan.py ppo_surrogate; PPO was only ever run with the
    BERT main D upstream)."""
    torch = pytest.importorskip("torch")

    bsz, length, V = 3, 8, 310
    gcfg = gan_mod.GanConfig(dis_type="cnn", loss_type="ppo",
                             ppo_dis_type="cnn", clip_param=0.4,
                             tgt_len=length, n_token=V)
    dcfg = disc_mod.RelganConfig(embed_dim=16, num_rep=1, vocab_size=V,
                                 dropout=0.0)
    disD = disc_mod.init_relgan_params(dcfg, seed=5)

    rng = np.random.RandomState(0)
    fake = rng.dirichlet(np.ones(V), size=(length, bsz)).astype(np.float32)
    # main-D scores straddling zero to hit BOTH sides of the where()
    d_fake = (rng.randn(bsz * num_rep_main) * 2.0).astype(np.float32)
    P0_prev = np.abs(rng.randn(bsz)).astype(np.float32) + 0.1

    # ours
    P0 = gan_mod.compute_P0(disD, dcfg, gcfg, jnp.asarray(fake))
    surr = gan_mod.ppo_surrogate(disD, dcfg, gcfg, jnp.asarray(fake),
                                 jnp.asarray(d_fake), jnp.asarray(P0_prev))

    # reference formulas on the SAME dis_D scores
    d1_logits = disc_mod.relgan_logits(disD, dcfg,
                                       jnp.asarray(fake).transpose(1, 0, 2))
    D0 = torch.sigmoid(torch.from_numpy(np.asarray(d1_logits)))
    ref_P0 = (1.0 - D0) / torch.clamp(D0, min=1e-7)
    np.testing.assert_allclose(np.asarray(P0), ref_P0.numpy(),
                               rtol=1e-5, atol=1e-6)

    ratio_P0 = torch.from_numpy(P0_prev)
    d_fake_t = torch.from_numpy(d_fake)
    if num_rep_main > 1:
        # the tiling our implementation defines (reference crashes here):
        # per-row ratio broadcast over that row's num_rep main-D scores
        ref = _torch_reference_surrogate(
            torch, torch.from_numpy(np.asarray(d1_logits))[:, None],
            d_fake_t.reshape(bsz, num_rep_main),
            ratio_P0[:, None], 0.4).reshape(-1)
    else:
        ref = _torch_reference_surrogate(
            torch, torch.from_numpy(np.asarray(d1_logits)), d_fake_t,
            ratio_P0, 0.4)
    np.testing.assert_allclose(np.asarray(surr), ref.numpy(),
                               rtol=1e-5, atol=1e-6)


def test_ppo_loss_zoo_matches_reference_formula():
    """'ppo' get_losses family: softmax-weighted W on fake scores
    (helpers.py:131-137)."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    from transformer_gan_tpu.train.losses import get_losses

    rng = np.random.RandomState(3)
    dr = rng.randn(8).astype(np.float32)
    df = rng.randn(8).astype(np.float32)
    g, d = get_losses(jnp.asarray(dr), jnp.asarray(df), "ppo")
    df_t, dr_t = torch.from_numpy(df), torch.from_numpy(dr)
    W = df_t.shape[0] * F.softmax(df_t, dim=0)
    ref_d = torch.mean(W * df_t - dr_t)
    ref_g = -torch.mean(df_t)
    np.testing.assert_allclose(float(d), float(ref_d), rtol=1e-5)
    np.testing.assert_allclose(float(g), float(ref_g), rtol=1e-5)


# ---------------------------------------------------------------------------
# End-to-end: clf/dis/gen phases with a ppo config on 1 and 8 devices
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def data_dir():
    from transformer_gan_tpu.data.codec import build_performance_vocab
    rng = np.random.RandomState(19)
    d = tempfile.mkdtemp()
    with open(os.path.join(d, "vocab.txt"), "w") as f:
        f.write("\n".join(build_performance_vocab()))
    for split, n in [("train", 24), ("valid", 10), ("test", 10)]:
        os.makedirs(os.path.join(d, split))
        for i in range(n):
            arr = rng.randint(2, 310,
                              size=(rng.randint(80, 300),)).astype(np.int32)
            np.save(os.path.join(d, split, f"p{i:03d}.npy"), arr)
    return d


def _ppo_cfg():
    from transformer_gan_tpu.config import get_default_cfg_training
    cfg = get_default_cfg_training()
    cfg.defrost()
    cfg.MODEL.num_layers = 2
    cfg.MODEL.num_heads = 2
    cfg.MODEL.units = 16
    cfg.MODEL.inner_size = 32
    cfg.TRAIN.batch_size = 16
    cfg.TRAIN.batch_chunk = 2
    cfg.TRAIN.tgt_length = 16
    cfg.TRAIN.mem_length = 16
    cfg.TRAIN.max_step = 4
    cfg.TRAIN.log_interval = 2
    cfg.TRAIN.eval_interval = 4
    cfg.TRAIN.warmup_step = 2
    cfg.TRAIN.scheduler = "inv_sqrt"
    cfg.EVALUATE.batch_size = 8
    cfg.EVALUATE.tgt_length = 16
    cfg.EVALUATE.mem_length = 16
    d = cfg.DISCRIMINATOR
    d.type = "cnn"
    d.start_iter = 0
    d.dis_loss_freq = 1
    d.gen_loss_freq = 1
    d.dis_steps = 1
    d.freeze_discriminator = False
    d.tgt_len = 16
    d.mem_len = 16
    d.context_len = 3
    d.sample_chunks_mem = 2
    d.batch_chunk = 2
    d.CNN.embed_dim = 16
    d.CNN.num_rep = 4           # main D multi-rep + dis_D single rep:
    d.CNN.loss_type = "ppo"     # the novel rep-tiling PPO branch
    cfg.PPO.dis_D_type = "cnn"
    cfg.PPO.dis_D_num_rep = 1
    cfg.PPO.dis_D_update_D0_freq = 2
    cfg.TPU.compute_dtype = "float32"
    cfg.TPU.rng_impl = "threefry2x32"
    cfg.freeze()
    return cfg


def _build_trainer(cfg, data_dir, n_devices):
    from transformer_gan_tpu.parallel import mesh as pmesh
    from transformer_gan_tpu.train.loop import Trainer
    mesh = pmesh.make_mesh(n_devices)
    wd = tempfile.mkdtemp()
    return Trainer(cfg, data_dir=data_dir, work_dir=wd, debug=True,
                   mesh=mesh)


def test_ppo_phases_end_to_end_single_device(data_dir):
    cfg = _ppo_cfg()
    trainer = _build_trainer(cfg, data_dir, 1)
    gan = trainer.gan
    assert gan.gcfg.ppo
    assert gan.disD_params is not None and gan._clf_step is not None
    assert not gan.P0_initialized
    assert np.allclose(np.asarray(gan.P0), 0.0)

    disD0 = jax.tree.map(np.asarray, gan.disD_params)
    dis0 = jax.tree.map(np.asarray, gan.dis_params)

    # first gen phase: clf step updates dis_D; P0 snapshot forced even
    # though 1 % update_D0_freq != 0 (reference initializes P0 lazily,
    # transformer_gan.py:378-381)
    gan.gen_phase(1)
    assert gan.P0_initialized
    P0_a = np.asarray(gan.P0)
    assert np.isfinite(P0_a).all() and not np.allclose(P0_a, 0.0)
    assert (P0_a > 0).all()   # (1-D0)/D0 with D0 in (0,1)
    moved = any(
        not np.allclose(a, np.asarray(b))
        for a, b in zip(jax.tree.leaves(disD0),
                        jax.tree.leaves(gan.disD_params)))
    assert moved, "clf phase did not update dis_D"

    # off-frequency step: update_D0 gating must HOLD P0 fixed
    gan.gen_phase(3)   # 3 % 2 != 0
    np.testing.assert_array_equal(P0_a, np.asarray(gan.P0))

    # on-frequency step: P0 re-snapshotted
    gan.gen_phase(4)   # 4 % 2 == 0
    assert not np.allclose(P0_a, np.asarray(gan.P0))

    # dis phase under the ppo loss family (W-softmax-weighted dis loss)
    gan.dis_phase(1)
    assert gan.log_dis_num > 0 and np.isfinite(gan.log_dis_loss)
    moved = any(
        not np.allclose(a, np.asarray(b))
        for a, b in zip(jax.tree.leaves(dis0),
                        jax.tree.leaves(gan.dis_params)))
    assert moved, "dis phase did not update the main D"

    g, d = gan.pop_log_stats()
    assert np.isfinite(g) and np.isfinite(d) and g != 0.0
    # generator stayed finite through the PPO surrogate gradients
    assert np.isfinite(np.asarray(trainer.state.params["word_emb"])).all()


def test_ppo_mesh_matches_single_device(data_dir):
    """One clf+gen phase pair with the ppo config on the 8-device mesh
    must produce the same dis_D/generator updates and the same P0 as on
    one device (P0 rows are batch-sharded; GSPMD psums the grads).

    Runs in a FRESH interpreter: inside the full suite (~170 programs
    already compiled in-process) the XLA CPU compile of the mesh
    gen_phase program segfaults deterministically; the identical test
    body passes in a clean process (reproduced twice at the exact same
    test, 2026-08-19). Subprocess isolation keeps the coverage without
    depending on accumulated in-process compiler state."""
    import subprocess
    import sys
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)   # keep the TPU tunnel closed
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") +
                        " --xla_force_host_platform_device_count=8")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    env["PPO_MESH_DATA_DIR"] = data_dir
    r = subprocess.run([sys.executable, os.path.abspath(__file__)],
                       env=env, cwd=repo, capture_output=True, text=True,
                       timeout=1200)
    assert r.returncode == 0, (
        f"mesh comparison subprocess failed (rc={r.returncode})\n"
        f"--- stdout ---\n{r.stdout[-4000:]}\n"
        f"--- stderr ---\n{r.stderr[-4000:]}")


def _mesh_comparison_main(data_dir):
    """Body of test_ppo_mesh_matches_single_device (fresh interpreter)."""
    assert len(jax.devices()) >= 8, jax.devices()
    cfg = _ppo_cfg()

    def run(n):
        trainer = _build_trainer(cfg, data_dir, n)
        gan = trainer.gan
        gen0 = jax.tree.map(np.asarray, trainer.state.params)
        # dis first, gen second (the trainer's phase order): the gen
        # update is lr/n_devices-scaled by design, so anything sampled
        # AFTER it sees diverged generators and can't be compared
        gan.dis_phase(1)
        gan.gen_phase(1)
        return (jax.tree.map(np.asarray, gan.disD_params),
                np.asarray(gan.P0),
                jax.tree.map(np.asarray, trainer.state.params), gen0,
                jax.tree.map(np.asarray, gan.dis_params))

    disD8, P08, gen8, gen0, dis8 = run(8)
    disD1, P01, gen1, _, dis1 = run(1)
    np.testing.assert_allclose(P08, P01, atol=2e-5, rtol=2e-4)
    # All parameter comparisons go through Adam's first-step
    # normalization, which amplifies psum-order fp noise on
    # tiny-gradient coordinates to a sizeable fraction of one lr (the
    # ppo family's softmax-weighted dis loss is noisier than rsgan's
    # BCE); bound at the measured ~5e-5 level with headroom
    for a, b in zip(jax.tree.leaves(dis8), jax.tree.leaves(dis1)):
        np.testing.assert_allclose(a, b, atol=2e-4, rtol=2e-3)
    for a, b in zip(jax.tree.leaves(disD8), jax.tree.leaves(disD1)):
        np.testing.assert_allclose(a, b, atol=2e-4, rtol=2e-3)
    # gen GAN lr is divided by device count (reference per-rank lr):
    # rescale the 8-device update by 8 before comparing
    for a, b, z in zip(jax.tree.leaves(gen8), jax.tree.leaves(gen1),
                       jax.tree.leaves(gen0)):
        np.testing.assert_allclose((a - z) * 8.0, b - z,
                                   atol=2e-4, rtol=2e-3)


if __name__ == "__main__":
    _mesh_comparison_main(os.environ["PPO_MESH_DATA_DIR"])
    print("ppo mesh comparison OK")
