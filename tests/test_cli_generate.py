"""Generate-CLI helpers (cli/generate.py)."""

import importlib.util
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_cli():
    spec = importlib.util.spec_from_file_location(
        "cli_generate", os.path.join(REPO, "cli", "generate.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_load_vocab_falls_back_to_packaged_file():
    """The reference default EVENT.vocab_file_path
    ("../data/performance_vocab.txt") assumes the reference repo layout;
    from any other cwd load_vocab must fall back to the byte-identical
    vocab shipped in the package instead of crashing."""
    cli = _load_cli()
    tokens, tok2idx = cli.load_vocab("../data/performance_vocab.txt")
    assert len(tokens) == 310
    assert tokens[0] == "<S>"
    assert tok2idx[tokens[-1]] == 309


def test_load_vocab_missing_custom_path_fails_loud(tmp_path):
    """Only the reference-default basename falls back; a missing custom
    vocab must NOT be silently replaced (wrong id mapping)."""
    import pytest
    cli = _load_cli()
    with pytest.raises(FileNotFoundError):
        cli.load_vocab(str(tmp_path / "my_custom_vocab.txt"))


def test_load_vocab_prefers_explicit_existing_path(tmp_path):
    cli = _load_cli()
    p = tmp_path / "v.txt"
    p.write_text("<S>\n<PAD>\nNOTE_ON_60\n")
    tokens, _ = cli.load_vocab(str(p))
    assert tokens == ["<S>", "<PAD>", "NOTE_ON_60"]


# ---------------------------------------------------------------------------
# End-to-end drives of cli/generate.py main() on CPU (jnp decode path):
# wave-batched unconditional generation, conditional priming + debug
# (the reference's incremental==batch mems assertion, generate.py:309-360),
# and the duration-based stop (generate.py:208-214).
# ---------------------------------------------------------------------------

def _make_work_dir(tmp_path):
    """A minimal training work dir: config.yml + an orbax checkpoint of
    random tiny-model params (what cli/train.py leaves behind)."""
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
    xcfg = xl.XLConfig.from_cfg(cfg, 310, 88)
    params = xl.init_xl_params(xcfg, seed=3)
    ckpt.save_checkpoint(str(work), "checkpoint_last",
                         {"params": jax.tree.map(lambda x: x, params)})
    return work


def _inference_cfg(work, out_dir, **over):
    from transformer_gan_tpu.config import get_default_cfg_inference
    icfg = get_default_cfg_inference()
    icfg.defrost()
    icfg.MODEL.model_directory = str(work)
    icfg.MODEL.checkpoint_name = "checkpoint_last"
    icfg.MODEL.memory_length = 48
    icfg.MODEL.debug = False
    icfg.SAMPLING.technique = "topk"
    icfg.SAMPLING.threshold = 8.0
    icfg.SAMPLING.temperature = 0.95
    icfg.INPUT.num_midi_files = 1
    icfg.OUTPUT.output_txt_directory = str(out_dir)
    icfg.GENERATION.generation_length = 12
    icfg.GENERATION.duration_based = False
    for dotted, v in over.items():
        group, key = dotted.split(".")
        setattr(getattr(icfg, group), key, v)
    icfg.freeze()
    return icfg


def _read_tokens(fp):
    with open(fp) as f:
        return [line.strip() for line in f if line.strip()]


def test_generate_cli_unconditional_waves(tmp_path):
    """Fixed-length generation batches files into lanes of one wave;
    every output file carries generation_length valid vocab tokens."""
    cli = _load_cli()
    work = _make_work_dir(tmp_path)
    out = tmp_path / "out"
    icfg = _inference_cfg(work, out, **{"INPUT.num_midi_files": 3,
                                        "GENERATION.generation_length": 16})
    cli.main(icfg)
    vocab, _ = cli.load_vocab("performance_vocab.txt")
    for i in range(3):
        toks = _read_tokens(out / f"{i}.txt")
        assert len(toks) == 16
        assert all(t in vocab for t in toks)
        assert "<S>" not in toks  # exclude_bos default on


def test_generate_cli_conditional_debug(tmp_path, capsys):
    """Conditional 'time extension' priming + debug mode: the CLI itself
    asserts incremental == batch memories and reports the prime NLL
    (reference generate.py:309-360); the output must start with the
    conditional prefix."""
    import numpy as np
    cli = _load_cli()
    work = _make_work_dir(tmp_path)
    out = tmp_path / "out"
    prefix = np.array([5, 105, 106, 280, 7, 9, 110, 111, 3, 4],
                      dtype=np.int32)
    np.save(tmp_path / "prefix.npy", prefix)
    icfg = _inference_cfg(
        work, out,
        **{"INPUT.time_extension": True,
           "INPUT.conditional_input_melody": str(tmp_path / "prefix.npy"),
           "INPUT.num_conditional_tokens": 6,
           "MODEL.debug": True,
           "GENERATION.generation_length": 8})
    cli.main(icfg)
    vocab, tok2idx = cli.load_vocab("performance_vocab.txt")
    toks = _read_tokens(out / "0.txt")
    assert [tok2idx[t] for t in toks[:6]] == prefix[:6].tolist()
    assert len(toks) == 6 + 8
    printed = capsys.readouterr().out
    assert "Mem same" in printed          # the debug assertion ran
    assert "Prime NLL" in printed
    assert (out / "inference.yml").exists()


def test_generate_cli_duration_based_stop(tmp_path):
    """Duration-based generation stops once summed TIME_SHIFT duration
    reaches generation_duration (reference generate.py:208-214)."""
    cli = _load_cli()
    work = _make_work_dir(tmp_path)
    out = tmp_path / "out"
    icfg = _inference_cfg(
        work, out,
        **{"GENERATION.duration_based": True,
           "GENERATION.generation_duration": 0.3,
           "GENERATION.max_generation_length": 64})
    cli.main(icfg)
    toks = _read_tokens(out / "0.txt")
    assert 1 <= len(toks) <= 64
    dur = sum(int(t.split("_")[-1]) * 0.01 for t in toks
              if t.startswith("TIME_SHIFT"))
    # stopped by duration (dur counts the full emitted sequence, the stop
    # check runs before appending) or by the max-length bound
    assert dur >= 0.3 or len(toks) == 64
