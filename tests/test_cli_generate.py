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
