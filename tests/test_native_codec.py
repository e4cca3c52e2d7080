"""Native C++ codec vs pure-Python codec: bit-exact agreement (fuzzed)."""

import numpy as np
import pytest

from transformer_gan_tpu.data import midi as midi_io
from transformer_gan_tpu.data import native
from transformer_gan_tpu.data import sequences as seq_lib
from transformer_gan_tpu.data.codec import PerformanceEventRepo
from transformer_gan_tpu.data.midi import ControlChange, Note, NoteSequence

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native codec not built")


def _random_sequence(rng, n_notes=40, with_sustain=True, wide_pitch=False):
    ns = NoteSequence()
    t = 0.0
    for _ in range(n_notes):
        t += rng.uniform(0.0, 0.35)
        dur = rng.uniform(0.02, 2.0)
        lo, hi = (0, 127) if wide_pitch else (21, 108)
        ns.notes.append(Note(
            pitch=int(rng.randint(lo, hi + 1)),
            velocity=int(rng.randint(1, 128)),
            start_time=t, end_time=t + dur))
    ns.total_time = max(n.end_time for n in ns.notes)
    if with_sustain:
        tt = 0.0
        for _ in range(6):
            tt += rng.uniform(0.2, 2.0)
            ns.control_changes.append(ControlChange(
                time=tt, control_number=64,
                control_value=int(rng.choice([0, 127]))))
    return ns


def _python_encode(repo, path):
    ns = repo._load_midi(path)
    repo.filter_pitches(ns)
    return repo.encode_note_sequence(ns)


@pytest.mark.parametrize("seed", range(8))
def test_native_encode_matches_python(tmp_path, seed):
    rng = np.random.RandomState(seed)
    ns = _random_sequence(rng, with_sustain=seed % 2 == 0,
                          wide_pitch=seed % 3 == 0)
    path = str(tmp_path / "x.mid")
    midi_io.note_sequence_to_midi_file(ns, path)

    repo = PerformanceEventRepo()
    py_ids = _python_encode(repo, path)
    with open(path, "rb") as f:
        nat_ids = native.encode_midi(f.read(), pitch_filter=True)
    assert nat_ids.tolist() == py_ids


@pytest.mark.parametrize("seed", range(4))
def test_native_grid_matches_python(tmp_path, seed):
    rng = np.random.RandomState(100 + seed)
    ns = _random_sequence(rng, with_sustain=True)
    path = str(tmp_path / "y.mid")
    midi_io.note_sequence_to_midi_file(ns, path)

    stretches = [0.95, 0.975, 1.0, 1.025, 1.05]
    repo = PerformanceEventRepo(stretch_factors=stretches,
                                pitch_transpose_lower=-3,
                                pitch_transpose_upper=3)
    # pure python reference (bypass the native fast path)
    loaded = repo._load_midi(path)
    py_grid = []
    for fn in repo.augment_fns:
        py_grid.append(repo.encode_note_sequence(fn(loaded)))

    with open(path, "rb") as f:
        nat_grid = native.encode_midi_grid(f.read(), stretches, -3, 3)
    assert len(nat_grid) == len(py_grid) == 35
    for a, b in zip(nat_grid, py_grid):
        assert a.tolist() == b


def test_repo_uses_native_path(tmp_path):
    """PerformanceEventRepo.encode must route through the native encoder
    and agree with the pure-python pipeline."""
    rng = np.random.RandomState(7)
    ns = _random_sequence(rng)
    path = str(tmp_path / "z.mid")
    midi_io.note_sequence_to_midi_file(ns, path)
    repo = PerformanceEventRepo()
    assert repo.encode(path) == _python_encode(repo, path)


def test_native_rejects_garbage():
    with pytest.raises(ValueError):
        native.encode_midi(b"this is not a midi file")


def test_native_tempo_changes(tmp_path):
    """Multi-tempo files: tick->seconds conversion must agree."""
    import struct

    def vl(x):
        out = [x & 0x7F]
        x >>= 7
        while x:
            out.append((x & 0x7F) | 0x80)
            x >>= 7
        return bytes(reversed(out))

    ppq = 480
    trk0 = b"\x00\xff\x51\x03" + (500000).to_bytes(3, "big")
    trk0 += vl(960) + b"\xff\x51\x03" + (250000).to_bytes(3, "big")
    trk0 += vl(960) + b"\xff\x51\x03" + (750000).to_bytes(3, "big")
    trk0 += b"\x00\xff\x2f\x00"
    trk1 = b"\x00\x90\x3c\x50" + vl(480) + b"\x80\x3c\x40"
    trk1 += vl(960) + b"\x90\x40\x64" + vl(1440) + b"\x80\x40\x40"
    trk1 += b"\x00\xff\x2f\x00"
    smf = b"MThd" + struct.pack(">IHHH", 6, 1, 2, ppq)
    smf += b"MTrk" + struct.pack(">I", len(trk0)) + trk0
    smf += b"MTrk" + struct.pack(">I", len(trk1)) + trk1

    path = str(tmp_path / "t.mid")
    with open(path, "wb") as f:
        f.write(smf)
    repo = PerformanceEventRepo()
    assert native.encode_midi(smf).tolist() == _python_encode(repo, path)
