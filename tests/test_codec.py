"""Codec tests: vocab layout, MIDI round trips, event-machine semantics."""

import os
import tempfile

import numpy as np
import pytest

from transformer_gan_tpu.data import midi as midi_io
from transformer_gan_tpu.data import performance as perf
from transformer_gan_tpu.data import sequences as seq_lib
from transformer_gan_tpu.data.codec import (PerformanceEventRepo,
                                            build_performance_vocab)
from transformer_gan_tpu.data.midi import ControlChange, Note, NoteSequence

REF_VOCAB = "/root/reference/data/performance_vocab.txt"


def test_vocab_layout_matches_reference():
    vocab = build_performance_vocab()
    assert len(vocab) == 310
    assert vocab[0] == "<S>" and vocab[1] == "<PAD>"
    assert vocab[2] == "TIME_SHIFT_1" and vocab[101] == "TIME_SHIFT_100"
    assert vocab[102] == "NOTE_ON_21" and vocab[103] == "NOTE_OFF_21"
    assert vocab[276] == "NOTE_ON_108" and vocab[277] == "NOTE_OFF_108"
    assert vocab[278] == "VELOCITY_1" and vocab[309] == "VELOCITY_32"
    if os.path.exists(REF_VOCAB):
        with open(REF_VOCAB) as f:
            ref = [line.strip() for line in f if line.strip()]
        assert vocab == ref


def _simple_sequence():
    ns = NoteSequence()
    ns.notes = [
        Note(pitch=60, velocity=80, start_time=0.0, end_time=0.5),
        Note(pitch=64, velocity=100, start_time=0.25, end_time=0.75),
        Note(pitch=67, velocity=100, start_time=2.0, end_time=2.5),
    ]
    ns.total_time = 2.5
    return ns


def test_encode_simple_sequence_events():
    repo = PerformanceEventRepo()
    ids = repo.encode_note_sequence(_simple_sequence())
    names = [repo.ids_to_events[i] for i in ids]
    # (v-1)//4+1: 80 -> 20, 100 -> 25
    assert names == [
        "VELOCITY_20", "NOTE_ON_60",
        "TIME_SHIFT_25", "VELOCITY_25", "NOTE_ON_64",
        "TIME_SHIFT_25", "NOTE_OFF_60",
        "TIME_SHIFT_25", "NOTE_OFF_64",
        # velocity bin is already 25: no repeated VELOCITY before NOTE_ON_67
        "TIME_SHIFT_100", "TIME_SHIFT_25", "NOTE_ON_67",
        "TIME_SHIFT_50", "NOTE_OFF_67",
    ]


def test_time_shift_chunking_over_100():
    repo = PerformanceEventRepo()
    ns = NoteSequence()
    ns.notes = [Note(pitch=60, velocity=1, start_time=3.205, end_time=3.5)]
    ns.total_time = 3.5
    ids = repo.encode_note_sequence(ns)
    names = [repo.ids_to_events[i] for i in ids]
    # 321 steps = 100 + 100 + 100 + 21
    assert names[:4] == ["TIME_SHIFT_100"] * 3 + ["TIME_SHIFT_21"]
    assert names[4:] == ["VELOCITY_1", "NOTE_ON_60",
                         "TIME_SHIFT_29", "NOTE_OFF_60"]


def test_velocity_binning_matches_magenta():
    # velocity_bin_size(32) = ceil(127/32) = 4 -> bin = (v-1)//4 + 1
    assert perf.velocity_to_bin(1, 32) == 1
    assert perf.velocity_to_bin(4, 32) == 1
    assert perf.velocity_to_bin(5, 32) == 2
    assert perf.velocity_to_bin(127, 32) == 32
    assert perf.velocity_bin_to_velocity(1, 32) == 1
    assert perf.velocity_bin_to_velocity(32, 32) == 125


def test_quantize_rounding():
    assert seq_lib.quantize_to_step(0.004999, 100) == 0
    assert seq_lib.quantize_to_step(0.005, 100) == 1
    assert seq_lib.quantize_to_step(1.0, 100) == 100


def test_zero_duration_note_bumped():
    ns = NoteSequence()
    ns.notes = [Note(pitch=60, velocity=10, start_time=1.0, end_time=1.001)]
    ns.total_time = 1.001
    q = seq_lib.quantize_note_sequence_absolute(ns, 100)
    assert q.notes[0].quantized_start_step == 100
    assert q.notes[0].quantized_end_step == 101


def test_sustain_pedal_extends_notes():
    ns = NoteSequence()
    ns.notes = [Note(pitch=60, velocity=80, start_time=0.0, end_time=0.5)]
    ns.control_changes = [
        ControlChange(time=0.1, control_number=64, control_value=100),
        ControlChange(time=2.0, control_number=64, control_value=0),
    ]
    ns.total_time = 0.5
    out = seq_lib.apply_sustain_control_changes(ns)
    assert out.notes[0].end_time == pytest.approx(2.0)
    assert out.total_time == pytest.approx(2.0)


def test_sustain_same_pitch_reonset_ends_previous():
    ns = NoteSequence()
    ns.notes = [
        Note(pitch=60, velocity=80, start_time=0.0, end_time=0.4),
        Note(pitch=60, velocity=90, start_time=1.0, end_time=1.5),
    ]
    ns.control_changes = [
        ControlChange(time=0.0, control_number=64, control_value=127),
        ControlChange(time=3.0, control_number=64, control_value=0),
    ]
    ns.total_time = 1.5
    out = seq_lib.apply_sustain_control_changes(ns)
    by_start = sorted(out.notes, key=lambda n: n.start_time)
    assert by_start[0].end_time == pytest.approx(1.0)  # cut by re-onset
    assert by_start[1].end_time == pytest.approx(3.0)  # extended to pedal up


def test_midi_roundtrip_bytes():
    ns = _simple_sequence()
    data = midi_io.note_sequence_to_midi_bytes(ns)
    back = midi_io.midi_bytes_to_note_sequence(data)
    assert len(back.notes) == 3
    for a, b in zip(sorted(ns.notes, key=lambda n: (n.start_time, n.pitch)),
                    sorted(back.notes, key=lambda n: (n.start_time, n.pitch))):
        assert a.pitch == b.pitch
        assert a.velocity == b.velocity
        assert abs(a.start_time - b.start_time) < 0.005
        assert abs(a.end_time - b.end_time) < 0.005


def test_npy_to_midi_roundtrip():
    repo = PerformanceEventRepo()
    ids = repo.encode_note_sequence(_simple_sequence())
    with tempfile.TemporaryDirectory() as d:
        npy = os.path.join(d, "x.npy")
        mid = os.path.join(d, "x.mid")
        np.save(npy, np.array(ids, dtype=np.int32))
        repo.npy_to_midi(npy, mid)
        # Re-encode the decoded MIDI: token ids must round-trip exactly
        # (all times land on exact 10ms steps).
        ids2 = repo.encode(mid)
    assert list(ids) == list(ids2)


def test_decode_collapses_time_shift_100_runs():
    repo = PerformanceEventRepo()
    ts100 = repo.events_to_ids["TIME_SHIFT_100"]
    on = repo.events_to_ids["NOTE_ON_60"]
    off = repo.events_to_ids["NOTE_OFF_60"]
    vel = repo.events_to_ids["VELOCITY_10"]
    # Reference condition (performance_event_repo.py:237-242): skip a
    # TIME_SHIFT_100 when >= 2 tokens kept already and last kept is also
    # TIME_SHIFT_100.
    with tempfile.TemporaryDirectory() as d:
        mid = os.path.join(d, "x.mid")
        repo.decode([vel, on, ts100, ts100, ts100, ts100, off],
                    save_path=mid)
        out = midi_io.midi_file_to_note_sequence(mid)
    # 4 TS100 collapse to 1 (the run starts with >=2 tokens already kept)
    # -> note length 1.0s
    assert len(out.notes) == 1
    assert out.notes[0].end_time - out.notes[0].start_time == pytest.approx(
        1.0, abs=0.01)


def test_decode_max_note_duration_cap():
    repo = PerformanceEventRepo()
    ts50 = repo.events_to_ids["TIME_SHIFT_50"]
    on = repo.events_to_ids["NOTE_ON_72"]
    off = repo.events_to_ids["NOTE_OFF_72"]
    with tempfile.TemporaryDirectory() as d:
        mid = os.path.join(d, "y.mid")
        repo.decode([on] + [ts50] * 8 + [off], save_path=mid)  # 4s > 3s cap
        out = midi_io.midi_file_to_note_sequence(mid)
    assert out.notes[0].end_time - out.notes[0].start_time == pytest.approx(
        3.0, abs=0.01)


def test_augmentation_grid():
    repo = PerformanceEventRepo(
        stretch_factors=[0.95, 0.975, 1.0, 1.025, 1.05],
        pitch_transpose_lower=-3, pitch_transpose_upper=3)
    assert len(repo.augment_fns) == 35
    with tempfile.TemporaryDirectory() as d:
        mid = os.path.join(d, "z.mid")
        midi_io.note_sequence_to_midi_file(_simple_sequence(), mid)
        encodings = list(repo.encode_transposition(mid))
    assert len(encodings) == 35
    # Transposition shifts NOTE_ON/NOTE_OFF ids by 2 per semitone.
    base = encodings[2 * 7 + 3]  # stretch 1.0, transpose 0
    up1 = encodings[2 * 7 + 4]   # stretch 1.0, transpose +1
    name = PerformanceEventRepo()
    for a, b in zip(base, up1):
        na, nb = name.ids_to_events[a], name.ids_to_events[b]
        if na.startswith("NOTE"):
            assert int(nb.split("_")[-1]) == int(na.split("_")[-1]) + 1
        else:
            assert na == nb


def test_transpose_out_of_range_deletes():
    ns = NoteSequence()
    ns.notes = [Note(pitch=107, velocity=50, start_time=0.0, end_time=0.1),
                Note(pitch=60, velocity=50, start_time=0.0, end_time=0.2)]
    ns.total_time = 0.2
    out, deleted = seq_lib.transpose_note_sequence(
        ns, 3, min_allowed_pitch=21, max_allowed_pitch=108)
    assert deleted == 1
    assert len(out.notes) == 1 and out.notes[0].pitch == 63
