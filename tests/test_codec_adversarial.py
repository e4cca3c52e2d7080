"""Adversarial codec corpus keyed to reference performance_event_repo.py
:163-250 edge semantics: sustain CC boundaries and repeats, notes past
total_time, same-step same-pitch on/off ordering, zero-duration notes
after quantization, velocity-bin boundaries, stretch factors on .5
rounding cutoffs — plus decode->encode idempotence fuzz at scale and a
native==python check over the adversarial inputs.

Expectations are hand-derived from the note_seq algorithms the reference
delegates to (sequences_lib.apply_sustain_control_changes /
quantize_note_sequence_absolute, performance_lib.Performance); the
environment has no note_seq, so tools/noteseq_diff.py ships the
id-for-id diff for environments that do.
"""

import os
import tempfile

import numpy as np
import pytest

from transformer_gan_tpu.data import midi as midi_io
from transformer_gan_tpu.data import native
from transformer_gan_tpu.data import sequences as seq_lib
from transformer_gan_tpu.data.codec import PerformanceEventRepo
from transformer_gan_tpu.data.midi import ControlChange, Note, NoteSequence


def _names(repo, ids):
    return [repo.ids_to_events[int(i)] for i in ids]


# ---------------------------------------------------------------------------
# Sustain pedal edges (sequences_lib.apply_sustain_control_changes)
# ---------------------------------------------------------------------------

def test_sustain_cc_boundary_63_is_off_64_is_on():
    """CC64 >= 64 engages the pedal; 63 releases it (note_seq threshold)."""
    def run(value):
        ns = NoteSequence()
        ns.notes = [Note(pitch=60, velocity=80, start_time=0.0,
                         end_time=0.5)]
        ns.control_changes = [
            ControlChange(time=0.1, control_number=64, control_value=value),
            ControlChange(time=2.0, control_number=64, control_value=0),
        ]
        ns.total_time = 0.5
        return seq_lib.apply_sustain_control_changes(ns)

    assert run(64).notes[0].end_time == pytest.approx(2.0)
    assert run(63).notes[0].end_time == pytest.approx(0.5)  # never engaged


def test_sustain_release_boundary_63():
    """A mid-note drop from 127 to 63 is a release: the note extends only
    to the drop time, not to the later full release."""
    ns = NoteSequence()
    ns.notes = [Note(pitch=60, velocity=80, start_time=0.0, end_time=0.5)]
    ns.control_changes = [
        ControlChange(time=0.0, control_number=64, control_value=127),
        ControlChange(time=1.0, control_number=64, control_value=63),
        ControlChange(time=1.5, control_number=64, control_value=127),
        ControlChange(time=3.0, control_number=64, control_value=0),
    ]
    ns.total_time = 0.5
    out = seq_lib.apply_sustain_control_changes(ns)
    assert out.notes[0].end_time == pytest.approx(1.0)
    assert out.total_time == pytest.approx(1.0)


def test_repeated_pedal_events_not_nested():
    """Pedal state is absolute, not a counter: on,on,off releases; and a
    repeated off is a no-op."""
    ns = NoteSequence()
    ns.notes = [Note(pitch=60, velocity=80, start_time=0.0, end_time=0.3)]
    ns.control_changes = [
        ControlChange(time=0.0, control_number=64, control_value=100),
        ControlChange(time=0.1, control_number=64, control_value=127),
        ControlChange(time=1.0, control_number=64, control_value=10),
        ControlChange(time=1.2, control_number=64, control_value=0),
    ]
    ns.total_time = 0.3
    out = seq_lib.apply_sustain_control_changes(ns)
    # released at the FIRST off (1.0) despite two preceding ons
    assert out.notes[0].end_time == pytest.approx(1.0)


def test_sustain_same_time_event_ordering():
    """At equal times note_seq orders sustain-on < sustain-off < note-on <
    note-off. A note ending exactly at a pedal-down instant is therefore
    caught by the pedal; a note starting at a pedal-up instant is not."""
    ns = NoteSequence()
    ns.notes = [
        Note(pitch=60, velocity=80, start_time=0.0, end_time=0.5),
        Note(pitch=64, velocity=80, start_time=2.0, end_time=2.5),
    ]
    ns.control_changes = [
        # pedal down exactly when note 60 ends; up exactly when 64 starts
        ControlChange(time=0.5, control_number=64, control_value=127),
        ControlChange(time=2.0, control_number=64, control_value=0),
    ]
    ns.total_time = 2.5
    out = seq_lib.apply_sustain_control_changes(ns)
    by_pitch = {n.pitch: n for n in out.notes}
    # sustain-on (kind 0) sorts before note-off (kind 3) at t=0.5: caught
    assert by_pitch[60].end_time == pytest.approx(2.0)
    # sustain-off (kind 1) sorts before note-on (kind 2) at t=2.0: free
    assert by_pitch[64].end_time == pytest.approx(2.5)


def test_sustain_zero_duration_reonset_deleted():
    """Same-pitch re-onset at the exact start time of the held note drives
    it to zero duration: note_seq deletes it outright."""
    ns = NoteSequence()
    ns.notes = [
        Note(pitch=60, velocity=80, start_time=1.0, end_time=1.2),
        Note(pitch=60, velocity=90, start_time=1.0, end_time=1.5),
    ]
    ns.control_changes = [
        ControlChange(time=0.0, control_number=64, control_value=127),
        ControlChange(time=3.0, control_number=64, control_value=0),
    ]
    ns.total_time = 1.5
    out = seq_lib.apply_sustain_control_changes(ns)
    # first onset processed cuts ... the second onset at the same time
    # zero-durations the first: exactly one survivor, held to pedal-up
    assert len(out.notes) == 1
    assert out.notes[0].end_time == pytest.approx(3.0)


def test_note_dangling_past_last_event_ends_at_stream_end():
    """A note still pedal-extended when the event stream ends is closed at
    the LAST event time (note_seq closes active notes at `time`)."""
    ns = NoteSequence()
    ns.notes = [
        Note(pitch=60, velocity=80, start_time=0.0, end_time=0.5),
        Note(pitch=64, velocity=80, start_time=0.2, end_time=4.0),
    ]
    ns.control_changes = [
        ControlChange(time=0.1, control_number=64, control_value=127),
        # pedal never released
    ]
    ns.total_time = 4.0
    out = seq_lib.apply_sustain_control_changes(ns)
    by_pitch = {n.pitch: n for n in out.notes}
    # last event = note-off of pitch 64 at 4.0: pitch 60 extends to it
    assert by_pitch[60].end_time == pytest.approx(4.0)
    assert by_pitch[64].end_time == pytest.approx(4.0)


# ---------------------------------------------------------------------------
# Quantization / event-machine edges
# ---------------------------------------------------------------------------

def test_note_past_total_time_encodes_fully():
    """total_time smaller than the last note end must not truncate the
    event stream (quantize bumps total_quantized_steps per note)."""
    repo = PerformanceEventRepo()
    ns = NoteSequence()
    ns.notes = [Note(pitch=60, velocity=1, start_time=0.0, end_time=2.0)]
    ns.total_time = 0.5   # stale: note extends past it
    names = _names(repo, repo.encode_note_sequence(ns))
    assert names == ["VELOCITY_1", "NOTE_ON_60",
                     "TIME_SHIFT_100", "TIME_SHIFT_100", "NOTE_OFF_60"]


def test_same_step_same_pitch_off_before_on():
    """Two same-pitch notes back to back: the earlier note's offset sorts
    before the later note's onset at the shared step ((step, idx,
    is_offset) ordering with idx by (start_time, pitch))."""
    repo = PerformanceEventRepo()
    ns = NoteSequence()
    ns.notes = [
        Note(pitch=60, velocity=10, start_time=0.0, end_time=0.5),
        Note(pitch=60, velocity=10, start_time=0.5, end_time=1.0),
    ]
    ns.total_time = 1.0
    names = _names(repo, repo.encode_note_sequence(ns))
    assert names == ["VELOCITY_3", "NOTE_ON_60",
                     "TIME_SHIFT_50", "NOTE_OFF_60", "NOTE_ON_60",
                     "TIME_SHIFT_50", "NOTE_OFF_60"]


def test_same_step_cross_pitch_ordering_by_start_index():
    """A pitch-70 offset and pitch-60 onset at the same step: the note
    that STARTED earlier owns the smaller idx, so its offset wins the tie
    regardless of pitch."""
    repo = PerformanceEventRepo()
    ns = NoteSequence()
    ns.notes = [
        Note(pitch=70, velocity=10, start_time=0.0, end_time=0.5),
        Note(pitch=60, velocity=10, start_time=0.5, end_time=1.0),
    ]
    ns.total_time = 1.0
    names = _names(repo, repo.encode_note_sequence(ns))
    assert names == ["VELOCITY_3", "NOTE_ON_70",
                     "TIME_SHIFT_50", "NOTE_OFF_70", "NOTE_ON_60",
                     "TIME_SHIFT_50", "NOTE_OFF_60"]


def test_zero_duration_note_encodes_one_step():
    """Sub-quantum notes get end = start + 1 step: NOTE_ON, TIME_SHIFT_1,
    NOTE_OFF — never an adjacent ON/OFF pair."""
    repo = PerformanceEventRepo()
    ns = NoteSequence()
    ns.notes = [Note(pitch=60, velocity=1, start_time=1.0,
                     end_time=1.0005)]
    ns.total_time = 1.0005
    names = _names(repo, repo.encode_note_sequence(ns))
    assert names == ["TIME_SHIFT_100", "VELOCITY_1", "NOTE_ON_60",
                     "TIME_SHIFT_1", "NOTE_OFF_60"]


def test_velocity_bin_boundaries_full_sweep():
    """All 127 velocities in ascending order: VELOCITY tokens appear
    exactly at the 32 bin entries (bin = (v-1)//4 + 1)."""
    repo = PerformanceEventRepo()
    ns = NoteSequence()
    ns.notes = [Note(pitch=60, velocity=v, start_time=0.1 * (v - 1),
                     end_time=0.1 * (v - 1) + 0.05)
                for v in range(1, 128)]
    ns.total_time = ns.notes[-1].end_time
    names = _names(repo, repo.encode_note_sequence(ns))
    vel_events = [n for n in names if n.startswith("VELOCITY")]
    assert vel_events == [f"VELOCITY_{b}" for b in range(1, 33)]
    # boundary pairs: 4 -> bin 1, 5 -> bin 2 etc.; no repeats within a bin
    assert "VELOCITY_1" in names and "VELOCITY_32" in names


def test_same_bin_velocity_change_emits_no_token():
    repo = PerformanceEventRepo()
    ns = NoteSequence()
    ns.notes = [
        Note(pitch=60, velocity=5, start_time=0.0, end_time=0.1),
        Note(pitch=62, velocity=8, start_time=0.2, end_time=0.3),  # bin 2 too
    ]
    ns.total_time = 0.3
    names = _names(repo, repo.encode_note_sequence(ns))
    assert names.count("VELOCITY_2") == 1


# ---------------------------------------------------------------------------
# Stretch factors on .5 rounding cutoffs (augmentation grid)
# ---------------------------------------------------------------------------

def test_stretch_rounding_half_step_cutoff():
    """stretch 1.05 puts a t=0.1 onset at 10.5 steps — exactly on the
    round-half-up cutoff. Expectation computed with the pipeline's own
    float ordering (t*stretch, then *sps + 0.5), which is what note_seq
    does; this pins the fp-sensitive behavior."""
    ns = NoteSequence()
    ns.notes = [Note(pitch=60, velocity=1, start_time=0.1, end_time=0.5)]
    ns.total_time = 0.5
    for stretch in (0.95, 1.05):
        repo = PerformanceEventRepo(stretch_factors=[stretch],
                                    pitch_transpose_lower=0,
                                    pitch_transpose_upper=0)
        with tempfile.TemporaryDirectory() as d:
            mid = os.path.join(d, "x.mid")
            midi_io.note_sequence_to_midi_file(ns, mid)
            # force the pure-python path (the oracle)
            loaded = repo._load_midi(mid)
            ids = repo.encode_note_sequence(
                seq_lib.stretch_note_sequence(loaded, stretch))
        names = _names(repo, ids)
        start = loaded.notes[0].start_time  # as decoded from the file
        expected_shift = int(start * stretch * 100 + 0.5)
        assert names[0] == f"TIME_SHIFT_{expected_shift}", (stretch, names)


@pytest.mark.skipif(not native.available(), reason="native codec not built")
def test_native_grid_matches_python_on_cutoff_times(tmp_path):
    """The C++ grid encoder must reproduce the python oracle's rounding on
    times engineered to land on .5 step cutoffs after stretching."""
    from transformer_gan_tpu.data.codec import augment_note_sequence

    stretches = [0.95, 0.975, 1.0, 1.025, 1.05]
    rng = np.random.RandomState(0)
    ns = NoteSequence()
    t = 0.0
    for i in range(30):
        # onsets at k*0.005/s: after stretch s, lands exactly on a .5
        # cutoff for one of the grid stretches
        s = stretches[i % len(stretches)]
        t += round((1 + int(rng.randint(1, 20))) * 0.005 / s, 10)
        ns.notes.append(Note(pitch=int(rng.randint(21, 109)),
                             velocity=int(rng.randint(1, 128)),
                             start_time=t,
                             end_time=t + float(rng.randint(1, 50)) / 100))
    ns.total_time = max(n.end_time for n in ns.notes)
    mid = os.path.join(tmp_path, "cutoff.mid")
    midi_io.note_sequence_to_midi_file(ns, mid)

    repo = PerformanceEventRepo(stretch_factors=stretches,
                                pitch_transpose_lower=-3,
                                pitch_transpose_upper=3)
    native_grid = list(repo.encode_transposition(mid))
    assert len(native_grid) == 35
    loaded = repo._load_midi(mid)
    for ids, fn in zip(native_grid, repo.augment_fns):
        expected = repo.encode_note_sequence(fn(loaded))
        assert list(ids) == list(expected)


@pytest.mark.skipif(not native.available(), reason="native codec not built")
@pytest.mark.parametrize("seed", range(4))
def test_native_matches_python_boundary_sustain(tmp_path, seed):
    """native==python fuzz with ADVERSARIAL sustain values (63/64/65,
    repeated ons/offs) — the original fuzz only used {0, 127}."""
    rng = np.random.RandomState(100 + seed)
    ns = NoteSequence()
    t = 0.0
    for _ in range(40):
        t += float(rng.randint(0, 40)) / 100
        ns.notes.append(Note(pitch=int(rng.randint(21, 109)),
                             velocity=int(rng.randint(1, 128)),
                             start_time=t,
                             end_time=t + float(rng.randint(1, 120)) / 100))
    ns.total_time = max(n.end_time for n in ns.notes)
    tt = 0.0
    for _ in range(25):
        tt += float(rng.randint(0, 60)) / 100
        ns.control_changes.append(ControlChange(
            time=tt, control_number=64,
            control_value=int(rng.choice([0, 62, 63, 64, 65, 127, 127]))))
    mid = os.path.join(tmp_path, "adv.mid")
    midi_io.note_sequence_to_midi_file(ns, mid)

    repo = PerformanceEventRepo()
    ids_native = repo.encode(mid)
    loaded = repo._load_midi(mid)
    repo.filter_pitches(loaded)
    ids_python = repo.encode_note_sequence(loaded)
    assert list(ids_native) == list(ids_python)


# ---------------------------------------------------------------------------
# decode -> encode idempotence at scale
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("seed", range(8))
def test_decode_encode_converges_to_fixed_point(tmp_path, seed):
    """decode->encode over random token soup converges to a token-level
    fixed point in a few passes.

    It is NOT one-pass idempotent by reference design: decode's
    TIME_SHIFT_100-run collapse (performance_event_repo.py:237-242)
    shrinks any silent gap > 200 steps, and pass 1's dropping of orphan
    NOTE_OFFs / zero-duration notes can CREATE such gaps by joining
    silences — so pass 2 can differ from pass 1. After that the stream is
    structurally normalized (all gaps <= 199 steps, well-formed notes,
    <= 3s durations) and must be exactly stable."""
    rng = np.random.RandomState(1000 + seed)
    repo = PerformanceEventRepo()
    ids = []
    for _ in range(150):
        r = rng.rand()
        if r < 0.35:
            ids.append(int(rng.randint(2, 102)))        # TIME_SHIFT
        elif r < 0.6:
            p = int(rng.randint(21, 109))
            ids.append(repo.events_to_ids[f"NOTE_ON_{p}"])
        elif r < 0.85:
            p = int(rng.randint(21, 109))
            ids.append(repo.events_to_ids[f"NOTE_OFF_{p}"])
        else:
            ids.append(repo.events_to_ids[
                f"VELOCITY_{int(rng.randint(1, 33))}"])

    prev = list(ids)
    trajectory = []
    for it in range(5):
        mid = os.path.join(tmp_path, f"s{seed}_p{it}.mid")
        repo.decode(prev, save_path=mid)
        cur = list(repo.encode(mid))
        trajectory.append(cur)
        if cur == prev:
            break
        prev = cur
    else:
        pytest.fail(f"no fixed point within 5 passes at seed {seed}")
    assert len(trajectory) <= 4, trajectory
    # content stability from pass 2 on: the note events (pitch stream)
    # are already final after the first normalization
    def pitch_stream(toks):
        return [repo.ids_to_events[t] for t in toks
                if repo.ids_to_events[t].startswith("NOTE")]
    assert pitch_stream(trajectory[-1]) == pitch_stream(trajectory[0])
