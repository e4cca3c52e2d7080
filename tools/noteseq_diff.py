#!/usr/bin/env python
"""Id-for-id encoding diff against the TRUE note_seq-backed reference.

This image has neither note_seq nor real Maestro MIDI, so the repo's
bit-exactness evidence is (a) hand-derived note_seq-semantics fixtures
(tests/test_codec.py, tests/test_codec_adversarial.py) and (b) fuzzed
python==C++ agreement (tests/test_native_codec.py). This script closes
the loop in any environment that DOES have the real dependencies: it
encodes every MIDI with both the reference ``PerformanceEventRepo``
(/root/reference/data/performance_event_repo.py, which delegates to
note_seq) and this repo's codec, and reports the first differing token
id per file.

Usage:
    python tools/noteseq_diff.py --midi_dir /path/to/maestro [--limit N]
        [--grid] [--reference /root/reference]

    --grid also diffs the full 35x augmentation grid per file
    (5 stretches x 7 transpositions, the training preprocessing path).

Exit status: 0 = all files bit-exact, 1 = any mismatch, 2 = environment
missing note_seq or the reference checkout.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STRETCHES = [0.95, 0.975, 1.0, 1.025, 1.05]
TRANSPOSE_LO, TRANSPOSE_HI = -3, 3


def find_midis(root: str):
    out = []
    for dirpath, _, names in os.walk(root):
        for n in sorted(names):
            if n.lower().endswith((".mid", ".midi")):
                out.append(os.path.join(dirpath, n))
    return sorted(out)


def first_diff(a, b):
    for i, (x, y) in enumerate(zip(a, b)):
        if x != y:
            return i, x, y
    if len(a) != len(b):
        return min(len(a), len(b)), None, None
    return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--midi_dir", required=True)
    ap.add_argument("--limit", type=int, default=0,
                    help="max files to diff (0 = all)")
    ap.add_argument("--grid", action="store_true",
                    help="also diff the 35x augmentation grid per file")
    ap.add_argument("--reference", default="/root/reference")
    args = ap.parse_args()

    try:
        import note_seq  # noqa: F401
    except ImportError:
        print("note_seq is not installed — this diff needs the real "
              "Magenta dependency. Run in an environment that has it.")
        return 2
    ref_data = os.path.join(args.reference, "data")
    if not os.path.isdir(ref_data):
        print(f"reference checkout not found under {args.reference}")
        return 2
    sys.path.insert(0, ref_data)
    import performance_event_repo as ref_mod

    from transformer_gan_tpu.data.codec import PerformanceEventRepo

    kwargs = dict(steps_per_second=100, num_velocity_bins=32)
    gridkw = dict(stretch_factors=STRETCHES,
                  pitch_transpose_lower=TRANSPOSE_LO,
                  pitch_transpose_upper=TRANSPOSE_HI)
    ref_repo = ref_mod.PerformanceEventRepo(**kwargs, **gridkw)
    our_repo = PerformanceEventRepo(**kwargs, **gridkw)

    midis = find_midis(args.midi_dir)
    if args.limit:
        midis = midis[:args.limit]
    if not midis:
        print(f"no .mid/.midi files under {args.midi_dir}")
        return 2

    bad = 0
    for path in midis:
        rel = os.path.relpath(path, args.midi_dir)
        try:
            ref_ids = list(ref_repo.encode(path))
            our_ids = list(our_repo.encode(path))
        except Exception as e:  # noqa: BLE001 — report and continue
            print(f"ERROR  {rel}: {type(e).__name__}: {e}")
            bad += 1
            continue
        diff = first_diff(ref_ids, our_ids)
        if diff is not None:
            i, x, y = diff
            print(f"DIFF   {rel}: canonical encode differs at index {i} "
                  f"(ref={x} ours={y}; lens {len(ref_ids)}/{len(our_ids)})")
            bad += 1
            continue
        status = f"OK     {rel}: {len(ref_ids)} ids"
        if args.grid:
            ref_grid = list(ref_repo.encode_transposition(path))
            our_grid = list(our_repo.encode_transposition(path))
            if len(ref_grid) != len(our_grid):
                print(f"DIFF   {rel}: grid size {len(ref_grid)} vs "
                      f"{len(our_grid)}")
                bad += 1
                continue
            for gi, (r, o) in enumerate(zip(ref_grid, our_grid)):
                diff = first_diff(list(r), list(o))
                if diff is not None:
                    i, x, y = diff
                    print(f"DIFF   {rel}: grid[{gi}] differs at index {i} "
                          f"(ref={x} ours={y})")
                    bad += 1
                    break
            else:
                status += f" + {len(ref_grid)}-way grid"
        print(status)

    print(f"\n{len(midis) - bad}/{len(midis)} files bit-exact")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
