"""ctypes binding for the native C++ codec (native/codec.cpp).

Loads (building on first use if the toolchain is available)
``libtgtcodec.so`` and exposes ``encode_midi`` / ``encode_midi_grid``. The
pure-Python codec is the fallback and the correctness oracle
(tests/test_native_codec.py asserts bit-exact agreement).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libtgtcodec.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH):
            try:
                subprocess.run(["make", "-s"], cwd=_NATIVE_DIR, check=True,
                               capture_output=True, timeout=120)
            except Exception:
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.tgt_encode_midi.restype = ctypes.c_int
        lib.tgt_encode_midi.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_double,
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_size_t]
        lib.tgt_encode_midi_grid.restype = ctypes.c_int
        lib.tgt_encode_midi_grid.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_double), ctypes.c_int,
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int32)]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def encode_midi(midi_bytes: bytes, stretch: float = 1.0,
                transpose: int = 0, pitch_filter: bool = True
                ) -> np.ndarray | None:
    """MIDI bytes -> int32 token ids, or None if native path unavailable."""
    lib = _load()
    if lib is None:
        return None
    cap = max(len(midi_bytes) * 4, 1 << 16)
    out = np.empty((cap,), np.int32)
    n = lib.tgt_encode_midi(
        midi_bytes, len(midi_bytes), float(stretch), int(transpose),
        1 if pitch_filter else 0,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), cap)
    if n == -2:  # buffer too small: retry bigger
        cap *= 8
        out = np.empty((cap,), np.int32)
        n = lib.tgt_encode_midi(
            midi_bytes, len(midi_bytes), float(stretch), int(transpose),
            1 if pitch_filter else 0,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), cap)
    if n == -1:
        raise ValueError("not a standard MIDI file (native parser)")
    if n < 0:
        raise ValueError(f"native MIDI encode failed (code {n})")
    return out[:n].copy()


def encode_midi_grid(midi_bytes: bytes, stretches, transpose_lo: int,
                     transpose_hi: int) -> list[np.ndarray] | None:
    """Parse once, encode the whole augmentation grid. None if
    unavailable."""
    lib = _load()
    if lib is None:
        return None
    n_enc = len(stretches) * (transpose_hi - transpose_lo + 1)
    cap = max(len(midi_bytes) * 4, 1 << 16) * n_enc
    out = np.empty((cap,), np.int32)
    lengths = np.zeros((n_enc,), np.int32)
    st = np.asarray(list(stretches), np.float64)
    n = lib.tgt_encode_midi_grid(
        midi_bytes, len(midi_bytes),
        st.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(st),
        int(transpose_lo), int(transpose_hi),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), cap,
        lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    if n == -1:
        raise ValueError("not a standard MIDI file (native parser)")
    if n < 0:
        raise ValueError(f"native MIDI grid encode failed (code {n})")
    results = []
    off = 0
    for ln in lengths[:n]:
        results.append(out[off:off + ln].copy())
        off += int(ln)
    return results
