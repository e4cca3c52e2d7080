"""Token vocabulary + held-note status tracking.

Counterpart of the reference ``BaseVocab`` (model/data_utils.py:24-99) with
the same invariants (<S> at id 0, <PAD> at id 1) and a vectorized
``update_status_vec`` replacing the reference's per-token Python triple loop
(model/data_utils.py:84-99).
"""

from __future__ import annotations

import numpy as np


class BaseVocab:
    def __init__(self, all_tokens):
        self._all_tokens = list(all_tokens)
        self._map = {}
        self._reverse_map = {}
        for i, token in enumerate(self._all_tokens):
            self._map[token] = i
            self._reverse_map[i] = token
        assert self._all_tokens[0] == "<S>"
        assert self._all_tokens[1] == "<PAD>"
        self.vec_len = 0
        self.note_on_dic: dict[int, int] = {}
        self.note_off_dic: dict[int, int] = {}

    @classmethod
    def from_file(cls, vocab_path: str) -> "BaseVocab":
        tokens = []
        with open(vocab_path, "r") as f:
            for token in f:
                token = token.strip()
                if token:
                    tokens.append(token)
        return cls(tokens)

    def idx_to_token(self, idx):
        return self._all_tokens[idx]

    @property
    def bos_token(self):
        return self._all_tokens[0]

    @property
    def pad_token(self):
        return self._all_tokens[1]

    @property
    def bos_id(self):
        return 0

    @property
    def pad_id(self):
        return 1

    @property
    def all_tokens(self):
        return self._all_tokens

    def token_to_idx(self, token):
        return self._map[token]

    def __len__(self):
        return len(self._all_tokens)

    def __getitem__(self, token):
        return self._map[token]

    def notes_mapping(self):
        """Build NOTE_ON/NOTE_OFF -> status-slot maps
        (reference model/data_utils.py:68-82)."""
        note_on_tokens = [t for t in self._map.keys() if "NOTE_ON" in t]
        note_off_tokens = [t for t in self._map.keys() if "NOTE_OFF" in t]
        self.vec_len = len(note_on_tokens)
        self.note_on_dic = {}
        self.note_off_dic = {}
        for index, (note_on, note_off) in enumerate(
                zip(note_on_tokens, note_off_tokens)):
            self.note_on_dic[self._map[note_on]] = index
            self.note_off_dic[self._map[note_off]] = index

        # Dense lookup tables for the vectorized status update:
        # token id -> slot (or -1), token id -> +1 (on) / -1 (off) / 0.
        n = len(self._all_tokens)
        self._status_slot = np.full((n,), -1, dtype=np.int32)
        self._status_delta = np.zeros((n,), dtype=np.int8)
        for tok, slot in self.note_on_dic.items():
            self._status_slot[tok] = slot
            self._status_delta[tok] = 1
        for tok, slot in self.note_off_dic.items():
            self._status_slot[tok] = slot
            self._status_delta[tok] = -1

    def update_status_vec(self, data: np.ndarray,
                          status_vec: np.ndarray) -> None:
        """Advance the held-note bit-vectors through a [bptt, bsz] window.

        Semantics match reference model/data_utils.py:84-99: the state is
        seeded from ``status_vec[-1]`` and each output row t reflects the
        state *after* consuming token t. Vectorized over the batch; the loop
        is only over the bptt dimension.
        """
        bptt, bsz = data.shape
        state = status_vec[-1].copy()  # [bsz, vec_len] bool
        slots = self._status_slot[data]    # [bptt, bsz]
        deltas = self._status_delta[data]  # [bptt, bsz]
        rows = np.arange(bsz)
        for t in range(bptt):
            active = deltas[t] != 0
            if active.any():
                s = slots[t]
                on = active & (deltas[t] > 0)
                off = active & (deltas[t] < 0)
                state[rows[on], s[on]] = True
                state[rows[off], s[off]] = False
            status_vec[t] = state
