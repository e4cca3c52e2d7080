"""File utilities (counterpart of reference top-level utils.py:1-30)."""

from __future__ import annotations

import os


def find_files_by_extensions(root: str, exts=None):
    """Recursively yield files under ``root`` whose extension is in
    ``exts`` (all files when ``exts`` is falsy)."""
    exts = {e.lower() for e in (exts or [])}

    def _match(name: str) -> bool:
        if not exts:
            return True
        return os.path.splitext(name)[1].lower() in exts

    for dirpath, _, files in os.walk(root):
        for fname in files:
            if _match(fname):
                yield os.path.join(dirpath, fname)
