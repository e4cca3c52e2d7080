"""Experiment logging (counterpart of model/utils/exp_utils.py:8-43):
per-process log file in the work dir, console on process 0 only."""

from __future__ import annotations

import logging
import os


def logging_config(folder: str, name: str, console: bool = True,
                   level=logging.INFO) -> None:
    os.makedirs(folder, exist_ok=True)
    logpath = os.path.join(folder, name + ".log")

    root = logging.getLogger()
    root.setLevel(level)
    for h in list(root.handlers):
        root.removeHandler(h)

    fmt = logging.Formatter("%(asctime)s %(levelname)s %(message)s")
    fh = logging.FileHandler(logpath, mode="a")
    fh.setFormatter(fmt)
    root.addHandler(fh)
    if console:
        ch = logging.StreamHandler()
        ch.setFormatter(fmt)
        root.addHandler(ch)
