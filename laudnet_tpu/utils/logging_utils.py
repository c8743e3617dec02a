"""Logging utilities (reference `train/main.py:775-784`, `utils/utils.py:20-59`)."""

from __future__ import annotations

import os
import sys
from typing import Iterable


class Logger:
    """Tee: prints and appends to a log file (reference Logger)."""

    def __init__(self, filename: str):
        self.filename = filename
        os.makedirs(os.path.dirname(filename) or ".", exist_ok=True)
        with open(self.filename, "w") as f:
            f.write("==================== start running ====================\n")

    def log(self, msg, isprint: bool = True):
        if isprint:
            print(msg, flush=True)
        with open(self.filename, "a") as f:
            f.write(str(msg) + "\n")

    __call__ = log


class ProgressMeter:
    """Batch-progress display over a set of AverageMeters."""

    def __init__(self, num_batches: int, meters: Iterable, prefix: str = "",
                 printer=print):
        self.meters = list(meters)
        self.prefix = prefix
        digits = len(str(num_batches // 1))
        self.fmt = "[" + "{:" + str(digits) + "d}" + f"/{num_batches}]"
        self.printer = printer

    def display(self, batch: int):
        entries = [self.prefix + self.fmt.format(batch)]
        entries += [str(m) for m in self.meters]
        self.printer("\t".join(entries))
