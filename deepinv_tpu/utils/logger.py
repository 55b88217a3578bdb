"""Meters and CSV logging (reference deepinv/utils/logger.py:10,71,102)."""

from __future__ import annotations

import csv
import os

__all__ = ["AverageMeter", "ProgressMeter", "CSVLogger"]


class AverageMeter:
    """Uneven-batch-safe running average (reference logger.py:10-65)."""

    def __init__(self, name: str = "", fmt: str = ":f"):
        self.name = name
        self.fmt = fmt
        self.reset()

    def reset(self):
        self.val = 0.0
        self.sum = 0.0
        self.count = 0
        self.avg = 0.0
        self.vals = []

    def update(self, val, n: int = 1):
        val = float(val)
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)
        self.vals.append(val)

    @property
    def std(self):
        import numpy as np

        return float(np.std(self.vals)) if self.vals else 0.0

    def __str__(self):
        return f"{self.name} {self.val:.4g} (avg {self.avg:.4g})"


class ProgressMeter:
    """Simple epoch progress printer (reference logger.py:71)."""

    def __init__(self, num_batches: int, meters, prefix: str = ""):
        self.num_batches = num_batches
        self.meters = meters
        self.prefix = prefix

    def display(self, batch: int):
        entries = [f"{self.prefix}[{batch}/{self.num_batches}]"]
        entries += [str(m) for m in self.meters]
        print("  ".join(entries))


class CSVLogger:
    """Append-mode CSV logger (reference LOG, logger.py:102)."""

    def __init__(self, path: str, fieldnames):
        self.path = path
        self.fieldnames = list(fieldnames)
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        new = not os.path.exists(path)
        self._fh = open(path, "a", newline="")
        self._writer = csv.DictWriter(self._fh, fieldnames=self.fieldnames)
        if new:
            self._writer.writeheader()

    def log(self, **row):
        self._writer.writerow(row)
        self._fh.flush()

    def close(self):
        self._fh.close()
