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
        self.sum2 = 0.0
        self.count = 0.0
        self.avg = 0.0
        self.std = 0.0
        self.vals = []

    def update(self, val, n: int = 1):
        """Process scalar value(s); arrays count each element, matching the
        reference's per-sample aggregation (logger.py:41-63)."""
        import numpy as np

        arr = np.asarray(val)
        if arr.ndim > 0:
            self.vals += arr.tolist()
            self.val = float(np.mean(arr))
            self.sum += float(np.sum(arr) * n)
            self.sum2 += float(np.sum(arr**2) * n)
            self.count += float(n * arr.size)
        else:
            v = float(arr)
            self.vals.append(v)
            self.val = v
            self.sum += v * n
            self.sum2 += v**2 * n
            self.count += float(n)
        self.avg = self.sum / max(self.count, 1.0)
        var = self.sum2 / max(self.count, 1.0) - self.avg**2
        self.std = float(np.sqrt(var)) if var > 0 else 0.0

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
