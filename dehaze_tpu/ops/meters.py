"""Running meters (reference `*/ops/meters.py:5-45` AverageMeter)."""

from __future__ import annotations

import math


class AverageMeter:
    """Tracks count/sum/mean and (population) std of scalar updates."""

    def __init__(self, name: str = "", fmt: str = ":f"):
        self.name = name
        self.fmt = fmt
        self.reset()

    def reset(self):
        self.count = 0
        self.sum = 0.0
        self.sq_sum = 0.0

    def update(self, value: float, n: int = 1):
        self.count += n
        self.sum += float(value) * n
        self.sq_sum += float(value) ** 2 * n

    @property
    def avg(self) -> float:
        return self.sum / max(self.count, 1)

    @property
    def std(self) -> float:
        if self.count == 0:
            return 0.0
        var = self.sq_sum / self.count - self.avg**2
        return math.sqrt(max(var, 0.0))

    def __str__(self):
        return f"{self.name} {self.avg:.6f} (n={self.count})"
