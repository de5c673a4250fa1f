"""Text logging + best-metric tracking.

Equivalent of `Logger/Logger.py` (append-only "[iter] [k]:v" lines) and the
`Logger/Scorer.py` Score/ScoreManager scaffolding (which the reference never
wires up — here it is live and used by the eval harness).
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Mapping


class Logger:
    """Append-only metrics log, one file per stream."""

    def __init__(self, path: str, name: str = "train"):
        os.makedirs(path, exist_ok=True)
        self.file = os.path.join(path, f"{name}.log")

    def log(self, step: int, metrics: Mapping[str, float]) -> None:
        parts = " ".join(f"[{k}]:{float(v):.6g}" for k, v in metrics.items())
        with open(self.file, "a") as f:
            f.write(f"[{step}] {parts} [t]:{time.time():.0f}\n")


@dataclasses.dataclass
class ScoreTracker:
    """Track best value per metric (higher_better per metric)."""

    higher_better: Mapping[str, bool] = dataclasses.field(default_factory=dict)

    def __post_init__(self):
        self.best: dict[str, tuple[float, int]] = {}

    def update(self, step: int, metrics: Mapping[str, float]) -> dict[str, bool]:
        """Returns {metric: is_new_best}."""
        out = {}
        for k, v in metrics.items():
            hb = self.higher_better.get(k, True)
            cur = self.best.get(k)
            better = cur is None or (v > cur[0] if hb else v < cur[0])
            if better:
                self.best[k] = (float(v), step)
            out[k] = better
        return out
