"""Structured metrics logging.

The reference logs with @info strings and commits its loss history only as a
PNG (src/train_brain.jl:280,302-303; SURVEY.md section 5.5). Here metrics go
to JSONL (machine-readable history) with optional CSV export and the parity
loss-curve PNG.
"""

from __future__ import annotations

import json
import time
from typing import Any


class MetricsLogger:
    def __init__(self, path: str | None = None, echo: bool = False):
        self.path = path
        self.echo = echo
        self.history: list[dict[str, Any]] = []
        self._fh = open(path, "a") if path else None

    def log(self, step: int, **metrics):
        rec = {"step": step, "time": time.time(), **metrics}
        self.history.append(rec)
        if self._fh:
            self._fh.write(json.dumps(rec) + "\n")
            self._fh.flush()
        if self.echo:
            kv = " ".join(f"{k}={v:.6g}" if isinstance(v, float) else f"{k}={v}" for k, v in metrics.items())
            print(f"[step {step}] {kv}")

    def series(self, key: str) -> list:
        return [r[key] for r in self.history if key in r]

    def to_csv(self, path: str):
        import csv

        keys = sorted({k for r in self.history for k in r})
        with open(path, "w", newline="") as fh:
            w = csv.DictWriter(fh, fieldnames=keys)
            w.writeheader()
            w.writerows(self.history)

    def close(self):
        if self._fh:
            self._fh.close()
            self._fh = None
