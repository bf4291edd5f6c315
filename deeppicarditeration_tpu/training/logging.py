"""Metric logging: JSONL stream + optional TensorBoard.

Replaces the reference's wandb/tensorboardX dual logger
(picard_iteration.py:265-276) with an always-on JSONL file per experiment
(machine-readable, no external deps) and best-effort TensorBoard when the
package is available.
"""

from __future__ import annotations

import json
import math
import pathlib
import time
from typing import Dict, Optional


def _jsonable(v):
    """Floats pass through; non-finite become None (strict-JSON safe —
    MArE = mean|err/u| is legitimately inf when u ~ 0 at a sample)."""
    if hasattr(v, "__float__"):
        f = float(v)
        return f if math.isfinite(f) else None
    return v


class MetricLogger:
    def __init__(self, exp_dir: pathlib.Path, logger: str = "jsonl",
                 tensorboard_dir: Optional[str] = None):
        self.exp_dir = pathlib.Path(exp_dir)
        self.exp_dir.mkdir(parents=True, exist_ok=True)
        self._jsonl = open(self.exp_dir / "metrics.jsonl", "a")
        self._tb = None
        if logger == "tensorboard":
            SummaryWriter = None
            try:
                from tensorboardX import SummaryWriter  # type: ignore
            except ImportError:
                try:  # torch ships a tensorboard writer with the same API
                    from torch.utils.tensorboard import (  # type: ignore
                        SummaryWriter)
                except ImportError:
                    pass
            if SummaryWriter is not None:
                try:
                    self._tb = SummaryWriter(
                        log_dir=str(tensorboard_dir or (self.exp_dir / "tb")))
                except Exception as e:  # best-effort: never kill the run
                    print(f"tensorboard writer unavailable ({e!r}); "
                          "logging to metrics.jsonl only")
                    self._tb = None

    def log(self, metrics: Dict, step: int, context: str = "train") -> None:
        rec = {"step": step, "context": context, "time": time.time()}
        rec.update({k: _jsonable(v) for k, v in metrics.items()})
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            for k, v in metrics.items():
                try:
                    self._tb.add_scalar(f"{context}/{k}", float(v), step)
                except (TypeError, ValueError):
                    pass

    def close(self) -> None:
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
