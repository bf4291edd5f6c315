"""Metric logging: JSONL stream + optional TensorBoard / wandb.

Replaces the reference's wandb/tensorboardX dual logger
(picard_iteration.py:265-276) with an always-on JSONL file per experiment
(machine-readable, no external deps) plus best-effort TensorBoard, and an
opt-in wandb backend with the reference's per-iteration run grouping
(one run named ``{NAME}_picard_iter_{i}`` per Picard iteration, grouped by
experiment NAME, offline by default — this environment has zero egress).
When the wandb package is missing the run degrades to JSONL with a clear
notice instead of failing.
"""

from __future__ import annotations

import json
import math
import pathlib
import time
from typing import Dict, Optional

_KNOWN_LOGGERS = ("jsonl", "tensorboard", "wandb", "none", None)


def _jsonable(v):
    """Floats pass through; non-finite become None (strict-JSON safe —
    MArE = mean|err/u| is legitimately inf when u ~ 0 at a sample)."""
    if hasattr(v, "__float__"):
        f = float(v)
        return f if math.isfinite(f) else None
    return v


class MetricLogger:
    def __init__(self, exp_dir: pathlib.Path, logger: str = "jsonl",
                 tensorboard_dir: Optional[str] = None,
                 name: str = "exp", logger_kwargs: Optional[Dict] = None,
                 hparams: Optional[Dict] = None, primary: bool = True):
        if logger not in _KNOWN_LOGGERS:
            raise ValueError(
                f"LOGGING.LOGGER {logger!r} is not supported; use one of "
                f"{[k for k in _KNOWN_LOGGERS if k]} "
                "(picard_iteration.py:265-276 parity)")
        # non-primary processes of a multi-process run validate the config
        # (above, so every rank fails in unison on a bad logger name) but
        # perform NO host IO: every process appending to the same
        # metrics.jsonl would duplicate each row N times
        self._primary = bool(primary)
        if not self._primary:
            self._jsonl = self._tb = self._wandb = self._wandb_run = None
            return
        self.exp_dir = pathlib.Path(exp_dir)
        self.exp_dir.mkdir(parents=True, exist_ok=True)
        self._jsonl = open(self.exp_dir / "metrics.jsonl", "a")
        self._tb = None
        self._wandb = None  # the wandb MODULE when the backend is active
        self._wandb_run = None
        self._name = name
        self._kwargs = dict(logger_kwargs or {})
        self._hparams = hparams or {}
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
        elif logger == "wandb":
            try:
                import wandb  # type: ignore

                self._wandb = wandb
            except ImportError:
                print("LOGGING.LOGGER: wandb requested but the wandb "
                      "package is not installed — logging to "
                      "metrics.jsonl only (offline-first environment)")

    # ------------------------------------------------------------------
    def start_iteration(self, i: int) -> None:
        """Reference parity (picard_iteration.py:265-276): one wandb run
        per Picard iteration, named {NAME}_picard_iter_{i}, grouped by the
        experiment NAME, hyperparams attached. No-op for other backends."""
        if self._wandb is None:
            return
        kwargs = dict(self._kwargs)
        # offline unless the recipe explicitly opts into online
        mode = "offline" if kwargs.pop("offline", True) else "online"
        project = kwargs.pop("project", "picard")
        try:
            if self._wandb_run is not None:
                self._wandb_run.finish()
            self._wandb_run = self._wandb.init(
                project=project, group=self._name,
                name=f"{self._name}_picard_iter_{i}", mode=mode,
                dir=str(self.exp_dir), config=self._hparams,
                reinit=True, **kwargs)
        except Exception as e:  # never kill the run over telemetry
            print(f"wandb run init failed ({e!r}); continuing with "
                  "metrics.jsonl only")
            self._wandb_run = None
            self._wandb = None

    def log(self, metrics: Dict, step: int, context: str = "train") -> None:
        if not self._primary:
            return
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
        if self._wandb_run is not None:
            try:
                self._wandb_run.log(
                    {f"{context}/{k}": _jsonable(v)
                     for k, v in metrics.items()}, step=step)
            except Exception:
                pass  # never kill the run over telemetry

    def close(self) -> None:
        if not self._primary:
            return
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
        if self._wandb_run is not None:
            self._wandb_run.finish()
            self._wandb_run = None
