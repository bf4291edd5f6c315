"""Rich console progress for the outer Picard loop and training.

Reference parity: CustomRichProgressBar + rich_track
(picard_iteration.py:37-73, utils.py:594-656) — iteration-prefixed bars
with losses in scientific notation. Auto-enabled on a TTY; force with
DPI_PROGRESS=1 (or off with DPI_PROGRESS=0) so test/batch logs stay clean.
"""

from __future__ import annotations

import os
import sys
from typing import Optional


def _enabled(explicit: Optional[bool]) -> bool:
    if explicit is not None:
        return explicit
    env = os.environ.get("DPI_PROGRESS")
    if env is not None:
        return env not in ("0", "false", "")
    return sys.stdout.isatty()


class PicardProgress:
    """Two-level progress: Picard iterations over epochs/steps.

    All methods are no-ops when disabled, so call sites need no guards."""

    def __init__(self, total_iters: int, enabled: Optional[bool] = None):
        self.enabled = _enabled(enabled)
        self._progress = None
        if not self.enabled:
            return
        try:
            # rich is not a hard dependency (today it arrives transitively
            # via flax); degrade to no progress bars if it is absent.
            from rich.progress import (
                BarColumn,
                Progress,
                TextColumn,
                TimeElapsedColumn,
                TimeRemainingColumn,
            )
        except ImportError:
            self.enabled = False
            return

        self._progress = Progress(
            TextColumn("[progress.description]{task.description}"),
            BarColumn(),
            TextColumn("{task.completed}/{task.total}"),
            TimeElapsedColumn(),
            TimeRemainingColumn(),
            TextColumn("{task.fields[loss]}"),
        )
        self._progress.start()
        self._iter_task = self._progress.add_task(
            "Picard", total=total_iters, loss="")
        self._train_task = None

    # ------------------------------------------------------------------
    def start_iteration(self, i: int, total_steps: int):
        if not self.enabled:
            return
        self._progress.update(self._iter_task,
                              description=f"Picard iter {i}")
        if self._train_task is not None:
            self._progress.remove_task(self._train_task)
        self._train_task = self._progress.add_task(
            f"  train (iter {i})", total=total_steps, loss="")

    def update_train(self, steps_done: int, loss: Optional[float] = None):
        if not self.enabled or self._train_task is None:
            return
        loss_txt = f"loss {loss:.3e}" if loss is not None else ""
        self._progress.update(self._train_task, completed=steps_done,
                              loss=loss_txt)

    def update_completed(self, n: int):
        """Jump the iteration bar forward (RESUME continuation)."""
        if self.enabled:
            self._progress.update(self._iter_task, completed=n)

    def finish_iteration(self, loss: Optional[float] = None):
        if not self.enabled:
            return
        loss_txt = f"loss {loss:.3e}" if loss is not None else ""
        self._progress.update(self._iter_task, advance=1, loss=loss_txt)
        if self._train_task is not None:
            self._progress.remove_task(self._train_task)
            self._train_task = None

    def close(self):
        if self.enabled and self._progress is not None:
            self._progress.stop()
            self._progress = None
            self.enabled = False

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
