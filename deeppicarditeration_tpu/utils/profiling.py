"""Env-gated step timing (TPU analogue of count_cuda_time_wrapper).

Reference parity: utils.py:50-66 times CUDA events when PROFILE_CUDA is
set. Here: when ``DPI_PROFILE`` is set, ``step_timer`` blocks on device
results and logs wall time per labeled region; otherwise it is free.
``jax.profiler`` traces can be captured with DPI_TRACE_DIR.
"""

from __future__ import annotations

import contextlib
import os
import time

import jax

_ENABLED = bool(os.environ.get("DPI_PROFILE"))
_TRACE_DIR = os.environ.get("DPI_TRACE_DIR")


@contextlib.contextmanager
def step_timer(label: str, result=None):
    """Time a region. Pass ``result`` (any pytree of arrays) to block on it."""
    if not _ENABLED:
        yield
        return
    t0 = time.perf_counter()
    yield
    if result is not None:
        jax.block_until_ready(result)
    print(f"[dpi-profile] {label}: {(time.perf_counter() - t0) * 1e3:.3f} ms")


@contextlib.contextmanager
def maybe_trace(label: str):
    """Capture a jax.profiler trace for this region if DPI_TRACE_DIR is set."""
    if not _TRACE_DIR:
        yield
        return
    with jax.profiler.trace(os.path.join(_TRACE_DIR, label)):
        yield
