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
import numpy as np

# "0"/"false"/"" disable: DPI_PROFILE=0 blocking per-stage syncs in a
# benchmark run is exactly the accident the falsy spellings invite
_ENABLED = os.environ.get("DPI_PROFILE", "").strip().lower() not in (
    "", "0", "false", "off", "no")
_TRACE_DIR = os.environ.get("DPI_TRACE_DIR")


class _ResultHolder:
    """Mutable slot so a value computed INSIDE the timed region can be
    blocked on at region exit (a plain kwarg is evaluated at entry and can
    never see it)."""

    __slots__ = ("result",)

    def __init__(self):
        self.result = None

    def set(self, result):
        self.result = result
        return result


@contextlib.contextmanager
def step_timer(label: str):
    """Time a region. Yields a holder; call ``holder.set(x)`` on a pytree of
    arrays computed in the region to make the timer wait for it.

    Completion is forced by a host readback of one leaf, not just
    block_until_ready — through the remote-TPU tunnel block_until_ready is
    not a reliable barrier (CLAUDE.md "Environment gotchas").

    CAVEAT (profiling-only tool): the outside-jit ravel/slice + readback
    adds one tunnel dispatch (~30 ms, and up to ~290 ms when it breaks a
    dispatch chain) to every timed region. step_timer numbers therefore
    carry a near-constant additive offset and are for coarse attribution;
    they are NOT comparable to bench.py's salt-token methodology, which
    folds the completion token into the jitted graph itself."""
    holder = _ResultHolder()
    if not _ENABLED:
        yield holder
        return
    t0 = time.perf_counter()
    yield holder
    if holder.result is not None:
        leaves = jax.tree_util.tree_leaves(holder.result)
        if leaves:
            jax.block_until_ready(leaves)
            # Read ONE element back, not the leaf: a full-array transfer
            # through the tunnel adds a large constant that would distort
            # the measurement (CLAUDE.md).
            np.asarray(jax.numpy.ravel(leaves[0])[:1])
    print(f"[dpi-profile] {label}: {(time.perf_counter() - t0) * 1e3:.3f} ms")


@contextlib.contextmanager
def maybe_trace(label: str):
    """Capture a jax.profiler trace for this region if DPI_TRACE_DIR is set."""
    if not _TRACE_DIR:
        yield
        return
    with jax.profiler.trace(os.path.join(_TRACE_DIR, label)):
        yield
