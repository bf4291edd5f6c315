"""Multi-host initialization (new capability; reference has none, §5.8).

One call before anything touches devices:

    from deeppicarditeration_tpu.parallel import distributed
    distributed.initialize()  # no-op on single-host / already-initialized

After this, ``jax.devices()`` spans the pod slice and the same SPMD program
(mesh over all devices, points sharded on 'data') runs unchanged — XLA
routes collectives over ICI within hosts and DCN across them.
"""

from __future__ import annotations

import os
from typing import Optional

import jax

_initialized = False


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> bool:
    """Initialize jax.distributed when running multi-process.

    Arguments default to the standard env vars (JAX_COORDINATOR_ADDRESS,
    JAX_NUM_PROCESSES, JAX_PROCESS_ID) or TPU-pod auto-detection. Returns
    True when distributed mode is active.
    """
    global _initialized
    if _initialized:
        return True
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    num_processes = num_processes if num_processes is not None else int(
        os.environ.get("JAX_NUM_PROCESSES", "0") or 0)
    if coordinator_address is None and num_processes <= 1:
        return False  # single-process run
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes or None,
        process_id=(process_id if process_id is not None
                    else int(os.environ.get("JAX_PROCESS_ID", "0"))))
    _initialized = True
    return True


def is_primary() -> bool:
    return jax.process_index() == 0
