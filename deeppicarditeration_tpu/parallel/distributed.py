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
    JAX_NUM_PROCESSES, JAX_PROCESS_ID). On managed multi-host platforms
    (Cloud TPU pods, SLURM) where jax.distributed can auto-detect
    everything, set ``DPI_DISTRIBUTED=auto`` to call the bare
    ``jax.distributed.initialize()`` — auto-detection cannot be the
    default because the bare call blocks forever on a plain single host.
    Returns True when distributed mode is active.
    """
    global _initialized
    if _initialized:
        return True
    if os.environ.get("DPI_DISTRIBUTED", "").lower() == "auto":
        jax.distributed.initialize()  # platform auto-detection
        _initialized = True
        return True
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    num_processes = num_processes if num_processes is not None else int(
        os.environ.get("JAX_NUM_PROCESSES", "0") or 0)
    if coordinator_address is None and num_processes <= 1:
        return False  # single-process run
    if process_id is None:
        pid = os.environ.get("JAX_PROCESS_ID")
        if pid is None:
            # defaulting to 0 on every host would collide all ranks at
            # the coordinator; fail loudly instead
            raise RuntimeError(
                "JAX_COORDINATOR_ADDRESS/JAX_NUM_PROCESSES are set but "
                "JAX_PROCESS_ID is not — set it per host (0..N-1), or use "
                "DPI_DISTRIBUTED=auto on platforms jax can auto-detect")
        process_id = int(pid)
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes or None,
        process_id=process_id)
    _initialized = True
    return True


def is_primary() -> bool:
    return jax.process_index() == 0
