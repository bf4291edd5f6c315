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
    """True on the process that owns host-side IO (exp dir, metrics,
    dataset files, plots). The checkpoint path is NOT guarded by this:
    orbax saves/restores are collectives every process must enter."""
    return jax.process_index() == 0


def is_multiprocess() -> bool:
    return jax.process_count() > 1


def barrier(name: str) -> None:
    """Cross-process sync point (no-op single-process). Non-primary
    processes wait here for primary's host IO (exp-dir creation, dataset
    writes) before depending on its effects."""
    if is_multiprocess():
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)


def host_local_copy(tree):
    """Process-local copy of a FULLY-REPLICATED global pytree.

    Eager (non-jit) host work — plotting, numpy post-processing — cannot
    consume arrays that span non-addressable devices. For replicated
    arrays every process holds a complete shard, so the local copy is
    exact and free of collectives."""
    def one(a):
        if isinstance(a, jax.Array) and not a.is_fully_addressable:
            if not a.is_fully_replicated:
                raise ValueError(
                    "host_local_copy needs a fully-replicated array; got "
                    f"sharding {a.sharding}")
            return jax.numpy.asarray(a.addressable_shards[0].data)
        return a

    return jax.tree_util.tree_map(one, tree)


def gather_to_host(a):
    """Full numpy value of a (possibly data-sharded) global array.

    COLLECTIVE when the array is not fully addressable — every process
    must call it (process_allgather); each then holds the full value and
    the primary alone writes it to disk."""
    import numpy as np

    if isinstance(a, jax.Array) and not a.is_fully_addressable:
        if a.is_fully_replicated:
            return np.asarray(a.addressable_shards[0].data)
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(a, tiled=True))
    return np.asarray(a)
