"""Device mesh + sharding helpers (the framework's SPMD backbone).

The reference has no distributed code (survey §2 row 33); this layer is the
TPU-native capability it lacked (survey §5.8): one ``Mesh`` with a ``data``
axis over all chips; collocation points (and their MC estimates) shard over
``data`` for both generation and training; parameters stay replicated and
XLA inserts the psum for the gradient all-reduce over ICI. Because every
DPI estimator is a mean of i.i.d. per-point terms (data.py:451, 468, 526),
sharding the point axis is mathematically exact. Multi-host runs call
``jax.distributed.initialize`` first; the SPMD program is identical.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: Optional[Sequence[int]] = None,
              axes: Sequence[str] = ("data",),
              devices=None) -> Mesh:
    """Build the run mesh. Default: all visible devices on one data axis.

    An explicit ``shape`` smaller than the device count takes the first
    prod(shape) devices (e.g. MESH.SHAPE: [1] pins a single-device run on
    a multi-device host — used by the sharded==single equality tests)."""
    devices = devices if devices is not None else jax.devices()
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axes) - 1)
    n = int(np.prod(shape))
    if n < len(devices):
        devices = devices[:n]
    dev_array = np.asarray(devices).reshape(tuple(shape))
    return Mesh(dev_array, tuple(axes))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim sharded over the data axis, features replicated."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a (B, ...) pytree with B sharded across the data axis."""
    return jax.device_put(batch, data_sharding(mesh))


def replicate(tree, mesh: Mesh):
    return jax.device_put(tree, replicated(mesh))
