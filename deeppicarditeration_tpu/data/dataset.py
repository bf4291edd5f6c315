"""HBM-resident dataset: generation, epoch shuffling, offline replay.

TPU-first replacement for the reference's dataset/cache/saver zoo
(dataset.py, data_saver.py, memory.py — survey §7.1.3): the per-iteration
dataset is ONE sharded device array pair (tx, y); multi-epoch training
shuffles a permutation of indices on device; persistence is one ``.npz``
(default) or ``.h5`` (``DATA.SAVE_FORMAT``, reference layout
data.py:1498-1520) per iteration; offline replay loads ``.npy``/``.npz``/
``.h5`` including the reference's ``split_NN.h5`` label layout
(OfflineDataGenerator, data.py:1382-1408). There is no OOM-probing:
generation batch sizes are static and chosen ahead of time.
"""

from __future__ import annotations

import pathlib
from typing import Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from deeppicarditeration_tpu.models.solution import Solution
from deeppicarditeration_tpu.ops import estimators as est


@struct.dataclass
class DeviceDataset:
    tx: jnp.ndarray  # (N, 1 + nx)
    y: jnp.ndarray  # (N, target_dim)

    @property
    def size(self) -> int:
        return self.tx.shape[0]


def default_gen_batch(n_total: int, chunk_elems: int, nx: int,
                      ndev: int = 1) -> int:
    """Derived bound on collocation points per generation dispatch.

    GenConfig.chunk picks the per-scan-step MC chunk as the largest
    divisor of M with B * mc * nx <= chunk_elems. With the reference's
    DEFAULT ``DATA.DATA_SIZE = 2048 * 5000 = 10.24M`` (reference
    config.py DATA.DATA_SIZE) in ONE dispatch, B * nx alone exceeds
    chunk_elems: mc degenerates to 1 and the scan runs M sequential steps
    each materializing a multi-GB (B, 1, nx) draw. Bounding
    B <= chunk_elems / (8 * nx) keeps mc >= ~8 (the shipped recipes'
    measured operating point) and the per-dispatch working set at the
    same scale the kernels were tuned for. Rounded down to a multiple of
    1024 (and of the mesh data-axis size) for clean tiling/sharding."""
    cap = max(1, chunk_elems // (8 * max(nx, 1)))
    if cap >= 2048:
        cap -= cap % 1024
    if ndev > 1 and cap > ndev:
        cap -= cap % ndev
    return min(n_total, max(cap, ndev))


def generate_dataset(key, eq, sol: Solution, n_total: int,
                     gen: est.GenConfig, mode: str,
                     sol_m2: Optional[Solution] = None,
                     gen_batch: Optional[int] = None,
                     sharding=None, dtype=jnp.float32,
                     jit_sample=None, t_expo=None) -> DeviceDataset:
    """Generate the per-iteration supervised dataset on device.

    ``gen_batch`` bounds collocation points per generation dispatch (the
    M-sample reduction is already chunked inside); with B=4096, M=4096 a
    single dispatch is typical. ``jit_sample`` allows the caller to pass a
    pre-jitted sample_batch closure (kept across Picard iterations so the
    kernel compiles once)."""
    gen_batch = gen_batch or n_total
    sample = jit_sample or (
        lambda k, e, s, s2, expo: est.sample_batch(
            k, e, s, gen_batch, gen, mode=mode, sol_m2=s2, dtype=dtype,
            t_expo=expo))
    if t_expo is None:
        t_expo = float(max(gen.N - gen.i + 1, 1))
    txs, ys = [], []
    n_done = 0
    ck = 0
    while n_done < n_total:
        k = jax.random.fold_in(key, ck)
        tx, y = sample(k, eq, sol, sol_m2, jnp.asarray(t_expo, dtype))
        if sharding is not None:
            tx = jax.device_put(tx, sharding)
            y = jax.device_put(y, sharding)
        take = min(gen_batch, n_total - n_done)
        txs.append(tx[:take])
        ys.append(y[:take])
        n_done += take
        ck += 1
    if len(txs) == 1:  # typical case: one dispatch, no copy
        return DeviceDataset(tx=txs[0], y=ys[0])
    return DeviceDataset(tx=jnp.concatenate(txs), y=jnp.concatenate(ys))


def epoch_batches(key, ds: DeviceDataset, batch_size: int,
                  shuffle: bool = True) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One epoch as stacked batches: ((S, bs, 1+nx), (S, bs, ydim)).

    Replaces CacheToMemoryWrapper + TensorDatasetBuiltInShuffle
    (dataset.py:203-255): an on-device permutation + reshape. Drops the
    ragged tail (as torch DataLoader(drop_last) would)."""
    n = ds.size
    steps = n // batch_size
    if steps == 0:
        # worded in terms of this function's own arguments: batch_size may
        # come from TRAIN.BATCH_SIZE or a baseline METHOD key — the caller
        # adds the config-key context
        raise ValueError(
            f"batch_size ({batch_size}) exceeds the dataset size "
            f"({n}); no full batch can be formed (drop_last semantics)")
    idx = (jax.random.permutation(key, n) if shuffle
           else jnp.arange(n))[: steps * batch_size]
    tx = jnp.take(ds.tx, idx, axis=0).reshape(steps, batch_size, -1)
    y = jnp.take(ds.y, idx, axis=0).reshape(steps, batch_size, -1)
    return tx, y


# Target-dataset labels used by the reference's H5 layout (one dataset per
# label, data_saver.py:25-54; label table data.py:1620-1661). Ordered most-
# specific first so a file with several is read at its widest target.
_H5_TARGET_LABELS = ("y", "u_ux_uh", "u_ux", "u")


def data_save_ext(save_format: str) -> str:
    """Map DATA.SAVE_FORMAT to the data_iter_{i} file extension (both the
    save and the RESUME-replay path MUST use this so they cannot drift)."""
    fmt = str(save_format).lower()
    if fmt in ("h5", "hdf5"):
        return "h5"
    if fmt == "npz":
        return "npz"
    raise ValueError(
        f"DATA.SAVE_FORMAT must be 'npz' or 'h5', got {save_format!r}")


def save_dataset(path: pathlib.Path, ds: DeviceDataset,
                 provenance: Optional[dict] = None) -> None:
    """Persist a generated dataset (DATA.SAVE, data.py:1498-1520).

    ``.npz`` (default) or ``.h5``/``.hdf5`` (the reference's format,
    data_saver.py:25-54: per-label datasets ``tx`` and targets; we write the
    target block under ``y``).

    ``provenance`` (a JSON-serializable dict — seed, iteration, estimator
    fingerprint) is stamped into the file so the RESUME replay path can
    refuse a stale file from an earlier FORCE run with different settings
    (load_provenance).

    Multi-process: COLLECTIVE — every process must call it. The
    data-sharded global arrays are allgathered to every host (np.asarray
    on a non-fully-addressable array raises), then the primary alone
    writes the file; the trailing barrier keeps a non-primary from
    outliving the run before the write committed (a later RESUME replay
    reads this file)."""
    import json

    from deeppicarditeration_tpu.parallel.distributed import (
        barrier,
        gather_to_host,
        is_primary,
    )

    tx_h, y_h = gather_to_host(ds.tx), gather_to_host(ds.y)
    if is_primary():
        path.parent.mkdir(parents=True, exist_ok=True)
        prov = json.dumps(provenance) if provenance is not None else None
        if path.suffix in (".h5", ".hdf5"):
            import h5py

            with h5py.File(path, "w") as f:
                f.create_dataset("tx", data=tx_h)
                f.create_dataset("y", data=y_h)
                if prov is not None:
                    f.attrs["provenance"] = prov
        else:
            extra = ({"provenance": np.asarray(prov)}
                     if prov is not None else {})
            np.savez_compressed(path, tx=tx_h, y=y_h, **extra)
    barrier("save_dataset")


def load_provenance(path) -> Optional[dict]:
    """The provenance stamp save_dataset wrote, or None (unstamped file —
    written before stamping existed, or an offline/reference file)."""
    import json

    path = pathlib.Path(path)
    if path.suffix == ".npz":
        z = np.load(path)
        if "provenance" in getattr(z, "files", ()):
            return json.loads(str(z["provenance"]))
        return None
    if path.suffix in (".h5", ".hdf5"):
        import h5py

        with h5py.File(path, "r") as f:
            prov = f.attrs.get("provenance")
        return json.loads(prov) if prov is not None else None
    return None


def load_dataset(path, dtype=jnp.float32) -> DeviceDataset:
    """Offline replay: .npz (ours), .h5/.hdf5 (ours or reference
    ``split_NN.h5`` label layout, data_saver.py:86-109), or .npy
    ((tx..., u) columns, reference OfflineDataGenerator format
    data.py:1391-1399)."""
    path = pathlib.Path(path)
    if path.suffix == ".npz":
        z = np.load(path)
        return DeviceDataset(tx=jnp.asarray(z["tx"], dtype),
                             y=jnp.asarray(z["y"], dtype))
    if path.suffix in (".h5", ".hdf5"):
        import h5py

        with h5py.File(path, "r") as f:
            tx = f["tx"][...]
            for label in _H5_TARGET_LABELS:
                if label in f:
                    y = f[label][...]
                    break
            else:
                raise KeyError(
                    f"{path}: no target dataset among {_H5_TARGET_LABELS}")
        return DeviceDataset(tx=jnp.asarray(tx, dtype),
                             y=jnp.asarray(y, dtype))
    data = np.load(path)
    return DeviceDataset(tx=jnp.asarray(data[:, :-1], dtype),
                         y=jnp.asarray(data[:, -1:], dtype))
