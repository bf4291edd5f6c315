"""Per-iteration checkpointing (orbax).

Reference parity: model_{i}.ckpt per Picard iteration
(picard_iteration.py:77-79, 295) and the RELOAD / PRETRAIN_PATH warm
starts (:244-251). Checkpoints hold the parameter pytree only; the
reload path restores into a freshly-initialized tree of the same
structure (so restore is structure-checked).

Saves are ASYNC: the device->host transfer happens synchronously (the
params are then safe to donate/mutate), the disk write overlaps the next
Picard iteration's generation. orbax serializes overlapping saves
internally; loads and process exit flush pending writes first.
"""

from __future__ import annotations

import atexit
import pathlib
import threading

import jax
import orbax.checkpoint as ocp

_CKPTR = None
_MISSING = object()  # sentinel: attribute absent vs present-but-None


def _checkpointer() -> ocp.AsyncCheckpointer:
    global _CKPTR
    if _CKPTR is None:
        _CKPTR = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
        # The flush must run BEFORE the interpreter shuts down its thread
        # pools: plain atexit handlers fire after threading's own, at
        # which point orbax's in-flight save can no longer submit work
        # ("cannot schedule new futures after shutdown") and the final
        # checkpoint is left as an uncommitted *-tmp dir (observed).
        register = getattr(threading, "_register_atexit", atexit.register)
        register(wait_all)
    return _CKPTR


def wait_all() -> None:
    """Block until every scheduled checkpoint write has committed."""
    if _CKPTR is not None:
        _CKPTR.wait_until_finished()


def ckpt_path(exp_dir: pathlib.Path, i: int) -> pathlib.Path:
    return (exp_dir / f"model_{i}").absolute()


def save_params(path: pathlib.Path, params, block: bool = False) -> None:
    ckptr = _checkpointer()
    ckptr.save(pathlib.Path(path).absolute(),
               args=ocp.args.StandardSave(params), force=True)
    if block:
        ckptr.wait_until_finished()


def load_params(path: pathlib.Path, like_params):
    """Restore params with the structure (and shardings) of like_params."""
    ckptr = _checkpointer()
    ckptr.wait_until_finished()  # a just-scheduled save may be the target
    abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct,
                                      like_params)
    return ckptr.restore(pathlib.Path(path).absolute(),
                         args=ocp.args.StandardRestore(abstract))


def is_readable(path: pathlib.Path) -> bool:
    """True iff a COMMITTED checkpoint with parseable tree metadata
    exists at ``path``. Lets recovery code distinguish a torn/missing
    save (orbax commits atomically, so torn == uncommitted tmp dir ==
    unreadable -> start fresh) from a committed state that no longer
    restores into the current model template (structural mismatch ->
    surface the error) without parsing orbax's error strings. Metadata-
    only: no O(checkpoint-size) I/O on the error path."""
    ckptr = _checkpointer()
    ckptr.wait_until_finished()
    p = pathlib.Path(path).absolute()
    try:
        meta = ckptr.metadata(p)
        item_md = getattr(meta, "item_metadata", _MISSING)
        if item_md is not _MISSING:
            return item_md is not None
    except Exception:
        return False
    # orbax version whose metadata() result has no item_metadata at all
    # (vs present-but-None = unparseable): fall back to the committed
    # checkpoint's on-disk metadata markers so a structural mismatch is
    # not silently classified as "start fresh"
    return (p / "_METADATA").exists() or (p / "_CHECKPOINT_METADATA").exists()
