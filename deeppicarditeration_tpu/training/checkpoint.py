"""Per-iteration checkpointing (orbax).

Reference parity: model_{i}.ckpt per Picard iteration
(picard_iteration.py:77-79, 295) and the RELOAD / PRETRAIN_PATH warm
starts (:244-251). Checkpoints hold the parameter pytree only; the
reload path restores into a freshly-initialized tree of the same
structure (so restore is structure-checked).
"""

from __future__ import annotations

import pathlib

import jax
import orbax.checkpoint as ocp


def ckpt_path(exp_dir: pathlib.Path, i: int) -> pathlib.Path:
    return (exp_dir / f"model_{i}").absolute()


def save_params(path: pathlib.Path, params) -> None:
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(pathlib.Path(path).absolute(), params, force=True)
    ckptr.wait_until_finished()


def load_params(path: pathlib.Path, like_params):
    """Restore params with the structure (and shardings) of like_params."""
    ckptr = ocp.StandardCheckpointer()
    abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct,
                                      like_params)
    return ckptr.restore(pathlib.Path(path).absolute(), abstract)
