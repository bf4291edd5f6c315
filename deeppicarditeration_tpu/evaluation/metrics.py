"""Accuracy metrics (reference parity: utils.py:410-496).

rRMSE = ||err||_2 / ||u||_2, rMAE = ||err||_1 / ||u||_1, MArE = mean|err/u|,
MSE = sqrt(mean(err^2)) (the reference's "MSE" is an RMSE; kept for metric-
name compatibility). Gradient/Hessian variants reduce per-dimension first,
then average the per-dimension ratios (utils.py:444-474).
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp


def _mare(err, exact, eps: float = 1e-8):
    """mean|err/u| over entries with |u| > eps — u_exact can be exactly 0
    (e.g. the GBM sine net at (t,x) = 0, always in the eval grid), and an
    unguarded division makes the whole metric inf."""
    denom = jnp.abs(exact)
    valid = denom > eps
    return (jnp.sum(jnp.where(valid, err / jnp.maximum(denom, eps), 0.0))
            / jnp.maximum(jnp.sum(valid), 1))


def value_metrics(u_pred, u_exact, prefix: str = "") -> Dict[str, jnp.ndarray]:
    err = jnp.abs(u_pred - u_exact)
    rrmse = jnp.sqrt(jnp.sum(err ** 2)) / jnp.sqrt(jnp.sum(u_exact ** 2))
    rmae = jnp.sum(err) / jnp.sum(jnp.abs(u_exact))
    mse = jnp.sqrt(jnp.mean(err ** 2))
    mare = _mare(err, u_exact)
    return {f"MSE{prefix}": mse, f"rRMSE{prefix}": rrmse,
            f"rMAE{prefix}": rmae, f"MArE{prefix}": mare}


def grad_metrics(pred, exact, prefix: str = "g") -> Dict[str, jnp.ndarray]:
    """Per-dimension relative errors, averaged over dimensions.

    pred/exact: (N, nx) (or (N, nx*nx) flattened Hessians with prefix 'h').
    """
    err = jnp.abs(pred - exact)
    l2 = jnp.sqrt(jnp.sum(err ** 2, axis=0)) / jnp.sqrt(jnp.sum(exact ** 2, axis=0))
    l1 = jnp.sum(err, axis=0) / jnp.sum(jnp.abs(exact), axis=0)
    mse = jnp.mean(jnp.sqrt(jnp.mean(err ** 2, axis=0)))
    mare = _mare(err, exact)
    return {f"MSE{prefix}": mse, f"rRMSE{prefix}": jnp.mean(l2),
            f"rMAE{prefix}": jnp.mean(l1), f"MArE{prefix}": mare}
