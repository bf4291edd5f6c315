"""Derivative operators on frozen solutions + the nonlinearity evaluator.

Reference parity:
  - get_f (data.py:1226-1325): evaluate f at sample points given the
    previous-iterate network, routing on network output dim and equation
    flags (full Hessian / SDGD sampled diagonal / Hutchinson Laplacian /
    plain ff/f);
  - hutchinson_trace_estimation_batch (utils.py:499-561);
  - SDGD index sampling (data.py:497-502).

All operators work on arbitrary leading batch dims and compile to batched
XLA ops (vmap of forward-over-reverse), with no Python loops over the
dimension at runtime.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from deeppicarditeration_tpu.models.solution import Solution


def _value_fn(sol: Solution):
    """(t_scalar_batch, x) -> u with matching leading dims."""

    def u_fn(t, x):
        tx = jnp.concatenate([jnp.broadcast_to(t, x[..., :1].shape), x],
                             axis=-1)
        return sol.value(tx)

    return u_fn


def grad_x_fn(sol: Solution):
    """Batched du/dx of the value head: one reverse pass, per-sample exact."""

    def g(t, x):
        return sol.value_and_grad_x(t, x)[1]

    return g


def diag_hessian_entries(sol: Solution, t, x, indices) -> jnp.ndarray:
    """Sampled diagonal Hessian entries d^2 u / dx_i^2 of the value head.

    t: (..., 1), x: (..., nx), indices: (..., v) int32 -> (..., v).
    Forward-over-reverse: for each sampled index i, jvp of the per-sample
    gradient along e_i, reading component i. Replaces the reference's
    Python loop over v with autograd.grad (data.py:1280-1292).
    """
    if sol.kind == "zero":
        return jnp.zeros(indices.shape, x.dtype)
    nx = x.shape[-1]
    u_fn = _value_fn(sol)

    def per_sample(t1, x1, idx1):
        def u_scalar(xx):
            return u_fn(t1[None, :], xx[None, :])[0, 0]

        grad_fn = jax.grad(u_scalar)

        def entry(i):
            e = jax.nn.one_hot(i, nx, dtype=x1.dtype)
            _, hcol = jax.jvp(grad_fn, (x1,), (e,))
            return jnp.take(hcol, i)

        return jax.vmap(entry)(idx1)

    flat = jax.vmap(per_sample)(t.reshape(-1, 1), x.reshape(-1, nx),
                                indices.reshape(-1, indices.shape[-1]))
    return flat.reshape(indices.shape)


def full_hessian(sol: Solution, t, x) -> jnp.ndarray:
    """Per-sample (nx, nx) Hessian of the value head: (..., nx, nx)."""
    nx = x.shape[-1]
    if sol.kind == "zero":
        return jnp.zeros(x.shape[:-1] + (nx, nx), x.dtype)
    u_fn = _value_fn(sol)

    def per_sample(t1, x1):
        def u_scalar(xx):
            return u_fn(t1[None, :], xx[None, :])[0, 0]

        return jax.hessian(u_scalar)(x1)

    flat = jax.vmap(per_sample)(t.reshape(-1, 1), x.reshape(-1, nx))
    return flat.reshape(x.shape[:-1] + (nx, nx))


def hutchinson_laplacian(key, sol: Solution, t, x, num_v: int) -> jnp.ndarray:
    """Rademacher estimate of Tr Hess u at each point: (..., 1).

    Reference parity: utils.py:499-561. Each probe is one
    forward-over-reverse pass of the whole batch (jvp of the batched
    gradient), so total cost ~ 2 * num_v net evaluations.
    """
    if sol.kind == "zero":
        return jnp.zeros(x.shape[:-1] + (1,), x.dtype)
    g = grad_x_fn(sol)

    def probe(k):
        z = (jax.random.rademacher(k, x.shape, dtype=jnp.int32)
             .astype(x.dtype))
        _, hz = jax.jvp(lambda xx: g(t, xx), (x,), (z,))
        return jnp.sum(hz * z, axis=-1, keepdims=True)

    probes = jax.vmap(probe)(jax.random.split(key, num_v))
    return jnp.mean(probes, axis=0)


def exact_laplacian(sol: Solution, t, x) -> jnp.ndarray:
    """Tr Hess u via nx basis-vector fwd-over-rev passes: (..., 1)."""
    nx = x.shape[-1]
    idx = jnp.broadcast_to(jnp.arange(nx, dtype=jnp.int32),
                           x.shape[:-1] + (nx,))
    diag = diag_hessian_entries(sol, t, x, idx)
    return jnp.sum(diag, axis=-1, keepdims=True)


def get_f(eq, sol: Solution, s, x, *,
          hess_indices: Optional[jnp.ndarray] = None,
          hutchinson_key=None) -> jnp.ndarray:
    """Evaluate the PDE nonlinearity at (s, x) under the frozen solution.

    Reference parity: data.py:1226-1325. Dispatch:
      - equation with Hessian term: SDGD sampled diagonal (hess_indices
        given) -> ffi; otherwise full Hessian -> ffh;
      - Laplacian term: Hutchinson (eq.num_v_samples > 0) or exact -> ffl;
      - gradient term: ff(s, x, u, u_x);
      - else: f(s, x, u).
    """
    u, u_x = sol.value_and_grad_x(s, x)
    if eq.has_hessian_term:
        if hess_indices is not None:
            u_ii = diag_hessian_entries(sol, s, x, hess_indices)
            return eq.ffi(s, x, u, u_ii)
        hess = full_hessian(sol, s, x)
        return eq.ffh(s, x, u, u_x, hess)
    if eq.has_laplacian_term:
        if eq.num_v_samples and eq.num_v_samples > 0:
            assert hutchinson_key is not None
            lap = hutchinson_laplacian(hutchinson_key, sol, s, x,
                                       eq.num_v_samples)
        else:
            lap = exact_laplacian(sol, s, x)
        return eq.ffl(s, x, u, u_x, lap)
    if eq.has_gradient_term:
        return eq.ff(s, x, u, u_x)
    return eq.f(s, x, u)
