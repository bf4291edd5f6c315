"""The frozen-solution abstraction consumed by estimators and evaluators.

A ``Solution`` is a pytree: trainable parameters are leaves, the network
definition (flax module) and dispatch tags are static treedef fields. This
replaces the reference's nn.Module zoo (PicardSolution / ZeroSolution /
GxSolution, solution.py:292-346) with one value that can be passed through
jit without recompilation across Picard iterations (same treedef, new
params — survey §7.3.4).

Value/gradient evaluation never uses per-sample vmap(jacrev): because the
network is pointwise across the batch, one batched vjp with a ones
cotangent yields exact per-sample gradients (the JAX-native replacement for
solution_jac.py:127).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import struct

VALUE = "Value"
VALUE_GRADIENT = "ValueGradient"
ONLY_GRADIENT = "OnlyGradient"


class _OracleModule:
    """Module-like wrapper exposing an equation's exact (u, u_x)."""

    __slots__ = ("eq",)

    def __init__(self, eq):
        self.eq = eq

    def apply(self, params, tx):
        del params
        t, x = tx[..., 0:1], tx[..., 1:]
        u, u_x = self.eq.u_u_x(t, x)
        return jnp.concatenate([u, u_x], axis=-1)

    def __hash__(self):
        return id(self.eq)

    def __eq__(self, other):
        return isinstance(other, _OracleModule) and other.eq is self.eq


def output_dim_for(net_type: str, nx: int, nu: int = 1) -> int:
    """NETWORK.TYPE -> output dim (reference parity: solution.py:304-311)."""
    if net_type == VALUE:
        return nu
    if net_type == VALUE_GRADIENT:
        return nu + nx
    if net_type == ONLY_GRADIENT:
        return nx
    raise ValueError(f"Unknown network type {net_type!r}")


@struct.dataclass
class Solution:
    """u(t, x) ansatz: either a network, the zero function, or g(x).

    kind: 'zero' (u_0 = 0, picard_iteration.py:182), 'net', or
    'gx' (iteration-0 ansatz for terminal-enforcing nets,
    experiment_evaluator.py:38-42).
    """

    params: Any
    module: Any = struct.field(pytree_node=False, default=None)
    kind: str = struct.field(pytree_node=False, default="zero")
    net_type: str = struct.field(pytree_node=False, default=VALUE)
    nx: int = struct.field(pytree_node=False, default=1)
    gfn: Any = struct.field(pytree_node=False, default=None)  # StaticFn for 'gx'

    # --- constructors -----------------------------------------------------
    @classmethod
    def zero(cls, nx: int, net_type: str = VALUE) -> "Solution":
        return cls(params=None, module=None, kind="zero", net_type=net_type,
                   nx=nx)

    @classmethod
    def from_net(cls, module, params, net_type: str, nx: int) -> "Solution":
        return cls(params=params, module=module, kind="net",
                   net_type=net_type, nx=nx)

    @classmethod
    def oracle(cls, eq) -> "Solution":
        """The equation's exact solution wrapped as a ValueGradient net.

        Plugging the oracle in as the frozen iterate makes the Picard
        target an identity in expectation (Feynman-Kac fixed point) — the
        basis of the estimator unbiasedness tests and a diagnostics mode.
        """
        return cls(params=None, module=_OracleModule(eq), kind="net",
                   net_type=VALUE_GRADIENT, nx=eq.nx)

    @classmethod
    def gx(cls, gfn, nx: int) -> "Solution":
        """u(t, x) = g(x); gfn must be a StaticFn (hashable)."""
        return cls(params=None, module=None, kind="gx", net_type=VALUE,
                   nx=nx, gfn=gfn)

    @property
    def output_dim(self) -> int:
        if self.kind == "gx":
            return 1
        return output_dim_for(self.net_type, self.nx)

    # --- evaluation -------------------------------------------------------
    def __call__(self, tx: jnp.ndarray) -> jnp.ndarray:
        """Raw network output, shape (..., output_dim)."""
        if self.kind == "zero":
            return jnp.zeros(tx.shape[:-1] + (self.output_dim,), tx.dtype)
        if self.kind == "gx":
            return self.gfn(tx[..., 1:])
        return self.module.apply(self.params, tx)

    def value(self, tx: jnp.ndarray) -> jnp.ndarray:
        """The scalar value head u(t, x), shape (..., 1)."""
        out = self(tx)
        if self.net_type == ONLY_GRADIENT:
            return jnp.zeros(tx.shape[:-1] + (1,), tx.dtype)
        return out[..., 0:1]

    def value_and_grad_x(self, t: jnp.ndarray, x: jnp.ndarray):
        """(u, du/dx), each per-sample; u: (..., 1), du/dx: (..., nx).

        For Value-type nets the gradient comes from ONE batched reverse pass
        (vjp with ones cotangent) — exact per-sample grads because the net
        is pointwise across batch dims. For ValueGradient/OnlyGradient nets
        the gradient head is read directly (data.py:1231-1251 dispatch).
        """
        if self.kind == "zero":
            z1 = jnp.zeros(x.shape[:-1] + (1,), x.dtype)
            return z1, jnp.zeros_like(x)
        if self.kind == "gx":
            u, vjp = jax.vjp(self.gfn, x)
            return u, vjp(jnp.ones_like(u))[0]
        if self.net_type in (VALUE_GRADIENT, ONLY_GRADIENT):
            tx = jnp.concatenate([jnp.broadcast_to(t, x[..., :1].shape), x],
                                 axis=-1)
            out = self(tx)
            if self.net_type == VALUE_GRADIENT:
                return out[..., 0:1], out[..., 1:]
            return jnp.zeros(x.shape[:-1] + (1,), x.dtype), out

        def u_of_x(xx):
            txx = jnp.concatenate(
                [jnp.broadcast_to(t, xx[..., :1].shape), xx], axis=-1)
            return self.module.apply(self.params, txx)

        u, vjp = jax.vjp(u_of_x, x)
        return u, vjp(jnp.ones_like(u))[0]

    def value_and_grad_tx(self, tx: jnp.ndarray):
        """(u, du/d(tx)) per-sample; du/d(tx): (..., 1 + nx).

        Used by the training step when the target supervises the gradient
        but the net has only a value head (solution_jac.py:196-198 analogue,
        via batched vjp instead of vmap(jacrev))."""
        if self.kind == "zero":
            return (jnp.zeros(tx.shape[:-1] + (1,), tx.dtype),
                    jnp.zeros_like(tx))
        u, vjp = jax.vjp(lambda z: self.value(z), tx)
        return u, vjp(jnp.ones_like(u))[0]
