"""Equation layer: terminal-value parabolic PDEs as pure-function pytrees.

The general form (reference parity: equations.py:63-78):

    u_t + 1/2 Tr(Sigma Sigma^T) u_xx + <mu, u_x> + ff(t, x, u, u_x) = 0
    u(T, x) = g(x)

with ``ff(t, x, y, w) = fff(t, x, y, z = Sigma w)``. All equations used by
DPI have ``Sigma = sqrt(alpha) I`` and drift-free forward sampling (the OU
drift is absorbed into ``ff``, see hjb.py), so the SDE transition is an
exact one-shot Gaussian jump — never a time-stepped rollout
(equations.py:217-230, survey §3.1).

TPU-first design deltas from the reference:
  - equations are ``flax.struct`` dataclasses: scalar parameters are static
    (part of the treedef, so jit sees them as compile-time constants), array
    parameters (e.g. GMM means) are pytree leaves;
  - all sampling takes explicit ``jax.random`` keys;
  - every function broadcasts over arbitrary leading batch dims
    (t: (..., 1), x: (..., nx)) so estimators can call them on
    (batch, m_chunk, nx) blocks without reshapes;
  - there is no ``.to(device)`` — placement/sharding is the runtime's job
    (replaces ParametersMixin, equations.py:12-60).
"""

from __future__ import annotations

import math
import zlib
from typing import Callable, Dict, Tuple, Type

import jax
import jax.numpy as jnp

_EQUATION_REGISTRY: Dict[str, Type] = {}


def register_equation(cls):
    """Register an equation class for config-driven lookup (EQUATION.cls)."""
    _EQUATION_REGISTRY[cls.__name__] = cls
    return cls


def get_equation_cls(name: str):
    if name not in _EQUATION_REGISTRY:
        raise ValueError(
            f"Unknown equation {name!r}; known: {sorted(_EQUATION_REGISTRY)}"
        )
    return _EQUATION_REGISTRY[name]


def param_tag(name: str) -> int:
    """Process-stable 31-bit tag for domain-separating the problem-parameter
    PRNG fold. Built-in ``hash()`` must never be used here: str hashes are
    PYTHONHASHSEED-salted per process, so the same seed would generate a
    DIFFERENT problem instance in a fresh process (breaking post-hoc
    evaluation and RESUME of seeded equations)."""
    return zlib.crc32(name.encode()) & 0x7FFFFFFF


def make_equation(name: str, run_seed: int = 0, **kwargs):
    """Instantiate an equation by name.

    ``run_seed`` is the experiment seed and feeds key-derived problem
    parameters by default; an explicit ``seed`` inside ``kwargs`` (i.e.
    ``EQUATION.kwargs.seed`` in a config) pins the problem *instance*
    independently of the run seed — the analogue of the reference's
    per-case parameter files
    (``scripts/fully_nonlinear/case_{1,2,3}/gbm_2nodes_*.pt``).
    """
    cls = get_equation_cls(name)
    seed = kwargs.pop("seed", run_seed)
    return cls.create(seed=seed, **kwargs)


_HAS_EXACT_CACHE: Dict[type, bool] = {}


class EquationMethods:
    """Method mixin shared by all equations (no dataclass fields).

    Subclass dataclasses must provide fields ``T`` (float), ``nx`` (int) and,
    for diffusion equations, ``alpha`` (float), all static.
    """

    # term-structure flags (reference parity: equations.py:80-84)
    has_gradient_term: bool = False
    has_laplacian_term: bool = False
    has_hessian_term: bool = False
    num_v_samples: int = 0
    supported_approximate_methods: Tuple[str, ...] = ()
    nu: int = 1

    # --- nonlinearity ----------------------------------------------------
    @property
    def alpha_sqrt(self) -> float:
        return math.sqrt(self.alpha)

    def fff(self, t, x, y, z):
        """Nonlinearity in terms of z = Sigma^T u_x."""
        raise NotImplementedError

    def ff(self, t, x, y, w):
        """Nonlinearity in terms of w = u_x (Sigma applied internally)."""
        return self.fff(t, x, y, self.alpha_sqrt * w)

    def f(self, t, x, y):
        """Nonlinearity when independent of the gradient."""
        raise NotImplementedError

    def ffl(self, t, x, y, w, laplacian):
        """Nonlinearity with a Laplacian term."""
        raise NotImplementedError

    def ffh(self, t, x, y, w, hess):
        """Nonlinearity with a full-Hessian term."""
        raise NotImplementedError

    def ffi(self, t, x, y, u_ii):
        """Nonlinearity with sampled diagonal-Hessian entries (SDGD)."""
        raise NotImplementedError

    def pinn_function(self, t, x, u, u_t, u_x, u_xx):
        """PINN residual: u_t + alpha/2 Lap(u) + ff(t, x, u, u_x).

        ``u_xx`` is the (estimated) Laplacian. Reference parity:
        equations.py:202-203; fully-nonlinear equations override this with
        their SDGD form.
        """
        return u_t + 0.5 * self.alpha * u_xx + self.ff(t, x, u, u_x)

    # --- forward SDE ------------------------------------------------------
    def transition(self, key, t, s, x):
        """One-shot Gaussian jump x -> X_s, X_s = x + sqrt(s-t) sqrt(a) dW.

        Exact for Sigma = sqrt(alpha) I with drift-free forward sampling
        (reference parity: equations.py:217-230). Returns (X_s, dW) with
        dW ~ N(0, I)^nx (note: dW is the *standardized* increment, as in
        the reference).
        """
        dW = jax.random.normal(key, x.shape, dtype=x.dtype)
        x_next = x + jnp.sqrt(s - t) * jnp.asarray(self.alpha_sqrt, x.dtype) * dW
        return x_next, dW

    def sample_x0(self, key, n: int, dtype=jnp.float32):
        return jax.random.normal(key, (n, self.nx), dtype=dtype)

    def sample_x(self, key, t):
        """x ~ law of X_t started from x0 at time 0 (equations.py:118-119)."""
        k0, k1 = jax.random.split(key)
        x0 = self.sample_x0(k0, t.shape[0], dtype=t.dtype)
        x, _ = self.transition(k1, jnp.zeros_like(t), t, x0)
        return x

    # --- terminal condition ----------------------------------------------
    def g(self, x):
        raise NotImplementedError

    def g_x(self, x):
        """Gradient of g; default via one batched reverse pass."""
        y, vjp = jax.vjp(self.g, x)
        return vjp(jnp.ones_like(y))[0]

    # --- exact-solution oracles ------------------------------------------
    def exact_solution(self, t, x):
        raise NotImplementedError

    @property
    def has_exact_solution(self) -> bool:
        # per-class constant, cached: the probe runs a real device
        # computation (for HJB the full GMM propagation), and callers read
        # this property inside per-iteration loops
        cls = type(self)
        hit = _HAS_EXACT_CACHE.get(cls)
        if hit is None:
            try:
                self.exact_solution(jnp.zeros((1, 1)),
                                    jnp.zeros((1, self.nx)))
                hit = True
            except NotImplementedError:
                hit = False
            _HAS_EXACT_CACHE[cls] = hit
        return hit

    def u_x(self, t, x):
        """Gradient of the exact solution; default via batched autodiff."""
        u, vjp = jax.vjp(lambda xx: self.exact_solution(t, xx), x)
        return vjp(jnp.ones_like(u))[0]

    def u_t(self, t, x):
        u, vjp = jax.vjp(lambda tt: self.exact_solution(tt, x), t)
        return vjp(jnp.ones_like(u))[0]

    def u_u_x(self, t, x):
        return self.exact_solution(t, x), self.u_x(t, x)

    def u_hessian(self, t, x):
        """Per-sample Hessian of the exact solution (default: autodiff)."""

        def u_scalar(tt, xx):
            return self.exact_solution(tt[None, :], xx[None, :])[0, 0]

        hess = jax.vmap(jax.hessian(u_scalar, argnums=1))(t, x)
        return hess

    def laplacian(self, t, x):
        """Trace of the exact-solution Hessian (default: autodiff)."""
        hess = self.u_hessian(t, x)
        return jnp.trace(hess, axis1=-2, axis2=-1)[..., None]

    def u_u_x_u_hessian(self, t, x):
        return self.exact_solution(t, x), self.u_x(t, x), self.u_hessian(t, x)

    # --- misc -------------------------------------------------------------
    @classmethod
    def create(cls, seed: int = 0, **kwargs):
        """Default factory for equations without derived array params."""
        del seed
        return cls(**kwargs)


class SimpleDiffusionMethods(EquationMethods):
    """Sigma = sqrt(alpha) I, mu = 0 (equations.py:206-230)."""


class SimpleDiffusionWithoutZ(SimpleDiffusionMethods):
    """ff independent of the gradient (equations.py:233-249)."""

    has_gradient_term = False

    def fff(self, t, x, y, z):
        return self.f(t, x, y)

    def ff(self, t, x, y, w):
        return self.f(t, x, y)


class SimpleDiffusionWithZ(SimpleDiffusionMethods):
    """ff depends on z = sqrt(alpha) u_x (equations.py:252-263)."""

    has_gradient_term = True


class SimpleDiffusionWithLaplacian(SimpleDiffusionMethods):
    """ff depends on the Laplacian via ``ffl`` (equations.py:341-356);
    estimated by Hutchinson probes (num_v_samples) or the exact loop."""

    has_gradient_term = True
    has_laplacian_term = True


class SimpleDiffusionWithHessian(SimpleDiffusionMethods):
    """ff depends on the Hessian (equations.py:359-385)."""

    has_gradient_term = True
    has_hessian_term = True
