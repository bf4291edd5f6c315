"""Collocation-time samplers for DPI data generation.

Reference parity: data.py:149-167. Two laws for t:
  - Picard power-law: t = T (1 - prod_{j=1}^{N-i+1} U_j), matching the
    time-marginal the Picard iteration error analysis calls for;
  - uniform-with-epsilon: t ~ U[eps, T - eps] (all shipped 100-d configs
    use ``t_always_uniform: true`` with eps = 0).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_t_picard(key, n: int, T: float, N: int, i: int,
                    dtype=jnp.float32) -> jnp.ndarray:
    """t ~ T (1 - prod of (N - i + 1) iid U[0,1]); shape (n, 1)."""
    n_factors = max(N - i + 1, 1)
    u = jax.random.uniform(key, (n, n_factors), dtype=dtype)
    return T * (1.0 - jnp.prod(u, axis=-1, keepdims=True))


def sample_t_uniform(key, n: int, T: float, eps: float = 0.0,
                     dtype=jnp.float32) -> jnp.ndarray:
    """t ~ U[eps, T - eps]; shape (n, 1) (data.py:161-167)."""
    u = jax.random.uniform(key, (n, 1), dtype=dtype)
    return (T - 2.0 * eps) * (1.0 - u) + eps
