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


def sample_t_picard(key, n: int, T: float, n_factors,
                    dtype=jnp.float32) -> jnp.ndarray:
    """t ~ T (1 - prod of n_factors iid U[0,1]); shape (n, 1).

    Sampled as T (1 - exp(-Gamma(k, 1))) — exactly the same law
    (-log prod U_j = sum of k Exp(1) = Gamma(k, 1)) but with a STATIC
    shape: ``n_factors`` may be a traced scalar, so one compiled graph
    serves every Picard iteration (the product form draws (n, N-i+1)
    uniforms, whose shape forces a recompile per iteration — through the
    remote-TPU tunnel that was 10-20 s per iteration)."""
    k = jnp.maximum(jnp.asarray(n_factors, dtype), 1.0)
    g = jax.random.gamma(key, k, (n, 1), dtype=dtype)
    return T * (1.0 - jnp.exp(-g))


def sample_t_uniform(key, n: int, T: float, eps: float = 0.0,
                     dtype=jnp.float32) -> jnp.ndarray:
    """t ~ U[eps, T - eps]; shape (n, 1) (data.py:161-167)."""
    u = jax.random.uniform(key, (n, 1), dtype=dtype)
    return (T - 2.0 * eps) * (1.0 - u) + eps
