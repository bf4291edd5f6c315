"""Diagonal-covariance Gaussian / Gaussian-mixture distributions (pure JAX).

Functional re-design of the reference's distribution classes
(/root/reference/picard/utils.py:658-967): parameters live in pytree
dataclasses, sampling takes explicit PRNG keys, and log_prob/grad_log_prob
are fully vectorized (logsumexp over components; no Python loops over K).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import struct

_LOG_2PI = math.log(2.0 * math.pi)


@struct.dataclass
class DiagGaussian:
    """N(mean, diag(var)). mean, var: (n,)."""

    mean: jnp.ndarray
    var: jnp.ndarray

    @property
    def dim(self) -> int:
        return self.mean.shape[-1]

    def log_prob(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (..., n) -> (..., 1)."""
        diff = x - self.mean
        quad = jnp.sum(diff * diff / self.var, axis=-1, keepdims=True)
        norm = jnp.sum(jnp.log(self.var)) + self.dim * _LOG_2PI
        return -0.5 * (quad + norm)

    def grad_log_prob(self, x: jnp.ndarray) -> jnp.ndarray:
        return -(x - self.mean) / self.var

    def sample(self, key, n: int) -> jnp.ndarray:
        z = jax.random.normal(key, (n, self.dim), dtype=self.mean.dtype)
        return self.mean + jnp.sqrt(self.var) * z


@struct.dataclass
class DiagGaussianMixture:
    """Mixture of K diagonal Gaussians.

    means: (K, n); vars: (K, n); log_weights: (K,).
    ``log_prob``/``grad_log_prob`` also support per-sample parameter
    batches: means/vars/log_weights may carry leading batch dims matching x
    (used by the OU exact solution, where the mixture parameters depend on
    each sample's t). ``sample`` requires unbatched (K, n) parameters.
    """

    means: jnp.ndarray
    vars: jnp.ndarray
    log_weights: jnp.ndarray

    @property
    def dim(self) -> int:
        return self.means.shape[-1]

    @property
    def num_components(self) -> int:
        return self.means.shape[-2]

    def _component_log_probs(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (..., n) -> per-component log p_k + log w_k, shape (..., K)."""
        diff = x[..., None, :] - self.means  # (..., K, n)
        quad = jnp.sum(diff * diff / self.vars, axis=-1)  # (..., K)
        norm = jnp.sum(jnp.log(self.vars), axis=-1) + self.dim * _LOG_2PI
        return self.log_weights - 0.5 * (quad + norm)

    def log_prob(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (..., n) -> (..., 1)."""
        lp = jax.scipy.special.logsumexp(self._component_log_probs(x), axis=-1)
        return lp[..., None]

    def grad_log_prob(self, x: jnp.ndarray) -> jnp.ndarray:
        """d/dx log p(x): responsibility-weighted component scores."""
        comp_lp = self._component_log_probs(x)  # (..., K)
        resp = jax.nn.softmax(comp_lp, axis=-1)  # (..., K)
        comp_grad = -(x[..., None, :] - self.means) / self.vars  # (..., K, n)
        return jnp.sum(resp[..., None] * comp_grad, axis=-2)

    def sample(self, key, n: int) -> jnp.ndarray:
        if self.means.ndim != 2:
            raise ValueError(
                "DiagGaussianMixture.sample supports only unbatched (K, n) "
                "parameters; per-sample batched mixtures (e.g. gmm_at(tau)) "
                "expose log_prob/grad_log_prob only")
        k_comp, k_norm = jax.random.split(key)
        idx = jax.random.categorical(k_comp, self.log_weights, shape=(n,))
        mean = self.means[idx]  # (n_samples, dim)
        std = jnp.sqrt(self.vars[idx])
        z = jax.random.normal(k_norm, (n, self.dim), dtype=self.means.dtype)
        return mean + std * z


def make_random_gmm(key, nx: int, num_components: int, mean_scale: float,
                    var_scale: float, dtype=jnp.float32) -> DiagGaussianMixture:
    """Key-seeded GMM parameters.

    Replaces the reference's CWD-relative ``.pt`` persistence
    (equations.py:525-544) with deterministic generation from a seed
    (survey §7.1.11): means ~ U[-mean_scale, mean_scale]^nx, isotropic
    variance var_scale, random normalized weights.
    """
    k_mean, k_pi = jax.random.split(key)
    means = mean_scale * (
        jax.random.uniform(k_mean, (num_components, nx), dtype=dtype) * 2.0 - 1.0
    )
    vars_ = jnp.full((num_components, nx), var_scale, dtype=dtype)
    pi = jax.random.uniform(k_pi, (num_components,), dtype=dtype)
    log_weights = jnp.log(pi / jnp.sum(pi))
    return DiagGaussianMixture(means=means, vars=vars_, log_weights=log_weights)
