import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deeppicarditeration_tpu.distributions import (
    DiagGaussian,
    DiagGaussianMixture,
    make_random_gmm,
)


def _scipy_free_gauss_logpdf(x, mean, var):
    return (-0.5 * np.sum((x - mean) ** 2 / var, -1)
            - 0.5 * np.sum(np.log(2 * np.pi * var)))


def test_diag_gaussian_log_prob(key):
    n = 5
    mean = jnp.arange(n, dtype=jnp.float32) * 0.1
    var = jnp.linspace(0.5, 2.0, n)
    d = DiagGaussian(mean, var)
    x = jax.random.normal(key, (7, n))
    lp = d.log_prob(x)
    assert lp.shape == (7, 1)
    expected = _scipy_free_gauss_logpdf(np.asarray(x), np.asarray(mean), np.asarray(var))
    np.testing.assert_allclose(np.asarray(lp)[:, 0], expected, rtol=1e-5)


def test_diag_gaussian_grad_log_prob_matches_autodiff(key):
    n = 4
    d = DiagGaussian(jnp.ones(n), jnp.full((n,), 1.7))
    x = jax.random.normal(key, (3, n))
    g = d.grad_log_prob(x)
    g_auto = jax.vmap(jax.grad(lambda xx: d.log_prob(xx[None])[0, 0]))(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_auto), rtol=1e-5)


def test_gmm_log_prob_reduces_to_single_gaussian(key):
    n = 6
    mean = jnp.zeros((1, n))
    var = jnp.ones((1, n)) * 2.0
    gmm = DiagGaussianMixture(mean, var, jnp.zeros((1,)))
    single = DiagGaussian(mean[0], var[0])
    x = jax.random.normal(key, (9, n))
    np.testing.assert_allclose(np.asarray(gmm.log_prob(x)),
                               np.asarray(single.log_prob(x)), rtol=1e-5)


def test_gmm_grad_matches_autodiff(key):
    gmm = make_random_gmm(key, nx=5, num_components=3, mean_scale=1.0, var_scale=2.0)
    x = jax.random.normal(jax.random.fold_in(key, 1), (4, 5))
    g = gmm.grad_log_prob(x)
    g_auto = jax.vmap(jax.grad(lambda xx: gmm.log_prob(xx[None])[0, 0]))(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_auto), rtol=1e-5, atol=1e-6)


def test_gmm_sample_moments(key):
    # mixture of two well-separated components with known mean
    means = jnp.array([[-2.0, 0.0], [2.0, 0.0]])
    vars_ = jnp.ones((2, 2)) * 0.25
    lw = jnp.log(jnp.array([0.5, 0.5]))
    gmm = DiagGaussianMixture(means, vars_, lw)
    xs = gmm.sample(key, 200_000)
    assert xs.shape == (200_000, 2)
    m = np.asarray(jnp.mean(xs, 0))
    np.testing.assert_allclose(m, [0.0, 0.0], atol=0.05)
    # second moment of dim 0: 0.25 + 4
    np.testing.assert_allclose(float(jnp.mean(xs[:, 0] ** 2)), 4.25, rtol=0.05)


def test_gmm_batched_params(key):
    """Per-sample mixture parameters (used by the OU exact solution)."""
    B, K, n = 3, 2, 4
    means = jax.random.normal(key, (B, K, n))
    vars_ = jnp.ones((B, K, n))
    lw = jnp.zeros((B, K)) - jnp.log(K)
    gmm = DiagGaussianMixture(means, vars_, lw)
    x = jax.random.normal(jax.random.fold_in(key, 2), (B, n))
    lp = gmm.log_prob(x)
    assert lp.shape == (B, 1)
    for b in range(B):
        single = DiagGaussianMixture(means[b], vars_[b], lw[b])
        np.testing.assert_allclose(float(lp[b, 0]),
                                   float(single.log_prob(x[b][None])[0, 0]),
                                   rtol=1e-5)


def test_gmm_sample_rejects_batched_params(key):
    """sample() indexes the component axis; batched (B, K, n) params would
    silently draw from wrong rows — it must refuse (review finding)."""
    import pytest

    gmm = DiagGaussianMixture(jnp.zeros((3, 2, 4)), jnp.ones((3, 2, 4)),
                              jnp.zeros((3, 2)))
    with pytest.raises(ValueError, match="unbatched"):
        gmm.sample(key, 5)
