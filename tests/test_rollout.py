"""Closed-form Brownian path rollout (ops/rollout.py) — the scan-free
replacement for the baselines' K-step Euler simulation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deeppicarditeration_tpu.equations import make_equation
from deeppicarditeration_tpu.ops.rollout import brownian_paths


@pytest.fixture
def key():
    return jax.random.PRNGKey(0)


def _setup(key, b=64, nx=5, alpha=1.3):
    eq = make_equation("Cha", nx=nx, alpha=alpha, k=1.0, T=1.0)
    kt, kx = jax.random.split(key)
    t0 = jax.random.uniform(kt, (b, 1)) * 0.5
    x0 = jax.random.normal(kx, (b, nx))
    return eq, t0, x0


@pytest.mark.parametrize("use_pallas", [False, True])
def test_paths_exact_increment_relation(key, use_pallas):
    """xs must satisfy the exact transition law step-by-step:
    X_{k+1} - X_k = sqrt(dt) sqrt(alpha) xi_k (equations base.transition),
    and ts must be the affine grid t0 + k*dts."""
    eq, t0, x0 = _setup(key)
    K = 7
    dts = jnp.full_like(t0, 0.05)
    ts, xs, xi = brownian_paths(jax.random.fold_in(key, 1), eq, t0, x0,
                                dts, K, use_pallas=use_pallas)
    assert ts.shape == (K + 1, t0.shape[0], 1)
    assert xs.shape == (K + 1,) + x0.shape
    assert xi.shape == (K,) + x0.shape
    np.testing.assert_allclose(
        np.asarray(ts[3]), np.asarray(t0 + 3 * dts), rtol=1e-6)
    steps = np.asarray(jnp.diff(xs, axis=0))
    expect = np.asarray(jnp.sqrt(dts) * eq.alpha_sqrt * xi)
    np.testing.assert_allclose(steps, expect, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(xs[0]), np.asarray(x0))


def test_paths_fallback_for_overridden_transition(key):
    """An equation that overrides transition (drift) must NOT take the
    drift-free closed form: brownian_paths falls back to a sequential
    scan through the equation's own law."""
    eq, t0, x0 = _setup(key, b=8, nx=3)

    class Drifted(type(eq)):
        def transition(self, k, t, s, x):
            dW = jax.random.normal(k, x.shape, x.dtype)
            return x + (s - t) * 1.5 + jnp.sqrt(s - t) * dW, dW

    eq2 = Drifted(**{f.name: getattr(eq, f.name)
                     for f in eq.__dataclass_fields__.values()})
    K = 4
    dts = jnp.full_like(t0, 0.1)
    _, xs, _ = brownian_paths(jax.random.fold_in(key, 9), eq2, t0, x0,
                              dts, K)
    # the drift must show up: E[x_K - x_0] = K * dt * 1.5
    drift = np.asarray(jnp.mean(xs[-1] - xs[0]))
    assert abs(drift - K * 0.1 * 1.5) < 0.25, drift


def test_paths_match_scan_law(key):
    """Terminal-state distribution equals the sequential scan's (same law,
    different stream): X_K ~ N(x0, alpha * K * dt * I). CLT-bounded
    moments over a large batch."""
    eq, _, _ = _setup(key, b=4096, nx=3)
    b, nx, K, dt = 4096, 3, 10, 0.02
    t0 = jnp.zeros((b, 1))
    x0 = jnp.zeros((b, nx))
    dts = jnp.full_like(t0, dt)
    _, xs, _ = brownian_paths(jax.random.fold_in(key, 2), eq, t0, x0,
                              dts, K)
    xK = np.asarray(xs[-1])
    var_expect = float(eq.alpha_sqrt) ** 2 * K * dt
    assert abs(xK.mean()) < 4 * np.sqrt(var_expect / (b * nx))
    np.testing.assert_allclose(xK.var(), var_expect, rtol=0.15)
