"""Antithetic sampling: unbiasedness + variance reduction."""

import jax
import jax.numpy as jnp
import numpy as np

from deeppicarditeration_tpu.equations import make_equation
from deeppicarditeration_tpu.models.solution import Solution
from deeppicarditeration_tpu.ops import estimators as est
from tests.test_estimators import QuadraticToy


def test_antithetic_terminal_unbiased(key):
    nx, b, m = 3, 8, 20000
    eq = QuadraticToy(nx=nx)
    gen = est.GenConfig(n_estimate_terminal=m, chunk_elems=2 ** 14,
                        antithetic=True)
    kt, kx, ke = jax.random.split(key, 3)
    t = jax.random.uniform(kt, (b, 1)) * 0.8
    x = jax.random.normal(kx, (b, nx))
    tx = jnp.concatenate([t, x], axis=-1)
    out = est.estimate_terminal_with_gradients(ke, eq, tx, gen)
    expected_val = np.asarray(eq.g(x) + (eq.T - t) * eq.alpha * nx)
    np.testing.assert_allclose(np.asarray(out[:, :1]), expected_val,
                               rtol=0.05, atol=0.05)
    np.testing.assert_allclose(np.asarray(out[:, 1:]),
                               np.asarray(eq.g_x(x)), rtol=0.1, atol=0.12)


def test_antithetic_reduces_gradient_variance(key):
    """Repeated small-M estimates: antithetic spread must be smaller."""
    nx, b, m = 3, 4, 256
    eq = QuadraticToy(nx=nx)
    t = jnp.full((b, 1), 0.4)
    x = jax.random.normal(key, (b, nx))
    tx = jnp.concatenate([t, x], axis=-1)

    def spread(antithetic):
        gen = est.GenConfig(n_estimate_terminal=m, chunk_elems=2 ** 12,
                            antithetic=antithetic)
        outs = jnp.stack([
            est.estimate_terminal_with_gradients(jax.random.fold_in(key, r),
                                                 eq, tx, gen)
            for r in range(32)])
        return float(jnp.mean(jnp.var(outs, axis=0)))

    v_plain, v_anti = spread(False), spread(True)
    assert v_anti < v_plain, (v_plain, v_anti)


def test_antithetic_integral_fixed_point(key):
    nx, b, m = 4, 8, 20000
    eq = make_equation("Cha", nx=nx, alpha=1.0, k=1.0, T=1.0)
    sol = Solution.oracle(eq)
    gen = est.GenConfig(n_estimate_terminal=m, n_estimate_integral=m,
                        chunk_elems=2 ** 16, antithetic=True)
    kt, kx, ke = jax.random.split(key, 3)
    t = jax.random.uniform(kt, (b, 1)) * 0.8
    x = jax.random.normal(kx, (b, nx)) * 0.5
    tx = jnp.concatenate([t, x], axis=-1)
    out = est.generate_with_gradients(ke, eq, sol, tx, gen)
    u_exact = np.asarray(eq.exact_solution(t, x))
    np.testing.assert_allclose(np.asarray(out[:, :1]), u_exact, atol=0.05)
