"""Estimator unbiasedness and derivative-operator correctness.

The central property (survey §4 implication (a)): plugging the *exact*
solution in as the frozen Picard iterate makes the MC target an identity in
expectation — u_hat(t,x) -> (u, grad u)(t,x) as M -> inf (Feynman-Kac fixed
point). We assert this within CLT bounds for every benchmark equation.
A quadratic-terminal toy equation gives closed forms for the heat semigroup
so the terminal estimator (value/gradient/Hessian heads) is tested exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import struct

from deeppicarditeration_tpu.equations import make_equation
from deeppicarditeration_tpu.equations.base import SimpleDiffusionWithoutZ
from deeppicarditeration_tpu.models.networks import MLP
from deeppicarditeration_tpu.models.solution import Solution
from deeppicarditeration_tpu.ops import estimators as est
from deeppicarditeration_tpu.ops.derivatives import (
    diag_hessian_entries,
    exact_laplacian,
    full_hessian,
    hutchinson_laplacian,
)
from deeppicarditeration_tpu.ops.samplers import sample_t_picard
from deeppicarditeration_tpu.ops.summation import KahanAcc


# --- toy equation with quadratic terminal: closed-form heat semigroup ------
@struct.dataclass
class QuadraticToy(SimpleDiffusionWithoutZ):
    nx: int = struct.field(pytree_node=False, default=3)
    T: float = struct.field(pytree_node=False, default=1.0)
    alpha: float = struct.field(pytree_node=False, default=1.0)

    def g(self, x):
        # g(x) = |x|^2 + sum x + 1
        return (jnp.sum(x * x, axis=-1, keepdims=True)
                + jnp.sum(x, axis=-1, keepdims=True) + 1.0)

    def g_x(self, x):
        return 2.0 * x + 1.0

    def f(self, t, x, y):
        return jnp.zeros_like(y)


def _mlp_solution(key, nx, net_type="Value"):
    out_dim = {"Value": 1, "ValueGradient": 1 + nx, "OnlyGradient": nx}[net_type]
    mod = MLP(neurons=(16, 16), activations=("Tanh", "Tanh"), out_dim=out_dim)
    params = mod.init(key, jnp.zeros((1, 1 + nx)))
    return Solution.from_net(mod, params, net_type, nx)


# ---------------------------------------------------------------------------
# terminal estimator vs closed-form heat semigroup
# ---------------------------------------------------------------------------

def test_terminal_estimator_heads_quadratic(key):
    nx, b, m = 3, 8, 40000
    eq = QuadraticToy(nx=nx)
    gen = est.GenConfig(n_estimate_terminal=m, chunk_elems=2 ** 16)
    kt, kx, ke = jax.random.split(key, 3)
    t = jax.random.uniform(kt, (b, 1)) * 0.8
    x = jax.random.normal(kx, (b, nx))
    tx = jnp.concatenate([t, x], axis=-1)
    out = est.estimate_terminal_with_gradients(ke, eq, tx, gen)
    # E g(X_T) = g(x) + (T - t) * alpha * nx   (Laplacian of |x|^2 is 2 nx)
    expected_val = np.asarray(eq.g(x) + (eq.T - t) * eq.alpha * nx)
    expected_grad = np.asarray(eq.g_x(x))
    np.testing.assert_allclose(np.asarray(out[:, :1]), expected_val,
                               rtol=0.05, atol=0.05)
    np.testing.assert_allclose(np.asarray(out[:, 1:]), expected_grad,
                               rtol=0.1, atol=0.12)


def test_terminal_hessian_estimator_quadratic(key):
    nx, b, m = 3, 4, 60000
    eq = QuadraticToy(nx=nx)
    gen = est.GenConfig(n_estimate_terminal=m, chunk_elems=2 ** 14)
    kt, kx, ke = jax.random.split(key, 3)
    t = jnp.full((b, 1), 0.5)
    x = jax.random.normal(kx, (b, nx))
    tx = jnp.concatenate([t, x], axis=-1)
    out = est.estimate_terminal_with_gradients_and_hessians(ke, eq, tx, gen)
    hess = np.asarray(out[:, 1 + nx:]).reshape(b, nx, nx)
    np.testing.assert_allclose(hess, 2.0 * np.eye(nx)[None].repeat(b, 0),
                               atol=0.4)


# ---------------------------------------------------------------------------
# Feynman-Kac fixed point: oracle iterate => target == exact solution
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("eq_name", ["Cha", "OUProcessEquation"])
def test_dpi_target_fixed_point(eq_name, key):
    nx, b, m = 6, 8, 20000
    kwargs = {"nx": nx, "T": 1.0, "alpha": 1.0}
    if eq_name == "Cha":
        kwargs["k"] = 5.0
    else:
        kwargs["num_components"] = 2
    eq = make_equation(eq_name, seed=0, **kwargs)
    sol = Solution.oracle(eq)
    gen = est.GenConfig(n_estimate_terminal=m, n_estimate_integral=m,
                        chunk_elems=2 ** 17)
    kt, kx, ke = jax.random.split(key, 3)
    t = jax.random.uniform(kt, (b, 1)) * 0.8
    x = eq.sample_x(kx, t) * 0.5
    tx = jnp.concatenate([t, x], axis=-1)
    out = est.generate_with_gradients(ke, eq, sol, tx, gen)
    u_exact = np.asarray(eq.exact_solution(t, x))
    ux_exact = np.asarray(eq.u_x(t, x))
    scale_u = max(1.0, np.abs(u_exact).max())
    scale_g = max(1.0, np.abs(ux_exact).max())
    np.testing.assert_allclose(np.asarray(out[:, :1]), u_exact,
                               atol=0.06 * scale_u)
    np.testing.assert_allclose(np.asarray(out[:, 1:]), ux_exact,
                               atol=0.25 * scale_g)


def test_dpi_value_only_fixed_point(key):
    nx, b, m = 6, 8, 20000
    eq = make_equation("Cha", nx=nx, alpha=1.0, k=5.0, T=1.0)
    sol = Solution.oracle(eq)
    gen = est.GenConfig(n_estimate_terminal=m, n_estimate_integral=m,
                        chunk_elems=2 ** 17)
    kt, kx, ke = jax.random.split(key, 3)
    t = jax.random.uniform(kt, (b, 1)) * 0.8
    x = jax.random.normal(kx, (b, nx)) * 0.5
    tx = jnp.concatenate([t, x], axis=-1)
    out = est.generate_values(ke, eq, sol, tx, gen)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(eq.exact_solution(t, x)), atol=0.05)


def test_dpi_hessian_target_fixed_point(key):
    nx, b, m = 4, 4, 30000
    eq = make_equation("GBMEquationComplexExact", nx=nx, seed=0)
    sol = Solution.oracle(eq)
    gen = est.GenConfig(n_estimate_terminal=m, n_estimate_integral=m,
                        chunk_elems=2 ** 14)
    kt, kx, ke = jax.random.split(key, 3)
    t = jax.random.uniform(kt, (b, 1)) * 0.5
    x = jax.random.normal(kx, (b, nx)) * 0.5
    tx = jnp.concatenate([t, x], axis=-1)
    out = est.generate_with_gradients_and_hessians(ke, eq, sol, tx, gen)
    u_exact = np.asarray(eq.exact_solution(t, x))
    ux_exact = np.asarray(eq.u_x(t, x))
    uh_exact = np.asarray(eq.u_hessian(t, x)).reshape(b, nx * nx)
    np.testing.assert_allclose(np.asarray(out[:, :1]), u_exact, atol=0.1)
    np.testing.assert_allclose(np.asarray(out[:, 1:1 + nx]), ux_exact,
                               atol=0.3)
    np.testing.assert_allclose(np.asarray(out[:, 1 + nx:]), uh_exact,
                               atol=0.6)


def test_sdgd_integral_matches_full_on_gbm(key):
    """With v == nx, SDGD reduces to the full diagonal: targets must agree
    in expectation with the no-approximation integral estimator."""
    nx, b, m = 4, 4, 8000
    eq = make_equation("GBMEquationComplexExact", nx=nx, seed=0)
    sol = _mlp_solution(jax.random.fold_in(key, 7), nx)
    kt, kx, ke = jax.random.split(key, 3)
    t = jnp.full((b, 1), 0.3)
    x = jax.random.normal(kx, (b, nx)) * 0.5
    tx = jnp.concatenate([t, x], axis=-1)
    gen_full = est.GenConfig(n_estimate_integral=m, chunk_elems=2 ** 14,
                             sdgd_v=None)
    gen_sdgd = est.GenConfig(n_estimate_integral=m, chunk_elems=2 ** 14,
                             sdgd_v=nx)
    out_full = est.estimate_integral_with_gradients(ke, eq, sol, tx, gen_full)
    out_sdgd = est.estimate_integral_with_gradients(ke, eq, sol, tx, gen_sdgd)
    np.testing.assert_allclose(np.asarray(out_full[:, 0]),
                               np.asarray(out_sdgd[:, 0]), atol=0.2)


# ---------------------------------------------------------------------------
# derivative operators
# ---------------------------------------------------------------------------

def test_solution_value_and_grad_matches_jacrev(key):
    nx = 5
    sol = _mlp_solution(key, nx, "Value")
    tx = jax.random.normal(jax.random.fold_in(key, 1), (7, 1 + nx))
    u, g_tx = sol.value_and_grad_tx(tx)
    jac = jax.vmap(jax.jacrev(lambda z: sol.value(z[None])[0, 0]))(tx)
    np.testing.assert_allclose(np.asarray(g_tx), np.asarray(jac), rtol=1e-5,
                               atol=1e-6)
    t, x = tx[:, :1], tx[:, 1:]
    u2, g_x = sol.value_and_grad_x(t, x)
    np.testing.assert_allclose(np.asarray(g_x), np.asarray(jac[:, 1:]),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(u), np.asarray(u2), rtol=1e-6)


def test_diag_hessian_entries_match_full(key):
    nx = 5
    sol = _mlp_solution(key, nx, "Value")
    t = jnp.full((6, 1), 0.4)
    x = jax.random.normal(jax.random.fold_in(key, 2), (6, nx))
    H = full_hessian(sol, t, x)
    idx = jnp.broadcast_to(jnp.arange(nx, dtype=jnp.int32), (6, nx))
    diag = diag_hessian_entries(sol, t, x, idx)
    np.testing.assert_allclose(np.asarray(diag),
                               np.asarray(jnp.diagonal(H, axis1=-2, axis2=-1)),
                               rtol=1e-4, atol=1e-6)
    lap = exact_laplacian(sol, t, x)
    np.testing.assert_allclose(np.asarray(lap)[:, 0],
                               np.asarray(jnp.trace(H, axis1=-2, axis2=-1)),
                               rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("neurons,acts,out_dim,bound", [
    ((64, 64, 64), ("ELU",) * 3, 1, None),
    ((32, 16), ("Tanh", "Sin"), 1, None),
    ((8,), ("Sigmoid",), 1, None),
    ((24, 24), ("Softplus", "ELU"), 6, None),
    ((16, 16), ("Tanh", "Tanh"), 1, 50.0),
])
def test_mlp_hessian_diag_matches_generic(key, neurons, acts, out_dim,
                                          bound):
    """Second-order-backprop full diagonal (the SDGD fast path) == the
    per-index forward-over-reverse fallback, across depths, activations,
    multi-output heads, and the bound clamp."""
    from deeppicarditeration_tpu.models.networks import MLP
    from deeppicarditeration_tpu.ops.derivatives import mlp_hessian_diag

    nx, b = 5, 16
    module = MLP(neurons=neurons, activations=acts, out_dim=out_dim,
                 bound=bound)
    params = module.init(key, jnp.zeros((1, 1 + nx)))
    net_type = "Value" if out_dim == 1 else "ValueGradient"
    sol = Solution.from_net(module, params, net_type, nx)
    t = jax.random.uniform(jax.random.fold_in(key, 1), (b, 1))
    x = jax.random.normal(jax.random.fold_in(key, 2), (b, nx))
    fast = mlp_hessian_diag(sol, t, x)

    # independent reference: raw per-sample jax.hessian (NOT full_hessian,
    # which itself dispatches to the same second-order-backprop chain)
    def per_sample(t1, x1):
        def u_scalar(xx):
            tx1 = jnp.concatenate([t1, xx])[None, :]
            return sol(tx1)[0, 0]

        return jax.hessian(u_scalar)(x1)

    H = jax.vmap(per_sample)(t, x)
    ref = jnp.diagonal(H, axis1=-2, axis2=-1)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                               rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(full_hessian(sol, t, x)),
                               np.asarray(H), rtol=2e-4, atol=1e-5)
    # the dispatcher must gather the same entries at sampled indices
    idx = jax.random.randint(jax.random.fold_in(key, 3), (b, nx), 0, nx)
    diag = diag_hessian_entries(sol, t, x, idx.astype(jnp.int32))
    np.testing.assert_allclose(
        np.asarray(diag),
        np.asarray(jnp.take_along_axis(ref, idx, axis=-1)),
        rtol=2e-4, atol=1e-5)


def test_sdgd_counts_path_matches_gather(key):
    """The gather-free SDGD path (multiplicity counts against the exact
    diagonal) == gathering the sampled entries, for get_f and for the
    per-sample baseline."""
    from deeppicarditeration_tpu.equations import make_equation
    from deeppicarditeration_tpu.ops.derivatives import (
        get_f,
        mlp_hessian_diag,
        sdgd_index_counts,
    )
    from deeppicarditeration_tpu.ops.estimators import (
        _baseline_f_at_indices,
    )

    nx, b, mc, v = 6, 8, 3, 4
    eq = make_equation("GBMEquationComplexExact", nx=nx, alpha=1.0, T=1.0)
    sol = _mlp_solution(key, nx, "Value")
    s = jax.random.uniform(jax.random.fold_in(key, 1), (b, 1))
    x = jax.random.normal(jax.random.fold_in(key, 2), (b, nx))
    idx = jax.random.randint(jax.random.fold_in(key, 3), (b, v), 0, nx,
                             dtype=jnp.int32)
    # counts are exact multiplicities
    c = sdgd_index_counts(idx, nx)
    assert np.all(np.asarray(jnp.sum(c, -1)) == v)
    f_fast = get_f(eq, sol, s, x, hess_indices=idx)
    diag = mlp_hessian_diag(sol, s, x)
    u_ii = jnp.take_along_axis(diag, idx, axis=-1)
    u = sol.value(jnp.concatenate([s, x], axis=-1))
    f_ref = eq.ffi(s, x, u, u_ii)
    np.testing.assert_allclose(np.asarray(f_fast), np.asarray(f_ref),
                               rtol=1e-5, atol=1e-5)

    # baseline: (B, mc, v) indices against the precomputed diagonal d0
    idx3 = jax.random.randint(jax.random.fold_in(key, 4), (b, mc, v), 0,
                              nx, dtype=jnp.int32)
    d0 = mlp_hessian_diag(sol, s, x)
    f0_fast = _baseline_f_at_indices(eq, sol, s, x, d0, idx3, u)
    u_ii0 = jnp.take_along_axis(
        jnp.broadcast_to(d0[:, None, :], (b, mc, nx)), idx3, axis=-1)
    f0_ref = eq.ffi(
        jnp.broadcast_to(s[:, None, :], (b, mc, 1)),
        jnp.broadcast_to(x[:, None, :], (b, mc, nx)),
        jnp.broadcast_to(u[:, None, :], (b, mc, 1)), u_ii0)
    np.testing.assert_allclose(np.asarray(f0_fast), np.asarray(f0_ref),
                               rtol=1e-5, atol=1e-5)


def test_diag_hessian_only_gradient_net_is_zero(key):
    """OnlyGradient nets have a zero value head — the MLP fast path must
    not engage (it would differentiate output column 0 of the grad net)."""
    sol = _mlp_solution(key, 4, "OnlyGradient")
    t = jnp.full((3, 1), 0.3)
    x = jax.random.normal(jax.random.fold_in(key, 5), (3, 4))
    idx = jnp.broadcast_to(jnp.arange(4, dtype=jnp.int32), (3, 4))
    diag = diag_hessian_entries(sol, t, x, idx)
    np.testing.assert_array_equal(np.asarray(diag), 0.0)


def test_hutchinson_unbiased(key):
    nx = 4
    sol = _mlp_solution(key, nx, "Value")
    t = jnp.full((5, 1), 0.2)
    x = jax.random.normal(jax.random.fold_in(key, 3), (5, nx))
    lap = exact_laplacian(sol, t, x)
    est_lap = hutchinson_laplacian(jax.random.fold_in(key, 4), sol, t, x, 512)
    np.testing.assert_allclose(np.asarray(est_lap), np.asarray(lap),
                               atol=0.15 * float(jnp.abs(lap).max()) + 0.02)


# ---------------------------------------------------------------------------
# infrastructure: Kahan accumulation, chunking, t-sampler, clipping
# ---------------------------------------------------------------------------

def test_kahan_beats_naive_f32():
    # large constant + many tiny values: naive f32 loses the tail
    n = 100_000
    vals = np.full(n, 1e-4, np.float32)
    vals[0] = 1e7
    acc = KahanAcc.zeros((), jnp.float32)

    def body(a, v):
        return a.add(v), None

    acc, _ = jax.lax.scan(body, acc, jnp.asarray(vals))
    exact = float(np.sum(vals.astype(np.float64)))
    naive = float(jnp.sum(jnp.asarray(vals)))
    assert abs(float(acc.value) - exact) < 1e-3
    assert abs(naive - exact) > abs(float(acc.value) - exact)


def test_chunk_is_divisor():
    gen = est.GenConfig(chunk_elems=1000)
    for m in [1, 7, 4096, 4095]:
        mc = gen.chunk(m, batch=32, nx=10)
        assert m % mc == 0
        assert mc >= 1


def test_chunking_invariance(key):
    """Different chunk sizes must give statistically identical estimates."""
    nx, b, m = 4, 8, 4096
    eq = QuadraticToy(nx=nx)
    t = jnp.full((b, 1), 0.3)
    x = jax.random.normal(key, (b, nx))
    tx = jnp.concatenate([t, x], axis=-1)
    outs = []
    for chunk_elems in (2 ** 10, 2 ** 14, 2 ** 22):
        gen = est.GenConfig(n_estimate_terminal=m, chunk_elems=chunk_elems)
        outs.append(np.asarray(
            est.estimate_terminal_with_gradients(key, eq, tx, gen)))
    # all close to the semigroup mean (not bitwise equal: keys differ by chunk)
    expected = np.asarray(eq.g(x) + (eq.T - t) * eq.alpha * nx)
    for o in outs:
        np.testing.assert_allclose(o[:, :1], expected, rtol=0.15, atol=0.15)


def test_t_sampler_power_law(key):
    # N - i + 1 = 1: t = T(1 - U) ~ U[0, T]
    t = sample_t_picard(key, 200_000, T=2.0, n_factors=1)
    tn = np.asarray(t)
    assert abs(tn.mean() - 1.0) < 0.01
    # N - i + 1 = 2: E[prod U] = 1/4 -> E t = T * 3/4
    t2 = sample_t_picard(key, 200_000, T=2.0, n_factors=2)
    assert abs(np.asarray(t2).mean() - 1.5) < 0.01


def test_sample_batch_clipping(key):
    nx = 4
    eq = QuadraticToy(nx=nx)
    sol = Solution.zero(nx)
    gen = est.GenConfig(n_estimate_terminal=64, n_estimate_integral=64,
                        sample_bound=0.5, t_always_uniform=True)
    tx, u = est.sample_batch(key, eq, sol, 32, gen, mode="gradient")
    assert tx.shape == (32, 1 + nx)
    assert u.shape == (32, 1 + nx)
    assert float(jnp.max(jnp.abs(u))) <= 0.5 + 1e-6


def test_sample_batch_exact_modes(key):
    nx = 4
    eq = make_equation("GBMEquationComplexExact", nx=nx, seed=0)
    sol = Solution.zero(nx)
    gen = est.GenConfig(t_always_uniform=True)
    for mode in ("exact", "exact_gradient", "exact_hessian"):
        tx, u = est.sample_batch(key, eq, sol, 16, gen, mode=mode)
        assert u.shape == (16, est.target_dim(mode, nx))
    # exact targets equal the oracle at the sampled points
    tx, u = est.sample_batch(key, eq, sol, 16, gen, mode="exact")
    np.testing.assert_allclose(
        np.asarray(u),
        np.asarray(eq.exact_solution(tx[:, :1], tx[:, 1:])), rtol=1e-5)


def test_two_layer_with_equal_solutions_is_identity(key):
    """f(u1) - f(u2) == 0 when u1 == u2: target collapses to u1(tx)."""
    nx = 4
    eq = make_equation("Cha", nx=nx, alpha=1.0, k=2.0)
    sol = _mlp_solution(key, nx, "Value")
    gen = est.GenConfig(n_estimate_integral=128, t_always_uniform=True)
    kt = jax.random.fold_in(key, 5)
    tx = est.sample_tx(kt, eq, 16, gen)
    out = est.generate_two_layer(kt, eq, sol, sol, tx, gen)
    np.testing.assert_allclose(np.asarray(out), np.asarray(sol.value(tx)),
                               rtol=1e-5, atol=1e-6)


def test_estimators_jit_with_equation_as_pytree(key):
    """Generation jits with (eq, sol) as pytree args — no recompilation
    across Picard iterations when only params change."""
    nx = 4
    eq = make_equation("OUProcessEquation", nx=nx, num_components=2)
    sol = _mlp_solution(key, nx, "Value")
    gen = est.GenConfig(n_estimate_terminal=32, n_estimate_integral=32,
                        t_always_uniform=True)

    @jax.jit
    def gen_fn(k, e, s, tx):
        return est.generate_with_gradients(k, e, s, tx, gen)

    tx = est.sample_tx(key, eq, 8, gen)
    out1 = gen_fn(key, eq, sol, tx)
    # new params, same structure: must hit the jit cache
    sol2 = _mlp_solution(jax.random.fold_in(key, 9), nx)
    out2 = gen_fn(key, eq, sol2, tx)
    assert out1.shape == out2.shape == (8, 1 + nx)
    assert gen_fn._cache_size() == 1


def test_terminal_gradients_finite_at_t_equals_T(key):
    """A collocation point with t == T exactly (reachable in f32: the
    t-samplers' support includes T) must yield finite targets, not the
    0 * inf = NaN of an unfloored 1/sqrt(T - t) weight."""
    nx = 4
    eq = make_equation("Cha", nx=nx, alpha=1.0, k=1.0, T=1.0)
    sol = Solution.zero(nx)
    t = jnp.array([[1.0], [0.5], [1.0]])  # two points AT T
    x = jax.random.normal(key, (3, nx))
    tx = jnp.concatenate([t, x], axis=-1)
    gen = est.GenConfig(n_estimate_terminal=8, n_estimate_integral=8,
                        chunk_elems=2 ** 12)
    for fn in (lambda: est.estimate_terminal_with_gradients(key, eq, tx, gen),
               lambda: est.generate_with_gradients(key, eq, sol, tx, gen)):
        out = np.asarray(fn())
        assert np.all(np.isfinite(out)), out
    # TD variant: t_next == t == T
    gen_td = est.GenConfig(n_estimate_terminal=8, n_estimate_integral=8,
                           chunk_elems=2 ** 12, estimate_delta_t=0.25)
    out = np.asarray(
        est.estimate_terminal_with_gradients_td(key, eq, sol, tx, gen_td))
    assert np.all(np.isfinite(out)), out
    # Hessian "double" form divides by (T - t) twice
    out = np.asarray(est.estimate_terminal_with_gradients_and_hessians(
        key, eq, tx, gen))
    assert np.all(np.isfinite(out)), out


def test_antithetic_odd_m_raises_clear_error():
    """Antithetic pairing with an odd sample count must raise, not crash
    with ZeroDivisionError inside the divisor walk."""
    gen = est.GenConfig(n_estimate_terminal=7, antithetic=True)
    with pytest.raises(ValueError, match="even sample count"):
        gen.chunk(7, 4, 3)
    assert est.largest_divisor(12, 8, 2) == 6
    assert est.largest_divisor(12, 100, 2) == 12
    assert est.largest_divisor(5, 1) == 1


def test_forced_pallas_flags_are_exact_off_tpu(key):
    """Forcing pallas_terminal / pallas_generate off-TPU must supply
    external increments (the interpreter stubs the in-kernel PRNG to
    zeros): the estimate must carry real MC noise, not collapse to the
    zero-noise degenerate value (g(x), 0)."""
    nx = 4
    eq = make_equation("Cha", nx=nx, alpha=1.0, k=1.0, T=1.0)
    sol = Solution.zero(nx)
    t = jnp.full((8, 1), 0.3)
    x = jax.random.normal(key, (8, nx))
    tx = jnp.concatenate([t, x], axis=-1)
    m = 4096
    gen_p = est.GenConfig(n_estimate_terminal=m, n_estimate_integral=m,
                          chunk_elems=2 ** 16, pallas_terminal=True)
    out_p = np.asarray(est.estimate_terminal_with_gradients(key, eq, tx,
                                                            gen_p))
    degenerate = np.concatenate([np.asarray(eq.g(x)),
                                 np.zeros((8, nx), np.float32)], axis=-1)
    assert not np.allclose(out_p, degenerate)
    # and it must agree with the XLA estimator up to MC error
    gen_x = est.GenConfig(n_estimate_terminal=m, n_estimate_integral=m,
                          chunk_elems=2 ** 16)
    out_x = np.asarray(est.estimate_terminal_with_gradients(
        jax.random.fold_in(key, 9), eq, tx, gen_x))
    np.testing.assert_allclose(out_p, out_x, atol=0.15)
    # merged kernel forced on CPU
    gen_g = est.GenConfig(n_estimate_terminal=m, n_estimate_integral=m,
                          chunk_elems=2 ** 16, pallas_generate=True)
    out_g = np.asarray(est.generate_with_gradients(key, eq, sol, tx, gen_g))
    out_gx = np.asarray(est.generate_with_gradients(
        jax.random.fold_in(key, 9), eq, sol, tx, gen_x))
    np.testing.assert_allclose(out_g, out_gx, atol=0.2)
