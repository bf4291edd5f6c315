"""Equation math checks: closed forms vs autodiff, PDE residual identities.

The reference has no tests; its de-facto verification is closed-form oracles
(survey §4). Here those identities become real assertions: for each
benchmark equation we check that the stated exact solution actually solves
the PDE, and that hand-written derivatives match autodiff.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deeppicarditeration_tpu.equations import (
    Cha,
    GBMEquationComplexExact,
    OUProcessEquation,
    make_equation,
)

NX = 8


def _rand_tx(key, eq, n=16):
    kt, kx = jax.random.split(key)
    t = jax.random.uniform(kt, (n, 1)) * eq.T
    x = jax.random.normal(kx, (n, eq.nx))
    return t, x


def _autodiff_u_x(eq, t, x):
    u, vjp = jax.vjp(lambda xx: eq.exact_solution(t, xx), x)
    return vjp(jnp.ones_like(u))[0]


def _autodiff_u_t(eq, t, x):
    u, vjp = jax.vjp(lambda tt: eq.exact_solution(tt, x), t)
    return vjp(jnp.ones_like(u))[0]


def _laplacian_autodiff(eq, t, x):
    def u_scalar(tt, xx):
        return eq.exact_solution(tt[None], xx[None])[0, 0]

    hess = jax.vmap(jax.hessian(u_scalar, argnums=1))(t, x)
    return jnp.trace(hess, axis1=-2, axis2=-1)[..., None], hess


@pytest.fixture(params=["Cha", "OUProcessEquation", "GBMEquationComplexExact"])
def eq(request):
    kwargs = {"nx": NX, "T": 1.0, "alpha": 1.0}
    if request.param == "Cha":
        kwargs["k"] = 5.0
    if request.param == "OUProcessEquation":
        kwargs["num_components"] = 3
    return make_equation(request.param, seed=0, **kwargs)


def test_closed_form_u_x_matches_autodiff(eq, key):
    t, x = _rand_tx(key, eq)
    np.testing.assert_allclose(np.asarray(eq.u_x(t, x)),
                               np.asarray(_autodiff_u_x(eq, t, x)),
                               rtol=1e-4, atol=1e-5)


def test_closed_form_u_t_matches_autodiff(eq, key):
    t, x = _rand_tx(key, eq)
    np.testing.assert_allclose(np.asarray(eq.u_t(t, x)),
                               np.asarray(_autodiff_u_t(eq, t, x)),
                               rtol=1e-4, atol=1e-5)


def test_terminal_condition(eq, key):
    _, x = _rand_tx(key, eq)
    T = jnp.full((x.shape[0], 1), eq.T)
    np.testing.assert_allclose(np.asarray(eq.g(x)),
                               np.asarray(eq.exact_solution(T, x)),
                               rtol=1e-5, atol=1e-6)


def test_g_x_matches_autodiff(eq, key):
    _, x = _rand_tx(key, eq)
    g, vjp = jax.vjp(eq.g, x)
    g_x_auto = vjp(jnp.ones_like(g))[0]
    np.testing.assert_allclose(np.asarray(eq.g_x(x)), np.asarray(g_x_auto),
                               rtol=1e-4, atol=1e-5)


def test_pde_residual_is_zero(eq, key):
    """The exact solution must satisfy u_t + a/2 Lap u + nonlinearity = 0."""
    t, x = _rand_tx(key, eq, n=8)
    u = eq.exact_solution(t, x)
    u_t = eq.u_t(t, x)
    u_x = eq.u_x(t, x)
    lap, hess = _laplacian_autodiff(eq, t, x)
    if eq.has_hessian_term:
        nonlinear = eq.ffh(t, x, u, u_x, hess)
    elif eq.has_gradient_term:
        nonlinear = eq.ff(t, x, u, u_x)
    else:
        nonlinear = eq.f(t, x, u)
    residual = u_t + 0.5 * eq.alpha * lap + nonlinear
    np.testing.assert_allclose(np.asarray(residual), 0.0, atol=5e-4)


def test_transition_moments(eq, key):
    """X_s - x ~ N(0, (s-t) alpha I) exactly (one-shot Gaussian)."""
    n = 50_000
    t = jnp.zeros((n, 1))
    s = jnp.full((n, 1), 0.7)
    x = jnp.ones((n, eq.nx))
    xs, dW = eq.transition(key, t, s, x)
    inc = np.asarray(xs - x)
    np.testing.assert_allclose(inc.mean(0), 0.0, atol=0.02)
    np.testing.assert_allclose(inc.var(0), 0.7 * eq.alpha, rtol=0.05)
    # dW is the standardized increment
    np.testing.assert_allclose(np.asarray(dW).var(0), 1.0, rtol=0.05)


def test_batched_leading_dims(eq, key):
    """Equation functions broadcast over (B, M, .) blocks."""
    t = jnp.full((4, 3, 1), 0.3)
    x = jax.random.normal(key, (4, 3, eq.nx))
    assert eq.g(x).shape == (4, 3, 1)
    assert eq.exact_solution(t, x).shape == (4, 3, 1)
    u = eq.exact_solution(t, x)
    w = jnp.ones_like(x)
    if eq.has_hessian_term:
        hess = jnp.zeros(x.shape + (eq.nx,))
        assert eq.ffh(t, x, u, w, hess).shape == (4, 3, 1)
    elif eq.has_gradient_term:
        assert eq.ff(t, x, u, w).shape == (4, 3, 1)


def test_cha_exact_solution_value():
    eq = make_equation("Cha", nx=NX, alpha=1.0, k=5.0, T=1.0)
    # at x=0: u(t, 0) = sigmoid(t)
    t = jnp.array([[0.0], [0.5]])
    x = jnp.zeros((2, NX))
    np.testing.assert_allclose(np.asarray(eq.exact_solution(t, x))[:, 0],
                               [0.5, 1 / (1 + np.exp(-0.5))], rtol=1e-6)
    # k is internally scaled by 1/sqrt(nx)
    np.testing.assert_allclose(eq.k, 5.0 / np.sqrt(NX), rtol=1e-6)


def test_gbm_hessian_matches_autodiff(key):
    eq = make_equation("GBMEquationComplexExact", nx=NX, seed=0)
    t, x = _rand_tx(key, eq, n=4)
    _, hess_auto = _laplacian_autodiff(eq, t, x)
    np.testing.assert_allclose(np.asarray(eq.u_hessian(t, x)),
                               np.asarray(hess_auto), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(eq.u_hessian_diag(t, x)),
        np.asarray(jnp.diagonal(hess_auto, axis1=-2, axis2=-1)),
        rtol=1e-4, atol=1e-5)


def test_ou_x0_distribution(key):
    eq = make_equation("OUProcessEquation", nx=NX, alpha=1.0, alpha_scale=4.0)
    x0 = eq.sample_x0(key, 100_000)
    np.testing.assert_allclose(np.asarray(x0).var(0), 4.0, rtol=0.05)


def test_equation_is_pytree(eq):
    leaves, treedef = jax.tree_util.tree_flatten(eq)
    eq2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert eq2.nx == eq.nx

    @jax.jit
    def f(e, x):
        return e.g(x)

    x = jnp.zeros((2, eq.nx))
    np.testing.assert_allclose(np.asarray(f(eq, x)), np.asarray(eq.g(x)),
                               rtol=1e-6)


# ---------------------------------------------------------------------------
# SimpleDiffusionWithLaplacian mixin -> get_f ffl dispatch
# ---------------------------------------------------------------------------
def test_laplacian_mixin_get_f_exact_and_hutchinson(key):
    """A WithLaplacian equation routes through get_f's ffl branch: exact
    Laplacian when num_v_samples <= 0, Hutchinson otherwise (reference
    dispatch parity: data.py:1304-1314)."""
    from flax import struct

    from deeppicarditeration_tpu.equations.base import (
        SimpleDiffusionWithLaplacian,
    )
    from deeppicarditeration_tpu.models.networks import MLP
    from deeppicarditeration_tpu.models.solution import Solution
    from deeppicarditeration_tpu.ops.derivatives import (
        exact_laplacian,
        get_f,
    )

    @struct.dataclass
    class LapToy(SimpleDiffusionWithLaplacian):
        nx: int = struct.field(pytree_node=False, default=4)
        T: float = struct.field(pytree_node=False, default=1.0)
        alpha: float = struct.field(pytree_node=False, default=1.0)
        num_v_samples: int = struct.field(pytree_node=False, default=0)

        def g(self, x):
            return jnp.sum(x * x, axis=-1, keepdims=True)

        def ffl(self, t, x, y, w, lap):
            return y + 0.5 * self.alpha * lap + jnp.sum(
                w, axis=-1, keepdims=True)

    nx = 4
    assert LapToy.has_laplacian_term and LapToy.has_gradient_term
    mod = MLP(neurons=(16, 16), activations=("Tanh", "Tanh"), out_dim=1)
    params = mod.init(key, jnp.zeros((1, 1 + nx)))
    sol = Solution.from_net(mod, params, "Value", nx)
    kt, kx, kh = jax.random.split(key, 3)
    t = jax.random.uniform(kt, (32, 1))
    x = jax.random.normal(kx, (32, nx))

    # exact-Laplacian path (num_v_samples = 0)
    eq = LapToy(nx=nx)
    f_exact = get_f(eq, sol, t, x)
    u, u_x = sol.value_and_grad_x(t, x)
    want = u + 0.5 * exact_laplacian(sol, t, x) + jnp.sum(
        u_x, axis=-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(f_exact), np.asarray(want),
                               rtol=1e-5, atol=1e-6)

    # Hutchinson path converges to the exact one
    eq_h = LapToy(nx=nx, num_v_samples=1024)
    f_hutch = get_f(eq_h, sol, t, x, hutchinson_key=kh)
    err = np.abs(np.asarray(f_hutch) - np.asarray(f_exact))
    assert err.mean() < 0.05 * (np.abs(np.asarray(f_exact)).mean() + 1.0)


def test_problem_instance_stable_across_processes():
    """Seeded problem parameters must be identical in a fresh process with a
    different PYTHONHASHSEED: built-in hash() is salted per process, so any
    hash() in the parameter derivation would silently change the problem
    instance between train and post-hoc evaluate/RESUME (regression test
    for the param_tag fix in equations/base.py)."""
    import os
    import subprocess
    import sys

    import numpy as np

    from deeppicarditeration_tpu.equations import make_equation

    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "import numpy as np\n"
        "from deeppicarditeration_tpu.equations import make_equation\n"
        "fn = make_equation('GBMEquationComplexExact', nx=7, seed=2)\n"
        "ou = make_equation('OUProcessEquation', nx=5, num_components=2,"
        " seed=2)\n"
        "print(repr([float(np.asarray(fn.w).sum()),"
        " float(np.asarray(ou.gmm_means).sum())]))\n"
    )
    env = dict(os.environ, PYTHONHASHSEED="12345", JAX_PLATFORMS="cpu",
               PALLAS_AXON_POOL_IPS="")
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=300,
                         cwd=os.path.dirname(os.path.dirname(__file__)))
    assert out.returncode == 0, out.stderr[-2000:]
    sub_w, sub_m = eval(out.stdout.strip().splitlines()[-1])
    fn = make_equation("GBMEquationComplexExact", nx=7, seed=2)
    ou = make_equation("OUProcessEquation", nx=5, num_components=2, seed=2)
    np.testing.assert_allclose(float(np.asarray(fn.w).sum()), sub_w, rtol=0)
    np.testing.assert_allclose(float(np.asarray(ou.gmm_means).sum()), sub_m,
                               rtol=0)


def test_ff_fff_scaling_contract():
    """Base contract (base.py:100-102): ff(w) == fff(z = sqrt(alpha) w) for
    every equation implementing both — at alpha != 1 so the Sigma scaling
    direction is actually exercised (regression: HJB fff had it inverted)."""
    import numpy as np

    key = jax.random.PRNGKey(3)
    for eq in (make_equation("Cha", nx=4, alpha=2.5, k=1.0, T=1.0),
               make_equation("OUProcessEquation", nx=4, alpha=2.5,
                             num_components=2)):
        t = jnp.full((5, 1), 0.3)
        x = jax.random.normal(key, (5, 4))
        y = jnp.ones((5, 1))
        w = jax.random.normal(jax.random.fold_in(key, 1), (5, 4))
        lhs = np.asarray(eq.ff(t, x, y, w))
        rhs = np.asarray(eq.fff(t, x, y, eq.alpha_sqrt * w))
        np.testing.assert_allclose(lhs, rhs, rtol=1e-5, atol=1e-6)
