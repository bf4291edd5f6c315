import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deeppicarditeration_tpu.config import default_cfg
from deeppicarditeration_tpu.equations import make_equation
from deeppicarditeration_tpu.models.factory import build_network, init_solution
from deeppicarditeration_tpu.models.networks import MLP, EnforceTerminal, PISGradNet
from deeppicarditeration_tpu.models.solution import Solution
from deeppicarditeration_tpu.utils.static_fn import StaticFn

NX = 6


def test_mlp_shapes_and_bound(key):
    mod = MLP(neurons=(8, 8), activations=("ELU", "Tanh"), out_dim=3,
              bound=0.7)
    params = mod.init(key, jnp.zeros((1, 1 + NX)))
    out = mod.apply(params, jax.random.normal(key, (5, 1 + NX)) * 100)
    assert out.shape == (5, 3)
    assert float(jnp.max(jnp.abs(out))) <= 0.7 + 1e-6


def test_pisgradnet_enforces_terminal(key):
    """At t = T the smoothing gate closes: output == g(x) exactly
    (solution.py:267-289: smooth(0) - smooth(0) = 0, decay = 1)."""
    eq = make_equation("Cha", nx=NX, alpha=1.0, k=3.0, T=1.0)
    mod = PISGradNet(hidden_shapes=(16, 16), dim=NX,
                     g0=StaticFn(eq.g, ("g", id(eq))), T=eq.T)
    params = mod.init(key, jnp.zeros((1, 1 + NX)))
    x = jax.random.normal(key, (7, NX))
    tx = jnp.concatenate([jnp.full((7, 1), eq.T), x], axis=-1)
    np.testing.assert_allclose(np.asarray(mod.apply(params, tx)),
                               np.asarray(eq.g(x)), rtol=1e-5, atol=1e-6)


def test_enforce_terminal_wrapper(key):
    eq = make_equation("Cha", nx=NX, alpha=1.0, k=3.0, T=1.0)
    inner = MLP(neurons=(8,), activations=("Tanh",), out_dim=1)
    mod = EnforceTerminal(inner=inner, anchor=StaticFn(eq.g, ("g", id(eq))),
                          T=eq.T)
    params = mod.init(key, jnp.zeros((1, 1 + NX)))
    x = jax.random.normal(key, (5, NX))
    txT = jnp.concatenate([jnp.full((5, 1), eq.T), x], axis=-1)
    np.testing.assert_allclose(np.asarray(mod.apply(params, txT)),
                               np.asarray(eq.g(x)), rtol=1e-5, atol=1e-6)
    tx0 = jnp.concatenate([jnp.zeros((5, 1)), x], axis=-1)
    assert not np.allclose(np.asarray(mod.apply(params, tx0)),
                           np.asarray(eq.g(x)))


def test_factory_variants(key):
    eq = make_equation("Cha", nx=NX, alpha=1.0, k=3.0)
    cfg = default_cfg()
    cfg.NETWORK.NEURONS = [8, 8]
    cfg.NETWORK.ACTIVATIONS = ["ELU", "ELU"]
    # plain value MLP
    sol = init_solution(key, cfg, eq)
    assert sol.output_dim == 1
    # ValueGradient
    cfg.NETWORK.TYPE = "ValueGradient"
    sol = init_solution(key, cfg, eq)
    assert sol.output_dim == 1 + NX
    # EnforceTerminal
    cfg.NETWORK.TYPE = "Value"
    cfg.NETWORK.cls = "PicardSolutionEnforceTerminal"
    sol = init_solution(key, cfg, eq)
    x = jax.random.normal(key, (4, NX))
    txT = jnp.concatenate([jnp.full((4, 1), eq.T), x], axis=-1)
    np.testing.assert_allclose(np.asarray(sol(txT)), np.asarray(eq.g(x)),
                               rtol=1e-5, atol=1e-6)
    # PISGradNet
    cfg.NETWORK.cls = None
    cfg.NETWORK.PISGRADNET = True
    sol = init_solution(key, cfg, eq)
    assert sol(txT).shape == (4, 1)


def test_zero_and_gx_solutions(key):
    eq = make_equation("Cha", nx=NX, alpha=1.0, k=3.0)
    zero = Solution.zero(NX, "ValueGradient")
    tx = jax.random.normal(key, (5, 1 + NX))
    assert float(jnp.abs(zero(tx)).max()) == 0.0
    u, ux = zero.value_and_grad_x(tx[:, :1], tx[:, 1:])
    assert float(jnp.abs(u).max()) == 0.0 and float(jnp.abs(ux).max()) == 0.0
    gxs = Solution.gx(StaticFn(eq.g, ("g", id(eq))), NX)
    np.testing.assert_allclose(np.asarray(gxs(tx)),
                               np.asarray(eq.g(tx[:, 1:])), rtol=1e-6)
    u, ux = gxs.value_and_grad_x(tx[:, :1], tx[:, 1:])
    np.testing.assert_allclose(np.asarray(ux), np.asarray(eq.g_x(tx[:, 1:])),
                               rtol=1e-4, atol=1e-6)


def test_factory_rejects_unknown_cls(key):
    """Unknown NETWORK.cls must raise (picard_iteration.py:102 parity), not
    silently fall through to a plain MLP that drops terminal anchoring."""
    eq = make_equation("Cha", nx=NX, alpha=1.0, k=3.0)
    cfg = default_cfg()
    cfg.NETWORK.cls = "MLPEnforceTerminal"  # real reference name, not ours
    with pytest.raises(ValueError, match="Unknown solution class"):
        build_network(cfg, eq)


def test_is_enforce_terminal_rejects_unknown_cls(key):
    """is_enforce_terminal must fail loudly on unsupported class names too:
    the DBDP baseline consults it without ever calling build_network, so a
    config with e.g. cls 'MLPEnforceTerminal' would otherwise silently run
    with enforce=False (ADVICE r1)."""
    from deeppicarditeration_tpu.models.factory import is_enforce_terminal

    cfg = default_cfg()
    cfg.NETWORK.cls = "MLPEnforceTerminal"
    with pytest.raises(ValueError, match="Unknown solution class"):
        is_enforce_terminal(cfg)
    cfg.NETWORK.cls = "PicardSolutionEnforceTerminal"
    assert is_enforce_terminal(cfg)


def test_factory_rejects_activation_length_mismatch(key):
    eq = make_equation("Cha", nx=NX, alpha=1.0, k=3.0)
    cfg = default_cfg()
    cfg.NETWORK.NEURONS = [8, 8, 8]
    cfg.NETWORK.ACTIVATIONS = ["ELU", "ELU"]
    with pytest.raises(ValueError, match="must match"):
        build_network(cfg, eq)
