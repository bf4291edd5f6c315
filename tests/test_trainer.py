import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deeppicarditeration_tpu.config import default_cfg
from deeppicarditeration_tpu.models.networks import MLP
from deeppicarditeration_tpu.models.solution import Solution
from deeppicarditeration_tpu.training.losses import (
    DimensionLossScaler,
    FixedLossScaler,
    SimpleLossScaler,
    get_scaler,
    make_loss_fn,
)
from deeppicarditeration_tpu.training.trainer import (
    TrainSpec,
    TrainState,
    compute_loss,
    make_optimizer,
    make_train_step,
)

NX = 4


def _cfg(**train_loss):
    cfg = default_cfg()
    cfg.NETWORK.NEURONS = [16, 16]
    cfg.NETWORK.ACTIVATIONS = ["Tanh", "Tanh"]
    for k, v in train_loss.items():
        cfg.TRAIN[k] = v
    return cfg


def _module_and_params(key, net_type="Value"):
    out = {"Value": 1, "ValueGradient": 1 + NX, "OnlyGradient": NX}[net_type]
    mod = MLP(neurons=(16, 16), activations=("Tanh", "Tanh"), out_dim=out)
    params = mod.init(key, jnp.zeros((1, 1 + NX)))
    return mod, params


def test_loss_fns():
    sq = make_loss_fn(None)
    np.testing.assert_allclose(float(sq(jnp.asarray(3.0))), 9.0)
    clip = make_loss_fn("LossFnLinearClip", clip=1.0)
    np.testing.assert_allclose(float(clip(jnp.asarray(0.5))), 0.25)
    np.testing.assert_allclose(float(clip(jnp.asarray(3.0))), 5.0)  # 2*3-1


def test_scalers():
    v = jnp.asarray(2.0)
    g = jnp.asarray([1.0, 3.0])
    loss, _ = FixedLossScaler(0.5).scale(v, g)
    np.testing.assert_allclose(float(loss), 2.0 + 0.5 * 4.0)
    loss, info = SimpleLossScaler().scale(v, g)
    np.testing.assert_allclose(float(loss), 2.0 + (2.0 / 4.0) * 4.0)
    loss, _ = DimensionLossScaler().scale(v, g)
    np.testing.assert_allclose(float(loss), 2.0 + (2 / 1) * 1 + (2 / 3) * 3)
    assert isinstance(get_scaler(None), FixedLossScaler)
    assert isinstance(get_scaler("SimpleLossScaler"), SimpleLossScaler)


def test_make_optimizer_variants():
    from deeppicarditeration_tpu.config import Config

    tx, nv = make_optimizer(Config({"cls": "Adam", "kwargs": {"lr": 1e-3},
                                    "SCHEDULER": {"cls": None}}))
    assert not nv
    tx, nv = make_optimizer(Config({
        "cls": "Adam", "kwargs": {"lr": 1e-3},
        "SCHEDULER": {"cls": "ReduceLROnPlateau",
                      "kwargs": {"factor": 0.5}}}))
    assert nv
    tx, nv = make_optimizer(Config({
        "cls": "SGD", "kwargs": {"lr": 1e-2},
        "SCHEDULER": {"cls": "StepLR",
                      "kwargs": {"step_size": 10, "gamma": 0.5}}}))
    assert not nv


@pytest.mark.parametrize("net_type", ["Value", "ValueGradient"])
def test_train_step_fits_linear_target(key, net_type):
    """A few hundred steps should fit u(t, x) = sum(tx) and its gradient."""
    mod, params = _module_and_params(key, net_type)
    spec = TrainSpec(net_type=net_type, nx=NX, supervise_gradient=True,
                     scaler_cls="FixedLossScaler",
                     scaler_kwargs=(("fixed_weight", 1.0),))
    tx_opt, nv = make_optimizer(
        {"cls": "Adam", "kwargs": {"lr": 3e-3}, "SCHEDULER": {"cls": None}})
    step = make_train_step(mod, tx_opt, spec, nv)
    state = TrainState.create(params, tx_opt)
    k = key
    for i in range(1500):
        k, kb = jax.random.split(k)
        tx = jax.random.uniform(kb, (128, 1 + NX))
        y_u = jnp.sum(tx, axis=-1, keepdims=True)
        y_ux = jnp.ones((128, NX))
        y = jnp.concatenate([y_u, y_ux], axis=-1)
        state, metrics = step(state, tx, y, kb)
    assert float(metrics["train_loss"]) < 5e-2
    sol = Solution.from_net(mod, state.params, net_type, NX)
    tx = jax.random.uniform(key, (16, 1 + NX))
    np.testing.assert_allclose(np.asarray(sol.value(tx)),
                               np.asarray(jnp.sum(tx, -1, keepdims=True)),
                               atol=0.25)


def test_gradient_short_circuit():
    spec = TrainSpec(net_type="Value", nx=NX, supervise_gradient=True,
                     scaler_cls="FixedLossScaler",
                     scaler_kwargs=(("fixed_weight", 0.0),))
    assert spec.gradient_short_circuit
    spec2 = TrainSpec(net_type="Value", nx=NX, supervise_gradient=True,
                      scaler_cls="FixedLossScaler",
                      scaler_kwargs=(("fixed_weight", 1.0),))
    assert not spec2.gradient_short_circuit


def test_short_circuit_ignores_gradient_targets(key):
    """With fixed_weight 0 the step must not differentiate through jacrev
    (value-only loss, solution_jac.py:120-122)."""
    mod, params = _module_and_params(key, "Value")
    spec = TrainSpec(net_type="Value", nx=NX, supervise_gradient=True,
                     scaler_cls="FixedLossScaler",
                     scaler_kwargs=(("fixed_weight", 0.0),))
    tx = jax.random.uniform(key, (8, 1 + NX))
    y = jnp.concatenate([jnp.ones((8, 1)), jnp.full((8, NX), 1e9)], axis=-1)
    loss, metrics = compute_loss(mod, params, tx, y, spec)
    assert np.isfinite(float(loss))  # the 1e9 gradient targets are unused


def test_hessian_supervision_smoke(key):
    mod, params = _module_and_params(key, "Value")
    spec = TrainSpec(net_type="Value", nx=NX, supervise_gradient=True,
                     supervise_hessian=True, num_hess_samples=4)
    tx = jax.random.uniform(key, (8, 1 + NX))
    y = jnp.zeros((8, 1 + NX + NX * NX))
    loss, metrics = compute_loss(mod, params, tx, y, spec, key=key)
    assert np.isfinite(float(loss))
    assert "train_hessian_loss" in metrics


def test_beta_weighting(key):
    """exp(beta t) weighting: points at larger t dominate the loss."""
    mod, params = _module_and_params(key, "Value")
    spec0 = TrainSpec(net_type="Value", nx=NX, beta=0.0)
    spec5 = TrainSpec(net_type="Value", nx=NX, beta=5.0)
    tx = jnp.concatenate([jnp.ones((4, 1)), jnp.zeros((4, NX))], axis=-1)
    y = jnp.ones((4, 1)) * 10.0
    l0, _ = compute_loss(mod, params, tx, y, spec0)
    l5, _ = compute_loss(mod, params, tx, y, spec5)
    np.testing.assert_allclose(float(l5) / float(l0), np.exp(5.0), rtol=1e-4)


def test_lbfgs_optimizer_trains(key):
    """LBFGS (zoom linesearch) needs value/grad/value_fn at update();
    make_step_body must supply them (reference exposes torch LBFGS via
    TRAIN.OPTIMIZER.cls, solution.py:91-120)."""
    mod, params = _module_and_params(key, "Value")
    spec = TrainSpec(net_type="Value", nx=NX, supervise_gradient=False,
                     scaler_cls="FixedLossScaler",
                     scaler_kwargs=(("fixed_weight", 0.0),))
    tx_opt, nv = make_optimizer(
        {"cls": "LBFGS", "kwargs": {"lr": 1.0}, "SCHEDULER": {"cls": None}})
    assert nv == "lbfgs"
    step = make_train_step(mod, tx_opt, spec, nv, donate=False)
    state = TrainState.create(params, tx_opt)
    k = jax.random.fold_in(key, 1)
    tx = jax.random.normal(k, (64, 1 + NX))
    y = jnp.sum(tx, axis=-1, keepdims=True)
    losses = []
    for i in range(20):
        state, m = step(state, tx, y, jax.random.fold_in(k, i))
        losses.append(float(m["train_loss"]))
    assert losses[-1] < losses[0]


def test_lr_schedule_fn_matches_make_optimizer_mapping():
    """lr logging (LearningRateMonitor parity) mirrors the scheduler
    mapping used by make_optimizer."""
    import math

    from deeppicarditeration_tpu.training.trainer import lr_schedule_fn

    # lr_schedule_fn evaluates the SAME optax schedule make_optimizer
    # installs (f32 on device), so comparisons are to float tolerance —
    # the logged lr is the real one by construction
    tol = 1e-6
    base = {"cls": "Adam", "kwargs": {"lr": 0.01}}
    f = lr_schedule_fn({**base, "SCHEDULER": {"cls": None}})
    assert f(0) == f(10_000) == 0.01
    f = lr_schedule_fn({**base, "SCHEDULER": {
        "cls": "StepLR", "kwargs": {"step_size": 10, "gamma": 0.5}}})
    assert (abs(f(9) - 0.01) < tol and abs(f(10) - 0.005) < tol
            and abs(f(25) - 0.0025) < tol)
    f = lr_schedule_fn({**base, "SCHEDULER": {
        "cls": "ExponentialLR", "kwargs": {"gamma": 0.9}}})
    assert abs(f(2) - 0.01 * 0.81) < tol
    f = lr_schedule_fn({**base, "SCHEDULER": {
        "cls": "CosineAnnealingLR", "kwargs": {"T_max": 100}}})
    assert abs(f(0) - 0.01) < tol
    assert abs(f(100)) < tol
    assert abs(f(50) - 0.005) < tol


def test_model_summary_counts_params(key):
    from deeppicarditeration_tpu.training.trainer import model_summary

    mod, params = _module_and_params(key, "Value")
    s = model_summary(mod, params)
    assert "total parameters" in s and "MLP" in s
    import re

    total = int(re.search(r"total parameters: ([\d,]+)",
                          s).group(1).replace(",", ""))
    import jax as _j

    assert total == sum(int(x.size)
                        for x in _j.tree_util.tree_leaves(params))
