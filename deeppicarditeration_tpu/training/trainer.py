"""Supervised-fit engine: optimizer factory + one jitted train step.

Reference parity: PicardBaseSolution.training_step / configure_optimizers
(solution.py:76-120) and the gradient/Hessian-supervised wrappers
(solution_jac.py:113-263). Differences by TPU design:
  - one jitted ``train_step`` with donated (params, opt_state): no
    per-batch Python dispatch, no Lightning;
  - per-sample gradients of Value-type nets come from a single batched vjp
    (see models/solution.py) instead of vmap(jacrev);
  - per-sample Hessians (Hessian supervision) use vmap(hessian) over the
    x-block only (the reference differentiates over full tx and slices,
    solution_jac.py:244-245 — same values, fewer FLOPs).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from deeppicarditeration_tpu.models.solution import (
    ONLY_GRADIENT,
    VALUE,
    VALUE_GRADIENT,
    Solution,
)
from deeppicarditeration_tpu.ops.derivatives import full_hessian
from deeppicarditeration_tpu.training.losses import (
    FixedHessianLossScaler,
    get_scaler,
    make_loss_fn,
)


# ---------------------------------------------------------------------------
# optimizer / scheduler factory (solution.py:91-120)
# ---------------------------------------------------------------------------

_OPTIMIZERS = {
    "Adam": optax.adam,
    "AdamW": optax.adamw,
    "SGD": optax.sgd,
    "RMSprop": optax.rmsprop,
    "LBFGS": optax.lbfgs,
}


def _build_schedule(lr, sched_cls, sched_kwargs):
    """torch-scheduler name -> (optax schedule or constant, plateau flag).

    The ONE place the scheduler mapping lives: make_optimizer feeds the
    result to the optimizer, lr_schedule_fn evaluates the same object for
    logging (so the logged lr can never drift from the real one)."""
    if sched_cls is None or sched_cls == "ReduceLROnPlateau":
        # plateau's multiplier lives in the optimizer STATE, not a schedule
        return lr, sched_cls == "ReduceLROnPlateau"
    if sched_cls == "StepLR":
        return optax.exponential_decay(
            init_value=lr,
            transition_steps=int(sched_kwargs.get("step_size", 1000)),
            decay_rate=float(sched_kwargs.get("gamma", 0.1)),
            staircase=True), False
    if sched_cls == "ExponentialLR":
        return optax.exponential_decay(
            init_value=lr, transition_steps=1,
            decay_rate=float(sched_kwargs.get("gamma", 0.999))), False
    if sched_cls == "CosineAnnealingLR":
        return optax.cosine_decay_schedule(
            init_value=lr,
            decay_steps=int(sched_kwargs.get("T_max", 10_000)),
            alpha=float(sched_kwargs.get("eta_min", 0.0))
            / max(lr, 1e-12)), False
    raise ValueError(f"Unknown scheduler {sched_cls!r}")


def make_optimizer(opt_cfg) -> Tuple[optax.GradientTransformation, object]:
    """Build optax optimizer (+scheduler). Returns (tx, needs_value) where
    needs_value is falsy (nothing extra), "value" (update() wants the loss
    value — ReduceLROnPlateau), or "lbfgs" (update() additionally wants
    grad and value_fn for the zoom linesearch).

    Scheduler mapping from the torch names the reference configs use:
      ReduceLROnPlateau -> optax.contrib.reduce_on_plateau (patience
      default 512 steps, solution.py:99-103); StepLR/ExponentialLR/
      CosineAnnealingLR -> optax schedules, stepped per train step.
    """
    cls = opt_cfg.get("cls", "Adam")
    kwargs = dict(opt_cfg.get("kwargs", {}) or {})
    lr = kwargs.pop("lr", 1e-3)
    if cls == "Adam":
        # torch.optim.Adam accepts weight_decay; optax.adam does not
        kwargs.pop("weight_decay", None)
    sched_cfg = opt_cfg.get("SCHEDULER", {}) or {}
    sched_kwargs = dict(sched_cfg.get("kwargs", {}) or {})
    schedule, needs_value = _build_schedule(lr, sched_cfg.get("cls"),
                                            sched_kwargs)

    if cls not in _OPTIMIZERS:
        raise ValueError(f"Unknown optimizer {cls!r}; known: {sorted(_OPTIMIZERS)}")
    tx = _OPTIMIZERS[cls](learning_rate=schedule, **kwargs)
    if needs_value:
        tx = optax.chain(
            tx,
            optax.contrib.reduce_on_plateau(
                factor=float(sched_kwargs.get("factor", 0.1)),
                patience=int(sched_kwargs.get("patience", 512)),
                atol=float(sched_kwargs.get("threshold", 1e-4)),
            ),
        )
    if cls == "LBFGS":
        # optax.lbfgs's linesearch requires value/grad/value_fn at every
        # update — the shared step body supplies them for this mode
        needs_value = "lbfgs"
    elif needs_value:
        needs_value = "value"
    return tx, needs_value


def lr_schedule_fn(opt_cfg) -> Callable[[int], float]:
    """step -> learning rate, for logging (the reference's
    LearningRateMonitor callback, picard_iteration.py:192-196).

    Evaluates THE SAME schedule object make_optimizer installs (built by
    _build_schedule — no parallel formula to drift). ReduceLROnPlateau's
    multiplier lives in the opt STATE, not the schedule: the step body
    emits it as the ``lr_scale`` train metric and the logging sites
    multiply it in, so the logged lr reflects actual plateau
    reductions."""
    kwargs = dict(opt_cfg.get("kwargs", {}) or {})
    lr = float(kwargs.pop("lr", 1e-3))
    sched_cfg = opt_cfg.get("SCHEDULER", {}) or {}
    schedule, _ = _build_schedule(lr, sched_cfg.get("cls"),
                                  dict(sched_cfg.get("kwargs", {}) or {}))
    if not callable(schedule):
        return lambda s: float(schedule)

    def eval_lr(s):
        # optax schedules are jnp computations: pin the (single-scalar)
        # evaluation to CPU so logging never pays a remote-TPU dispatch +
        # readback (~30 ms each through the tunnel)
        try:
            cpu = jax.devices("cpu")[0]
        except RuntimeError:
            return float(schedule(s))
        with jax.default_device(cpu):
            return float(schedule(s))

    return eval_lr


def model_summary(module, params) -> str:
    """One-line-per-leaf parameter summary + total count (the reference's
    Lightning ModelSummary callback, picard_iteration.py:192-196)."""
    lines = [f"model: {type(module).__name__}"]
    total = 0
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, leaf in flat:
        n = int(jnp.size(leaf))
        total += n
        name = "/".join(getattr(p, "key", getattr(p, "name", str(p)))
                        for p in path)
        lines.append(f"  {name}: {tuple(jnp.shape(leaf))} = {n:,}")
    lines.append(f"total parameters: {total:,} "
                 f"({total * 4 / 2 ** 20:.2f} MB f32)")
    return "\n".join(lines)


# ---------------------------------------------------------------------------
# train state + step
# ---------------------------------------------------------------------------

_OPT_INIT_CACHE: Dict = {}


def jit_opt_init(tx: optax.GradientTransformation):
    """Cached jitted optimizer init (eager optax init is one dispatch per
    pytree leaf — costly through the remote-TPU tunnel when re-run every
    Picard iteration / DBDP timestep)."""
    init = _OPT_INIT_CACHE.get(tx)
    if init is None:  # keyed on tx itself (hashable namedtuple of fns;
        # an id() key could alias a new object after GC)
        init = _OPT_INIT_CACHE[tx] = jax.jit(tx.init)
    return init


@struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray

    @classmethod
    def create(cls, params, tx: optax.GradientTransformation):
        return cls(params=params, opt_state=jit_opt_init(tx)(params),
                   step=jnp.zeros((), jnp.int32))


@dataclasses.dataclass(frozen=True)
class TrainSpec:
    """Static training-step description (hashable; closed over in jit)."""

    net_type: str = VALUE
    nx: int = 1
    supervise_gradient: bool = False
    supervise_hessian: bool = False
    beta: float = 0.0
    scaler_cls: Optional[str] = None
    scaler_kwargs: tuple = ()
    loss_fn_cls: Optional[str] = None
    loss_fn_kwargs: tuple = ()
    use_aux_loss: bool = False
    weight_aux_loss: float = 0.1
    num_hess_samples: int = -1

    @classmethod
    def from_cfg(cls, cfg, nx: int) -> "TrainSpec":
        t = cfg.TRAIN
        return cls(
            net_type=cfg.NETWORK.TYPE,
            nx=nx,
            supervise_gradient=bool(t.SUPERVISE_GRADIENT),
            supervise_hessian=bool(t.SUPERVISE_HESSIAN),
            beta=float(t.LOSS.beta),
            scaler_cls=t.LOSS.SCALER.cls,
            scaler_kwargs=tuple(sorted((t.LOSS.SCALER.kwargs or {}).items())),
            loss_fn_cls=t.LOSS.FN.cls,
            loss_fn_kwargs=tuple(sorted((t.LOSS.FN.kwargs or {}).items())),
            use_aux_loss=bool(t.LOSS.use_aux_loss),
            weight_aux_loss=float(t.LOSS.weight_aux_loss),
            num_hess_samples=int(t.NUM_HESS_SAMPLES),
        )

    @property
    def effective_scaler(self):
        if self.supervise_hessian and self.scaler_cls is None:
            return FixedHessianLossScaler(1.0, 1.0)
        return get_scaler(self.scaler_cls, **dict(self.scaler_kwargs))

    @property
    def gradient_short_circuit(self) -> bool:
        """FixedLossScaler with weight ~ 0 trains the plain value loss
        (solution_jac.py:120-122)."""
        if self.supervise_hessian or not self.supervise_gradient:
            return False
        if self.scaler_cls == "FixedLossScaler":
            w = dict(self.scaler_kwargs).get("fixed_weight", 1.0)
            return (w is not None and float(w) <= 1e-9
                    and self.net_type == VALUE)
        return False


def compute_loss(module, params, tx, y, spec: TrainSpec, key=None):
    """Loss + metrics for one batch; pure in (params, batch)."""
    sol = Solution.from_net(module, params, spec.net_type, spec.nx)
    lfn = make_loss_fn(spec.loss_fn_cls, **dict(spec.loss_fn_kwargs))
    weight = jnp.exp(tx[:, 0:1] * spec.beta)
    nx = spec.nx
    metrics: Dict[str, jnp.ndarray] = {}

    if spec.supervise_hessian:
        # value + gradient + Hessian supervision (solution_jac.py:221-260)
        y_u, y_ux = y[:, 0:1], y[:, 1:1 + nx]
        y_uh = y[:, 1 + nx:1 + nx + nx * nx]
        u, g_tx = sol.value_and_grad_tx(tx)
        u_x = g_tx[:, 1:]
        v_loss = jnp.mean(weight * lfn(u - y_u))
        g_vec = jnp.mean(weight * lfn(u_x - y_ux), axis=0)
        t, x = tx[:, 0:1], tx[:, 1:]
        u_hess = full_hessian(sol, t, x).reshape(tx.shape[0], nx * nx)
        diff = u_hess - y_uh
        if spec.num_hess_samples > 0:
            assert key is not None
            idx = jax.random.choice(key, nx * nx,
                                    (spec.num_hess_samples,), replace=False)
            diff = jnp.take(diff, idx, axis=1)
        h_vec = jnp.mean(weight * lfn(diff), axis=0)
        loss, info = spec.effective_scaler.scale_g_h(v_loss, g_vec, h_vec)
        metrics.update(info)
        metrics.update(train_value_loss=v_loss,
                       train_gradient_loss=jnp.mean(g_vec),
                       train_hessian_loss=jnp.mean(h_vec))
    elif spec.supervise_gradient and not spec.gradient_short_circuit:
        y_u, y_ux = y[:, 0:1], y[:, 1:1 + nx]
        aux_loss = None
        if spec.net_type == ONLY_GRADIENT:
            u_x = sol(tx)
            v_loss = jnp.zeros(())
        elif spec.net_type == VALUE_GRADIENT:
            out = sol(tx)
            u, u_x = out[:, 0:1], out[:, 1:]
            if spec.use_aux_loss:
                # consistency between the gradient head and the autodiff
                # gradient of the value head (solution_jac.py:141-144)
                _, g_tx = sol.value_and_grad_tx(tx)
                aux_loss = jnp.mean(lfn(g_tx[:, 1:] - u_x), axis=0)
            v_loss = jnp.mean(weight * lfn(u - y_u))
        else:  # VALUE: per-sample gradient via one batched vjp
            u, g_tx = sol.value_and_grad_tx(tx)
            u_x = g_tx[:, 1:]
            v_loss = jnp.mean(weight * lfn(u - y_u))
        g_vec = jnp.mean(weight * lfn(u_x - y_ux), axis=0)
        if aux_loss is not None:
            g_vec = g_vec + spec.weight_aux_loss * aux_loss
            metrics["aux_loss"] = jnp.mean(aux_loss)
        loss, info = spec.effective_scaler.scale(v_loss, g_vec)
        metrics.update(info)
        metrics["train_value_loss"] = v_loss
    else:
        # plain value regression (solution.py:76-82)
        y_u = y[:, 0:1]
        u = sol.value(tx)
        loss = jnp.mean(weight * lfn(u - y_u))
        metrics["train_value_loss"] = loss
    metrics["train_loss"] = loss
    return loss, metrics


def make_step_body(module, tx_opt: optax.GradientTransformation,
                   spec: TrainSpec, needs_value=False) -> Callable:
    """The canonical unjitted train-step body
    (state, tx_batch, y_batch, key) -> (state, metrics) — the single
    definition shared by make_train_step and the fused multi-step /
    epoch-scan wrappers in training/picard.py. ``needs_value`` is the
    mode returned by make_optimizer."""

    def body(state: TrainState, tx, y, key):
        def loss_of(p):
            return compute_loss(module, p, tx, y, spec, key)

        (loss, metrics), grads = jax.value_and_grad(
            loss_of, has_aux=True)(state.params)
        extra = {}
        if needs_value:
            extra["value"] = loss
        if needs_value == "lbfgs":
            extra["grad"] = grads
            extra["value_fn"] = lambda p: loss_of(p)[0]
        updates, opt_state = tx_opt.update(grads, state.opt_state,
                                           state.params, **extra)
        params = optax.apply_updates(state.params, updates)
        if needs_value == "value":
            # ReduceLROnPlateau's multiplier lives in the optimizer STATE
            # (the chain's last element), not in any schedule — surface it
            # so the logged lr reflects an actual plateau reduction. Rides
            # the metric outputs of every (fused or not) training path.
            metrics["lr_scale"] = opt_state[-1].scale
        return (TrainState(params=params, opt_state=opt_state,
                           step=state.step + 1), metrics)

    return body


def make_train_step(module, tx_opt: optax.GradientTransformation,
                    spec: TrainSpec, needs_value=False,
                    donate: bool = True) -> Callable:
    """Build the jitted train step: (state, tx_batch, y_batch, key) -> ..."""
    body = make_step_body(module, tx_opt, spec, needs_value)
    return jax.jit(body, donate_argnums=(0,) if donate else ())
