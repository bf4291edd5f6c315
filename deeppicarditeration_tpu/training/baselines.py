"""Baseline solvers: PINN-HTE, D-DBSDE (Diffusion), DBDP (FullyNonlinear).

Reference parity: solution.py:349-893, dispatched by METHOD.cls
(picard_iteration.py:253-264). All three are re-designed around jitted
steps and lax.scan rollouts (the only time-stepped SDE simulation in the
framework, survey §3.1).
"""

from __future__ import annotations

import json
import math
import time
from functools import partial

import jax
import jax.numpy as jnp
import optax

from deeppicarditeration_tpu.models.factory import (
    init_solution,
    is_enforce_terminal,
)
from deeppicarditeration_tpu.models.networks import MLP
from deeppicarditeration_tpu.models.solution import Solution
from deeppicarditeration_tpu.ops.derivatives import (
    diag_hessian_entries,
    exact_laplacian,
    full_hessian,
    hutchinson_laplacian,
)
from deeppicarditeration_tpu.parallel.distributed import is_primary
from deeppicarditeration_tpu.training import checkpoint as ckpt
from deeppicarditeration_tpu.training.trainer import jit_opt_init


def _shard(runner, *arrays):
    """Constrain sampled (B, ...) batches to the runner's mesh data axis.

    The baselines sample their own collocation batches inside the jitted
    loss, so sharding is a constraint on those draws (threefry is
    partitionable — each device materializes only its slice) plus
    replicated params; XLA then psums the gradients over ICI exactly like
    the Picard path. The loss is a mean over points, so sharded ==
    single-device up to reduction reassociation (tested)."""
    shd = runner.sharding
    out = tuple(jax.lax.with_sharding_constraint(a, shd) for a in arrays)
    return out if len(out) > 1 else out[0]


def run_baseline(runner, key):
    method = runner.cfg.METHOD.cls
    if method == "PINN":
        return train_pinn(runner, key)
    if method == "Diffusion":
        return train_diffusion(runner, key)
    if method == "FullyNonlinearSolver":
        return train_dbdp(runner, key)
    raise ValueError(f"Unknown baseline {method!r}")


# ---------------------------------------------------------------------------
# PINN-HTE (solution.py:349-520)
# ---------------------------------------------------------------------------

def _pinn_residual(eq, sol: Solution, t, x, key, sdgd_v, num_v_samples):
    """PDE residual at (t, x) with the configured Laplacian estimator."""
    tx = jnp.concatenate([t, x], axis=-1)
    u, g_tx = sol.value_and_grad_tx(tx)
    u_t, u_x = g_tx[:, 0:1], g_tx[:, 1:]
    if eq.has_hessian_term:
        if sdgd_v:
            # WITHOUT replacement (torch.multinomial(ones, v),
            # solution.py:439) — unlike the data-generation SDGD draw,
            # which the reference makes WITH replacement (data.py:501)
            idx = jax.vmap(
                lambda kk: jax.random.permutation(kk, eq.nx)[:sdgd_v]
            )(jax.random.split(key, t.shape[0])).astype(jnp.int32)
            u_ii = diag_hessian_entries(sol, t, x, idx)
        else:
            hess = full_hessian(sol, t, x)
            u_ii = jnp.diagonal(hess, axis1=-2, axis2=-1)
        return eq.pinn_function(t, x, u, u_t, u_x, u_ii)
    if num_v_samples and num_v_samples > 0:
        lap = hutchinson_laplacian(key, sol, t, x, num_v_samples)
    else:
        lap = exact_laplacian(sol, t, x)
    return eq.pinn_function(t, x, u, u_t, u_x, lap)


def train_pinn(runner, key):
    """PINN with Hutchinson-trace or SDGD Hessian sampling.

    Fixed Adam lr=1e-3 as in the reference (solution.py:352-355); terminal
    penalty beta unless the ansatz enforces the terminal condition."""
    cfg, eq = runner.cfg, runner.equation
    sol0 = init_solution(jax.random.fold_in(key, 0), cfg, eq,
                         module=runner.module)
    enforce = is_enforce_terminal(cfg)
    terminal_weight = 0.0 if enforce else float(cfg.TRAIN.LOSS.beta)
    sdgd_v = None
    if cfg.DATA.HESSIAN_APPROXIMATION.method == "SDGD":
        v = (cfg.DATA.HESSIAN_APPROXIMATION.kwargs or {}).get("v")
        if v is None:
            raise ValueError(
                "DATA.HESSIAN_APPROXIMATION.method is SDGD but "
                "DATA.HESSIAN_APPROXIMATION.kwargs.v is not set")
        sdgd_v = int(v)
    num_v = int(cfg.METHOD.num_v_samples)
    bs = int(cfg.TRAIN.BATCH_SIZE)
    tx_opt = optax.adam(1e-3)

    def loss_fn(params, k):
        sol = Solution.from_net(runner.module, params, runner.net_type, eq.nx)
        kt, kx, kr, kT = jax.random.split(k, 4)
        t = eq.T * jax.random.uniform(kt, (bs, 1))
        x = eq.sample_x(kx, t)
        t, x = _shard(runner, t, x)
        res = _pinn_residual(eq, sol, t, x, kr, sdgd_v, num_v)
        loss = jnp.mean(res ** 2)
        if terminal_weight > 0.0:
            T = jnp.full((bs, 1), eq.T)
            xT = _shard(runner, eq.sample_x(kT, T))
            uT = sol.value(jnp.concatenate([T, xT], axis=-1))
            loss = loss + terminal_weight * jnp.mean((uT - eq.g(xT)) ** 2)
        return loss

    def step(params, opt_state, k):
        loss, grads = jax.value_and_grad(loss_fn)(params, k)
        updates, opt_state = tx_opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    params, opt_state = sol0.params, jit_opt_init(tx_opt)(sol0.params)
    _baseline_loop(runner, key, step, params, opt_state,
                   n_epochs=int(cfg.TRAIN.N_EPOCHS), tag="pinn")


# ---------------------------------------------------------------------------
# D-DBSDE / Diffusion (solution.py:523-658)
# ---------------------------------------------------------------------------

def train_diffusion(runner, key):
    """K-step Euler rollout + BSDE martingale-residual loss.

    v_T ~ v_0 - sum f dt + sum <grad v, dX> (solution.py:601-616); the
    rollout replaces the reference's Python k-loop (:591-595) with the
    CLOSED-FORM Brownian path (one draw + cumsum, ops/rollout.py) —
    exact for the drift-free transitions this framework supports."""
    from deeppicarditeration_tpu.ops.rollout import brownian_paths

    cfg, eq = runner.cfg, runner.equation
    sol0 = init_solution(jax.random.fold_in(key, 0), cfg, eq,
                         module=runner.module)
    enforce = is_enforce_terminal(cfg)
    terminal_weight = 0.0 if enforce else float(cfg.TRAIN.LOSS.beta)
    K = int(cfg.METHOD.K)
    dt = float(cfg.METHOD.dt)
    bs = int(cfg.TRAIN.BATCH_SIZE)
    use_pallas = bool(cfg.DATA.TPU.PALLAS_ROLLOUT)
    tx_opt = optax.adam(1e-3)

    def rollout(k, t0, x0):
        """(K+1, B) times/states, with the tail-shrunk dt when
        t0 + K dt > T (solution.py:586-589)."""
        dts = jnp.where(t0 + K * dt <= eq.T, dt, (eq.T - t0) / K)  # (B,1)
        ts, xs, _ = brownian_paths(k, eq, t0, x0, dts, K,
                                   use_pallas=use_pallas)
        return ts, xs, dts

    def loss_fn(params, k):
        sol = Solution.from_net(runner.module, params, runner.net_type, eq.nx)
        kt, kx, kw, kT = jax.random.split(k, 4)
        t0 = eq.T * jax.random.uniform(kt, (bs, 1))
        x0 = eq.sample_x(kx, t0)
        t0, x0 = _shard(runner, t0, x0)
        ts, xs, dts = rollout(kw, t0, x0)  # (K+1, B, .)
        v, v_grad = sol.value_and_grad_x(ts, xs)  # (K+1, B, 1/nx)
        if eq.has_gradient_term:
            fs = eq.ff(ts, xs, v, v_grad)
        else:
            fs = eq.f(ts, xs, v)
        dxs = jnp.diff(xs, axis=0)  # (K, B, nx)
        v_pred = (v[0] - jnp.sum(fs[:-1] * dts[None], axis=0)
                  + jnp.sum(jnp.sum(v_grad[:-1] * dxs, axis=-1,
                                    keepdims=True), axis=0))
        loss = jnp.mean((v[-1] - v_pred) ** 2)
        if terminal_weight > 0.0:
            T = jnp.full((bs, 1), eq.T)
            xT = _shard(runner, eq.sample_x(kT, T))
            uT = sol.value(jnp.concatenate([T, xT], axis=-1))
            loss = loss + terminal_weight * jnp.mean((uT - eq.g(xT)) ** 2)
        return loss

    def step(params, opt_state, k):
        loss, grads = jax.value_and_grad(loss_fn)(params, k)
        updates, opt_state = tx_opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    params, opt_state = sol0.params, jit_opt_init(tx_opt)(sol0.params)
    _baseline_loop(runner, key, step, params, opt_state,
                   n_epochs=int(cfg.TRAIN.N_EPOCHS), tag="diffusion")


# ---------------------------------------------------------------------------
# DBDP / FullyNonlinearSolver (solution.py:661-893, arXiv:1908.00412)
# ---------------------------------------------------------------------------

def _dbdp_modules(cfg, eq):
    """Per-timestep value / gradient nets taking x only; the terminal
    anchor g + (T - t_k) net(x) is applied functionally per step
    (MLPEnforceTerminal, solution.py:661-694)."""
    neurons = tuple(cfg.NETWORK.NEURONS)
    acts = tuple(cfg.NETWORK.ACTIVATIONS)
    bound = cfg.NETWORK.BOUND
    u_mod = MLP(neurons=neurons, activations=acts, out_dim=1, bound=bound)
    g_mod = MLP(neurons=neurons, activations=acts, out_dim=eq.nx, bound=bound)
    return u_mod, g_mod


def train_dbdp(runner, key):
    """Backward DBDP sweep with per-timestep net pairs.

    All K+1 net pairs live as stacked parameter pytrees (one leaf per
    layer with a leading (K+1,) axis) — indexing with k replaces the
    reference's list of modules (solution.py:712-731); the warm start
    net_{k-1} <- net_k is an indexed copy."""
    cfg, eq = runner.cfg, runner.equation
    K = round(eq.T / float(cfg.METHOD.dt))
    dt = eq.T / K
    num_sub_iter = int(cfg.METHOD.num_sub_iter)
    bs = int(cfg.TRAIN.BATCH_SIZE)
    enforce = is_enforce_terminal(cfg)
    u_mod, g_mod = _dbdp_modules(cfg, eq)
    x0_shape = jnp.zeros((1, eq.nx))

    def init_pair(k):
        ku, kg = jax.random.split(k)
        return (u_mod.init(ku, x0_shape), g_mod.init(kg, x0_shape))

    pairs = [init_pair(jax.random.fold_in(key, 1000 + kk))
             for kk in range(K + 1)]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *pairs)
    stacked = jax.device_put(stacked, runner.repl)  # dp over the mesh
    ts_grid = jnp.arange(K + 1) * dt

    def u_at(params_k, t_k, x):
        return eq.g(x) + (eq.T - t_k) * u_mod.apply(params_k, x)

    def ux_at(params_k, t_k, x):
        return eq.g_x(x) + (eq.T - t_k) * g_mod.apply(params_k, x)

    def sample_paths(k):
        """(B, K+1) Euler path + scaled increments (solution.py:744-760)
        via the closed-form Brownian path (ops/rollout.py)."""
        from deeppicarditeration_tpu.ops.rollout import brownian_paths

        from jax.sharding import NamedSharding, PartitionSpec as P

        x = _shard(runner, eq.sample_x0(jax.random.fold_in(k, 0), bs))
        t = jnp.zeros((bs, 1))
        dts = jnp.full((bs, 1), dt, x.dtype)
        _, xs, xi = brownian_paths(
            jax.random.fold_in(k, 1), eq, t, x, dts, K,
            use_pallas=bool(cfg.DATA.TPU.PALLAS_ROLLOUT))
        # paths are (K+1, B, nx): keep B on the mesh data axis
        path_shd = NamedSharding(runner.mesh, P(None, "data"))
        xs = jax.lax.with_sharding_constraint(xs, path_shd)
        xi = jax.lax.with_sharding_constraint(xi, path_shd)
        return xs, xi * math.sqrt(dt)  # (K+1, B, nx), (K, B, nx)

    def one_step_loss(pair_prev, pair_next, t_prev, t_next, x, x_next, dW,
                      is_last):
        u_params, g_params = pair_prev
        un_params, gn_params = pair_next
        u = u_at(u_params, t_prev, x)
        u_x = ux_at(g_params, t_prev, x)
        if enforce:
            u_next = jnp.where(is_last, eq.g(x_next),
                               u_at(un_params, t_next, x_next))
        else:
            u_next = u_at(un_params, t_next, x_next)

        # Hess u_{k}(x_next): per-sample jacobian of the next gradient net
        def gnet(xx):
            if enforce:
                return jnp.where(is_last, eq.g_x(xx[None])[0],
                                 ux_at(gn_params, t_next, xx[None])[0])
            return ux_at(gn_params, t_next, xx[None])[0]

        hess = jax.vmap(jax.jacrev(gnet))(x_next)  # (B, nx, nx)
        f_hat = eq.ffh(t_prev, x, u, u_x, jax.lax.stop_gradient(hess))
        F = (u - f_hat * dt
             + jnp.sum(u_x * eq.alpha_sqrt * dW, axis=-1, keepdims=True))
        return jnp.mean((jax.lax.stop_gradient(u_next) - F) ** 2)

    tx_opt = optax.adam(1e-3)

    def pair_at(stacked_params, kk):
        return jax.tree_util.tree_map(lambda a: a[kk], stacked_params)

    def substep_k(k_rng, pair_prev, opt_state, pair_next, kk, is_last):
        xs, dWs = sample_paths(k_rng)
        x = xs[kk - 1]
        x_next = xs[kk]
        dW = dWs[kk - 1]
        t_prev = ts_grid[kk - 1] * jnp.ones((bs, 1))
        t_next = ts_grid[kk] * jnp.ones((bs, 1))

        def loss_of(p):
            return one_step_loss(p, pair_next, t_prev, t_next, x, x_next,
                                 dW, is_last)

        loss, grads = jax.value_and_grad(loss_of)(pair_prev)
        updates, opt_state = tx_opt.update(grads, opt_state, pair_prev)
        return optax.apply_updates(pair_prev, updates), opt_state, loss

    @partial(jax.jit, donate_argnums=(1, 2))
    def substeps_k(kkk, pair_prev, opt_state, pair_next, kk, is_last):
        """All num_sub_iter Adam steps at timestep kk in one dispatch;
        per-sub-iter RNG fold_in(kkk, it) exactly as the unfused loop.
        kk/is_last stay TRACED (dynamic gather) so the whole backward
        sweep compiles once, not K times."""
        def body(carry, it):
            p, o = carry
            p, o, loss = substep_k(jax.random.fold_in(kkk, it), p, o,
                                   pair_next, kk, is_last)
            return (p, o), loss

        (pair_prev, opt_state), losses = jax.lax.scan(
            body, (pair_prev, opt_state), jnp.arange(num_sub_iter))
        return pair_prev, opt_state, losses[-1]

    # terminal pre-fit when not enforcing (solution.py:810-823)
    def terminal_fit_step(k_rng, pair, opt_state):
        xs, _ = sample_paths(k_rng)
        x = xs[-1]

        def loss_of(p):
            u_params, g_params = p
            u = u_at(u_params, ts_grid[K], x)
            u_x = ux_at(g_params, ts_grid[K], x)
            return (jnp.mean((u - eq.g(x)) ** 2)
                    + dt * jnp.mean((u_x - eq.g_x(x)) ** 2))

        loss, grads = jax.value_and_grad(loss_of)(pair)
        updates, opt_state = tx_opt.update(grads, opt_state, pair)
        return optax.apply_updates(pair, updates), opt_state, loss

    @partial(jax.jit, donate_argnums=(1, 2))
    def terminal_fit(kep, pair, opt_state):
        def body(carry, it):
            p, o = carry
            p, o, loss = terminal_fit_step(jax.random.fold_in(kep, it), p, o)
            return (p, o), loss

        (pair, opt_state), losses = jax.lax.scan(
            body, (pair, opt_state), jnp.arange(num_sub_iter))
        return pair, opt_state, losses[-1]

    eval_grid = _make_dbdp_eval(u_mod, ts_grid, K, eq)

    n_epochs = int(cfg.TRAIN.N_EPOCHS)
    # ONE persistent Adam state per timestep pair, kept across epochs —
    # the reference builds optimizer_list once (solution.py:712-731), so
    # at epoch 2+ each timestep's moments continue rather than restart
    opt0 = jit_opt_init(tx_opt)(pair_at(stacked, 0))
    stacked_opt = jax.tree_util.tree_map(
        lambda a: jnp.stack([a] * (K + 1)), opt0)

    def opt_at(kk):
        return jax.tree_util.tree_map(lambda a: a[kk], stacked_opt)

    step_counter = 0
    pending = []  # per-timestep (kk, step, loss, eval) device values
    runner.progress.start_iteration(runner.i, n_epochs * K)
    t_start = time.perf_counter()
    wall0 = 0.0  # wall at the previous epoch's readback barrier
    for epoch in range(n_epochs):
        kep = jax.random.fold_in(key, 31 + epoch)
        if not enforce:
            pair = pair_at(stacked, K)
            pair, opt_state, loss = terminal_fit(kep, pair, opt_at(K))
            stacked = jax.tree_util.tree_map(
                lambda a, b: a.at[K].set(b), stacked, pair)
            stacked_opt = jax.tree_util.tree_map(
                lambda a, b: a.at[K].set(b), stacked_opt, opt_state)
        for kk in range(K, 0, -1):
            if kk < K:  # warm start from step k (solution.py:829-831)
                stacked = jax.tree_util.tree_map(
                    lambda a: a.at[kk - 1].set(a[kk]), stacked)
            pair_prev = pair_at(stacked, kk - 1)
            pair_next = pair_at(stacked, kk)
            kkk = jax.random.fold_in(kep, kk)
            pair_prev, opt_state, loss = substeps_k(
                kkk, pair_prev, opt_at(kk - 1), pair_next, jnp.asarray(kk),
                jnp.asarray(kk == K))
            stacked = jax.tree_util.tree_map(
                lambda a, b: a.at[kk - 1].set(b), stacked, pair_prev)
            stacked_opt = jax.tree_util.tree_map(
                lambda a, b: a.at[kk - 1].set(b), stacked_opt, opt_state)
            step_counter += num_sub_iter
            # defer loss/eval readbacks: each float()/eval fetch here is a
            # blocking tunnel round trip x K timesteps; collect device
            # values and fetch them in ONE device_get after the sweep
            em = (eval_grid(stacked, jax.random.fold_in(kkk, 777))
                  if eq.has_exact_solution else None)
            pending.append((kk, step_counter, loss, em))
            runner.progress.update_train(epoch * K + (K - kk + 1), None)
        fetched = jax.device_get(pending)
        # dispatch-time walls under-report by up to a full epoch of async
        # device compute (the device_get above is the real barrier):
        # interpolate per-timestep walls between the previous and current
        # readback barriers so eval-vs-wall-time curves stay honest
        wall1 = time.perf_counter() - t_start
        for idx, (kk, sc, loss_f, em) in enumerate(fetched):
            wall = wall0 + (wall1 - wall0) * (idx + 1) / len(fetched)
            runner.logger.log({"loss": float(loss_f), "k": int(kk),
                               "epoch": epoch, "wall_time": float(wall)},
                              int(sc), context="dbdp")
            if em is not None:
                runner.logger.log({k: float(v) for k, v in em.items()},
                                  int(sc), context="eval")
        wall0 = wall1
        pending.clear()
        # per-epoch periodic save (async) so a killed multi-epoch sweep
        # keeps its last full backward pass (solution.py:520 parity).
        # A SEPARATE path, never model_{i}: a mid-run model_{i} would
        # make PicardRunner._maybe_resume try to restore the stacked
        # pair pytree into the single-net template and crash.
        ckpt.save_params(_baseline_state_paths(runner)[0], stacked)
    # persist the stacked nets
    ckpt.save_params(ckpt.ckpt_path(runner.exp_dir, runner.i), stacked)
    # a single u(t, x) view over the per-timestep nets (nearest grid time,
    # how the reference evaluates its net list, solution.py:856-886) so
    # runner.u_current / eval_solution see the trained DBDP solution
    # instead of the initial zero solution
    runner.u_current = Solution.from_net(
        _DBDPGridModule(u_mod, ts_grid, K, dt, eq), stacked, "Value", eq.nx)
    return stacked


class _DBDPGridModule:
    """Module-like view of the stacked DBDP nets: u(t, x) evaluates the
    value net at the nearest time-grid index (EnforceTerminal form
    g(x) + (T - t_k) NN_k(x)). Used only for evaluation — cost is one
    pass per grid net, gathered per sample."""

    __slots__ = ("u_mod", "ts_grid", "K", "dt", "eq")

    def __init__(self, u_mod, ts_grid, K, dt, eq):
        self.u_mod, self.ts_grid = u_mod, ts_grid
        self.K, self.dt, self.eq = K, dt, eq

    def apply(self, stacked, tx):
        t, x = tx[..., 0:1], tx[..., 1:]
        kk = jnp.clip(jnp.round(t / self.dt).astype(jnp.int32), 0, self.K)

        def per_k(pair_k, t_k):
            return (self.eq.g(x)
                    + (self.eq.T - t_k) * self.u_mod.apply(pair_k[0], x))

        us = jax.vmap(per_k)(stacked, self.ts_grid)  # (K+1, B, 1)
        return jnp.take_along_axis(us, kk[None], axis=0)[0]


def _make_dbdp_eval(u_mod, ts_grid, K, eq, n: int = 100):
    """Value metrics across the whole time grid in ONE jitted dispatch
    (the reference's per-timestep Python loop, solution.py:856-886, would
    cost (K+1) round trips per eval through a remote TPU)."""
    from deeppicarditeration_tpu.evaluation.metrics import value_metrics

    @jax.jit
    def eval_grid(stacked, key):
        def per_k(params_k, t_k, k_rng):
            t_eval = jnp.full((n, 1), t_k)
            x_eval = eq.sample_x(k_rng, t_eval)
            u = eq.g(x_eval) + (eq.T - t_k) * u_mod.apply(params_k[0],
                                                          x_eval)
            return u, eq.exact_solution(t_eval, x_eval)

        keys = jax.vmap(lambda kk: jax.random.fold_in(key, kk))(
            jnp.arange(K + 1))
        us, exacts = jax.vmap(per_k)(stacked, ts_grid, keys)
        return value_metrics(us.reshape(-1, 1), exacts.reshape(-1, 1))

    # returns DEVICE scalars — the caller batches the host readback (one
    # device_get per epoch, not per timestep)
    return eval_grid


# ---------------------------------------------------------------------------
# shared epoch loop for PINN / Diffusion
# ---------------------------------------------------------------------------

def _baseline_state_paths(runner):
    state_path = (runner.exp_dir / f"baseline_{runner.i}_state").absolute()
    meta_path = runner.exp_dir / f"baseline_{runner.i}_meta.json"
    return state_path, meta_path


def _baseline_loop(runner, key, step, params, opt_state, n_epochs, tag):
    """Run ``step`` for n_epochs, fused into one jitted lax.scan dispatch
    per log interval (epoch-by-epoch dispatch through a ~30 ms-latency
    remote-TPU path would dominate the wall clock). The per-epoch RNG is
    fold_in(key, epoch) exactly as the unfused loop produced, so loss
    trajectories are bitwise independent of the chunking.

    Reference parity beyond the final checkpoint (solution.py:479-520,
    632-645): every log interval saves a periodic {params, opt} state +
    epoch sidecar (async orbax) and logs cumulative wall time; a killed
    run restarted with RESUME: true continues from the last periodic save
    with the optimizer moments intact — the per-epoch RNG makes the
    continuation bitwise-equal to an uninterrupted run (tested)."""
    cfg, eq = runner.cfg, runner.equation
    log_interval = int(cfg.EVAL.FREQ or 100)
    params = jax.device_put(params, runner.repl)
    opt_state = jax.device_put(opt_state, runner.repl)

    state_path, meta_path = _baseline_state_paths(runner)
    start, wall_base = 0, 0.0
    if cfg.RESUME and meta_path.exists():
        # stage 1: the meta sidecar — read ALL resume inputs before
        # touching params/opt_state so a failure can never leave a
        # half-restored mixture (restored weights + epoch-0 keys is
        # neither a resume nor a fresh run)
        meta_ok = False
        try:
            meta = json.loads(meta_path.read_text())
            start_new = int(meta["epoch"])
            wall_new = float(meta.get("wall_time", 0.0))
            meta_ok = True
        except Exception as e:
            print(f"RESUME: periodic {tag} meta unusable ({e!r}); "
                  "starting fresh")
        # stage 2: the state itself — distinguish a torn/missing write
        # (start fresh) from a READABLE state that no longer matches the
        # current model/optimizer (code or config change since the save):
        # silently restarting from epoch 0 would mask the latter. The
        # probe restores without a template, so the verdict does not
        # depend on orbax error-message wording.
        if meta_ok:
            state = None
            try:
                # try narrowed to the restore itself: a failure AFTER it
                # (device_put OOM, transient RPC) must not be classified
                # as a structural mismatch telling the user to delete a
                # good checkpoint
                state = ckpt.load_params(state_path, {"params": params,
                                                      "opt": opt_state})
            except Exception as e:
                if ckpt.is_readable(state_path):
                    raise RuntimeError(
                        f"RESUME: periodic {tag} state at {state_path} "
                        "does not match the current model/optimizer "
                        "structure (code or config changed since it was "
                        "written); delete it to start fresh") from e
                print(f"RESUME: periodic {tag} state unusable ({e!r}); "
                      "starting fresh")
                start, wall_base = 0, 0.0
            if state is not None:
                params = jax.device_put(state["params"], runner.repl)
                opt_state = jax.device_put(state["opt"], runner.repl)
                start, wall_base = start_new, wall_new
                print(f"RESUME: {tag} baseline from epoch {start} "
                      f"({runner.exp_dir})")

    # oracle eval traced into the chunk jit (same fusion as the Picard
    # path's TRAIN.FUSED): the separate eval_solution dispatch + readback
    # per chunk cost ~0.1 s each through the remote tunnel x hundreds of
    # chunks per baseline budget
    names = eval_fn = None
    if eq.has_exact_solution:
        from deeppicarditeration_tpu.evaluation.evaluator import (
            make_traced_eval,
        )

        names, eval_fn = make_traced_eval(int(cfg.EVAL.L2_N_POINTS),
                                          bool(cfg.EVAL.TEST_GRAD), False)

    @partial(jax.jit, static_argnames=("n",), donate_argnums=(0, 1))
    def run_chunk(params, opt_state, e0, n):
        def body(carry, e):
            p, o = carry
            p, o, loss = step(p, o, jax.random.fold_in(key, e))
            return (p, o), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), e0 + jnp.arange(n))
        if eval_fn is None:
            ev = jnp.zeros((0,))
        else:
            sol = Solution.from_net(runner.module, params,
                                    runner.net_type, eq.nx)
            ev = eval_fn(sol, eq, jax.random.fold_in(key, 900 + e0 + n - 1))
        return params, opt_state, losses[-1], ev

    loss = jnp.zeros(())
    runner.progress.start_iteration(runner.i, n_epochs)
    t_start = time.perf_counter()
    for e0 in range(start, n_epochs, log_interval):
        n = min(log_interval, n_epochs - e0)
        params, opt_state, loss, ev = run_chunk(params, opt_state,
                                                jnp.asarray(e0), n)
        epoch = e0 + n - 1
        # ONE readback for loss + the chunk's eval metric stack
        loss_f, ev_vals = jax.device_get((loss, ev))
        loss_f = float(loss_f)
        wall = wall_base + (time.perf_counter() - t_start)
        runner.progress.update_train(e0 + n, loss_f)
        runner.logger.log({"loss": loss_f, "epoch": epoch,
                           "wall_time": wall}, epoch, context=tag)
        # periodic state; the final model_{i} below stays params-only so
        # evaluators/RELOAD see the same layout as Picard. BLOCKING save,
        # meta written only after the commit: an async overwrite of the
        # single state slot would leave a kill-window where the previous
        # state is deleted, the new one uncommitted, and the meta already
        # points at it — losing every periodic save exactly when needed.
        # (These nets are small; the blocking write is milliseconds.)
        ckpt.save_params(state_path, {"params": params, "opt": opt_state},
                         block=True)
        # the orbax save above is a collective (all processes enter);
        # the meta stamp is plain host IO — primary only
        if is_primary():
            meta_path.write_text(json.dumps({"epoch": e0 + n,
                                             "wall_time": wall}))
        if eval_fn is not None:
            em = {nm: float(v) for nm, v in zip(names, ev_vals)}
            em["wall_time"] = wall
            runner.logger.log(em, epoch, context="eval")
    ckpt.save_params(ckpt.ckpt_path(runner.exp_dir, runner.i), params)
    runner.u_current = Solution.from_net(runner.module, params,
                                         runner.net_type, eq.nx)
    return params
