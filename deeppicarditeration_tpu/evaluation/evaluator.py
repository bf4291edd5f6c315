"""Solution evaluation: oracle comparison + MC self-consistency.

Reference parity:
  - compute_at_t / EvalCallback (utils.py:117-478): sample x ~ law(X_t) on a
    t-grid, compare u / grad u / Hess u against the closed-form oracle;
  - Evaluator.monte_carlo (evaluate.py:58-106): compare the trained network
    at (t, x) = (0, 0) against a fresh Picard MC estimate built FROM that
    same network — a fixed-point residual check with 10^6 samples
    (main.py:31-33).
"""

from __future__ import annotations

from typing import Dict, Optional

import math

import jax
import jax.numpy as jnp

from deeppicarditeration_tpu.evaluation.metrics import grad_metrics, value_metrics
from deeppicarditeration_tpu.models.solution import (
    ONLY_GRADIENT,
    VALUE_GRADIENT,
    Solution,
)
from deeppicarditeration_tpu.ops import estimators as est
from deeppicarditeration_tpu.ops.derivatives import full_hessian


def _eval_batch_fn(test_grad: bool, test_hessian: bool):
    """One jitted (sol, eq, tb, xb) -> prediction/oracle batch.

    Solution and equation are pytree arguments: the net-type / kind
    dispatch below reads their STATIC treedef fields at trace time, so
    one compilation serves a whole run (new params each Picard iteration,
    same treedef) and recompiles only when the ansatz class changes.
    Without this the oracle evaluation (e.g. the HJB per-t GMM
    propagation) runs op-by-op — measured 649 ms/call through the remote
    tunnel vs single-digit ms jitted.
    """
    key = (bool(test_grad), bool(test_hessian))
    fn = _EVAL_BATCH_CACHE.get(key)
    if fn is not None:
        return fn

    @jax.jit
    def run(sol, eq, tb, xb):
        tx = jnp.concatenate([tb, xb], axis=-1)
        if sol.net_type == ONLY_GRADIENT and sol.kind == "net":
            u_pred = jnp.zeros((tb.shape[0], 1), tb.dtype)
            ux_pred = sol(tx)
        elif sol.net_type == VALUE_GRADIENT and sol.kind == "net":
            out = sol(tx)
            u_pred, ux_pred = out[:, 0:1], out[:, 1:]
        else:
            u_pred, g_tx = sol.value_and_grad_tx(tx)
            ux_pred = g_tx[:, 1:]
        out = {"u": u_pred, "u_exact": eq.exact_solution(tb, xb)}
        if test_grad:
            out["g"] = ux_pred
            out["g_exact"] = eq.u_x(tb, xb)
            if test_hessian:
                out["h"] = full_hessian(sol, tb, xb).reshape(tb.shape[0], -1)
                out["h_exact"] = eq.u_hessian(tb, xb).reshape(tb.shape[0], -1)
        return out

    _EVAL_BATCH_CACHE[key] = run
    return run


_EVAL_BATCH_CACHE: Dict = {}


@jax.jit
def _value_and_grad_jit(sol, txb):
    u_pred, g_tx = sol.value_and_grad_tx(txb)
    return u_pred, g_tx[:, 1:]


def _eval_metrics_fn(test_grad: bool, test_hessian: bool):
    """Jitted (cat dict) -> (names, stacked scalars). One device dispatch
    and ONE host readback for the whole metric set — per-metric float()
    conversions each pay the remote-dispatch round trip otherwise."""
    key = ("metrics", bool(test_grad), bool(test_hessian))
    cached = _EVAL_BATCH_CACHE.get(key)
    if cached is not None:
        return cached

    def metrics_dict(cat):
        metrics = value_metrics(cat["u"], cat["u_exact"])
        if test_grad:
            metrics.update(grad_metrics(cat["g"], cat["g_exact"],
                                        prefix="g"))
            if test_hessian:
                metrics.update(grad_metrics(cat["h"], cat["h_exact"],
                                            prefix="h"))
        return metrics

    names: list = []
    jitted = jax.jit(lambda cat: jnp.stack(
        [metrics_dict(cat)[n] for n in names]))

    def wrapped(cat):
        if not names:  # abstract eval discovers the metric names once
            names.extend(sorted(jax.eval_shape(metrics_dict, cat)))
        return names, jitted(cat)

    _EVAL_BATCH_CACHE[key] = wrapped
    return wrapped


def make_traced_eval(n_points: int, test_grad: bool, test_hessian: bool):
    """(names, fn) with fn(sol, eq, key) -> stacked metric values.

    Pure and jit-safe: designed to be traced INTO a larger jitted program
    (the fused train+eval iteration scan in training/picard.py), where
    eval_solution's host-side batching and per-call readback would break
    the dispatch chain (~70 ms/segment through the remote tunnel). Points
    are sampled and metrics reduced exactly as eval_solution does with
    batch_size=None, so the two agree to float tolerance. ``names`` is
    filled at first trace (the same discovery trick as _eval_metrics_fn)
    in sorted order.
    """
    run = _eval_batch_fn(test_grad, test_hessian)
    names: list = []

    def metrics_dict(cat):
        metrics = value_metrics(cat["u"], cat["u_exact"])
        if test_grad:
            metrics.update(grad_metrics(cat["g"], cat["g_exact"],
                                        prefix="g"))
            if test_hessian:
                metrics.update(grad_metrics(cat["h"], cat["h_exact"],
                                            prefix="h"))
        return metrics

    def fn(sol, eq, key):
        t = jnp.linspace(0.0, eq.T, n_points)[:, None]
        x = eq.sample_x(key, t)
        cat = run(sol, eq, t, x)
        if not names:
            names.extend(sorted(jax.eval_shape(metrics_dict, cat)))
        md = metrics_dict(cat)
        return jnp.stack([md[n] for n in names])

    return names, fn


def eval_solution(key, sol: Solution, eq, n_points: int,
                  test_grad: bool = False, test_hessian: bool = False,
                  batch_size: Optional[int] = None) -> Dict[str, float]:
    """Metrics of sol vs the exact solution on a t-linspace grid.

    x is drawn from the law of X_t (utils.py:150, 185). ``batch_size``
    bounds per-chunk memory (EVAL.BATCH_SIZE, utils.py:141-183). The
    whole pipeline (point sampling, per-batch oracle + net evaluation,
    metric reductions) is jitted, ending in a single host readback.
    """
    skey = ("sample", int(n_points))
    sample = _EVAL_BATCH_CACHE.get(skey)
    if sample is None:
        def sample_fn(k, e):
            t = jnp.linspace(0.0, e.T, n_points)[:, None]
            return t, e.sample_x(k, t)

        sample = _EVAL_BATCH_CACHE[skey] = jax.jit(sample_fn)
    t, x = sample(key, eq)
    bs = batch_size or n_points
    run = _eval_batch_fn(test_grad, test_hessian)
    batches = [run(sol, eq, t[i:i + bs], x[i:i + bs])
               for i in range(0, n_points, bs)]
    cat = {k: (jnp.concatenate([b[k] for b in batches])
               if len(batches) > 1 else batches[0][k])
           for k in batches[0]}
    names, vals = _eval_metrics_fn(test_grad, test_hessian)(cat)
    vals = jax.device_get(vals)
    return {n: float(v) for n, v in zip(names, vals)}


def eval_solution_against_file(sol: Solution, path, nx: int,
                               batch_size: Optional[int] = None
                               ) -> Dict[str, float]:
    """Metrics of sol vs a precomputed reference-solution file.

    Reference parity: the EvalCallback fallback for equations without a
    closed form, which loads ``../../data/{Eq}_nx=..._N=7_100.npy``
    (utils.py:343-353). Accepted layouts (npy or npz with keys tx/u[/ux]):
    columns [t, x(nx), u] or [t, x(nx), u, u_x(nx)].
    """
    import numpy as np

    z = np.load(path)
    if hasattr(z, "files"):  # npz
        tx = jnp.asarray(z["tx"])
        u_ref = jnp.asarray(z["u"]).reshape(tx.shape[0], 1)
        ux_ref = jnp.asarray(z["ux"]) if "ux" in z.files else None
    else:
        data = jnp.asarray(z)
        tx = data[:, :1 + nx]
        u_ref = data[:, 1 + nx:2 + nx]
        ux_ref = data[:, 2 + nx:] if data.shape[1] > 2 + nx else None
    n = tx.shape[0]
    bs = batch_size or n
    preds, gpreds = [], []
    for i in range(0, n, bs):
        u_pred, ux_pred = _value_and_grad_jit(sol, tx[i:i + bs])
        preds.append(u_pred)
        gpreds.append(ux_pred)
    metrics = value_metrics(jnp.concatenate(preds), u_ref)
    if ux_ref is not None and ux_ref.shape[-1] == nx:
        metrics.update(grad_metrics(jnp.concatenate(gpreds), ux_ref,
                                    prefix="g"))
    return {k: float(v) for k, v in metrics.items()}


def monte_carlo_at(key, eq, sol: Solution, gen: est.GenConfig,
                   x: jnp.ndarray, t: Optional[jnp.ndarray] = None):
    """Fresh Picard MC estimate of u(t, x) from sol (evaluate.py:58-82).

    Jitted (cached per (gen, shape, solution treedef)): the 10^6-sample
    protocol runs a chunked scan whose eager op-by-op dispatch through
    the remote tunnel costs seconds/point; jitted it is one dispatch and
    serves every iteration's checkpoint (same treedef)."""
    if t is None:
        t = jnp.zeros((x.shape[0], 1), x.dtype)
    tx = jnp.concatenate([t, x], axis=-1)
    ck = ("mc_at", gen, tx.shape, jax.tree_util.tree_structure(sol))
    run = _EVAL_BATCH_CACHE.get(ck)
    if run is None:
        run = _EVAL_BATCH_CACHE[ck] = jax.jit(
            lambda k, e, s, txx: est.generate_values(k, e, s, txx, gen))
    from deeppicarditeration_tpu.utils.memory import oom_advice

    with oom_advice(
            "the MC self-consistency estimate",
            "lower --n-estimate (MC samples; the SE scales as "
            "1/sqrt(n)) or the GenConfig chunk_elems. Observed: the "
            "1e6-sample protocol at nx=512 with a full-Hessian get_f "
            "exceeds one chip's HBM by ~67 MB; 5e5 fits."):
        return run(key, eq, sol, tx)


def monte_carlo_at_zero(key, eq, sol: Solution, n_estimate: int = 1_000_000,
                        chunk_elems: int = 2 ** 22,
                        n_estimate_integral: int = None) -> Dict[str, float]:
    """u_net(0,0) vs a 10^6-sample MC estimate built from u_net itself.

    The reference's de-facto verification harness
    (experiment_evaluator.py:74-82). Small |u_net - MC| means the network
    is near the Picard fixed point. ``n_estimate_integral`` defaults to
    ``n_estimate`` (the terminal count).
    """
    gen = est.GenConfig(n_estimate_terminal=n_estimate,
                        n_estimate_integral=(n_estimate_integral
                                             or n_estimate),
                        chunk_elems=chunk_elems)
    x0 = jnp.zeros((1, eq.nx))
    u_mc = monte_carlo_at(key, eq, sol, gen, x0)
    tx0 = jnp.concatenate([jnp.zeros((1, 1)), x0], axis=-1)
    u_net = sol.value(tx0)
    return {"u_net_at_zero": float(u_net[0, 0]),
            "u_mc_at_zero": float(u_mc[0, 0]),
            "self_consistency_error": float(jnp.abs(u_net - u_mc)[0, 0])}


def monte_carlo_at_sharded(key, eq, sol: Solution, gen: est.GenConfig,
                           x: jnp.ndarray, t: Optional[jnp.ndarray] = None,
                           mesh=None):
    """MC-sample-axis-sharded estimate of u(t, x) over the device mesh.

    The 10^6-sample self-consistency evaluation is a mean of i.i.d. terms
    per point, so splitting the M samples across devices and averaging is
    mathematically exact (survey §5.7: the TPU-native analogue of sequence
    scaling). Each point is replicated n_dev times with an independent key
    and m/n_dev samples per replica; the replica rows shard over ALL mesh
    axes (on a ('data', 'mc') mesh the M axis genuinely splits over 'mc'),
    XLA reduces the final mean. Statistically identical (not bitwise) to
    the single-device estimate.
    """
    from jax.sharding import NamedSharding, PartitionSpec
    from deeppicarditeration_tpu.parallel.mesh import make_mesh

    mesh = mesh or make_mesh()
    rows_sharding = NamedSharding(mesh,
                                  PartitionSpec(tuple(mesh.axis_names)))
    n_dev = int(math.prod(mesh.devices.shape))
    if t is None:
        t = jnp.zeros((x.shape[0], 1), x.dtype)
    b = x.shape[0]
    m_t = max(1, gen.n_estimate_terminal // n_dev)
    m_i = max(1, gen.n_estimate_integral // n_dev)
    import dataclasses

    gen_shard = dataclasses.replace(gen, n_estimate_terminal=m_t,
                                    n_estimate_integral=m_i)
    # (b * n_dev, .) replica rows, sharded over 'data'
    t_r = jnp.repeat(t, n_dev, axis=0)
    x_r = jnp.repeat(x, n_dev, axis=0)
    tx = jnp.concatenate([t_r, x_r], axis=-1)
    tx = jax.device_put(tx, rows_sharding)

    # stable mesh descriptor, NOT id(mesh): an id can be reused after GC,
    # silently returning a jit bound to a dead mesh's sharding
    mesh_key = (mesh.axis_names, mesh.devices.shape,
                tuple(d.id for d in mesh.devices.flat))
    ckey = ("mc_sharded", gen_shard, b, n_dev, mesh_key)
    run = _EVAL_BATCH_CACHE.get(ckey)
    if run is None:
        def run_fn(k, e, s, tx_in):
            vals = est.generate_values(k, e, s, tx_in, gen_shard)
            return jnp.mean(vals.reshape(b, n_dev, 1), axis=1)

        run = _EVAL_BATCH_CACHE[ckey] = jax.jit(run_fn)
    return run(key, eq, sol, tx)


def value_batched(sol: Solution, tx: jnp.ndarray,
                  batch_size: Optional[int] = None) -> jnp.ndarray:
    """sol.value over ``tx`` in EVAL.BATCH_SIZE-bounded chunks.

    The post-hoc evaluators take whole solution files (``--sol-file``)
    whose row count the user controls; an unbatched net forward would
    materialize O(rows x width) activations at once. ``None`` = one
    chunk (bitwise-identical to the direct call)."""
    n = tx.shape[0]
    bs = int(batch_size) if batch_size else n
    if bs >= n:
        return sol.value(tx)
    return jnp.concatenate([sol.value(tx[i:i + bs])
                            for i in range(0, n, bs)])


def l2_at_t(key, sol: Solution, eq, t: jnp.ndarray,
            batch_size: Optional[int] = None) -> Dict[str, float]:
    """RMSE of the value head vs exact at given t points (evaluate.py:108).

    ``batch_size`` bounds the net-forward chunk (EVAL.BATCH_SIZE); the
    point draw itself is O(n x nx) and stays whole so batched and
    unbatched sweeps evaluate identical points."""
    x = eq.sample_x(key, t)
    tx = jnp.concatenate([t, x], axis=-1)
    err = value_batched(sol, tx, batch_size) - eq.exact_solution(t, x)
    return {"l2_error": float(jnp.sqrt(jnp.mean(err ** 2)))}
