#!/usr/bin/env python
"""Component timing of one DBDP substeps_k dispatch (FN 100-d scale:
K=50, B=512, 3x64 nets, 150 fused sub-iterations).

Variants: full substep loss, loss without the Hessian term, path
sampling alone — to locate the 173 ms/sub-iter cost.

Usage: python scripts/probe_dbdp.py
"""

import json
import math
import pathlib
import sys

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

import jax
import jax.numpy as jnp
import optax

from scripts.bench_pallas_kernels import timed

K, B, NX, SUB = 50, 512, 100, 50  # SUB=50 sub-iters per timed dispatch


def main():
    jax.config.update("jax_default_matmul_precision", "highest")
    from deeppicarditeration_tpu.equations import make_equation
    from deeppicarditeration_tpu.models.networks import MLP
    from deeppicarditeration_tpu.ops.rollout import brownian_paths

    eq = make_equation("GBMEquationComplexExact", nx=NX, alpha=1.0, T=1.0)
    dt = float(eq.T) / K
    u_mod = MLP(neurons=(64,) * 3, activations=("ELU",) * 3, out_dim=1)
    g_mod = MLP(neurons=(64,) * 3, activations=("ELU",) * 3, out_dim=NX)
    ku, kg, ku2, kg2 = jax.random.split(jax.random.PRNGKey(0), 4)
    x0s = jnp.zeros((1, NX))
    pair_prev = (u_mod.init(ku, x0s), g_mod.init(kg, x0s))
    pair_next = (u_mod.init(ku2, x0s), g_mod.init(kg2, x0s))
    tx_opt = optax.adam(1e-3)
    kk = jnp.asarray(25)
    is_last = jnp.asarray(False)
    ts_grid = jnp.arange(K + 1) * dt
    print(json.dumps({"backend": jax.default_backend(), "K": K, "B": B,
                      "sub_iters": SUB}), flush=True)

    def u_at(params_k, t_k, x):
        return eq.g(x) + (eq.T - t_k) * u_mod.apply(params_k, x)

    def ux_at(params_k, t_k, x):
        return eq.g_x(x) + (eq.T - t_k) * g_mod.apply(params_k, x)

    def sample_paths(k):
        x = eq.sample_x0(jax.random.fold_in(k, 0), B)
        t = jnp.zeros((B, 1))
        dts = jnp.full((B, 1), dt, x.dtype)
        _, xs, xi = brownian_paths(jax.random.fold_in(k, 1), eq, t, x,
                                   dts, K)
        return xs, xi * math.sqrt(dt)

    def one_step_loss(pair_prev, x, x_next, dW, with_hess=True):
        u_params, g_params = pair_prev
        un_params, gn_params = pair_next
        t_prev = ts_grid[kk - 1] * jnp.ones((B, 1))
        t_next = ts_grid[kk] * jnp.ones((B, 1))
        u = u_at(u_params, t_prev, x)
        u_x = ux_at(g_params, t_prev, x)
        u_next = u_at(un_params, t_next, x_next)

        if with_hess:
            def gnet(xx):
                return ux_at(gn_params, t_next, xx[None])[0]

            hess = jax.vmap(jax.jacrev(gnet))(x_next)
        else:
            hess = jnp.zeros((B, NX, NX))
        f_hat = eq.ffh(t_prev, x, u, u_x, jax.lax.stop_gradient(hess))
        F = (u - f_hat * dt
             + jnp.sum(u_x * eq.alpha_sqrt * dW, axis=-1, keepdims=True))
        return jnp.mean((jax.lax.stop_gradient(u_next) - F) ** 2)

    def make_chunk(with_hess=True, paths_only=False):
        @jax.jit
        def chunk(pair, opt_state, key, salt):
            def body(carry, it):
                p, o = carry
                kr = jax.random.fold_in(key, it)
                xs, dWs = sample_paths(kr)
                x, x_next, dW = xs[kk - 1], xs[kk], dWs[kk - 1]
                if paths_only:
                    return (p, o), jnp.sum(x_next) * 1e-9
                loss, grads = jax.value_and_grad(
                    lambda pp: one_step_loss(pp, x, x_next, dW,
                                             with_hess))(p)
                up, o = tx_opt.update(grads, o, p)
                return (optax.apply_updates(p, up), o), loss

            (pair, opt_state), losses = jax.lax.scan(
                body, (pair, opt_state), jnp.arange(SUB))
            return losses[-1] * 1e-9 + salt

        return chunk

    cases = [
        ("full", make_chunk(True, False)),
        ("no_hess", make_chunk(False, False)),
        ("paths_only", make_chunk(False, True)),
    ]
    opt_state = tx_opt.init(pair_prev)
    for name, chunk in cases:
        fn = lambda key, salt, c=chunk: c(pair_prev, opt_state, key, salt)
        try:
            sec = timed(fn, jax.random.PRNGKey(5))
        except Exception as e:
            print(json.dumps({"case": name, "error": str(e)[:200]}),
                  flush=True)
            continue
        print(json.dumps({"case": name, "sec": sec,
                          "ms_per_subiter": sec / SUB * 1e3}), flush=True)


if __name__ == "__main__":
    main()
