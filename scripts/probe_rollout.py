#!/usr/bin/env python
"""A/B the diffusion-baseline rollout variants END-TO-END: the old
lax.scan simulation vs the closed-form draw+cumsum vs the Pallas fused
path kernel, each inside a realistic jitted 20-epoch training chunk
(HJB-diffusion scale: K=50, B=512, nx=100, 4x128 MLP).

Also statistically validates the real Pallas path kernel (the CPU suite
only exercises its interpreter fallback).

Usage: python scripts/probe_rollout.py
"""

import json
import pathlib
import sys
import time

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from deeppicarditeration_tpu.equations import make_equation
from deeppicarditeration_tpu.models.networks import MLP
from deeppicarditeration_tpu.models.solution import Solution
from deeppicarditeration_tpu.ops.rollout import brownian_paths

K, B, NX, EPOCHS = 50, 512, 100, 20


def main():
    eq = make_equation("Cha", nx=NX, alpha=1.0, k=5.0, T=1.0)
    module = MLP(neurons=(128,) * 4, activations=("ELU",) * 4, out_dim=1)
    params0 = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 1 + NX)))
    tx_opt = optax.adam(1e-3)
    dt = float(eq.T) / K
    print(json.dumps({"backend": jax.default_backend(), "K": K, "B": B,
                      "nx": NX, "epochs_per_chunk": EPOCHS}), flush=True)

    # --- statistical validation of the real Pallas kernel ---------------
    t0 = jnp.zeros((4096, 1))
    x0 = jnp.zeros((4096, NX))
    dts = jnp.full_like(t0, dt)
    _, xs, xi = jax.jit(lambda k: brownian_paths(
        k, eq, t0, x0, dts, 8, use_pallas=True))(jax.random.PRNGKey(5))
    xK = np.asarray(xs[-1])
    var_expect = 8 * dt
    print(json.dumps({"pallas_kernel_stats": {
        "mean": float(xK.mean()), "var": float(xK.var()),
        "var_expect": var_expect,
        "xi_var": float(np.asarray(xi).var())}}), flush=True)

    def rollout_scan(k, t0, x0, dts):
        def body(carry, kk):
            t, x = carry
            t_next = t + dts
            x_next, _ = eq.transition(jax.random.fold_in(k, kk), t,
                                      t_next, x)
            return (t_next, x_next), (t_next, x_next)

        (_, _), (ts, xs) = jax.lax.scan(body, (t0, x0), jnp.arange(K))
        return (jnp.concatenate([t0[None], ts], 0),
                jnp.concatenate([x0[None], xs], 0))

    def rollout_closed(k, t0, x0, dts, use_pallas=False):
        ts, xs, _ = brownian_paths(k, eq, t0, x0, dts, K,
                                   use_pallas=use_pallas)
        return ts, xs

    def make_chunk(rollout):
        def loss_fn(params, k):
            sol = Solution.from_net(module, params, "Value", NX)
            kt, kx, kw = jax.random.split(k, 3)
            t0 = eq.T * jax.random.uniform(kt, (B, 1))
            x0 = eq.sample_x(kx, t0)
            dts = jnp.where(t0 + K * dt <= eq.T, dt, (eq.T - t0) / K)
            ts, xs = rollout(kw, t0, x0, dts)
            v, v_grad = sol.value_and_grad_x(ts, xs)
            fs = eq.ff(ts, xs, v, v_grad)
            dxs = jnp.diff(xs, axis=0)
            v_pred = (v[0] - jnp.sum(fs[:-1] * dts[None], axis=0)
                      + jnp.sum(jnp.sum(v_grad[:-1] * dxs, axis=-1,
                                        keepdims=True), axis=0))
            return jnp.mean((v[-1] - v_pred) ** 2)

        @jax.jit
        def chunk(params, opt_state, key, salt):
            def body(carry, e):
                p, o = carry
                loss, grads = jax.value_and_grad(loss_fn)(
                    p, jax.random.fold_in(key, e))
                updates, o = tx_opt.update(grads, o, p)
                return (optax.apply_updates(p, updates), o), loss

            (params, opt_state), losses = jax.lax.scan(
                body, (params, opt_state), jnp.arange(EPOCHS))
            return params, opt_state, losses[-1] * 1e-9 + salt

        return chunk

    variants = [
        ("scan", make_chunk(rollout_scan)),
        ("closed_form", make_chunk(rollout_closed)),
        ("pallas", make_chunk(
            lambda k, t0, x0, dts: rollout_closed(k, t0, x0, dts, True))),
    ]
    for name, chunk in variants:
        try:
            params, opt_state = params0, tx_opt.init(params0)
            salt = jnp.zeros(())
            params, opt_state, salt = chunk(params, opt_state,
                                            jax.random.PRNGKey(1), salt)
            float(salt)  # compile + warmup
            t0c = time.perf_counter()
            reps = 3
            for r in range(reps):
                params, opt_state, salt = chunk(
                    params, opt_state, jax.random.fold_in(
                        jax.random.PRNGKey(2), r), salt)
            float(salt)
            sec = (time.perf_counter() - t0c) / reps
        except Exception as e:
            print(json.dumps({"variant": name, "error": str(e)[:200]}),
                  flush=True)
            continue
        print(json.dumps({"variant": name, "sec_per_chunk": sec,
                          "ms_per_epoch": sec / EPOCHS * 1e3}), flush=True)


if __name__ == "__main__":
    main()
