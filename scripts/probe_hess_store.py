#!/usr/bin/env python
"""A/B of DATA.TPU.HESSIAN_STORE bf16 vs f32 on the FN/SDGD generation
path (VERDICT r3 weak #2 / next-round item 3).

The path is HBM-bandwidth-bound (~8 FLOP/byte measured, CLAUDE.md): the
second-order-backprop chain's (R, w, w) G blocks dominate its bytes, so
storing them in bf16 (MXU consumes bf16 natively, f32 accumulation)
should cut the dominant traffic ~2x. This probe measures s/call for the
full generation call and the isolated diag chunk at the recipe's shapes
(100-d GBM, v=100, 3x64 MLP), plus the max relative target delta.

Usage: python scripts/probe_hess_store.py   (real TPU, one probe at a time)
"""

import dataclasses
import json
import pathlib
import sys

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

import jax
import jax.numpy as jnp

from scripts.bench_pallas_kernels import timed


def main():
    jax.config.update("jax_default_matmul_precision", "highest")
    from deeppicarditeration_tpu.equations import make_equation
    from deeppicarditeration_tpu.models.networks import MLP
    from deeppicarditeration_tpu.models.solution import Solution
    from deeppicarditeration_tpu.ops import estimators as est
    from deeppicarditeration_tpu.ops.derivatives import mlp_hessian_diag

    nx, b, m, v = 100, 2048, 1024, 100
    eq = make_equation("GBMEquationComplexExact", nx=nx, alpha=1.0, T=1.0)
    module = MLP(neurons=(64,) * 3, activations=("ELU",) * 3, out_dim=1)
    params = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 1 + nx)))
    sol = Solution.from_net(module, params, "Value", nx)
    gen32 = est.GenConfig(n_estimate_terminal=m, n_estimate_integral=m,
                          sdgd_v=v, chunk_elems=2 ** 23,
                          t_always_uniform=True)
    gen16 = dataclasses.replace(gen32, hess_store="bf16")
    key0 = jax.random.PRNGKey(7)
    t = jax.random.uniform(jax.random.fold_in(key0, 0), (b, 1)) * 0.98
    x = eq.sample_x(jax.random.fold_in(key0, 1), t)
    tx = jnp.concatenate([t, x], axis=-1)
    print(json.dumps({"backend": jax.default_backend(),
                      "b": b, "m": m, "v": v}), flush=True)

    mc = gen32.chunk(m, b, nx)
    R = b * mc
    tR = jnp.full((R, 1), 0.3)
    xR = jax.random.normal(jax.random.fold_in(key0, 2), (R, nx))

    cases = {
        "generate_f32": lambda key, salt: jnp.sum(
            est.generate_with_gradients(key, eq, sol, tx, gen32)
        ) * 1e-9 + salt,
        "generate_bf16": lambda key, salt: jnp.sum(
            est.generate_with_gradients(key, eq, sol, tx, gen16)
        ) * 1e-9 + salt,
        "fulldiag_f32": lambda key, salt: jnp.sum(
            mlp_hessian_diag(sol, tR, xR + 0 * salt)) * 1e-9 + salt,
        "fulldiag_bf16": lambda key, salt: jnp.sum(
            mlp_hessian_diag(sol, tR, xR + 0 * salt, store="bf16")
        ) * 1e-9 + salt,
    }
    for name, fn in cases.items():
        jfn = jax.jit(fn)
        try:
            sec = timed(jfn, jax.random.fold_in(key0, 9))
        except Exception as e:
            print(json.dumps({"case": name, "error": str(e)[:200]}),
                  flush=True)
            continue
        print(json.dumps({"case": name, "sec": sec, "mc": mc}), flush=True)

    # accuracy: same key through both configs
    y32 = jax.jit(lambda k: est.generate_with_gradients(
        k, eq, sol, tx, gen32))(jax.random.fold_in(key0, 5))
    y16 = jax.jit(lambda k: est.generate_with_gradients(
        k, eq, sol, tx, gen16))(jax.random.fold_in(key0, 5))
    import numpy as np

    a, c = np.asarray(y32), np.asarray(y16)
    scale = np.abs(a).max()
    print(json.dumps({"case": "target_delta",
                      "max_abs": float(np.abs(a - c).max()),
                      "max_rel_vs_scale": float(np.abs(a - c).max() / scale),
                      "scale": float(scale)}), flush=True)


if __name__ == "__main__":
    main()
