#!/usr/bin/env python
"""Component timing of the FN/SDGD generation call (100-d GBM, v=100,
3x64 MLP frozen net) to locate the post-fast-diag bottleneck.

Usage: python scripts/probe_fn_gen.py
"""

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
    from deeppicarditeration_tpu.ops.derivatives import (
        diag_hessian_entries,
        mlp_hessian_diag,
    )

    nx, b, m, v = 100, 2048, 1024, 100
    eq = make_equation("GBMEquationComplexExact", nx=nx, alpha=1.0, T=1.0)
    module = MLP(neurons=(64,) * 3, activations=("ELU",) * 3, out_dim=1)
    params = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 1 + nx)))
    sol = Solution.from_net(module, params, "Value", nx)
    gen = est.GenConfig(n_estimate_terminal=m, n_estimate_integral=m,
                        sdgd_v=v, chunk_elems=2 ** 23,
                        t_always_uniform=True)
    key0 = jax.random.PRNGKey(7)
    t = jax.random.uniform(jax.random.fold_in(key0, 0), (b, 1)) * 0.98
    x = eq.sample_x(jax.random.fold_in(key0, 1), t)
    tx = jnp.concatenate([t, x], axis=-1)
    print(json.dumps({"backend": jax.default_backend()}), flush=True)

    mc = gen.chunk(m, b, nx)
    R = b * mc
    tR = jnp.full((R, 1), 0.3)
    xR = jax.random.normal(jax.random.fold_in(key0, 2), (R, nx))
    idxR = jax.random.randint(jax.random.fold_in(key0, 3), (R, v), 0, nx,
                              dtype=jnp.int32)

    cases = {
        "full_generate": lambda key, salt: jnp.sum(
            est.generate_with_gradients(key, eq, sol, tx, gen)) * 1e-9 + salt,
        "terminal_only": lambda key, salt: jnp.sum(
            est.estimate_terminal_with_gradients(key, eq, tx, gen)
        ) * 1e-9 + salt,
        "integral_only": lambda key, salt: jnp.sum(
            est.estimate_integral_with_gradients(key, eq, sol, tx, gen)
        ) * 1e-9 + salt,
        "diag_chunk": lambda key, salt: jnp.sum(
            diag_hessian_entries(sol, tR, xR + 0 * salt, idxR)) * 1e-9 + salt,
        "fulldiag_chunk": lambda key, salt: jnp.sum(
            mlp_hessian_diag(sol, tR, xR + 0 * salt)) * 1e-9 + salt,
        "gather_chunk": lambda key, salt: jnp.sum(
            jnp.take_along_axis(xR + 0 * salt, idxR, axis=-1)
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


if __name__ == "__main__":
    main()
