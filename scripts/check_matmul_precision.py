#!/usr/bin/env python
"""Accuracy check: bf16-default vs highest matmul precision on TPU.

The MXU runs f32 matmuls with bf16 inputs by default. This script measures
the effect on DPI targets: generate value+gradient targets from a trained-
like net with both precisions and report the divergence relative to the MC
noise floor. Informs the PRECISION.MATMUL default (see PRECISION.md).

Usage: python scripts/check_matmul_precision.py [--m 4096]
"""

import argparse
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=4096)
    ap.add_argument("--b", type=int, default=512)
    args = ap.parse_args()

    from deeppicarditeration_tpu.equations import make_equation
    from deeppicarditeration_tpu.models.networks import MLP
    from deeppicarditeration_tpu.models.solution import Solution
    from deeppicarditeration_tpu.ops import estimators as est

    nx = 100
    eq = make_equation("Cha", nx=nx, alpha=1.0, k=5.0, T=1.0)
    module = MLP(neurons=(128,) * 4, activations=("ELU",) * 4, out_dim=1)
    params = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 1 + nx)))
    sol = Solution.from_net(module, params, "Value", nx)
    gen = est.GenConfig(n_estimate_terminal=args.m,
                        n_estimate_integral=args.m,
                        t_always_uniform=True, t_uniform_eps=0.01,
                        chunk_elems=2 ** 25)
    tx = est.sample_tx(jax.random.PRNGKey(2), eq, args.b, gen)
    key = jax.random.PRNGKey(7)

    results = {}
    for prec in ("default", "highest"):
        with jax.default_matmul_precision(prec):
            fn = jax.jit(lambda k: est.generate_with_gradients(
                k, eq, sol, tx, gen))
            out = fn(key)
            jax.block_until_ready(out)
            salt = out[0, 0]
            t0 = time.perf_counter()
            for i in range(3):
                out = fn(jax.random.fold_in(key, 99))  # same stream both precs
                salt = salt + out[0, 0] * 0
            float(salt)
            dt = (time.perf_counter() - t0) / 3
        results[prec] = (out, dt)
        print(f"{prec}: {dt * 1e3:.1f} ms/call")

    o_d, _ = results["default"]
    o_h, _ = results["highest"]
    # same RNG stream: the difference is pure matmul rounding
    dv = jnp.abs(o_d[:, :1] - o_h[:, :1])
    dg = jnp.abs(o_d[:, 1:] - o_h[:, 1:])
    print("value: max|Δ| =", float(dv.max()),
          " mean|u| =", float(jnp.abs(o_h[:, :1]).mean()))
    print("grad:  max|Δ| =", float(dg.max()),
          " mean|g| =", float(jnp.abs(o_h[:, 1:]).mean()))


if __name__ == "__main__":
    main()
