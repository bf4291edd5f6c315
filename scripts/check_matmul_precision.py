#!/usr/bin/env python
"""Accuracy/speed A/B of MXU matmul precision on the DPI generation path.

The MXU runs f32 matmuls as bf16 passes: "default" = 1 pass (lossy),
"high"/"tensorfloat32" = 3 passes, "highest" = 6 passes (full f32).
This script generates value+gradient targets with the SAME RNG stream at
each precision and reports wall time + divergence vs highest. Informs the
PRECISION.MATMUL default (see PRECISION.md).

--path xla     : XLA chunked-scan estimators (pallas_generate=False)
--path pallas  : merged dual-estimator Pallas kernel (in-kernel dots
                 inherit the trace-time precision context)

Usage: python scripts/check_matmul_precision.py [--m 4096] [--b 4096]
       [--path xla] [--precs default,high,highest]
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
    ap.add_argument("--path", default="xla", choices=("xla", "pallas"))
    ap.add_argument("--precs", default="default,highest")
    ap.add_argument("--repeats", type=int, default=3)
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
                        chunk_elems=2 ** 25,
                        pallas_generate=(args.path == "pallas"))
    tx = est.sample_tx(jax.random.PRNGKey(2), eq, args.b, gen)
    key = jax.random.PRNGKey(7)

    precs = args.precs.split(",")
    if "highest" not in precs:
        precs.append("highest")
    results = {}
    for prec in precs:
        with jax.default_matmul_precision(prec):
            # TIMED fn returns the scalar token ONLY: returning the full
            # output array ships ~1.7 MB through the remote tunnel per
            # call (+~290 ms/call constant — see CLAUDE.md). The token is
            # a full-output reduction computed inside the jit, so nothing
            # is DCE'd and calls chain through a true data dependency.
            @jax.jit
            def timed_fn(k, salt):
                out = est.generate_with_gradients(k, eq, sol, tx, gen)
                return jnp.sum(out) * 1e-9 + salt

            # accuracy comparison output: fetched ONCE, untimed
            out = jax.jit(lambda k: est.generate_with_gradients(
                k, eq, sol, tx, gen))(jax.random.fold_in(key, 99))

            salt = timed_fn(key, jnp.zeros(()))
            float(salt)  # compile + warmup (forced host readback)
            t0 = time.perf_counter()
            for i in range(args.repeats):
                salt = timed_fn(jax.random.fold_in(key, 99), salt)
            float(salt)
            dt = (time.perf_counter() - t0) / args.repeats
        results[prec] = (out, dt)
        print(f"{prec}: {dt * 1e3:.1f} ms/call", flush=True)

    o_h, _ = results["highest"]
    for prec in precs:
        if prec == "highest":
            continue
        o_p, _ = results[prec]
        # same RNG stream: the difference is pure matmul rounding
        dv = jnp.abs(o_p[:, :1] - o_h[:, :1])
        dg = jnp.abs(o_p[:, 1:] - o_h[:, 1:])
        print(f"{prec} vs highest:"
              f" value max|Δ| = {float(dv.max()):.3e}"
              f" (mean|u| = {float(jnp.abs(o_h[:, :1]).mean()):.3e})"
              f" | grad max|Δ| = {float(dg.max()):.3e}"
              f" (mean|g| = {float(jnp.abs(o_h[:, 1:]).mean()):.3e})",
              flush=True)


if __name__ == "__main__":
    main()
