#!/usr/bin/env python
"""The reference's MC self-consistency protocol at full scale, recorded.

Reference parity: ``picard evaluate`` runs ExperimentEvaluator.monte_carlo
with 10^6 terminal + 10^6 integral samples at (t, x) = (0, 0) for every
iteration (reference picard/main.py:31-33, experiment_evaluator.py:74-82)
— the de-facto correctness oracle: u_net(0,0) must agree with a fresh
Picard MC estimate built FROM u_net itself.

Beyond the reference, each row also records the MC standard error (from
``--se-rows`` independent replica estimates of n/r samples each — rows of
a batched generate_values call draw independent noise, so one extra call
of the same total sample budget calibrates the CLT band) and the z-score
err/se, so "agreement inside CLT bounds" is a checkable claim instead of
an eyeball.

Writes one JSON line per iteration to --out.
"""

import argparse
import json
import pathlib
import sys
import time

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

from deeppicarditeration_tpu.utils.compile_cache import (  # noqa: E402
    enable_persistent_compile_cache,
)

enable_persistent_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("exp_dir")
    ap.add_argument("--out", required=True)
    ap.add_argument("--n-estimate", type=int, default=1_000_000)
    ap.add_argument("--se-rows", type=int, default=16,
                    help="replica rows for the CLT standard-error estimate "
                         "(0 disables; costs one extra equal-budget call)")
    ap.add_argument("--iters", type=int, nargs="*", default=None,
                    help="iterations to evaluate (default: 0..PICARD.N)")
    ap.add_argument("--no-law-point", action="store_true",
                    help="skip the additional self-consistency check at a "
                         "law-typical point (see below)")
    args = ap.parse_args()

    from deeppicarditeration_tpu.evaluation.experiment import (
        ExperimentEvaluator,
    )
    from deeppicarditeration_tpu.ops import estimators as est

    ev = ExperimentEvaluator(args.exp_dir,
                             n_estimate_terminal=args.n_estimate,
                             n_estimate_integral=args.n_estimate)
    eq = ev.equation
    # match the experiment's matmul-precision policy (the runner sets this
    # at train time; the MC estimate re-runs the same nets)
    prec = (ev.cfg.get("PRECISION") or {}).get("MATMUL", "default")
    if prec and prec != "default":
        jax.config.update("jax_default_matmul_precision", prec)

    n = args.n_estimate
    gen = est.GenConfig(n_estimate_terminal=n, n_estimate_integral=n)
    r = args.se_rows
    gen_se = est.GenConfig(n_estimate_terminal=max(1, n // r),
                           n_estimate_integral=max(1, n // r)) if r else None

    from deeppicarditeration_tpu.evaluation.evaluator import monte_carlo_at

    def run_mc(g, key, sol, tx):
        # monte_carlo_at is jitted + cached per (gen, shape, treedef): one
        # dispatch per call, one compile per solution class
        return monte_carlo_at(key, eq, sol, g, tx[:, 1:], t=tx[:, :1])

    iters = (args.iters if args.iters is not None
             else range(int(ev.cfg.PICARD.N) + 1))
    key = jax.random.PRNGKey(1234)
    out_path = ROOT / args.out
    out_path.parent.mkdir(parents=True, exist_ok=True)

    # Evaluation points. (0, 0) is the reference's hardcoded protocol
    # point. In high nx it can sit far OUTSIDE the training law (e.g. the
    # 100-d HJB data law has ||x|| ~ 20 by measure concentration, so both
    # u_net(0,0) and the MC paths from the origin are extrapolations —
    # the reference implementation evaluated there would face the same
    # geometry). The law-typical point x* ~ law(X_0) checks the fixed
    # point where the recipe actually trains.
    points = {"zero": jnp.zeros((1, 1 + eq.nx))}
    if not args.no_law_point:
        # mid-horizon: t = T/2, x ~ law(X_{T/2}) (at t = 0 the Burgers/FN
        # law is degenerate at the origin — (0,0) IS its typical point)
        t_star = jnp.full((1, 1), eq.T / 2)
        x_star = eq.sample_x(jax.random.PRNGKey(777), t_star)
        points["xlaw"] = jnp.concatenate(
            [t_star, x_star.astype(jnp.float32)], axis=-1)

    with open(out_path, "a") as f:
        for i in iters:
            t0 = time.time()
            sol = ev.get_solution(int(i))
            ki = jax.random.fold_in(key, int(i))
            rec = {"iter": int(i), "n_estimate": n}
            for salt, (tag, tx_p) in enumerate(points.items()):
                suf = "_at_zero" if tag == "zero" else f"_at_{tag}"
                kp = jax.random.fold_in(ki, salt * 50)
                u_mc = run_mc(gen, kp, sol, tx_p)
                u_net = sol.value(tx_p)
                rec[f"u_net{suf}"] = float(u_net[0, 0])
                rec[f"u_mc{suf}"] = float(u_mc[0, 0])
                err = abs(rec[f"u_net{suf}"] - rec[f"u_mc{suf}"])
                rec["self_consistency_error" if tag == "zero"
                    else f"err{suf}"] = err
                if r:
                    tx_se = jnp.tile(tx_p, (r, 1))
                    rows = run_mc(gen_se, jax.random.fold_in(kp, 99), sol,
                                  tx_se)
                    # each row is an n/r-sample estimate; SE of the
                    # n-sample protocol estimate = std(rows)/sqrt(r)
                    se = float(jnp.std(rows) / jnp.sqrt(r))
                    rec[f"mc_se{suf}"] = se
                    rec[f"z{suf}"] = err / se if se else 0.0
            rec["wall_s"] = round(time.time() - t0, 2)
            ev._cache.clear()  # 100 param sets would otherwise pile up
            print(json.dumps(rec), flush=True)
            f.write(json.dumps(rec) + "\n")
            f.flush()


if __name__ == "__main__":
    main()
