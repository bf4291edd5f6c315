#!/usr/bin/env python
"""Measure the non-generate, non-train per-iteration overheads on TPU:

  1. eval_solution at recipe settings (now jitted per batch);
  2. orbax checkpoint save of the recipe's parameter pytree;
  3. init_solution (fresh per-iteration network init).

Usage: python scripts/probe_iter_overhead.py [--config ...]
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/hjb/base_100d_T1.0_w0.1.yaml")
    ap.add_argument("--eval-points", type=int, default=1000)
    ap.add_argument("--eval-batch", type=int, default=500)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from deeppicarditeration_tpu.config import load_cfg
    from deeppicarditeration_tpu.evaluation.evaluator import eval_solution
    from deeppicarditeration_tpu.models.factory import init_solution
    from deeppicarditeration_tpu.training import checkpoint as ckpt
    from deeppicarditeration_tpu.training.picard import PicardRunner

    cfg = load_cfg(os.path.join(REPO, args.config),
                   ["FORCE", "true", "NAME", "probe_ovh"])
    runner = PicardRunner(cfg, exp_root="/tmp/probe_ovh")
    eq = runner.equation

    key = jax.random.PRNGKey(0)
    sol = init_solution(key, cfg, eq, module=runner.module)

    # --- eval_solution (jitted path) ---
    em = eval_solution(key, sol, eq, args.eval_points, test_grad=True,
                       batch_size=args.eval_batch)  # compile
    t0 = time.perf_counter()
    for r in range(10):
        eval_solution(jax.random.fold_in(key, r), sol, eq, args.eval_points,
                      test_grad=True, batch_size=args.eval_batch)
    dt_eval = (time.perf_counter() - t0) / 10

    # --- checkpoint save ---
    p = ckpt.ckpt_path(runner.exp_dir, 1)
    ckpt.save_params(p, sol.params)  # first save (dir creation etc.)
    t0 = time.perf_counter()
    for r in range(5):
        ckpt.save_params(ckpt.ckpt_path(runner.exp_dir, 2 + r), sol.params)
    dt_save = (time.perf_counter() - t0) / 5

    # --- init_solution ---
    t0 = time.perf_counter()
    for r in range(5):
        s2 = init_solution(jax.random.fold_in(key, 100 + r), cfg, eq,
                           module=runner.module)
    float(jnp.sum(jax.tree_util.tree_leaves(s2.params)[0]))
    dt_init = (time.perf_counter() - t0) / 5

    print(json.dumps({
        "eval_ms": round(dt_eval * 1e3, 2),
        "ckpt_save_ms": round(dt_save * 1e3, 2),
        "init_ms": round(dt_init * 1e3, 2),
        "rrmse_probe": em.get("rRMSE"),
    }))


if __name__ == "__main__":
    main()
