#!/usr/bin/env python
"""A/B the XLA matmul precision on the TRAINING side of a recipe.

With the merged Pallas estimator kernel as the generation default
(bf16x3 emulated-f32 in-kernel dots, independent of the XLA precision
flag), the global PRECISION.MATMUL setting now mostly taxes the jitted
train step and the eval forward. This probe times, on the real chip:

  1. the production 8-step ``run_steps`` dispatch (HJB shape by default:
     PISGradNet 4x512, B=512, value+gradient loss at w=0.1), chained
     through the donated TrainState so tunnel dispatch overlaps;
  2. one in-training ``eval_solution`` call at the recipe's settings.

Usage (ONE process at a time; each precision is a fresh process because
jax_default_matmul_precision must be set before compilation):

  python scripts/probe_train_precision.py --precision highest
  python scripts/probe_train_precision.py --precision default
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
    ap.add_argument("--precision", default="highest")
    ap.add_argument("--seg", type=int, default=8)
    ap.add_argument("--repeats", type=int, default=30)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from deeppicarditeration_tpu.config import load_cfg
    from deeppicarditeration_tpu.evaluation.evaluator import eval_solution
    from deeppicarditeration_tpu.models.solution import Solution
    from deeppicarditeration_tpu.training.picard import PicardRunner
    from deeppicarditeration_tpu.training.trainer import TrainState

    cfg = load_cfg(os.path.join(REPO, args.config),
                   ["PRECISION.MATMUL", args.precision,
                    "FORCE", "true", "NAME", "probe_prec"])
    runner = PicardRunner(cfg, exp_root="/tmp/probe_prec")
    eq = runner.equation
    nx = eq.nx
    bs = int(cfg.TRAIN.BATCH_SIZE)
    seg = args.seg

    key = jax.random.PRNGKey(0)
    params = runner.module.init(key, jnp.zeros((1, 1 + nx)))
    state = TrainState.create(params, runner.tx_opt)
    run_steps = runner._make_multi_step()

    kt, kx, ky, kk = jax.random.split(key, 4)
    t = jax.random.uniform(kt, (seg, bs, 1), minval=0.01, maxval=eq.T - 0.01)
    x = jax.random.normal(kx, (seg, bs, nx))
    txs = jnp.concatenate([t, x], axis=-1)
    ydim = 1 + nx if runner.spec.supervise_gradient else 1
    ys = 0.1 * jax.random.normal(ky, (seg, bs, ydim))
    keys = jax.random.split(kk, seg)

    # warmup/compile, forced by a host readback of a param-leaf sum
    state, m = run_steps(state, txs, ys, keys)
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    float(jnp.sum(leaf))
    t0 = time.perf_counter()
    for _ in range(args.repeats):
        # the donated TrainState chains every dispatch through a data
        # dependency — true device time through the tunnel (CLAUDE.md)
        state, m = run_steps(state, txs, ys, keys)
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    float(jnp.sum(leaf))
    dt_seg = (time.perf_counter() - t0) / args.repeats

    # eval_solution at recipe settings (synchronous per call by design)
    sol = Solution.from_net(runner.module, state.params, runner.net_type, nx)
    n_pts = int(cfg.EVAL.L2_N_POINTS)
    em = eval_solution(jax.random.PRNGKey(1), sol, eq, n_pts,
                       test_grad=bool(cfg.EVAL.TEST_GRAD))
    t0 = time.perf_counter()
    for r in range(5):
        em = eval_solution(jax.random.fold_in(key, r), sol, eq, n_pts,
                           test_grad=bool(cfg.EVAL.TEST_GRAD))
    dt_eval = (time.perf_counter() - t0) / 5

    n_epochs = int(cfg.TRAIN.N_EPOCHS)
    steps = int(cfg.DATA.DATA_SIZE) // bs
    segs_per_iter = n_epochs * steps / seg
    print(json.dumps({
        "precision": args.precision,
        "seg_ms": round(dt_seg * 1e3, 2),
        "step_ms": round(dt_seg / seg * 1e3, 3),
        "eval_ms": round(dt_eval * 1e3, 2),
        "train_s_per_iter": round(dt_seg * segs_per_iter, 3),
        "eval_s_per_iter": round(dt_eval * segs_per_iter, 3),
        "rrmse_probe": em.get("rRMSE"),
    }))


if __name__ == "__main__":
    main()
