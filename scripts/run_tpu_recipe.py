#!/usr/bin/env python
"""Run any recipe config on the TPU with per-iteration oracle metrics.

Generalization of run_tpu_burgers.py to all benchmark families.
"""

import argparse
import json
import pathlib
import sys
import time

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("--iters", type=int, default=None)
    ap.add_argument("--out", required=True)
    ap.add_argument("--exp-root", default="/tmp/dpi_tpu_recipe")
    ap.add_argument("--eval-points", type=int, default=1000)
    ap.add_argument("--eval-batch", type=int, default=500)
    ap.add_argument("--override", nargs="*", default=[])
    ap.add_argument("--resume", action="store_true",
                    help="continue from the latest checkpoint in exp dir")
    ap.add_argument("--keep-freq", action="store_true",
                    help="keep the recipe's EVAL.FREQ (in-training eval "
                         "via the fused train+eval scan) instead of "
                         "overriding it to None")
    args = ap.parse_args()

    from deeppicarditeration_tpu.utils.compile_cache import (
        enable_persistent_compile_cache,
    )

    enable_persistent_compile_cache()
    from deeppicarditeration_tpu.config import load_cfg
    from deeppicarditeration_tpu.evaluation.evaluator import eval_solution
    from deeppicarditeration_tpu.training.picard import PicardRunner

    overrides = [] if args.keep_freq else ["EVAL.FREQ", "None"]
    if args.resume:
        overrides += ["RESUME", "true"]
    if args.iters:
        overrides += ["PICARD.N", str(args.iters)]
    overrides += list(args.override)
    cfg = load_cfg(ROOT / args.config, overrides)
    runner = PicardRunner(cfg, exp_root=pathlib.Path(args.exp_root))
    out_path = ROOT / args.out
    out_path.parent.mkdir(parents=True, exist_ok=True)
    key = jax.random.PRNGKey(1234)

    t_start = time.time()
    with open(out_path, "a") as f:
        while runner.i < int(cfg.PICARD.N):
            t0 = time.time()
            runner.run_one()
            runner.u_history.append(runner.u_current)
            m = eval_solution(jax.random.fold_in(key, runner.i - 1),
                              runner.u_current,
                              runner.equation, args.eval_points,
                              test_grad=True, batch_size=args.eval_batch)
            rec = {"iter": runner.i, "wall_s": round(time.time() - t0, 2),
                   "total_s": round(time.time() - t_start, 1),
                   "rRMSE": m["rRMSE"], "rRMSEg": m["rRMSEg"],
                   "rMAE": m["rMAE"]}
            print(json.dumps(rec), flush=True)
            f.write(json.dumps(rec) + "\n")
            f.flush()
    from deeppicarditeration_tpu.training import checkpoint as ckpt
    ckpt.wait_all()  # commit the final async checkpoint before exit


if __name__ == "__main__":
    main()
