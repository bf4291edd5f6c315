#!/usr/bin/env python
"""Flagship validation: 100-d Burgers DPI on real TPU hardware.

Runs the reference-parity recipe (configs/burgers/base_100d_T1.0_w0.0.yaml)
for --iters Picard iterations and prints the per-iteration rRMSE/rRMSEg
trajectory vs the closed-form solution — the accuracy-parity evidence for
BASELINE.md. Results append to bench_results/burgers100d_tpu.jsonl.
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
    ap.add_argument("--iters", type=int, default=15)
    ap.add_argument("--out", default="bench_results/burgers100d_tpu.jsonl")
    ap.add_argument("--config",
                    default="configs/burgers/base_100d_T1.0_w0.0.yaml")
    ap.add_argument("--exp-root", default="/tmp/dpi_tpu_runs")
    ap.add_argument("--eval-points", type=int, default=2000)
    ap.add_argument("--precision", default=None,
                    help="override PRECISION.MATMUL (e.g. default|highest)")
    ap.add_argument("--override", nargs="*", default=[],
                    help="extra KEY value config overrides")
    args = ap.parse_args()

    from deeppicarditeration_tpu.utils.compile_cache import (
        enable_persistent_compile_cache,
    )

    enable_persistent_compile_cache()
    from deeppicarditeration_tpu.config import load_cfg
    from deeppicarditeration_tpu.evaluation.evaluator import eval_solution
    from deeppicarditeration_tpu.training.picard import PicardRunner

    overrides = ["PICARD.N", str(args.iters), "EVAL.FREQ", "None"]
    if args.precision:
        overrides += ["PRECISION.MATMUL", args.precision]
    overrides += list(args.override)
    cfg = load_cfg(ROOT / args.config, overrides)
    runner = PicardRunner(cfg, exp_root=pathlib.Path(args.exp_root))
    out_path = ROOT / args.out
    out_path.parent.mkdir(parents=True, exist_ok=True)
    key = jax.random.PRNGKey(1234)

    t_start = time.time()
    with open(out_path, "a") as f:
        for i in range(args.iters):
            t0 = time.time()
            runner.run_one()
            runner.u_history.append(runner.u_current)
            m = eval_solution(jax.random.fold_in(key, i), runner.u_current,
                              runner.equation, args.eval_points,
                              test_grad=True, batch_size=1000)
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
