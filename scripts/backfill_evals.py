#!/usr/bin/env python
"""Backfill per-iteration oracle evals for an interrupted recipe run.

If a run_tpu_recipe.py process dies after training iteration i but before
(or during) its eval, the checkpoints model_{j} exist while the JSONL lacks
records for j > last-logged. This loads each missing checkpoint and runs the
same eval_solution call the recipe runner would have, reconstructing wall_s
from checkpoint mtimes (marked "backfilled": true).
"""

import argparse
import json
import pathlib
import sys

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

import jax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("exp_dir")
    ap.add_argument("--out", required=True)
    ap.add_argument("--eval-points", type=int, default=1000)
    ap.add_argument("--eval-batch", type=int, default=500)
    args = ap.parse_args()

    from deeppicarditeration_tpu.evaluation.evaluator import eval_solution
    from deeppicarditeration_tpu.evaluation.experiment import (
        ExperimentEvaluator,
    )

    exp_dir = pathlib.Path(args.exp_dir)
    out_path = ROOT / args.out
    records = [json.loads(line)
               for line in out_path.read_text().splitlines() if line.strip()]
    last_logged = max((r["iter"] for r in records), default=0)
    total_s = max((r["total_s"] for r in records), default=0.0)

    n_ckpt = 0
    while (exp_dir / f"model_{n_ckpt + 1}").exists():
        n_ckpt += 1
    if n_ckpt <= last_logged:
        print(f"nothing to backfill (logged {last_logged}, ckpts {n_ckpt})")
        return

    ev = ExperimentEvaluator(exp_dir)
    key = jax.random.PRNGKey(1234)  # matches run_tpu_recipe.py
    with open(out_path, "a") as f:
        for i in range(last_logged + 1, n_ckpt + 1):
            sol = ev.get_solution(i)
            m = eval_solution(jax.random.fold_in(key, i - 1), sol,
                              ev.equation, args.eval_points,
                              test_grad=True, batch_size=args.eval_batch)
            prev = (exp_dir / f"model_{i - 1}").stat().st_mtime
            cur = (exp_dir / f"model_{i}").stat().st_mtime
            wall = round(cur - prev, 2)
            total_s = round(total_s + wall, 1)
            rec = {"iter": i, "wall_s": wall, "total_s": total_s,
                   "rRMSE": m["rRMSE"], "rRMSEg": m["rRMSEg"],
                   "rMAE": m["rMAE"], "backfilled": True}
            print(json.dumps(rec), flush=True)
            f.write(json.dumps(rec) + "\n")
            f.flush()


if __name__ == "__main__":
    main()
