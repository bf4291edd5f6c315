#!/usr/bin/env python
"""TwoLayer Picard formula at 100-d on TPU (reference data.py:1328-1379).

The reference ships the two-layer variance-reduced formula
u_k = u_{k-1} + E[(T-t)(f(u_{k-1}) - f(u_{k-2}))] but no recipe using
it; here it runs at the flagship Burgers w0.0 scale against the
recorded one-layer value-only ablation (bench_results/
burgers100d_tpu.jsonl: hovers ~0.1-0.3, genuinely unstable at 100-d —
BASELINE.md "Stability note"). TwoLayer generates VALUE-ONLY targets
(reference data.py:1332-1333), so gradient supervision is disabled the
same way the CPU test does (tests/test_td_and_runner_features.py).
"""

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


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=15)
    ap.add_argument("--out", default="bench_results/burgers100d_twolayer.jsonl")
    ap.add_argument("--exp-root", default="/tmp/dpi_twolayer")
    args = ap.parse_args()

    from deeppicarditeration_tpu.config import load_cfg
    from deeppicarditeration_tpu.evaluation.evaluator import eval_solution
    from deeppicarditeration_tpu.training.picard import PicardRunner

    cfg = load_cfg(ROOT / "configs/burgers/base_100d_T1.0_w0.0.yaml",
                   ["PICARD.N", str(args.iters),
                    "PICARD.FORMULA", "TwoLayer",
                    "TRAIN.SUPERVISE_GRADIENT", "false",
                    "EVAL.FREQ", "None",
                    "NAME", "twolayer_w0.0"])
    runner = PicardRunner(cfg, exp_root=pathlib.Path(args.exp_root))
    # TwoLayer generates value-only targets (data.py:1332-1333); Burgers'
    # gradient term auto-trips gradient supervision, so disable it the
    # same way the CPU path test does
    runner.supervise_gradient = False
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
                              runner.u_current, runner.equation, 1000,
                              test_grad=True, batch_size=500)
            rec = {"iter": runner.i, "wall_s": round(time.time() - t0, 2),
                   "total_s": round(time.time() - t_start, 1),
                   "rRMSE": m["rRMSE"], "rRMSEg": m["rRMSEg"]}
            print(json.dumps(rec), flush=True)
            f.write(json.dumps(rec) + "\n")
            f.flush()
    from deeppicarditeration_tpu.training import checkpoint as ckpt

    ckpt.wait_all()


if __name__ == "__main__":
    main()
