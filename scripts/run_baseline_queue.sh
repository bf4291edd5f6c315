#!/bin/bash
# Serial TPU queue: full Burgers w1.0 N=100 DPI recipe, then the
# PINN / D-DBSDE / DBDP baseline 100-d runs for all three families.
# One process at a time (remote-TPU rule); each under a timeout guard.
set -u
ROOT=/root/repo
cd "$ROOT"
Q=/tmp/dpi_q
mkdir -p "$Q" bench_results

run() { # name timeout_s cmd...
  local name=$1 tmo=$2; shift 2
  echo "=== [$(date +%H:%M:%S)] $name"
  timeout "$tmo" "$@" >"/tmp/dpi_q/$name.log" 2>&1
  echo "=== [$(date +%H:%M:%S)] $name exit=$?"
}

# 1. Full Burgers w1.0 DPI recipe (N = 100, the shipped reference budget)
run burgers_w1_N100 7200 python scripts/run_tpu_recipe.py \
  configs/burgers/base_100d_T1.0_w1.0.yaml \
  --out bench_results/burgers100d_tpu_w1_N100.jsonl \
  --exp-root "$Q/burgers_w1_N100"

# 2-5. PINN and D-DBSDE baselines (u_current is a plain net -> oracle eval)
run burgers_pinn 7200 python scripts/run_tpu_recipe.py \
  configs/burgers/pinn_100d_T1.0_v16_beta10.0.yaml \
  --out bench_results/burgers100d_pinn_tpu.jsonl --exp-root "$Q/burgers_pinn"
run burgers_diffusion 7200 python scripts/run_tpu_recipe.py \
  configs/burgers/diffusion_100d_T1.0_beta10.0.yaml \
  --out bench_results/burgers100d_diffusion_tpu.jsonl \
  --exp-root "$Q/burgers_diffusion"
run hjb_pinn 7200 python scripts/run_tpu_recipe.py \
  configs/hjb/pinn_100d_T1.0_v16.yaml \
  --out bench_results/hjb100d_pinn_tpu.jsonl --exp-root "$Q/hjb_pinn"
run hjb_diffusion 7200 python scripts/run_tpu_recipe.py \
  configs/hjb/diffusion_100d_T1.0.yaml \
  --out bench_results/hjb100d_diffusion_tpu.jsonl --exp-root "$Q/hjb_diffusion"
run fn_pinn 7200 python scripts/run_tpu_recipe.py \
  configs/fully_nonlinear/pinn_100d_T1.0_v16_beta10.0.yaml \
  --out bench_results/fn100d_pinn_tpu.jsonl --exp-root "$Q/fn_pinn"

# 6-7. DBDP: per-timestep nets, evaluated internally on the time grid;
# the queue copies each run's eval trajectory out of metrics.jsonl.
dbdp() { # name timeout cfg
  local name=$1 tmo=$2 cfg=$3
  mkdir -p "$Q/$name"
  ( cd "$Q/$name" && \
    run "$name" "$tmo" env PYTHONPATH="$ROOT${PYTHONPATH:+:$PYTHONPATH}" \
      python -m deeppicarditeration_tpu.cli train "$ROOT/$cfg" )
  python - "$Q/$name" "bench_results/${name}_tpu.jsonl" <<'EOF'
import json, pathlib, sys
root, out = pathlib.Path(sys.argv[1]), pathlib.Path(sys.argv[2])
metrics = sorted(root.glob("*/metrics.jsonl"), key=lambda p: p.stat().st_mtime)
if metrics:
    with open(out, "w") as f:
        for line in metrics[-1].read_text().splitlines():
            rec = json.loads(line)
            if rec.get("context") == "eval":
                f.write(json.dumps(rec) + "\n")
EOF
}
dbdp hjb100d_dbdp 10800 configs/hjb/fn_100d_T1.0.yaml
dbdp fn100d_dbdp 10800 configs/fully_nonlinear/fn_100d_T1.0.yaml

echo "=== queue done"
