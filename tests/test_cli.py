"""CLI end-to-end smoke: train + evaluate subcommands in a subprocess."""

import json
import os
import pathlib
import subprocess
import sys


def _run_cli(args, cwd):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo
    return subprocess.run(
        [sys.executable, "-m", "deeppicarditeration_tpu.cli"] + args,
        env=env, cwd=cwd, capture_output=True, text=True, timeout=600)


def test_cli_train_and_evaluate(tmp_path):
    cfg = tmp_path / "tiny.yaml"
    cfg.write_text("""
NAME: cli_tiny
FORCE: true
EQUATION:
  cls: Cha
  kwargs: {nx: 3, alpha: 1.0, k: 1.0, T: 1.0}
PICARD:
  N: 2
DATA:
  DATA_SIZE: 64
  CHUNK_ELEMS: 16384
  kwargs: {t_always_uniform: true, n_estimate_terminal: 32, n_estimate_integral: 32}
TRAIN:
  BATCH_SIZE: 32
  N_EPOCHS: 2
NETWORK:
  NEURONS: [8]
  ACTIVATIONS: [Tanh]
EVAL:
  FREQ: null
""")
    out = _run_cli(["train", str(cfg)], cwd=tmp_path)
    assert out.returncode == 0, out.stderr[-2000:]
    exp = tmp_path / "cli_tiny"
    assert (exp / "config.yaml").exists()
    assert (exp / "model_2").exists()

    out = _run_cli(["evaluate", str(exp), "--n-estimate", "256",
                    "--out", str(tmp_path / "mc.jsonl")],
                   cwd=tmp_path)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "Picard Estimate" in out.stdout
    recs = [json.loads(l)
            for l in (tmp_path / "mc.jsonl").read_text().splitlines()]
    assert [r["iter"] for r in recs] == [0, 1, 2]
    assert all("u_mc_at_zero" in r for r in recs)
    # --out appends; each record must carry the run delimiter so reruns
    # of the same command stay separable (ADVICE r3 item 4)
    assert all(r["protocol"] == "mc_at_zero" and "run_ts" in r
               and r["exp"] == "cli_tiny" for r in recs)

    # the recorded-protocol harness must stay runnable (round-3 artifact)
    repo = pathlib.Path(__file__).resolve().parents[1]
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    out = subprocess.run(
        [sys.executable, str(repo / "scripts" / "run_mc_eval.py"),
         str(exp), "--out", str(tmp_path / "mc2.jsonl"),
         "--n-estimate", "64", "--se-rows", "4", "--iters", "2"],
        env=env, capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    rec = json.loads((tmp_path / "mc2.jsonl").read_text().splitlines()[-1])
    assert {"u_mc_at_zero", "mc_se_at_zero", "u_mc_at_xlaw"} <= set(rec)

    out = _run_cli(["evaluate", str(exp), "--do-l2", "--n-points", "64"],
                   cwd=tmp_path)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "L2(td)" in out.stdout
    assert list(exp.glob("iter_*_error_distribution.png"))
