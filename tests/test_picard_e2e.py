"""End-to-end DPI integration tests: tiny-d, few-iteration runs asserting
rRMSE decreases across Picard iterations (survey §4 implication list).
"""

import json
import pathlib

import jax
import numpy as np
import pytest

from deeppicarditeration_tpu.config import default_cfg
from deeppicarditeration_tpu.evaluation.evaluator import eval_solution, monte_carlo_at_zero
from deeppicarditeration_tpu.training.picard import PicardRunner


def _tiny_cfg(tmp_path, **overrides):
    cfg = default_cfg()
    cfg.NAME = "tiny_e2e"
    cfg.FORCE = True
    cfg.EQUATION.cls = "Cha"
    # k = 1.0 at nx = 4 gives k_eff = 0.5 — the same nonlinearity strength
    # as the shipped 100-d config (k = 5, k_eff = 5/sqrt(100) = 0.5). At
    # much larger k_eff the Picard map exhibits its genuine transient
    # growth (L^k T^k / k!) and needs ~LT iterations to turn around.
    cfg.EQUATION.kwargs = {"nx": 4, "alpha": 1.0, "k": 1.0, "T": 1.0}
    cfg.PICARD.N = 3
    cfg.DATA.DATA_SIZE = 512
    cfg.DATA.CHUNK_ELEMS = 2 ** 16
    cfg.DATA.kwargs = {"t_always_uniform": True,
                       "n_estimate_terminal": 512,
                       "n_estimate_integral": 512}
    cfg.TRAIN.BATCH_SIZE = 128
    cfg.TRAIN.N_EPOCHS = 30
    cfg.TRAIN.SUPERVISE_GRADIENT = True
    cfg.TRAIN.OPTIMIZER.kwargs = {"lr": 3e-3}
    cfg.TRAIN.LOSS.SCALER.cls = "FixedLossScaler"
    cfg.TRAIN.LOSS.SCALER.kwargs = {"fixed_weight": 1.0}
    cfg.NETWORK.NEURONS = [32, 32]
    cfg.NETWORK.ACTIVATIONS = ["ELU", "ELU"]
    cfg.NETWORK.RELOAD = True
    cfg.EVAL.L2_N_POINTS = 500
    cfg.EVAL.FREQ = None
    cfg.EVAL.TEST_GRAD = True
    for k, v in overrides.items():
        node = cfg
        parts = k.split(".")
        for p in parts[:-1]:
            node = node[p]
        node[parts[-1]] = v
    return cfg


@pytest.fixture(scope="module")
def trained_runner(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("e2e")
    cfg = _tiny_cfg(tmp)
    runner = PicardRunner(cfg, exp_root=tmp)
    runner.run()
    return runner


def test_e2e_rrmse_improves(trained_runner):
    runner = trained_runner
    key = jax.random.PRNGKey(99)
    # zero solution baseline rRMSE is 1.0 by construction
    m_final = eval_solution(key, runner.u_current, runner.equation, 1000,
                            test_grad=True)
    assert m_final["rRMSE"] < 0.08, m_final
    assert m_final["rRMSEg"] < 0.6, m_final
    # iterate-over-iterate improvement (u_history[0] is the zero solution)
    m_first = eval_solution(key, runner.u_history[1], runner.equation, 1000)
    assert m_final["rRMSE"] < m_first["rRMSE"]


def test_e2e_checkpoints_and_logs(trained_runner):
    runner = trained_runner
    for i in range(1, runner.N + 1):
        assert (runner.exp_dir / f"model_{i}").exists()
    assert (runner.exp_dir / "config.yaml").exists()
    lines = [json.loads(l) for l in
             (runner.exp_dir / "metrics.jsonl").read_text().splitlines()]
    assert any(r["context"] == "train" for r in lines)


def test_e2e_self_consistency(trained_runner):
    runner = trained_runner
    rec = monte_carlo_at_zero(jax.random.PRNGKey(5), runner.equation,
                              runner.u_current, n_estimate=20_000,
                              chunk_elems=2 ** 16)
    # exact u(0, 0) = sigmoid(0) = 0.5
    assert abs(rec["u_net_at_zero"] - 0.5) < 0.05
    assert rec["self_consistency_error"] < 0.05


def test_e2e_experiment_evaluator(trained_runner):
    from deeppicarditeration_tpu.evaluation.experiment import (
        ExperimentEvaluator,
    )

    ev = ExperimentEvaluator(trained_runner.exp_dir,
                             n_estimate_terminal=4096,
                             n_estimate_integral=4096)
    recs = ev.monte_carlo_at_zero(iters=[0, trained_runner.N])
    assert recs[0]["u_net_at_zero"] == 0.0  # zero solution
    assert recs[-1]["self_consistency_error"] < 0.1
    l2 = ev.l2(200)
    assert l2[-1]["l2_td"] < 0.1

    # l2_file sweep against a reference-format H5 (tx, u) file
    # (experiment_evaluator.py:103-111)
    import h5py
    import numpy as np

    eq = trained_runner.equation
    key = jax.random.PRNGKey(9)
    t = jax.random.uniform(key, (128, 1)) * eq.T
    x = eq.sample_x(jax.random.fold_in(key, 1), t)
    tx = np.concatenate([np.asarray(t), np.asarray(x)], axis=1)
    u = np.asarray(eq.exact_solution(t, x))
    h5_path = trained_runner.exp_dir / "sol_file.h5"
    with h5py.File(h5_path, "w") as f:
        f["tx"], f["u"] = tx, u
    lf = ev.l2_file(h5_path)
    assert len(lf) == trained_runner.N
    assert lf[-1]["l2"] < 0.1
    assert (trained_runner.exp_dir
            / f"iter_{trained_runner.N:03d}_of_given_file"
              "_error_distribution.png").exists()


def test_e2e_exact_data_mode(tmp_path):
    """DATA.EXACT isolates the regression stack from the estimators
    (survey §4.3): training on oracle targets must fit tightly."""
    cfg = _tiny_cfg(tmp_path, **{"NAME": "tiny_exact", "PICARD.N": 1,
                                 "DATA.EXACT": True, "TRAIN.N_EPOCHS": 60})
    runner = PicardRunner(cfg, exp_root=tmp_path)
    runner.run()
    m = eval_solution(jax.random.PRNGKey(3), runner.u_current,
                      runner.equation, 800)
    assert m["rRMSE"] < 0.05, m
