"""Baseline solver smoke + sanity tests (PINN / D-DBSDE / DBDP).

Tiny budgets: these check wiring, shapes, finiteness, and that a few
hundred steps move the solution toward the oracle on a small problem.
"""

import jax
import numpy as np
import pytest

from deeppicarditeration_tpu.config import default_cfg
from deeppicarditeration_tpu.evaluation.evaluator import eval_solution
from deeppicarditeration_tpu.training.picard import PicardRunner


def _base_cfg(name, method, nx=4, epochs=150):
    cfg = default_cfg()
    cfg.NAME = name
    cfg.FORCE = True
    cfg.EQUATION.cls = "Cha"
    cfg.EQUATION.kwargs = {"nx": nx, "alpha": 1.0, "k": 1.0, "T": 1.0}
    cfg.METHOD.cls = method
    cfg.PICARD.N = 1
    cfg.TRAIN.BATCH_SIZE = 256
    cfg.TRAIN.N_EPOCHS = epochs
    cfg.TRAIN.LOSS.beta = 10.0
    cfg.NETWORK.NEURONS = [32, 32]
    cfg.NETWORK.ACTIVATIONS = ["Tanh", "Tanh"]
    cfg.EVAL.L2_N_POINTS = 200
    cfg.EVAL.FREQ = 100
    cfg.EVAL.TEST_GRAD = False
    return cfg


def test_pinn_baseline_runs_and_improves(tmp_path):
    cfg = _base_cfg("pinn_smoke", "PINN", epochs=600)
    cfg.METHOD.num_v_samples = 4
    runner = PicardRunner(cfg, exp_root=tmp_path)
    runner.run_one()
    m = eval_solution(jax.random.PRNGKey(0), runner.u_current,
                      runner.equation, 400)
    assert np.isfinite(m["rRMSE"])
    assert m["rRMSE"] < 0.5, m  # zero-function baseline is 1.0


def test_pinn_exact_laplacian_path(tmp_path):
    cfg = _base_cfg("pinn_exact_lap", "PINN", epochs=50)
    cfg.METHOD.num_v_samples = -1  # exact Laplacian (loop over dims)
    runner = PicardRunner(cfg, exp_root=tmp_path)
    runner.run_one()
    m = eval_solution(jax.random.PRNGKey(0), runner.u_current,
                      runner.equation, 200)
    assert np.isfinite(m["rRMSE"])


def test_pinn_sdgd_on_fully_nonlinear(tmp_path):
    cfg = _base_cfg("pinn_sdgd", "PINN", epochs=50)
    cfg.EQUATION.cls = "GBMEquationComplexExact"
    cfg.EQUATION.kwargs = {"nx": 4, "alpha": 1.0, "T": 1.0}
    cfg.DATA.HESSIAN_APPROXIMATION.method = "SDGD"
    cfg.DATA.HESSIAN_APPROXIMATION.kwargs = {"v": 2}
    runner = PicardRunner(cfg, exp_root=tmp_path)
    runner.run_one()
    m = eval_solution(jax.random.PRNGKey(0), runner.u_current,
                      runner.equation, 200)
    assert np.isfinite(m["rRMSE"])


def test_diffusion_baseline_runs_and_improves(tmp_path):
    cfg = _base_cfg("diff_smoke", "Diffusion", epochs=600)
    cfg.METHOD.K = 10
    cfg.METHOD.dt = 0.02
    runner = PicardRunner(cfg, exp_root=tmp_path)
    runner.run_one()
    m = eval_solution(jax.random.PRNGKey(0), runner.u_current,
                      runner.equation, 400)
    assert np.isfinite(m["rRMSE"])
    assert m["rRMSE"] < 0.5, m


def _final_loss(exp_dir, context):
    import json

    recs = [json.loads(l)
            for l in (exp_dir / "metrics.jsonl").read_text().splitlines()]
    return [r for r in recs if r["context"] == context][-1]["loss"]


@pytest.mark.parametrize("method,ctx", [("PINN", "pinn"),
                                        ("Diffusion", "diffusion")])
def test_baseline_sharded_matches_single_device(tmp_path, method, ctx):
    """PINN/Diffusion batches now route through the runner mesh: the loss
    on the 8-device mesh must equal the single-device loss (threefry draws
    are partitionable; the loss is a mean over points) up to reduction
    reassociation (VERDICT r1 item 5)."""
    losses = {}
    for tag, shape in (("single", [1]), ("mesh8", None)):
        cfg = _base_cfg(f"{ctx}_{tag}", method, epochs=30)
        cfg.METHOD.num_v_samples = 4
        cfg.METHOD.K = 5
        cfg.METHOD.dt = 0.02
        cfg.TRAIN.BATCH_SIZE = 64
        cfg.EVAL.FREQ = 30
        cfg.MESH.SHAPE = shape
        runner = PicardRunner(cfg, exp_root=tmp_path)
        assert runner.mesh.devices.size == (1 if shape == [1] else 8)
        runner.run_one()
        losses[tag] = _final_loss(runner.exp_dir, ctx)
    np.testing.assert_allclose(losses["single"], losses["mesh8"],
                               rtol=2e-4)


def test_dbdp_sharded_matches_single_device(tmp_path):
    """DBDP path sampling + per-timestep fits over the mesh == single."""
    losses = {}
    for tag, shape in (("single", [1]), ("mesh8", None)):
        cfg = _base_cfg(f"dbdp_{tag}", "FullyNonlinearSolver", epochs=1)
        cfg.EQUATION.cls = "GBMEquationComplexExact"
        cfg.EQUATION.kwargs = {"nx": 3, "alpha": 1.0, "T": 0.2}
        cfg.METHOD.dt = 0.05  # K = 4
        cfg.METHOD.num_sub_iter = 10
        cfg.TRAIN.BATCH_SIZE = 64
        cfg.MESH.SHAPE = shape
        runner = PicardRunner(cfg, exp_root=tmp_path)
        runner.run_one()
        losses[tag] = _final_loss(runner.exp_dir, "dbdp")
    np.testing.assert_allclose(losses["single"], losses["mesh8"],
                               rtol=2e-4)


def test_pinn_periodic_checkpoint_resume_bitwise(tmp_path):
    """Killed-and-resumed PINN == uninterrupted run: the periodic
    {params, opt} save plus per-epoch RNG makes the continuation exact
    (VERDICT r1 item 6). Simulates the kill by running half the epochs
    and deleting the final model checkpoint."""
    import shutil

    def cfg_for(name, epochs, resume=False):
        cfg = _base_cfg(name, "PINN", epochs=epochs)
        cfg.METHOD.num_v_samples = 4
        cfg.TRAIN.BATCH_SIZE = 64
        cfg.EVAL.FREQ = 10
        if resume:
            cfg.FORCE = False
            cfg.RESUME = True
        return cfg

    # uninterrupted 40-epoch run
    r_full = PicardRunner(cfg_for("pinn_resume_full", 40), exp_root=tmp_path)
    r_full.run_one()
    full_leaves = jax.tree_util.tree_leaves(r_full.u_current.params)

    # "killed" after 20 epochs: periodic state exists, final ckpt gone
    r_half = PicardRunner(cfg_for("pinn_resume_half", 20), exp_root=tmp_path)
    r_half.run_one()
    from deeppicarditeration_tpu.training import checkpoint as ckpt_mod

    ckpt_mod.wait_all()
    shutil.rmtree(ckpt_mod.ckpt_path(r_half.exp_dir, 1))
    meta = (r_half.exp_dir / "baseline_1_meta.json").read_text()
    assert '"epoch": 20' in meta

    # resume to 40 — must land bitwise on the uninterrupted params
    r_res = PicardRunner(cfg_for("pinn_resume_half", 40, resume=True),
                         exp_root=tmp_path)
    r_res.run_one()
    res_leaves = jax.tree_util.tree_leaves(r_res.u_current.params)
    for a, b in zip(full_leaves, res_leaves):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # cumulative wall time is logged
    import json

    recs = [json.loads(l) for l in
            (r_res.exp_dir / "metrics.jsonl").read_text().splitlines()
            if '"context": "pinn"' in l]
    assert all("wall_time" in r for r in recs)


def test_dbdp_baseline_runs(tmp_path):
    cfg = _base_cfg("dbdp_smoke", "FullyNonlinearSolver", epochs=1)
    cfg.EQUATION.cls = "GBMEquationComplexExact"
    cfg.EQUATION.kwargs = {"nx": 3, "alpha": 1.0, "T": 0.2}
    cfg.METHOD.dt = 0.05  # K = 4
    cfg.METHOD.num_sub_iter = 30
    cfg.TRAIN.BATCH_SIZE = 128
    runner = PicardRunner(cfg, exp_root=tmp_path)
    runner.run_one()
    logs = (runner.exp_dir / "metrics.jsonl").read_text().splitlines()
    assert any('"context": "dbdp"' in l for l in logs)
    import json

    evals = [json.loads(l) for l in logs if '"context": "eval"' in l]
    assert evals and np.isfinite(evals[-1]["rRMSE"])
    # the runner must hold the TRAINED grid solution afterwards, not the
    # initial zero solution (review finding: eval of u_current was silent
    # garbage), and it must beat the zero solution on the value metric
    assert runner.u_current.kind == "net"
    from deeppicarditeration_tpu.evaluation.evaluator import eval_solution
    from deeppicarditeration_tpu.models.solution import Solution

    k = jax.random.PRNGKey(0)
    m_net = eval_solution(k, runner.u_current, runner.equation, 200)
    m_zero = eval_solution(k, Solution.zero(runner.equation.nx),
                           runner.equation, 200)
    assert np.isfinite(m_net["rRMSE"])
    assert m_net["rRMSE"] < m_zero["rRMSE"]


def test_dbdp_resume_skips_completed_iterations(tmp_path):
    """RESUME on a finished DBDP run must not try to restore the stacked
    pair pytree into the single-net template (review finding): completed
    iterations are skipped and the runner constructs cleanly."""
    cfg = _base_cfg("dbdp_resume", "FullyNonlinearSolver", epochs=1)
    cfg.EQUATION.cls = "GBMEquationComplexExact"
    cfg.EQUATION.kwargs = {"nx": 3, "alpha": 1.0, "T": 0.2}
    cfg.METHOD.dt = 0.1  # K = 2
    cfg.METHOD.num_sub_iter = 5
    cfg.TRAIN.BATCH_SIZE = 64
    runner = PicardRunner(cfg, exp_root=tmp_path)
    runner.run_one()
    from deeppicarditeration_tpu.training import checkpoint as ckpt_mod

    ckpt_mod.wait_all()
    # mid-run periodic state lives on its own path, never model_{i}
    assert (runner.exp_dir / "baseline_1_state").exists()

    cfg2 = cfg.clone()
    cfg2.FORCE = False
    cfg2.RESUME = True
    cfg2.freeze()
    r2 = PicardRunner(cfg2, exp_root=tmp_path)  # must not raise
    assert r2.i == 1  # completed iteration skipped; run() would do nothing
