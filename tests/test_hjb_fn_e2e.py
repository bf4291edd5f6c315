"""E2E DPI on the HJB (OU) and fully-nonlinear (GBM) families, tiny-d."""

import jax
import numpy as np
import pytest

from deeppicarditeration_tpu.config import default_cfg
from deeppicarditeration_tpu.evaluation.evaluator import eval_solution
from deeppicarditeration_tpu.training.picard import PicardRunner


def _cfg(name, eq_cls, eq_kwargs, **kv):
    cfg = default_cfg()
    cfg.NAME = name
    cfg.FORCE = True
    cfg.EQUATION.cls = eq_cls
    cfg.EQUATION.kwargs = eq_kwargs
    cfg.PICARD.N = 4
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
    cfg.TRAIN.LOSS.SCALER.kwargs = {"fixed_weight": 0.1}
    cfg.NETWORK.NEURONS = [48, 48]
    cfg.NETWORK.ACTIVATIONS = ["ELU", "ELU"]
    cfg.NETWORK.RELOAD = True
    cfg.EVAL.FREQ = None
    for k, v in kv.items():
        node = cfg
        parts = k.split(".")
        for p in parts[:-1]:
            node = node[p]
        node[parts[-1]] = v
    return cfg


def test_hjb_ou_dpi_converges(tmp_path):
    cfg = _cfg("hjb_e2e", "OUProcessEquation",
               {"nx": 4, "alpha": 1.0, "T": 1.0, "num_components": 2,
                "mean_scale": 1.0, "var_scale": 2.0, "alpha_scale": 4.0},
               **{"PICARD.N": 6, "TRAIN.N_EPOCHS": 40})
    runner = PicardRunner(cfg, exp_root=tmp_path)
    runner.run()
    m = eval_solution(jax.random.PRNGKey(7), runner.u_current,
                      runner.equation, 800, test_grad=True)
    assert m["rRMSE"] < 0.12, m
    m0 = eval_solution(jax.random.PRNGKey(7), runner.u_history[1],
                       runner.equation, 800)
    assert m["rRMSE"] < m0["rRMSE"]


def test_hjb_pisgradnet_smoke(tmp_path):
    cfg = _cfg("hjb_pis", "OUProcessEquation",
               {"nx": 4, "alpha": 1.0, "T": 1.0, "num_components": 2},
               **{"PICARD.N": 2, "NETWORK.PISGRADNET": True,
                  "TRAIN.N_EPOCHS": 15})
    runner = PicardRunner(cfg, exp_root=tmp_path)
    runner.run()
    m = eval_solution(jax.random.PRNGKey(7), runner.u_current,
                      runner.equation, 400)
    assert np.isfinite(m["rRMSE"])
    assert m["rRMSE"] < 0.5, m


def test_fully_nonlinear_sdgd_dpi(tmp_path):
    """GBM equation with SDGD sampled diagonals (the reference's case-1
    shape, value+gradient supervision, Hessian term inside f)."""
    cfg = _cfg("fn_e2e", "GBMEquationComplexExact",
               {"nx": 4, "alpha": 1.0, "T": 1.0},
               **{"PICARD.N": 3, "DATA.DATA_SIZE": 256,
                  "TRAIN.N_EPOCHS": 30,
                  "DATA.kwargs": {"t_always_uniform": True,
                                  "n_estimate_terminal": 256,
                                  "n_estimate_integral": 256}})
    cfg.DATA.HESSIAN_APPROXIMATION.method = "SDGD"
    cfg.DATA.HESSIAN_APPROXIMATION.kwargs = {"v": 4}
    runner = PicardRunner(cfg, exp_root=tmp_path)
    runner.run()
    m = eval_solution(jax.random.PRNGKey(7), runner.u_current,
                      runner.equation, 400, test_grad=True)
    assert np.isfinite(m["rRMSE"])
    assert m["rRMSE"] < 0.35, m


def test_fully_nonlinear_hessian_supervision_smoke(tmp_path):
    """Hessian-target generation + Hessian-supervised training wiring."""
    cfg = _cfg("fn_hess", "GBMEquationComplexExact",
               {"nx": 3, "alpha": 1.0, "T": 0.5},
               **{"PICARD.N": 1, "DATA.DATA_SIZE": 128,
                  "TRAIN.N_EPOCHS": 5, "TRAIN.SUPERVISE_HESSIAN": True,
                  "TRAIN.NUM_HESS_SAMPLES": 4,
                  "DATA.kwargs": {"t_always_uniform": True,
                                  "n_estimate_terminal": 128,
                                  "n_estimate_integral": 128}})
    cfg.TRAIN.LOSS.SCALER.cls = "FixedHessianLossScaler"
    cfg.TRAIN.LOSS.SCALER.kwargs = {"fixed_gradient_weight": 0.1,
                                    "fixed_hessian_weight": 0.01}
    runner = PicardRunner(cfg, exp_root=tmp_path)
    runner.run()
    m = eval_solution(jax.random.PRNGKey(7), runner.u_current,
                      runner.equation, 200)
    assert np.isfinite(m["rRMSE"])
