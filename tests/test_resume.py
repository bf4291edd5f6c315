"""RESUME: continuing an interrupted run from its latest checkpoint must
reproduce the uninterrupted run bitwise (all per-iteration RNG is keyed by
the iteration index, and the only cross-iteration state is u_current, which
the checkpoint restores exactly).

The reference has no resume; its FORCE-or-fail semantics
(picard_iteration.py:124-141) are kept for the non-RESUME path.
"""

import jax
import numpy as np
import pytest

from deeppicarditeration_tpu.config import default_cfg
from deeppicarditeration_tpu.models.factory import init_solution
from deeppicarditeration_tpu.training import checkpoint as ckpt
from deeppicarditeration_tpu.training.picard import PicardRunner


def _cfg(n_iters=3):
    cfg = default_cfg()
    cfg.NAME = "resume_test"
    cfg.FORCE = True
    cfg.EQUATION.cls = "Cha"
    cfg.EQUATION.kwargs = {"nx": 3, "alpha": 1.0, "k": 1.0, "T": 1.0}
    cfg.PICARD.N = n_iters
    cfg.DATA.DATA_SIZE = 256
    cfg.DATA.CHUNK_ELEMS = 2 ** 14
    cfg.DATA.kwargs = {"t_always_uniform": True,
                       "n_estimate_terminal": 64,
                       "n_estimate_integral": 64}
    cfg.TRAIN.BATCH_SIZE = 64
    cfg.TRAIN.N_EPOCHS = 4
    cfg.TRAIN.SUPERVISE_GRADIENT = True
    cfg.NETWORK.NEURONS = [16, 16]
    cfg.NETWORK.ACTIVATIONS = ["ELU", "ELU"]
    cfg.EVAL.FREQ = None
    return cfg


def _leaves(params):
    return [np.asarray(x) for x in jax.tree_util.tree_leaves(params)]


def test_resume_bitwise_matches_uninterrupted(tmp_path):
    full_dir, int_dir = tmp_path / "full", tmp_path / "interrupted"

    runner_a = PicardRunner(_cfg(), exp_root=full_dir)
    runner_a.run()

    # "interrupted" after one iteration
    runner_b = PicardRunner(_cfg(), exp_root=int_dir)
    runner_b.run_one()
    runner_b.u_history.append(runner_b.u_current)
    del runner_b

    cfg_resume = _cfg()
    cfg_resume.FORCE = False
    cfg_resume.RESUME = True
    runner_c = PicardRunner(cfg_resume, exp_root=int_dir)
    assert runner_c.i == 1, "resume should pick up after iteration 1"
    runner_c.run()

    template = init_solution(jax.random.PRNGKey(0), runner_a.cfg,
                             runner_a.equation, module=runner_a.module)
    for i in (2, 3):
        pa = ckpt.load_params(ckpt.ckpt_path(runner_a.exp_dir, i),
                              template.params)
        pc = ckpt.load_params(ckpt.ckpt_path(runner_c.exp_dir, i),
                              template.params)
        for la, lc in zip(_leaves(pa), _leaves(pc)):
            np.testing.assert_array_equal(la, lc)


def test_mid_iteration_resume_replays_saved_dataset(tmp_path, capsys):
    """Killed after generating iteration 2's dataset but before its
    checkpoint: resume replays data_iter_2.npz (no regeneration) and ends
    bitwise-identical to the uninterrupted run."""
    full_dir, int_dir = tmp_path / "full", tmp_path / "interrupted"

    cfg = _cfg(2)
    cfg.DATA.SAVE = True
    runner_a = PicardRunner(cfg, exp_root=full_dir)
    runner_a.run()

    cfg = _cfg(2)
    cfg.DATA.SAVE = True
    runner_b = PicardRunner(cfg, exp_root=int_dir)
    runner_b.run_one()  # iteration 1 complete
    # fabricate the mid-iteration-2 kill: dataset written, no checkpoint
    gen = __import__(
        "deeppicarditeration_tpu.training.picard",
        fromlist=["gen_config_from_cfg"]).gen_config_from_cfg(cfg, 2)
    runner_b.i = 2
    import jax as _jax
    ds = runner_b._make_dataset(
        _jax.random.fold_in(_jax.random.fold_in(runner_b.root_key, 2), 1),
        gen, runner_b.generation_mode)
    assert (runner_b.exp_dir / "data_iter_2.npz").exists()
    del runner_b, ds

    cfg_resume = _cfg(2)
    cfg_resume.DATA.SAVE = True
    cfg_resume.FORCE = False
    cfg_resume.RESUME = True
    runner_c = PicardRunner(cfg_resume, exp_root=int_dir)
    assert runner_c.i == 1
    capsys.readouterr()
    runner_c.run()
    assert "replaying saved dataset data_iter_2.npz" in capsys.readouterr().out

    template = init_solution(jax.random.PRNGKey(0), runner_a.cfg,
                             runner_a.equation, module=runner_a.module)
    pa = ckpt.load_params(ckpt.ckpt_path(runner_a.exp_dir, 2),
                          template.params)
    pc = ckpt.load_params(ckpt.ckpt_path(runner_c.exp_dir, 2),
                          template.params)
    for la, lc in zip(_leaves(pa), _leaves(pc)):
        np.testing.assert_array_equal(la, lc)


def test_resume_noop_on_fresh_dir(tmp_path):
    cfg = _cfg(1)
    cfg.RESUME = True
    runner = PicardRunner(cfg, exp_root=tmp_path)
    assert runner.i == 0
    runner.run()
    assert ckpt.ckpt_path(runner.exp_dir, 1).exists()


def test_without_resume_or_force_raises(tmp_path):
    runner = PicardRunner(_cfg(1), exp_root=tmp_path)
    runner.run()
    cfg = _cfg(1)
    cfg.FORCE = False
    with pytest.raises(FileExistsError):
        PicardRunner(cfg, exp_root=tmp_path)
