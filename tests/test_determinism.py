"""Determinism: same seed => identical datasets, params, and metrics.

The reference has no determinism story (global torch RNG + worker
processes); explicit keys make full-run reproducibility a testable
property (survey §5.2: determinism tests replace race detection).
"""

import jax
import jax.numpy as jnp
import numpy as np

from deeppicarditeration_tpu.equations import make_equation
from deeppicarditeration_tpu.models.solution import Solution
from deeppicarditeration_tpu.ops import estimators as est
from deeppicarditeration_tpu.training.picard import PicardRunner
from tests.test_picard_e2e import _tiny_cfg


def test_generation_deterministic(key):
    eq = make_equation("Cha", nx=4, alpha=1.0, k=1.0)
    sol = Solution.zero(4)
    gen = est.GenConfig(n_estimate_terminal=64, n_estimate_integral=64,
                        t_always_uniform=True, chunk_elems=2 ** 12)
    tx1, y1 = est.sample_batch(key, eq, sol, 32, gen, mode="gradient")
    tx2, y2 = est.sample_batch(key, eq, sol, 32, gen, mode="gradient")
    np.testing.assert_array_equal(np.asarray(tx1), np.asarray(tx2))
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))


def test_full_run_deterministic(tmp_path):
    def run(name):
        cfg = _tiny_cfg(tmp_path, **{"NAME": name, "PICARD.N": 1,
                                     "TRAIN.N_EPOCHS": 3,
                                     "DATA.DATA_SIZE": 128})
        runner = PicardRunner(cfg, exp_root=tmp_path)
        runner.run()
        return runner.u_current.params

    p1 = run("det_a")
    p2 = run("det_b")
    leaves1 = jax.tree_util.tree_leaves(p1)
    leaves2 = jax.tree_util.tree_leaves(p2)
    for a, b in zip(leaves1, leaves2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
