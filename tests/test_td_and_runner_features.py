"""TD (short-horizon) estimators + runner feature coverage
(RELOAD / DATA.SAVE / offline replay / TwoLayer / PRETRAIN)."""

import json
import pathlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deeppicarditeration_tpu.config import default_cfg
from deeppicarditeration_tpu.data.dataset import load_dataset
from deeppicarditeration_tpu.equations import make_equation
from deeppicarditeration_tpu.evaluation.evaluator import eval_solution
from deeppicarditeration_tpu.models.solution import Solution
from deeppicarditeration_tpu.ops import estimators as est
from deeppicarditeration_tpu.training import checkpoint as ckpt
from deeppicarditeration_tpu.training.picard import PicardRunner

NX = 4


# ---------------------------------------------------------------------------
# TD estimators
# ---------------------------------------------------------------------------

def test_td_terminal_reduces_to_standard_when_horizon_covers_T(key):
    """delta_t >= T: t_next == T, so the TD terminal == plain terminal."""
    eq = make_equation("Cha", nx=NX, alpha=1.0, k=1.0, T=1.0)
    sol = Solution.zero(NX)
    m = 512
    t = jnp.full((8, 1), 0.3)
    x = jax.random.normal(key, (8, NX))
    tx = jnp.concatenate([t, x], axis=-1)
    gen_std = est.GenConfig(n_estimate_terminal=m, chunk_elems=2 ** 14)
    gen_td = est.GenConfig(n_estimate_terminal=m, chunk_elems=2 ** 14,
                           estimate_delta_t=5.0)
    out_std = est.estimate_terminal_with_gradients(key, eq, tx, gen_std)
    out_td = est.estimate_terminal_with_gradients_td(key, eq, sol, tx, gen_td)
    np.testing.assert_allclose(np.asarray(out_std), np.asarray(out_td),
                               rtol=1e-5, atol=1e-5)


def test_td_terminal_bootstraps_from_solution(key):
    """Short horizon: gT comes from u_k(t_next, .), so with the ORACLE as
    u_k the TD target estimates u(t, x) itself (tower property)."""
    eq = make_equation("Cha", nx=NX, alpha=1.0, k=1.0, T=1.0)
    sol = Solution.oracle(eq)
    m = 20000
    gen = est.GenConfig(n_estimate_terminal=m, chunk_elems=2 ** 16,
                        estimate_delta_t=0.25)
    t = jnp.full((8, 1), 0.2)
    x = jax.random.normal(key, (8, NX)) * 0.5
    tx = jnp.concatenate([t, x], axis=-1)
    out = est.estimate_terminal_with_gradients_td(key, eq, sol, tx, gen)
    # E[u(t_next, X_{t_next})] = u(t, x) + integral-of-f correction; for the
    # value slot the tower property gives u(t,x) - E int_t^{t_next} f ds.
    # We only assert finiteness + rough magnitude here; the full identity
    # is covered by the generate_with_gradients TD fixed-point test below.
    assert np.all(np.isfinite(np.asarray(out)))


def test_td_full_target_fixed_point(key):
    """TD terminal + TD integral with the oracle == exact solution
    (the short-horizon Feynman-Kac identity)."""
    eq = make_equation("Cha", nx=NX, alpha=1.0, k=1.0, T=1.0)
    sol = Solution.oracle(eq)
    m = 20000
    gen = est.GenConfig(n_estimate_terminal=m, n_estimate_integral=m,
                        chunk_elems=2 ** 16, estimate_delta_t=0.25)
    t = jnp.full((8, 1), 0.2)
    x = jax.random.normal(key, (8, NX)) * 0.5
    tx = jnp.concatenate([t, x], axis=-1)
    # value-bootstrap terminal + TD integral (the solution_output_dim == 1
    # dispatch, data.py:1209-1214; ValueGradient solutions route to the
    # bygx variant whose value slot is zero by design)
    out = (est.estimate_terminal_with_gradients_td(key, eq, sol, tx, gen)
           + est.estimate_integral_with_gradients_td(key, eq, sol, tx, gen))
    u_exact = np.asarray(eq.exact_solution(t, x))
    np.testing.assert_allclose(np.asarray(out[:, :1]), u_exact, atol=0.05)


# ---------------------------------------------------------------------------
# runner features
# ---------------------------------------------------------------------------

def _mk_cfg(name, **kv):
    cfg = default_cfg()
    cfg.NAME = name
    cfg.FORCE = True
    cfg.EQUATION.cls = "Cha"
    cfg.EQUATION.kwargs = {"nx": NX, "alpha": 1.0, "k": 1.0, "T": 1.0}
    cfg.PICARD.N = 2
    cfg.DATA.DATA_SIZE = 128
    cfg.DATA.CHUNK_ELEMS = 2 ** 14
    cfg.DATA.kwargs = {"t_always_uniform": True, "n_estimate_terminal": 64,
                       "n_estimate_integral": 64}
    cfg.TRAIN.BATCH_SIZE = 64
    cfg.TRAIN.N_EPOCHS = 3
    cfg.NETWORK.NEURONS = [16]
    cfg.NETWORK.ACTIVATIONS = ["Tanh"]
    cfg.EVAL.FREQ = None
    for k, v in kv.items():
        node = cfg
        parts = k.split(".")
        for p in parts[:-1]:
            node = node[p]
        node[parts[-1]] = v
    return cfg


def test_data_save_and_offline_replay(tmp_path):
    cfg = _mk_cfg("save_test", **{"DATA.SAVE": True, "PICARD.N": 1})
    runner = PicardRunner(cfg, exp_root=tmp_path)
    runner.run()
    saved = runner.exp_dir / "data_iter_1.npz"
    assert saved.exists()
    ds = load_dataset(saved)
    assert ds.tx.shape == (128, 1 + NX)
    # offline replay of the saved dataset (value column only usage needs
    # the same target_dim; offline mode trains on whatever was saved)
    cfg2 = _mk_cfg("offline_test", **{"DATA.ONLINE": False,
                                      "PICARD.N": 1,
                                      "DATA.TRAIN_FILE": str(saved)})
    runner2 = PicardRunner(cfg2, exp_root=tmp_path)
    runner2.run()
    assert (runner2.exp_dir / "model_1").exists()


def test_reload_warm_start(tmp_path):
    cfg = _mk_cfg("reload_test", **{"NETWORK.RELOAD": True})
    runner = PicardRunner(cfg, exp_root=tmp_path)
    runner.run()
    # both checkpoints exist and iteration 2 started from iteration 1
    p1 = ckpt.load_params(ckpt.ckpt_path(runner.exp_dir, 1),
                          runner.u_current.params)
    assert jax.tree_util.tree_structure(p1) == jax.tree_util.tree_structure(
        runner.u_current.params)


def test_pretrain_path(tmp_path):
    cfg = _mk_cfg("pre_src", **{"PICARD.N": 1})
    src = PicardRunner(cfg, exp_root=tmp_path)
    src.run()
    pre = str(ckpt.ckpt_path(src.exp_dir, 1))
    cfg2 = _mk_cfg("pre_dst", **{"PICARD.N": 1,
                                 "NETWORK.PRETRAIN_PATH": pre})
    dst = PicardRunner(cfg2, exp_root=tmp_path)
    key = jax.random.PRNGKey(0)
    dst.run_one()
    assert dst.i == 1


def test_two_layer_formula(tmp_path):
    cfg = _mk_cfg("two_layer", **{"PICARD.FORMULA": "TwoLayer",
                                  "PICARD.N": 3,
                                  "TRAIN.SUPERVISE_GRADIENT": False})
    # Cha has a gradient term, so supervise_gradient auto-trips; use the
    # toy gradient-free equation path instead: force Value net + no grad
    cfg.EQUATION.cls = "Cha"
    runner = PicardRunner(cfg, exp_root=tmp_path)
    # monkeypatch the supervise flag to exercise the two-layer value mode
    runner.supervise_gradient = False
    runner.run()
    assert len(runner.u_history) == 4


def test_force_overwrite_semantics(tmp_path):
    cfg = _mk_cfg("force_test", **{"PICARD.N": 1})
    r1 = PicardRunner(cfg, exp_root=tmp_path)
    r1.run()
    cfg_no_force = _mk_cfg("force_test", **{"PICARD.N": 1})
    cfg_no_force.defrost()
    cfg_no_force.FORCE = False
    with pytest.raises(FileExistsError):
        PicardRunner(cfg_no_force, exp_root=tmp_path)
    # FORCE: true wipes and reruns
    PicardRunner(_mk_cfg("force_test", **{"PICARD.N": 1}),
                 exp_root=tmp_path)


@pytest.mark.parametrize("method", ["OptimalControl", "DeepNesting"])
def test_method_cls_fall_through_runs_picard(tmp_path, method):
    """METHOD.cls values with no special-case branch fall through to the
    standard Picard path (reference picard_iteration.py:253-264; the
    hjb_control / hjb_nest recipes rely on this — survey §2 row 3)."""
    cfg = _mk_cfg(f"fallthrough_{method}", **{"PICARD.N": 1})
    cfg.defrost()
    cfg.METHOD.cls = method
    runner = PicardRunner(cfg, exp_root=tmp_path)
    runner.run()
    assert ckpt.ckpt_path(runner.exp_dir, 1).exists()


def test_data_save_h5_and_reference_label_replay(tmp_path):
    """DATA.SAVE_FORMAT h5 roundtrip + reading the reference's split_NN.h5
    label layout (data_saver.py:25-54: per-label datasets tx / u_ux)."""
    h5py = pytest.importorskip("h5py")
    import numpy as np

    cfg = _mk_cfg("save_h5_test", **{"DATA.SAVE": True,
                                     "DATA.SAVE_FORMAT": "h5",
                                     "PICARD.N": 1})
    runner = PicardRunner(cfg, exp_root=tmp_path)
    runner.run()
    saved = runner.exp_dir / "data_iter_1.h5"
    assert saved.exists()
    ds = load_dataset(saved)
    assert ds.tx.shape == (128, 1 + NX)

    ref = tmp_path / "split_00.h5"
    with h5py.File(ref, "w") as f:
        f.create_dataset("tx", data=np.asarray(ds.tx))
        f.create_dataset("u_ux", data=np.asarray(ds.y))
    ds2 = load_dataset(ref)
    assert np.allclose(np.asarray(ds2.y), np.asarray(ds.y))


def test_data_save_ext_validation():
    """SAVE_FORMAT is validated once for both the save and replay paths."""
    from deeppicarditeration_tpu.data.dataset import data_save_ext

    assert data_save_ext("npz") == "npz"
    assert data_save_ext("h5") == "h5"
    assert data_save_ext("hdf5") == "h5"
    assert data_save_ext("H5") == "h5"
    with pytest.raises(ValueError):
        data_save_ext("parquet")
