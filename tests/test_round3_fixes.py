"""Round-3 hardening: dataset-replay provenance, generation dispatch
bounds, plateau LR surfacing, sublane-degenerate Pallas tile guards,
narrowed baseline-resume recovery, and EVAL.FREQ edge cases."""

import dataclasses
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deeppicarditeration_tpu.config import default_cfg
from deeppicarditeration_tpu.data.dataset import (
    DeviceDataset,
    default_gen_batch,
    load_provenance,
    save_dataset,
)
from deeppicarditeration_tpu.ops import estimators as est
from deeppicarditeration_tpu.training.picard import PicardRunner


def _cfg(n_iters=1, nx=3):
    cfg = default_cfg()
    cfg.NAME = "r3_test"
    cfg.FORCE = True
    cfg.EQUATION.cls = "Cha"
    cfg.EQUATION.kwargs = {"nx": nx, "alpha": 1.0, "k": 1.0, "T": 1.0}
    cfg.PICARD.N = n_iters
    cfg.DATA.DATA_SIZE = 256
    cfg.DATA.CHUNK_ELEMS = 2 ** 14
    cfg.DATA.kwargs = {"t_always_uniform": True,
                       "n_estimate_terminal": 64,
                       "n_estimate_integral": 64}
    cfg.TRAIN.BATCH_SIZE = 64
    cfg.TRAIN.N_EPOCHS = 2
    cfg.TRAIN.SUPERVISE_GRADIENT = True
    cfg.NETWORK.NEURONS = [16, 16]
    cfg.NETWORK.ACTIVATIONS = ["ELU", "ELU"]
    cfg.EVAL.FREQ = None
    return cfg


# ---------------------------------------------------------------------------
# dataset-replay provenance
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("ext", ["npz", "h5"])
def test_provenance_roundtrip(tmp_path, ext):
    ds = DeviceDataset(tx=jnp.ones((4, 3)), y=jnp.zeros((4, 1)))
    prov = {"seed": 3, "iteration": 2, "gen": "GenConfig(...)"}
    p = tmp_path / f"d.{ext}"
    save_dataset(p, ds, provenance=prov)
    assert load_provenance(p) == prov
    p2 = tmp_path / f"unstamped.{ext}"
    save_dataset(p2, ds)
    assert load_provenance(p2) is None


def test_resume_refuses_poisoned_stale_dataset(tmp_path, capsys):
    """A data_iter_{i} file with the right row count but a mismatched
    provenance stamp (stale file from an earlier FORCE run with different
    settings) must be refused and regenerated — and the resumed run must
    still end bitwise-equal to the uninterrupted run (VERDICT r2 item 5)."""
    from deeppicarditeration_tpu.models.factory import init_solution
    from deeppicarditeration_tpu.training import checkpoint as ckpt
    from deeppicarditeration_tpu.training.picard import gen_config_from_cfg

    full_dir, int_dir = tmp_path / "full", tmp_path / "interrupted"
    cfg = _cfg(2)
    cfg.DATA.SAVE = True
    runner_a = PicardRunner(cfg, exp_root=full_dir)
    runner_a.run()

    cfg = _cfg(2)
    cfg.DATA.SAVE = True
    runner_b = PicardRunner(cfg, exp_root=int_dir)
    runner_b.run_one()
    runner_b.i = 2
    gen = gen_config_from_cfg(cfg, 2)
    runner_b._make_dataset(
        jax.random.fold_in(jax.random.fold_in(runner_b.root_key, 2), 1),
        gen, runner_b.generation_mode)
    saved = runner_b.exp_dir / "data_iter_2.npz"
    assert saved.exists()
    # poison the stamp (as if an earlier run with a different SEED wrote it)
    z = dict(np.load(saved))
    prov = json.loads(str(z["provenance"]))
    prov["seed"] = prov["seed"] + 17
    z["provenance"] = np.asarray(json.dumps(prov))
    np.savez_compressed(saved, **z)
    del runner_b

    cfg_resume = _cfg(2)
    cfg_resume.DATA.SAVE = True
    cfg_resume.FORCE = False
    cfg_resume.RESUME = True
    runner_c = PicardRunner(cfg_resume, exp_root=int_dir)
    capsys.readouterr()
    runner_c.run()
    out = capsys.readouterr().out
    assert "provenance mismatch" in out
    assert "replaying saved dataset" not in out

    template = init_solution(jax.random.PRNGKey(0), runner_a.cfg,
                             runner_a.equation, module=runner_a.module)
    pa = ckpt.load_params(ckpt.ckpt_path(runner_a.exp_dir, 2),
                          template.params)
    pc = ckpt.load_params(ckpt.ckpt_path(runner_c.exp_dir, 2),
                          template.params)
    for la, lc in zip(jax.tree_util.tree_leaves(pa),
                      jax.tree_util.tree_leaves(pc)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lc))


# ---------------------------------------------------------------------------
# generation dispatch bound
# ---------------------------------------------------------------------------

def test_default_gen_batch_derivation():
    # reference-default DATA_SIZE in one dispatch would put B*nx far over
    # CHUNK_ELEMS; the bound keeps B <= chunk_elems/(8 nx), rounded
    assert default_gen_batch(2048 * 5000, 2 ** 22, 100) == 5120
    # shipped recipes stay single-dispatch
    assert default_gen_batch(4096, 2 ** 22, 100) == 4096
    assert default_gen_batch(2048, 2 ** 22, 100) == 2048
    # mesh divisibility
    assert default_gen_batch(2048 * 5000, 2 ** 22, 100, ndev=8) % 8 == 0
    # degenerate sizes never return 0
    assert default_gen_batch(10, 64, 100) >= 1


def test_large_data_size_generates_in_bounded_dispatches(tmp_path, capsys):
    """A config whose DATA_SIZE exceeds the derived per-dispatch bound
    generates in multiple dispatches and still trains (VERDICT r2 item 6)."""
    cfg = _cfg()
    cfg.DATA.DATA_SIZE = 512
    cfg.DATA.CHUNK_ELEMS = 2 ** 10  # cap = 1024 // (8*3) = 42 points
    runner = PicardRunner(cfg, exp_root=tmp_path)
    assert default_gen_batch(512, 2 ** 10, 3,
                             int(runner.mesh.devices.size)) < 512
    runner.run_one()
    assert runner.u_current.kind == "net"
    # and an explicit DATA.GEN_BATCH override is honored
    cfg2 = _cfg()
    cfg2.NAME = "r3_genbatch"
    cfg2.DATA.DATA_SIZE = 256
    cfg2.DATA.GEN_BATCH = 128
    runner2 = PicardRunner(cfg2, exp_root=tmp_path)
    runner2.run_one()
    assert runner2.u_current.kind == "net"


@pytest.mark.parametrize("freq,n_epochs", [(None, 4), (None, 5), (2, 4),
                                           (2, 5)])
def test_epoch_chunking_bitwise(tmp_path, freq, n_epochs):
    """TRAIN.DISPATCH_STEPS chunking (one dispatch per epoch chunk) must
    reproduce the single-dispatch trajectory bitwise on both fused paths
    (the EVAL.FREQ=None epoch scan and the fused freq scan), including a
    non-divisor epoch count (ragged final chunk)."""
    params = {}
    for tag, dsteps in (("one", 65536), ("chunked", 8)):
        cfg = _cfg()
        cfg.NAME = f"chunk_{freq}_{n_epochs}_{tag}"
        cfg.TRAIN.N_EPOCHS = n_epochs
        cfg.EVAL.FREQ = freq
        # steps = 256/64 = 4 per epoch; bound 8 => 2 epochs per dispatch
        # (n_epochs=5 => chunks of 2, 2, 1)
        cfg.TRAIN.DISPATCH_STEPS = dsteps
        runner = PicardRunner(cfg, exp_root=tmp_path)
        runner.run_one()
        params[tag] = jax.tree_util.tree_leaves(runner.u_current.params)
    for a, b in zip(params["one"], params["chunked"]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_zero_epochs_is_a_noop_fit(tmp_path):
    """TRAIN.N_EPOCHS: 0 (generation-only config) must run, not crash."""
    cfg = _cfg()
    cfg.TRAIN.N_EPOCHS = 0
    cfg.DATA.SAVE = True
    runner = PicardRunner(cfg, exp_root=tmp_path)
    runner.run_one()
    assert (runner.exp_dir / "data_iter_1.npz").exists()


def test_explicit_gen_batch_mesh_divisibility(tmp_path):
    cfg = _cfg()
    cfg.DATA.GEN_BATCH = 100  # 8-device test mesh: 100 % 8 != 0
    runner = PicardRunner(cfg, exp_root=tmp_path)
    if runner.mesh.devices.size <= 1:
        pytest.skip("needs a multi-device mesh (conftest provides 8)")
    with pytest.raises(ValueError, match="DATA.GEN_BATCH"):
        runner.run_one()


def test_baseline_resume_bad_meta_starts_fresh(tmp_path, capsys):
    """A meta sidecar without 'epoch' must start fresh WITHOUT leaving a
    half-restored state (params untouched by the failed resume)."""
    import shutil

    from deeppicarditeration_tpu.training import checkpoint as ckpt

    cfg = _cfg()
    cfg.METHOD.cls = "PINN"
    cfg.METHOD.num_v_samples = 2
    cfg.TRAIN.N_EPOCHS = 4
    cfg.EVAL.FREQ = 2
    runner = PicardRunner(cfg, exp_root=tmp_path)
    runner.run_one()
    ckpt.wait_all()
    shutil.rmtree(ckpt.ckpt_path(runner.exp_dir, 1))
    (runner.exp_dir / "baseline_1_meta.json").write_text(
        json.dumps({"wall_time": 1.0}))  # no "epoch"
    cfg2 = _cfg()
    cfg2.METHOD.cls = "PINN"
    cfg2.METHOD.num_v_samples = 2
    cfg2.TRAIN.N_EPOCHS = 4
    cfg2.EVAL.FREQ = 2
    cfg2.FORCE = False
    cfg2.RESUME = True
    runner2 = PicardRunner(cfg2, exp_root=tmp_path)
    capsys.readouterr()
    runner2.run_one()
    assert "meta unusable" in capsys.readouterr().out


# ---------------------------------------------------------------------------
# plateau LR surfacing
# ---------------------------------------------------------------------------

def test_plateau_lr_scale_in_metrics_and_logged_lr(tmp_path):
    cfg = _cfg()
    cfg.TRAIN.N_EPOCHS = 2
    cfg.EVAL.FREQ = 2
    cfg.TRAIN.OPTIMIZER = {
        "cls": "Adam", "kwargs": {"lr": 1e-3},
        "SCHEDULER": {"cls": "ReduceLROnPlateau",
                      # huge atol => every step is a "plateau"; tiny
                      # patience => the scale drops within one epoch
                      "kwargs": {"factor": 0.5, "patience": 2,
                                 "threshold": 100.0}}}
    runner = PicardRunner(cfg, exp_root=tmp_path)
    runner.run_one()
    recs = [json.loads(l) for l in
            (runner.exp_dir / "metrics.jsonl").read_text().splitlines()]
    train = [r for r in recs if r["context"] == "train"]
    evals = [r for r in recs if r["context"] == "eval"]
    assert train and evals
    assert train[-1]["lr_scale"] < 1.0
    # the logged lr reflects the plateau reduction, not the base schedule
    assert evals[-1]["lr"] == pytest.approx(1e-3 * train[-1]["lr_scale"])
    assert evals[-1]["lr"] < 1e-3


# ---------------------------------------------------------------------------
# sublane-degenerate Pallas tile guard
# ---------------------------------------------------------------------------

def test_sublane_tile():
    assert est.sublane_tile(4096, 128) == 128
    assert est.sublane_tile(16, 512) == 16
    assert est.sublane_tile(4, 512) is None      # 4 rows/device
    assert est.sublane_tile(13, 512) is None     # prime
    assert est.sublane_tile(262, 512) is None    # 2 * prime: tile 262
    assert est.sublane_tile(136, 128) is None    # tile 68, astride sublane


@pytest.mark.parametrize("b", [4, 13])
def test_forced_pallas_falls_back_on_degenerate_batch(monkeypatch, b):
    """pallas_terminal/pallas_integral forced flags with a batch that
    cannot tile to the 8-row sublane must take the XLA path (the merged
    kernel's trial compile does not protect these standalone paths)."""
    from deeppicarditeration_tpu.equations import make_equation
    from deeppicarditeration_tpu.models.solution import Solution
    from deeppicarditeration_tpu.ops import pallas_kernels as pk

    def boom(*a, **k):
        raise AssertionError("kernel path taken for degenerate batch")

    monkeypatch.setattr(pk, "terminal_with_gradients_pallas", boom)
    monkeypatch.setattr(pk, "integral_with_gradients_pallas", boom)
    eq = make_equation("Cha", nx=3, alpha=1.0, k=1.0, T=1.0)
    sol = Solution.zero(3, "Value")
    tx = jnp.concatenate([jnp.full((b, 1), 0.3), jnp.ones((b, 3))], axis=1)
    gen_k = est.GenConfig(n_estimate_terminal=8, n_estimate_integral=8,
                          pallas_terminal=True, pallas_integral=True,
                          pallas_generate=False)
    gen_x = dataclasses.replace(gen_k, pallas_terminal=False,
                                pallas_integral=False)
    out_k = est.generate_with_gradients(jax.random.PRNGKey(0), eq, sol, tx,
                                        gen_k)
    out_x = est.generate_with_gradients(jax.random.PRNGKey(0), eq, sol, tx,
                                        gen_x)
    np.testing.assert_array_equal(np.asarray(out_k), np.asarray(out_x))


def test_merged_kernel_guard_on_degenerate_batch():
    from deeppicarditeration_tpu.equations import make_equation
    from deeppicarditeration_tpu.models.solution import Solution

    eq = make_equation("Cha", nx=3, alpha=1.0, k=1.0, T=1.0)
    sol = Solution.zero(3, "Value")
    gen = est.GenConfig(pallas_generate=True)
    assert est._pallas_generate_tile(gen, eq, sol, 12) is None
    assert est._pallas_generate_tile(gen, eq, sol, 128) == (128, False, None)


# ---------------------------------------------------------------------------
# EVAL.FREQ edge cases (ADVICE r2)
# ---------------------------------------------------------------------------

def test_eval_freq_zero_runs_without_eval(tmp_path):
    cfg = _cfg()
    cfg.EVAL.FREQ = 0  # falsy semantics: no in-training eval, no crash
    runner = PicardRunner(cfg, exp_root=tmp_path)
    runner.run_one()
    recs = [json.loads(l) for l in
            (runner.exp_dir / "metrics.jsonl").read_text().splitlines()]
    assert not [r for r in recs if r["context"] == "eval"]


def test_oversized_batch_size_raises_informatively(tmp_path):
    cfg = _cfg()
    cfg.TRAIN.BATCH_SIZE = 1024  # > DATA_SIZE = 256
    cfg.EVAL.FREQ = 8
    runner = PicardRunner(cfg, exp_root=tmp_path)
    with pytest.raises(ValueError, match="batch_size"):
        runner.run_one()


def test_explicit_fused_warns_when_gate_fails(tmp_path, capsys):
    cfg = _cfg()
    cfg.TRAIN.FUSED = True
    cfg.EVAL.FREQ = 3  # steps = 256/64 = 4, not a multiple of 3
    runner = PicardRunner(cfg, exp_root=tmp_path)
    capsys.readouterr()
    runner.run_one()
    assert "TRAIN.FUSED: true requested but unavailable" in \
        capsys.readouterr().out


# ---------------------------------------------------------------------------
# baseline resume: structural mismatch must raise, not restart silently
# ---------------------------------------------------------------------------

def test_baseline_resume_structural_mismatch_raises(tmp_path):
    cfg = _cfg()
    cfg.METHOD.cls = "PINN"
    cfg.METHOD.num_v_samples = 2
    cfg.TRAIN.N_EPOCHS = 4
    cfg.EVAL.FREQ = 2
    runner = PicardRunner(cfg, exp_root=tmp_path)
    runner.run_one()
    assert (runner.exp_dir / "baseline_1_meta.json").exists()
    # simulate a kill BEFORE the final model_1 save: only the periodic
    # baseline state remains (otherwise _maybe_resume restores model_1)
    import shutil

    from deeppicarditeration_tpu.training import checkpoint as ckpt

    ckpt.wait_all()
    shutil.rmtree(ckpt.ckpt_path(runner.exp_dir, 1))

    cfg2 = _cfg()
    cfg2.METHOD.cls = "PINN"
    cfg2.METHOD.num_v_samples = 2
    cfg2.TRAIN.N_EPOCHS = 6
    cfg2.EVAL.FREQ = 2
    cfg2.NETWORK.NEURONS = [8, 8, 8]  # different param pytree
    cfg2.NETWORK.ACTIVATIONS = ["ELU", "ELU", "ELU"]
    cfg2.FORCE = False
    cfg2.RESUME = True
    runner2 = PicardRunner(cfg2, exp_root=tmp_path)
    with pytest.raises(RuntimeError, match="does not match"):
        runner2.run_one()


def test_baseline_resume_missing_state_starts_fresh(tmp_path, capsys):
    cfg = _cfg()
    cfg.METHOD.cls = "PINN"
    cfg.METHOD.num_v_samples = 2
    cfg.TRAIN.N_EPOCHS = 4
    cfg.EVAL.FREQ = 2
    runner = PicardRunner(cfg, exp_root=tmp_path)
    runner.run_one()
    # meta present but the state dir is gone (e.g. manual cleanup), and no
    # final model_1 (killed run)
    import shutil

    from deeppicarditeration_tpu.training import checkpoint as ckpt

    ckpt.wait_all()
    shutil.rmtree(runner.exp_dir / "baseline_1_state")
    shutil.rmtree(ckpt.ckpt_path(runner.exp_dir, 1))
    cfg2 = _cfg()
    cfg2.METHOD.cls = "PINN"
    cfg2.METHOD.num_v_samples = 2
    cfg2.TRAIN.N_EPOCHS = 4
    cfg2.EVAL.FREQ = 2
    cfg2.FORCE = False
    cfg2.RESUME = True
    runner2 = PicardRunner(cfg2, exp_root=tmp_path)
    capsys.readouterr()
    runner2.run_one()  # no raise
    assert "starting fresh" in capsys.readouterr().out
