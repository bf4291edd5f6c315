"""Segmented training path with in-training eval (EVAL.FREQ set)."""

import json

from deeppicarditeration_tpu.training.picard import PicardRunner
from tests.test_picard_e2e import _tiny_cfg


def test_eval_freq_segments_and_logs(tmp_path):
    cfg = _tiny_cfg(tmp_path, **{"NAME": "freq_test", "PICARD.N": 1,
                                 "TRAIN.N_EPOCHS": 4, "EVAL.FREQ": 2,
                                 "EVAL.L2_N_POINTS": 100})
    runner = PicardRunner(cfg, exp_root=tmp_path)
    runner.run()
    lines = [json.loads(l) for l in
             (runner.exp_dir / "metrics.jsonl").read_text().splitlines()]
    evals = [r for r in lines if r["context"] == "eval"]
    trains = [r for r in lines if r["context"] == "train"]
    # 4 epochs x (4 steps / freq 2) = 8 segments, each with eval + train log
    assert len(evals) >= 4
    assert len(trains) >= 4
    assert all("rRMSE" in r for r in evals)
    assert all("rRMSEg" in r for r in evals)  # TEST_GRAD: true in fixture


def test_fused_freq_matches_unfused_loop(tmp_path):
    """TRAIN.FUSED's one-dispatch train+eval scan reproduces the unfused
    segmented loop exactly: same key derivation => same trajectory, and
    the logged metric rows agree row-for-row."""
    import numpy as np

    rows = {}
    for name, fused in (("fused_on", "auto"), ("fused_off", False)):
        cfg = _tiny_cfg(tmp_path, **{"NAME": name, "PICARD.N": 1,
                                     "TRAIN.N_EPOCHS": 3, "EVAL.FREQ": 2,
                                     "TRAIN.FUSED": fused,
                                     "EVAL.L2_N_POINTS": 100})
        runner = PicardRunner(cfg, exp_root=tmp_path)
        runner.run()
        rows[name] = [json.loads(l) for l in
                      (runner.exp_dir / "metrics.jsonl")
                      .read_text().splitlines()]
    a, b = rows["fused_on"], rows["fused_off"]
    assert len(a) == len(b)
    for ra, rb in zip(a, b):
        assert ra["step"] == rb["step"] and ra["context"] == rb["context"]
        for k in ra:
            if k in ("time",):
                continue
            va, vb = ra[k], rb.get(k)
            if isinstance(va, float):
                assert np.isclose(va, vb, rtol=1e-4, atol=1e-6), (k, ra, rb)
            else:
                assert va == vb, (k, ra, rb)


def test_fused_freq_no_oracle_logs_train_only(tmp_path, monkeypatch):
    """Fused path with an equation lacking a closed form: train rows are
    still logged per segment, no eval rows, no crash."""
    cfg = _tiny_cfg(tmp_path, **{"NAME": "fused_noex", "PICARD.N": 1,
                                 "TRAIN.N_EPOCHS": 2, "EVAL.FREQ": 2})
    runner = PicardRunner(cfg, exp_root=tmp_path)
    monkeypatch.setattr(type(runner.equation), "has_exact_solution",
                        property(lambda self: False))
    runner.run()
    lines = [json.loads(l) for l in
             (runner.exp_dir / "metrics.jsonl").read_text().splitlines()]
    assert [r for r in lines if r["context"] == "train"]
    assert not [r for r in lines if r["context"] == "eval"]


def test_training_trajectory_path_independent(tmp_path):
    """The reproducibility contract (_train_keys): EVAL.FREQ=None scan,
    fused freq scan, and unfused segmented loop batch and key the
    training identically, so the final parameters agree regardless of
    which execution path ran the recipe."""
    import jax
    import numpy as np

    params = {}
    for name, freq, fused in (("pi_none", None, "auto"),
                              ("pi_fused", 2, "auto"),
                              ("pi_loop", 2, False)):
        cfg = _tiny_cfg(tmp_path, **{"NAME": name, "PICARD.N": 1,
                                     "TRAIN.N_EPOCHS": 4, "EVAL.FREQ": freq,
                                     "TRAIN.FUSED": fused,
                                     "EVAL.L2_N_POINTS": 100})
        runner = PicardRunner(cfg, exp_root=tmp_path)
        runner.run()
        params[name] = jax.tree_util.tree_leaves(runner.u_current.params)
    for other in ("pi_fused", "pi_loop"):
        for a, b in zip(params["pi_none"], params[other]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-7,
                                       err_msg=other)


def test_fused_and_segmented_share_loss_scale(tmp_path):
    """Fused (FREQ None) and segmented (FREQ set) paths train equivalently
    well on the same tiny problem."""
    import jax

    from deeppicarditeration_tpu.evaluation.evaluator import eval_solution

    results = {}
    for name, freq in (("fused_p", None), ("seg_p", 2)):
        cfg = _tiny_cfg(tmp_path, **{"NAME": name, "PICARD.N": 1,
                                     "TRAIN.N_EPOCHS": 10,
                                     "EVAL.FREQ": freq,
                                     "EVAL.L2_N_POINTS": 100})
        runner = PicardRunner(cfg, exp_root=tmp_path)
        runner.run()
        m = eval_solution(jax.random.PRNGKey(0), runner.u_current,
                          runner.equation, 400)
        results[name] = m["rRMSE"]
    assert abs(results["fused_p"] - results["seg_p"]) < 0.15, results
