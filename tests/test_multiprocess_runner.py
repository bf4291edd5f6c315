"""The FULL PicardRunner executed multi-process, end-to-end (VERDICT r3
item 1).

Round 2/3 proved the distributed pieces below the runner (sharded
generation, dp train step, the Pallas kernel); what they never proved is
that ``PicardRunner.run()`` itself — exp-dir prepare/FORCE, config dump,
JSONL metric logging, orbax checkpointing, DATA.SAVE dataset persistence,
RESUME (iteration-level and mid-iteration dataset replay) — is correct
when N processes run it in SPMD lockstep. Each hazard was real before the
round-4 guards: every process rmtree'd and rewrote the experiment dir,
appended duplicate metric rows, and DATA.SAVE crashed on non-addressable
global arrays (np.asarray). Single-host IO contract being replicated:
reference picard_iteration.py:124-145,295.

Four CLI launches on the CPU backend, all over the SAME 8-device global
mesh so trajectories are comparable bitwise:
  (a) single-process, 8 virtual devices, PICARD.N=2  — the anchor
  (b) two processes x 4 devices,         PICARD.N=2  — must equal (a)
  (c) two processes, PICARD.N=1 then RESUME to N=2   — kill-resume
  (d) (c) again with model_2 deleted but data_iter_2 kept — the
      mid-iteration dataset-replay path (collective save + replay)
(b), (c), (d) must agree with (a) BITWISE on the final params — the
"identical SPMD at 1 chip / N hosts" claim (survey §7.1.7) tested at the
runner surface, not just the kernel surface.
"""

import json
import os
import pathlib
import socket
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_TINY_YAML = """
NAME: mp_e2e
FORCE: true
EQUATION:
  cls: Cha
  kwargs: {nx: 3, alpha: 1.0, k: 1.0, T: 1.0}
PICARD:
  N: 2
DATA:
  DATA_SIZE: 64
  CHUNK_ELEMS: 16384
  SAVE: true
  kwargs: {t_always_uniform: true, n_estimate_terminal: 32,
           n_estimate_integral: 32}
TRAIN:
  BATCH_SIZE: 32
  N_EPOCHS: 2
NETWORK:
  NEURONS: [8]
  ACTIVATIONS: [Tanh]
EVAL:
  FREQ: null
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _base_env(n_local_devices: int) -> dict:
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["PYTHONPATH"] = REPO
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={n_local_devices}")
    return env


def _run_single(cwd, cfg, overrides):
    out = subprocess.run(
        [sys.executable, "-m", "deeppicarditeration_tpu.cli", "train",
         str(cfg)] + overrides,
        env=_base_env(8), cwd=cwd, capture_output=True, text=True,
        timeout=600)
    assert out.returncode == 0, out.stderr[-3000:]
    return out


def _run_two_process(cwd, cfg, overrides):
    port = _free_port()
    procs = []
    for rank in range(2):
        env = _base_env(4)
        env["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
        env["JAX_NUM_PROCESSES"] = "2"
        env["JAX_PROCESS_ID"] = str(rank)
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "deeppicarditeration_tpu.cli", "train",
             str(cfg)] + overrides,
            env=env, cwd=cwd, stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True))
    outs = []
    for rank, p in enumerate(procs):
        try:
            out, err = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"rank {rank} failed:\n{err[-3000:]}"
        outs.append((out, err))
    return outs


def _load_leaves(ckpt_dir: pathlib.Path):
    """Param leaves of a committed checkpoint, host-side."""
    import jax
    import orbax.checkpoint as ocp

    ckptr = ocp.Checkpointer(ocp.StandardCheckpointHandler())
    meta = ckptr.metadata(str(ckpt_dir.absolute())).item_metadata
    shd = jax.sharding.SingleDeviceSharding(jax.devices("cpu")[0])
    abstract = jax.tree_util.tree_map(
        lambda m: jax.ShapeDtypeStruct(m.shape, m.dtype, sharding=shd),
        meta)
    tree = ckptr.restore(str(ckpt_dir.absolute()),
                         args=ocp.args.StandardRestore(abstract))
    return [np.asarray(x) for x in jax.tree_util.tree_leaves(tree)]


def _assert_bitwise(a, b, what):
    assert len(a) == len(b)
    for la, lb in zip(a, b):
        np.testing.assert_array_equal(la, lb, err_msg=what)


def test_resume_across_mesh_width_change(tmp_path):
    """A checkpoint saved under an 8-device mesh must resume under a
    4-device mesh (users move runs between hosts of different widths):
    the restore template is mesh-replicated, so orbax re-lays the
    committed arrays onto whatever mesh the resuming run builds."""
    cfg = tmp_path / "tiny.yaml"
    cfg.write_text(_TINY_YAML)
    _run_single(tmp_path, cfg, ["NAME", "topo", "PICARD.N", "1"])

    out = subprocess.run(
        [sys.executable, "-m", "deeppicarditeration_tpu.cli", "train",
         str(cfg), "NAME", "topo", "PICARD.N", "2", "RESUME", "true",
         "FORCE", "false"],
        env=_base_env(4), cwd=tmp_path, capture_output=True, text=True,
        timeout=600)
    assert out.returncode == 0, out.stderr[-3000:]
    assert "RESUME: continuing from iteration 1" in out.stdout
    assert _load_leaves(tmp_path / "topo" / "model_2")


_PINN_YAML = """
NAME: mp_pinn
FORCE: true
EQUATION:
  cls: Cha
  kwargs: {nx: 3, alpha: 1.0, k: 1.0, T: 1.0}
METHOD:
  cls: PINN
  num_v_samples: 2
PICARD:
  N: 1
DATA:
  DATA_SIZE: 64
  CHUNK_ELEMS: 16384
  kwargs: {t_always_uniform: true, n_estimate_terminal: 8,
           n_estimate_integral: 8}
TRAIN:
  BATCH_SIZE: 32
  N_EPOCHS: 6
NETWORK:
  NEURONS: [8]
  ACTIVATIONS: [Tanh]
EVAL:
  FREQ: null
"""


# DBDP's timestep count is T/dt (METHOD.dt), not METHOD.K: dt=0.125 at
# T=1 gives an 8-step backward sweep (8 per-k metric rows + evals)
_DBDP_OVERRIDES = ["NAME", "mp_dbdp", "METHOD.cls", "FullyNonlinearSolver",
                   "METHOD.dt", "0.125", "METHOD.num_sub_iter", "2",
                   "TRAIN.N_EPOCHS", "2"]


def test_baseline_runner_two_process(tmp_path):
    """The BASELINE paths through 2 processes. PINN exercises the
    epoch-loop IO shape (periodic orbax {state, opt} collective save +
    primary-only meta stamp); DBDP exercises the per-timestep backward
    sweep with stacked-pytree checkpoints and per-k logging
    (`training/baselines.py`). One metrics stream each, committed final
    models."""
    cfg = tmp_path / "pinn.yaml"
    cfg.write_text(_PINN_YAML)
    _run_two_process(tmp_path, cfg, [])
    exp = tmp_path / "mp_pinn"
    rows = [json.loads(r) for r in
            (exp / "metrics.jsonl").read_text().splitlines()]
    # one pinn-context row and one eval row per log interval — a
    # duplicated-writer bug would double them
    assert [r["context"] for r in rows] == ["pinn", "eval"], rows
    assert (exp / "baseline_1_meta.json").exists()
    assert _load_leaves(exp / "model_1")  # committed, restorable

    _run_two_process(tmp_path, cfg, _DBDP_OVERRIDES)
    exp = tmp_path / "mp_dbdp"
    rows = [json.loads(r) for r in
            (exp / "metrics.jsonl").read_text().splitlines()]
    ctx = [r["context"] for r in rows]
    # one (dbdp, eval) pair per (timestep, sub-iter) log point: 8
    # timesteps (T/dt) x 2 sub-iters; a duplicated-writer bug would
    # double the pairs
    assert ctx == ["dbdp", "eval"] * 16, ctx
    assert _load_leaves(exp / "model_1")  # stacked per-timestep pytree

    _run_two_process(tmp_path, cfg, ["NAME", "mp_diff", "METHOD.cls",
                                     "Diffusion", "METHOD.K", "3",
                                     "TRAIN.N_EPOCHS", "4"])
    exp = tmp_path / "mp_diff"
    rows = [json.loads(r) for r in
            (exp / "metrics.jsonl").read_text().splitlines()]
    assert [r["context"] for r in rows] == ["diffusion", "eval"], rows
    assert _load_leaves(exp / "model_1")


def test_full_runner_two_process_e2e(tmp_path):
    cfg = tmp_path / "tiny.yaml"
    cfg.write_text(_TINY_YAML)

    # (a) single-process anchor over the same 8-device global mesh
    _run_single(tmp_path, cfg, ["NAME", "sp"])
    sp_leaves = _load_leaves(tmp_path / "sp" / "model_2")

    # (b) the same recipe through TWO processes
    _run_two_process(tmp_path, cfg, ["NAME", "mp"])
    exp = tmp_path / "mp"

    # exactly ONE set of files on disk, written by the primary only
    assert (exp / "config.yaml").exists()
    rows = [json.loads(r) for r in
            (exp / "metrics.jsonl").read_text().splitlines()]
    # fused EVAL.FREQ=None path: one train row per Picard iteration; a
    # duplicated-writer bug would double these
    assert [r["iter"] for r in rows] == [1, 2], rows
    for i in (1, 2):
        z = np.load(exp / f"data_iter_{i}.npz")
        assert z["tx"].shape[0] == 64  # full allgathered dataset
    mp_leaves = _load_leaves(exp / "model_2")
    _assert_bitwise(sp_leaves, mp_leaves, "2-process != single-process")

    # (c) kill-resume: N=1 run, then RESUME continues to N=2
    _run_two_process(tmp_path, cfg, ["NAME", "mpr", "PICARD.N", "1"])
    outs = _run_two_process(tmp_path, cfg,
                            ["NAME", "mpr", "PICARD.N", "2",
                             "RESUME", "true", "FORCE", "false"])
    assert any("RESUME: continuing from iteration 1" in o for o, _ in outs)
    _assert_bitwise(sp_leaves, _load_leaves(tmp_path / "mpr" / "model_2"),
                    "2-process resume != single-process straight run")

    # (d) mid-iteration replay: iteration 2's dataset survives but its
    # checkpoint does not -> the saved (allgathered) dataset is replayed
    import shutil

    shutil.rmtree(tmp_path / "mpr" / "model_2")
    outs = _run_two_process(tmp_path, cfg,
                            ["NAME", "mpr", "PICARD.N", "2",
                             "RESUME", "true", "FORCE", "false"])
    assert any("replaying saved dataset data_iter_2" in o for o, _ in outs)
    _assert_bitwise(sp_leaves, _load_leaves(tmp_path / "mpr" / "model_2"),
                    "2-process mid-iteration replay != straight run")
