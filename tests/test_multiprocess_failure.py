"""Multi-process FAILURE semantics (VERDICT r4 "What's weak" #3).

The happy path is covered by test_multiprocess_runner.py; these tests pin
down what happens when a rank dies or diverges:

- a rank that stops heartbeating is detected by the coordination service
  within DPI_HEARTBEAT_TIMEOUT and every survivor is TERMINATED (nonzero
  exit, diagnostic on stderr) — no collective can hang forever;
- a rank that is alive but never reaches a runner barrier surfaces a
  bounded-time RuntimeError naming the barrier and the RESUME recovery
  path (DPI_BARRIER_TIMEOUT);
- after the crash, rerunning with RESUME: true recovers and completes
  (the recovery path the error message points at);
- the runner is correct beyond two ranks (4 processes x 2 devices,
  bitwise vs the single-process 8-device anchor) — no lingering two-rank
  assumptions.
"""

import json
import os
import signal
import socket
import subprocess
import sys
import textwrap
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _env(rank, nprocs, port, n_dev, extra=None):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["PYTHONPATH"] = REPO
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={n_dev}"
    env["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
    env["JAX_NUM_PROCESSES"] = str(nprocs)
    env["JAX_PROCESS_ID"] = str(rank)
    env.update(extra or {})
    return env


_STALL_WORKER = textwrap.dedent("""
    import os, sys, time
    sys.path.insert(0, {repo!r})
    import jax
    jax.config.update("jax_platforms", "cpu")
    from deeppicarditeration_tpu.parallel import distributed
    assert distributed.initialize()
    rank = jax.process_index()
    distributed.barrier("start")
    if rank == 1:
        time.sleep(120)   # alive (heartbeating) but never arrives
        os._exit(0)
    t0 = time.time()
    try:
        distributed.barrier("never_reached")
    except RuntimeError as e:
        print(f"BOUNDED after {{time.time()-t0:.1f}}s: {{e}}", flush=True)
        os._exit(7)
    print("UNREACHABLE: barrier passed", flush=True)
    os._exit(0)
""")


def test_barrier_timeout_on_stalled_peer(tmp_path):
    """A live-but-diverged peer must turn into a bounded-time RuntimeError
    naming the barrier and the RESUME recovery, not an infinite wait.
    Heartbeats are healthy here, so this isolates the barrier timeout."""
    port = _free_port()
    script = tmp_path / "stall.py"
    script.write_text(_STALL_WORKER.format(repo=REPO))
    extra = {"DPI_BARRIER_TIMEOUT": "8", "DPI_HEARTBEAT_TIMEOUT": "120"}
    procs = [subprocess.Popen(
        [sys.executable, str(script)],
        env=_env(r, 2, port, 2, extra), stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True) for r in range(2)]
    t0 = time.time()
    out0, _ = procs[0].communicate(timeout=90)
    procs[1].kill()
    procs[1].wait()
    assert procs[0].returncode == 7, out0[-3000:]
    assert "BOUNDED after" in out0
    assert "never_reached" in out0 and "RESUME: true" in out0
    assert time.time() - t0 < 80  # bounded, with startup slack


_CRASH_YAML = """
NAME: mp_crash
FORCE: true
EQUATION:
  cls: Cha
  kwargs: {nx: 3, alpha: 1.0, k: 1.0, T: 1.0}
PICARD:
  N: 4
DATA:
  DATA_SIZE: 512
  CHUNK_ELEMS: 16384
  kwargs: {t_always_uniform: true, n_estimate_terminal: 32,
           n_estimate_integral: 32}
TRAIN:
  BATCH_SIZE: 64
  N_EPOCHS: 300
NETWORK:
  NEURONS: [8]
  ACTIVATIONS: [Tanh]
EVAL:
  FREQ: null
"""


def test_dead_rank_terminates_survivor_then_resume(tmp_path):
    """SIGKILL rank 1 mid-recipe: rank 0 must exit nonzero with a
    dead-peer diagnostic within the heartbeat bound (never hang in the
    next collective), and a RESUME rerun must complete — the recovery
    path the semantics doc promises."""
    cfg = tmp_path / "crash.yaml"
    cfg.write_text(_CRASH_YAML)
    port = _free_port()
    extra = {"DPI_HEARTBEAT_TIMEOUT": "5", "DPI_BARRIER_TIMEOUT": "60"}
    cmd = [sys.executable, "-m", "deeppicarditeration_tpu.cli", "train",
           str(cfg)]
    procs = [subprocess.Popen(
        cmd, env=_env(r, 2, port, 2, extra), cwd=tmp_path,
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        for r in range(2)]

    # kill rank 1 once the run is demonstrably under way (first metrics
    # row), or after 120 s of compile if the tiny recipe is slower than
    # expected — both land mid-run because N_EPOCHS x PICARD.N is sized
    # to dominate the wall
    metrics = tmp_path / "mp_crash" / "metrics.jsonl"
    t0 = time.time()
    while time.time() - t0 < 120:
        if procs[1].poll() is not None:
            break  # rank 1 ended by itself?! -> fail below
        if metrics.exists() and metrics.stat().st_size > 0:
            break
        time.sleep(0.5)
    assert procs[1].poll() is None, "recipe finished before the kill"
    procs[1].send_signal(signal.SIGKILL)

    t_kill = time.time()
    try:
        out0, err0 = procs[0].communicate(timeout=120)
    except subprocess.TimeoutExpired:
        procs[0].kill()
        raise AssertionError(
            "rank 0 HUNG after rank 1 died — failure semantics broken")
    detect_s = time.time() - t_kill
    assert procs[0].returncode != 0, (out0[-2000:], err0[-2000:])
    blob = out0 + err0
    assert ("detected fatal errors" in blob or "heartbeat" in blob
            or "cross-process barrier" in blob), blob[-3000:]
    # 5 s heartbeat timeout + polling/teardown slack
    assert detect_s < 90, f"took {detect_s:.0f}s to surface the death"
    procs[1].wait()

    # recovery: the same recipe, RESUME'd, completes on a fresh pair
    port = _free_port()
    procs = [subprocess.Popen(
        cmd + ["RESUME", "true", "FORCE", "false", "TRAIN.N_EPOCHS", "2"],
        env=_env(r, 2, port, 2, {"DPI_HEARTBEAT_TIMEOUT": "30"}),
        cwd=tmp_path, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True) for r in range(2)]
    for r, p in enumerate(procs):
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, f"RESUME rank {r}:\n{err[-3000:]}"
    assert (tmp_path / "mp_crash" / "model_4").exists()


def test_full_runner_four_process_e2e(tmp_path):
    """4 processes x 2 devices == single process x 8 devices, bitwise:
    kills any lingering two-rank assumption in the runner's collective
    IO (allgathered DATA.SAVE, orbax save, primary-only logging)."""
    from test_multiprocess_runner import (
        _TINY_YAML,
        _assert_bitwise,
        _load_leaves,
        _run_single,
    )

    cfg = tmp_path / "tiny.yaml"
    cfg.write_text(_TINY_YAML)
    _run_single(tmp_path, cfg, ["NAME", "sp4"])
    sp_leaves = _load_leaves(tmp_path / "sp4" / "model_2")

    port = _free_port()
    procs = [subprocess.Popen(
        [sys.executable, "-m", "deeppicarditeration_tpu.cli", "train",
         str(cfg), "NAME", "mp4"],
        env=_env(r, 4, port, 2), cwd=tmp_path, stdout=subprocess.PIPE,
        stderr=subprocess.PIPE, text=True) for r in range(4)]
    for r, p in enumerate(procs):
        try:
            out, err = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"rank {r} failed:\n{err[-3000:]}"
    exp = tmp_path / "mp4"
    rows = [json.loads(r) for r in
            (exp / "metrics.jsonl").read_text().splitlines()]
    assert [r["iter"] for r in rows] == [1, 2], rows  # ONE writer
    z = np.load(exp / "data_iter_2.npz")
    assert z["tx"].shape[0] == 64  # full allgathered dataset
    _assert_bitwise(sp_leaves, _load_leaves(exp / "model_2"),
                    "4-process != single-process")
