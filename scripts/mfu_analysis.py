#!/usr/bin/env python
"""FLOP / roofline accounting for the flagship generation workloads.

VERDICT r2 ("What's weak" #1): BASELINE.md reported s/call and samples/s
but never achieved-TFLOP/s over peak. This script measures, per family
(burgers / hjb / fn), on the real TPU:

  - FLOPs per generation call, from XLA's compiled cost analysis of the
    XLA estimator path (the merged Pallas kernel computes the same
    estimator math, so the model-FLOP count carries over; its in-kernel
    dots run 1/3/6 MXU passes depending on DATA.TPU.PALLAS_PRECISION,
    which multiplies MXU *work*, not model FLOPs);
  - wall per call for the XLA path and the shipped (auto) kernel path,
    measured with the chained in-jit salt-token scheme (CLAUDE.md —
    block_until_ready is not a completion barrier through the tunnel);
  - achieved model-TFLOP/s and MFU vs the v5e bf16 MXU peak
    (197 TFLOP/s) and vs the f32 VPU peak (~3.9 Tops/s) for the
    VPU-bound cases.

Writes one JSON line per family to --out (default stdout only).
"""

import argparse
import json
import pathlib
import sys
import time

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

from deeppicarditeration_tpu.utils.compile_cache import (  # noqa: E402
    enable_persistent_compile_cache,
)

enable_persistent_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

# v5e single-chip peaks (public spec: 197 bf16 TFLOP/s; the VPU is
# (8, 128) x 4 ALUs at ~940 MHz ~= 3.85 T f32 simple-ops/s)
PEAK_BF16_TFLOPS = 197.0
PEAK_VPU_TOPS = 3.85


def build_family(name):
    """(eq, sol, gen, b, mode) for a flagship family, built from the
    SHIPPED config so the accounting matches the recorded runs."""
    from deeppicarditeration_tpu.config import load_cfg
    from deeppicarditeration_tpu.equations import make_equation
    from deeppicarditeration_tpu.models.factory import (
        build_network,
        init_solution,
    )
    from deeppicarditeration_tpu.models.solution import Solution
    from deeppicarditeration_tpu.training.picard import gen_config_from_cfg

    cfgs = {
        "burgers": "configs/burgers/base_100d_T1.0_w1.0.yaml",
        "hjb": "configs/hjb/base_100d_T1.0_w0.1.yaml",
        "fn": "configs/fully_nonlinear/base_100d_T1.0_w0.0_nov.yaml",
    }
    cfg = load_cfg(ROOT / cfgs[name])
    prec = (cfg.get("PRECISION") or {}).get("MATMUL", "default")
    if prec and prec != "default":
        jax.config.update("jax_default_matmul_precision", prec)
    eq = make_equation(cfg.EQUATION.cls, run_seed=int(cfg.SEED),
                       **(cfg.EQUATION.kwargs or {}))
    module = build_network(cfg, eq)
    sol = init_solution(jax.random.PRNGKey(0), cfg, eq, module=module)
    gen = gen_config_from_cfg(cfg, 1)
    b = int(cfg.DATA.DATA_SIZE)
    supervise_grad = bool(cfg.TRAIN.SUPERVISE_GRADIENT
                          or eq.has_gradient_term)
    mode = "gradient" if supervise_grad else "value"
    return eq, sol, gen, b, mode


def timed_call(fn, key, eq, sol, repeats):
    salt = jnp.zeros(())
    salt = fn(key, eq, sol, salt)
    float(salt)  # compile + warmup
    t0 = time.perf_counter()
    for r in range(repeats):
        salt = fn(jax.random.fold_in(key, r), eq, sol, salt)
    float(salt)
    return (time.perf_counter() - t0) / repeats


def analyze(name, repeats=8):
    import dataclasses

    from deeppicarditeration_tpu.ops import estimators as est

    eq, sol, gen, b, mode = build_family(name)
    nx = eq.nx
    m = gen.n_estimate_integral

    def make_fn(g):
        @jax.jit
        def generate(key, e, s, salt):
            tx = est.sample_tx(key, e, b, g)
            if mode == "gradient":
                out = est.generate_with_gradients(key, e, s, tx, g)
            else:
                out = est.generate_values(key, e, s, tx, g)
            return jnp.sum(out) * 1e-9 + salt

        return generate

    gen_xla = dataclasses.replace(gen, pallas_generate=False)
    fn_xla = make_fn(gen_xla)
    fn_auto = make_fn(gen)

    key = jax.random.PRNGKey(1)
    args = (key, eq, sol, jnp.zeros(()))
    # FLOP count: XLA's cost_analysis counts a lax.scan BODY ONCE, not per
    # trip (verified: scan of 8 matmuls reports 1 matmul of flops), and
    # the estimators scan over M/mc chunks. Count on a single-chunk graph
    # (chunk_elems huge => n_chunks == 1; FLOPs are chunking-invariant),
    # compile-only on the CPU backend so the 6+ GB intermediate is never
    # materialized and no TPU compile is spent on a never-run graph.
    gen_count = dataclasses.replace(gen_xla, chunk_elems=2 ** 40)
    fn_count = make_fn(gen_count)
    try:
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            ca = fn_count.lower(*args).compile().cost_analysis() or {}
    except Exception:
        ca = fn_count.lower(*args).compile().cost_analysis() or {}
    flops = float(ca.get("flops", float("nan")))
    bytes_acc = float(ca.get("bytes accessed", float("nan")))

    dt_xla = timed_call(fn_xla, key, eq, sol, repeats)
    dt_auto = timed_call(fn_auto, key, eq, sol, repeats)

    rec = {
        "family": name, "b": b, "m": m, "nx": nx, "mode": mode,
        "flops_per_call": flops,
        "bytes_per_call": bytes_acc,
        "xla_s_per_call": round(dt_xla, 4),
        "auto_s_per_call": round(dt_auto, 4),
        "xla_tflops": round(flops / dt_xla / 1e12, 2),
        "auto_tflops": round(flops / dt_auto / 1e12, 2),
        "mfu_xla_vs_bf16_peak": round(flops / dt_xla / 1e12
                                      / PEAK_BF16_TFLOPS, 4),
        "mfu_auto_vs_bf16_peak": round(flops / dt_auto / 1e12
                                       / PEAK_BF16_TFLOPS, 4),
        "samples_per_s_auto": round(b * 2 * m / dt_auto, 0),
    }
    return rec


def analyze_train_step(name, repeats=3):
    """FLOPs + achieved TFLOP/s of ONE optimizer step at the family's
    shipped batch size (the fused paths scan this same step body)."""
    from deeppicarditeration_tpu.config import load_cfg
    from deeppicarditeration_tpu.equations import make_equation
    from deeppicarditeration_tpu.models.factory import (
        build_network,
        init_solution,
    )
    from deeppicarditeration_tpu.training.trainer import (
        TrainSpec,
        TrainState,
        make_optimizer,
        make_step_body,
    )

    cfgs = {
        "burgers": "configs/burgers/base_100d_T1.0_w1.0.yaml",
        "hjb": "configs/hjb/base_100d_T1.0_w0.1.yaml",
        "fn": "configs/fully_nonlinear/base_100d_T1.0_w0.0_nov.yaml",
    }
    cfg = load_cfg(ROOT / cfgs[name])
    eq = make_equation(cfg.EQUATION.cls, run_seed=int(cfg.SEED),
                       **(cfg.EQUATION.kwargs or {}))
    module = build_network(cfg, eq)
    sol = init_solution(jax.random.PRNGKey(0), cfg, eq, module=module)
    spec = TrainSpec.from_cfg(cfg, eq.nx)
    tx_opt, needs_value = make_optimizer(cfg.TRAIN.OPTIMIZER)
    body = make_step_body(module, tx_opt, spec, needs_value)
    bs = int(cfg.TRAIN.BATCH_SIZE)
    ydim = 1 + (eq.nx if (cfg.TRAIN.SUPERVISE_GRADIENT
                          or eq.has_gradient_term) else 0)
    tx_b = jnp.ones((bs, 1 + eq.nx)) * 0.3
    y_b = jnp.ones((bs, ydim)) * 0.1
    state = TrainState.create(sol.params, tx_opt)

    @jax.jit
    def step(st, txx, yy, key, salt):
        st2, ms = body(st, txx, yy, key)
        return st2, ms["train_loss"] * 1e-9 + salt

    args = (state, tx_b, y_b, jax.random.PRNGKey(1), jnp.zeros(()))
    try:
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            ca = step.lower(*args).compile().cost_analysis() or {}
    except Exception:
        ca = {}
    flops = float(ca.get("flops", float("nan")))

    # timing: N steps scanned inside ONE jit — the real fused paths run
    # this exact structure; per-dispatch loops through the remote tunnel
    # would measure issue rate, not device time
    n = 64

    @jax.jit
    def steps_scan(st, txx, yy, salt):
        def b(c, i):
            c2, ms = body(c, txx, yy,
                          jax.random.fold_in(jax.random.PRNGKey(0), i))
            return c2, ms["train_loss"]
        st, losses = jax.lax.scan(b, st, jnp.arange(n))
        return st, jnp.sum(losses) * 1e-9 + salt

    import time as _t

    st, salt = steps_scan(state, tx_b, y_b, jnp.zeros(()))
    float(salt)
    t0 = _t.perf_counter()
    for r in range(repeats):
        st, salt = steps_scan(st, tx_b, y_b, salt)
    float(salt)
    dt = (_t.perf_counter() - t0) / (repeats * n)
    return {"family": name, "what": "train_step", "batch": bs,
            "flops_per_step": flops,
            "s_per_step": round(dt, 6),
            "tflops": round(flops / dt / 1e12, 2),
            "mfu_vs_bf16_peak": round(flops / dt / 1e12
                                      / PEAK_BF16_TFLOPS, 4)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--families", nargs="*",
                    default=["burgers", "hjb", "fn"])
    ap.add_argument("--repeats", type=int, default=8)
    ap.add_argument("--train", action="store_true",
                    help="also account one optimizer step per family")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    out_f = open(ROOT / args.out, "a") if args.out else None
    for fam in args.families:
        recs = [analyze(fam, repeats=args.repeats)]
        if args.train:
            recs.append(analyze_train_step(fam))
        for rec in recs:
            line = json.dumps(rec)
            print(line, flush=True)
            if out_f:
                out_f.write(line + "\n")
                out_f.flush()


if __name__ == "__main__":
    main()
