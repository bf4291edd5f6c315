#!/usr/bin/env python
"""Headline benchmark + 3-family perf-regression harness.

Headline (BASELINE.md row 1): SDE samples/s/chip on the throughput-
dominant kernel — value+gradient Monte-Carlo target generation for the
Cha 100-d equation at the shipped config's scale (B=4096 collocation
points, M=4096 terminal + 4096 integral samples each, frozen 4x128 ELU
MLP as the previous Picard iterate).

Baseline: the same estimator math implemented in PyTorch (float64, as the
reference's shipped configs run, config.py:170-195) on this host's CPU —
the reference itself publishes no numbers (BASELINE.json "published": {}).

Regression harness (VERDICT r4 "What's weak" #2): the Burgers headline
has been flat at its measured VPU roofline for four rounds, so it alone
cannot catch a regression of the round wins that live in the OTHER
families' paths (the HJB raised-vmem tile-128 pick, the FN bf16 Hessian
store). The full run therefore also measures HJB and FN generation at
their shipped-config scales, compares each family's s/call against the
recorded r4 band (bench_results/mfu_r4*.jsonl +-15%), and reports
in-band status per family; ``--check`` exits nonzero when any family is
outside its band — one command that catches a tile-pick or hess-store
regression.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N,
   "mfu": ..., "families": {...}, "all_in_band": bool}
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

# Recorded r4 steady s/call per family at the shipped-config scales
# (bench_results/mfu_r4.jsonl, mfu_r4_fn.jsonl, mfu_r4_hjb128.jsonl) and
# model FLOPs per call from XLA single-chunk cost analysis
# (scripts/mfu_analysis.py — scan bodies are counted once, so the count
# must come from an UNCHUNKED graph; FLOPs are chunking-invariant).
FAMILY_BANDS = {
    # family: (center s/call, flops/call, config path, reduce over)
    "burgers": (0.2682, 4.800996442112e12,
                "configs/burgers/base_100d_T1.0_w1.0.yaml"),
    "hjb": (0.8038, 6.753043349504e13,
            "configs/hjb/base_100d_T1.0_w0.1.yaml"),
    "fn": (0.4426, 6.542841085952e12,
           "configs/fully_nonlinear/base_100d_T1.0_w0.0_nov.yaml"),
}
BAND_TOL = 0.15
PEAK_BF16_TFLOPS = 197.0  # v5e


def bench_tpu(b=4096, m=4096, nx=100, repeats=8):
    import jax
    import jax.numpy as jnp

    from deeppicarditeration_tpu.equations import make_equation
    from deeppicarditeration_tpu.models.networks import MLP
    from deeppicarditeration_tpu.models.solution import Solution
    from deeppicarditeration_tpu.ops import estimators as est

    eq = make_equation("Cha", nx=nx, alpha=1.0, k=5.0, T=1.0)
    module = MLP(neurons=(128, 128, 128, 128), activations=("ELU",) * 4,
                 out_dim=1)
    params = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 1 + nx)))
    sol = Solution.from_net(module, params, "Value", nx)
    gen = est.GenConfig(n_estimate_terminal=m, n_estimate_integral=m,
                        t_always_uniform=True, t_uniform_eps=0.01,
                        chunk_elems=2 ** 25)

    @jax.jit
    def generate(key, e, s, salt):
        tx = est.sample_tx(key, e, b, gen)
        out = est.generate_with_gradients(key, e, s, tx, gen)
        # scalar token: creates a data dependency so chained calls measure
        # true device time even through remote-dispatch tunnels where
        # block_until_ready is not a reliable completion barrier. The
        # token reduces over the FULL output — consuming a single element
        # lets XLA dead-code-eliminate entire estimator branches (e.g.
        # the gradient heads) and over-reports throughput ~2x.
        return jnp.sum(out) * 1e-9 + salt

    key = jax.random.PRNGKey(1)
    salt = jnp.zeros(())
    salt = generate(key, eq, sol, salt)
    float(salt)  # compile + warmup, forced to completion by host readback
    t0 = time.perf_counter()
    for r in range(repeats):
        salt = generate(jax.random.fold_in(key, r), eq, sol, salt)
    float(salt)
    dt = (time.perf_counter() - t0) / repeats
    samples = b * (2 * m)  # terminal + integral SDE samples per call
    return samples / dt, dt


def bench_family(name, repeats=6):
    """Steady generation s/call for a flagship family built from its
    SHIPPED config (same construction as the runner: gen_config_from_cfg
    threads the TPU flags — HJB's raised-vmem tile pick, FN's bf16
    Hessian store — so a regression in either shows up here)."""
    import pathlib

    import jax
    import jax.numpy as jnp

    from deeppicarditeration_tpu.config import load_cfg
    from deeppicarditeration_tpu.equations import make_equation
    from deeppicarditeration_tpu.models.factory import (
        build_network,
        init_solution,
    )
    from deeppicarditeration_tpu.ops import estimators as est
    from deeppicarditeration_tpu.training.picard import gen_config_from_cfg

    center, flops, cfg_path = FAMILY_BANDS[name]
    cfg = load_cfg(pathlib.Path(REPO) / cfg_path)
    eq = make_equation(cfg.EQUATION.cls, run_seed=int(cfg.SEED),
                       **(cfg.EQUATION.kwargs or {}))
    module = build_network(cfg, eq)
    sol = init_solution(jax.random.PRNGKey(0), cfg, eq, module=module)
    gen = gen_config_from_cfg(cfg, 1)
    b = int(cfg.DATA.DATA_SIZE)

    @jax.jit
    def generate(key, e, s, salt):
        tx = est.sample_tx(key, e, b, gen)
        out = est.generate_with_gradients(key, e, s, tx, gen)
        return jnp.sum(out) * 1e-9 + salt

    key = jax.random.PRNGKey(1)
    salt = generate(key, eq, sol, jnp.zeros(()))
    float(salt)
    t0 = time.perf_counter()
    for r in range(repeats):
        salt = generate(jax.random.fold_in(key, r), eq, sol, salt)
    float(salt)
    dt = (time.perf_counter() - t0) / repeats
    lo, hi = center * (1 - BAND_TOL), center * (1 + BAND_TOL)
    m = gen.n_estimate_integral
    return {
        "s_per_call": round(dt, 4),
        "samples_per_s": round(b * 2 * m / dt, 0),
        "mfu": round(flops / dt / 1e12 / PEAK_BF16_TFLOPS, 4),
        "band_s_per_call": [round(lo, 4), round(hi, 4)],
        "in_band": bool(lo <= dt <= hi),
    }


def bench_torch_cpu(b=128, m=512, nx=100, repeats=2):
    """Reference-equivalent estimator in PyTorch f64 on CPU (fresh
    implementation of the same math; NOT imported from the reference)."""
    import torch

    torch.set_default_dtype(torch.float64)
    torch.manual_seed(0)
    T, alpha = 1.0, 1.0
    k_coef = 5.0 / (nx ** 0.5)
    sqrt_a = alpha ** 0.5
    layers = []
    widths = [1 + nx, 128, 128, 128, 128]
    for i in range(4):
        layers += [torch.nn.Linear(widths[i], widths[i + 1]), torch.nn.ELU()]
    layers += [torch.nn.Linear(128, 1)]
    net = torch.nn.Sequential(*layers)
    for p in net.parameters():
        p.requires_grad_(False)

    def g(x):
        return torch.sigmoid(T + k_coef * x.sum(-1, keepdim=True))

    def ff(t, x, y, w):
        alpha_d = alpha * nx
        coef = k_coef * y - (2 + k_coef * k_coef * alpha_d) / (2 * k_coef * alpha_d)
        return sqrt_a * coef * (sqrt_a * w).sum(-1, keepdim=True)

    def one_round():
        t = torch.rand(b, 1) * (T - 0.02) + 0.01
        x = torch.zeros(b, nx) + torch.sqrt(t) * sqrt_a * torch.randn(b, nx)
        # terminal with gradients
        tr = torch.repeat_interleave(t, m, dim=0)
        xr = torch.repeat_interleave(x, m, dim=0)
        dW = torch.randn_like(xr)
        XT = xr + torch.sqrt(T - tr) * sqrt_a * dW
        gT = g(XT)
        g0 = g(x)
        Y = dW / torch.sqrt(T - tr) / sqrt_a
        eY = torch.cat([torch.ones_like(gT), Y], dim=-1)
        term = ((gT - torch.repeat_interleave(g0, m, 0)) * eY)
        term = term.view(b, m, -1).mean(1)
        term[:, :1] += g0
        # integral with gradients (autograd u_x of the frozen net)
        s = torch.rand_like(tr) * (T - tr) + tr
        dW2 = torch.randn_like(xr)
        Xs = (xr + torch.sqrt(s - tr) * sqrt_a * dW2).requires_grad_()
        u = net(torch.cat([s, Xs], dim=-1))
        u_x = torch.autograd.grad(u.sum(), Xs)[0]
        f = ff(s, Xs.detach(), u.detach(), u_x.detach())
        x0 = x.clone().requires_grad_()
        u0 = net(torch.cat([t, x0], dim=-1))
        u0_x = torch.autograd.grad(u0.sum(), x0)[0]
        f0 = ff(t, x0.detach(), u0.detach(), u0_x.detach())
        f0r = torch.repeat_interleave(f0, m, 0)
        Ys = dW2 / torch.sqrt(s - tr) / sqrt_a
        eYs = torch.cat([torch.ones_like(s), Ys], dim=-1)
        integ = ((T - tr) * (f - f0r) * eYs).view(b, m, -1).mean(1)
        integ[:, :1] += f0 * (T - t)
        return term + integ

    one_round()  # warmup
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        one_round()
        times.append(time.perf_counter() - t0)
    dt = min(times)
    return b * 2 * m / dt, dt


# Model FLOPs per SDE sample for the headline workload (see FAMILY_BANDS
# for the per-call counts). The Burgers workload is VPU-bound, not
# MXU-bound (scripts/probe_vpu_roofline.py + BASELINE.md MFU section), so
# MXU MFU is structurally low here; reported for fleet comparability.
FLOPS_PER_SAMPLE = 143081.0


def main():
    quick = "--quick" in sys.argv
    check = "--check" in sys.argv

    import jax

    from deeppicarditeration_tpu.utils.compile_cache import (
        enable_persistent_compile_cache,
    )

    enable_persistent_compile_cache()  # warm runs skip tunnel compiles
    # Match the shipped accuracy policy (PRECISION.md): full-f32 matmuls.
    # Measured free on the headline workload (651.9 ms highest vs 619.5
    # default on the XLA path); the HJB/FN family paths are insensitive
    # (in-kernel precision is the config's PALLAS_PRECISION; the FN r4
    # band was recorded under this same global setting).
    jax.config.update("jax_default_matmul_precision", "highest")

    tpu_sps, tpu_dt = bench_tpu(
        b=512 if quick else 4096, m=512 if quick else 4096)
    families = None
    all_in_band = None
    if not quick:
        blo = FAMILY_BANDS["burgers"][0] * (1 - BAND_TOL)
        bhi = FAMILY_BANDS["burgers"][0] * (1 + BAND_TOL)
        families = {"burgers": {
            "s_per_call": round(tpu_dt, 4),
            "samples_per_s": round(tpu_sps, 1),
            "mfu": round(tpu_sps * FLOPS_PER_SAMPLE
                         / (PEAK_BF16_TFLOPS * 1e12), 4),
            "band_s_per_call": [round(blo, 4), round(bhi, 4)],
            "in_band": bool(blo <= tpu_dt <= bhi),
        }}
        for fam in ("hjb", "fn"):
            try:
                families[fam] = bench_family(fam)
            except Exception as e:
                families[fam] = {"error": f"{type(e).__name__}: {e}"[:200],
                                 "in_band": False}
        all_in_band = all(f.get("in_band") for f in families.values())
    try:
        torch_sps, _ = bench_torch_cpu(b=32 if quick else 128,
                                       m=256 if quick else 512)
    except Exception:
        torch_sps = float("nan")
    print(json.dumps({
        "metric": "burgers100d_dpi_sde_samples_per_s_per_chip",
        "value": round(tpu_sps, 1),
        "unit": "samples/s",
        "vs_baseline": (round(tpu_sps / torch_sps, 2)
                        if torch_sps == torch_sps else None),
        "mfu": round(tpu_sps * FLOPS_PER_SAMPLE / (PEAK_BF16_TFLOPS * 1e12),
                     4),
        "families": families,
        "all_in_band": all_in_band,
    }))
    if check and not all_in_band:
        sys.exit(1)


if __name__ == "__main__":
    main()
