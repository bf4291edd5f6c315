#!/usr/bin/env python
"""Headline benchmark: SDE samples/s/chip on 100-d Burgers DPI generation.

Workload (BASELINE.md row 1): the throughput-dominant kernel of the
framework — value+gradient Monte-Carlo target generation for the Cha 100-d
equation at the shipped config's scale (B=4096 collocation points,
M=4096 terminal + 4096 integral samples each, frozen 4x128 ELU MLP as the
previous Picard iterate).

Baseline: the same estimator math implemented in PyTorch (float64, as the
reference's shipped configs run, config.py:170-195) on this host's CPU —
the reference itself publishes no numbers (BASELINE.json "published": {}).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def bench_tpu(b=4096, m=4096, nx=100, repeats=8):
    import jax
    import jax.numpy as jnp

    from deeppicarditeration_tpu.utils.compile_cache import (
        enable_persistent_compile_cache,
    )

    enable_persistent_compile_cache()  # warm runs skip tunnel compiles

    # Match the shipped accuracy policy (PRECISION.md): full-f32 matmuls.
    # Measured free on this workload once nothing is dead-code-eliminated
    # (651.9 ms highest vs 619.5 default on the XLA path at this scale).
    jax.config.update("jax_default_matmul_precision", "highest")

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


# Model FLOPs per SDE sample for this workload: 4.801e12 flops/call at
# B=4096, M=4096+4096 by XLA cost analysis of the single-chunk XLA-path
# graph (scripts/mfu_analysis.py — cost_analysis counts scan bodies once,
# so the count must be taken on an unchunked graph; FLOPs are
# chunking-invariant). Dominated by the frozen 4x128 MLP fwd+vjp of the
# integral estimator. The workload is VPU-bound, not MXU-bound (see
# scripts/probe_vpu_roofline.py + BASELINE.md MFU section), so MXU MFU is
# structurally low here; it is reported for fleet comparability.
FLOPS_PER_SAMPLE = 143081.0
PEAK_BF16_TFLOPS = 197.0  # v5e


def main():
    quick = "--quick" in sys.argv
    tpu_sps, tpu_dt = bench_tpu(
        b=512 if quick else 4096, m=512 if quick else 4096)
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
    }))


if __name__ == "__main__":
    main()
