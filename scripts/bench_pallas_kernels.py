#!/usr/bin/env python
"""A/B the fused Pallas estimator kernels against the XLA scan paths.

Timing rule (CLAUDE.md): chain calls through a scalar data dependency and
force one final host readback — block_until_ready is not reliable through
the remote-TPU tunnel and single-call timings absorb ~30 ms dispatch.

Usage: python scripts/bench_pallas_kernels.py [--which terminal|integral|all]
"""

import argparse
import itertools
import json
import pathlib
import sys
import time

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

import jax
import jax.numpy as jnp


def make_setup(b=4096, m=4096, nx=100):
    from deeppicarditeration_tpu.equations import make_equation
    from deeppicarditeration_tpu.models.networks import MLP
    from deeppicarditeration_tpu.models.solution import Solution
    from deeppicarditeration_tpu.ops import estimators as est

    jax.config.update("jax_default_matmul_precision", "highest")
    eq = make_equation("Cha", nx=nx, alpha=1.0, k=5.0, T=1.0)
    module = MLP(neurons=(128, 128, 128, 128), activations=("ELU",) * 4,
                 out_dim=1)
    params = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 1 + nx)))
    sol = Solution.from_net(module, params, "Value", nx)
    key = jax.random.PRNGKey(7)
    t = jax.random.uniform(jax.random.fold_in(key, 0), (b, 1)) * 0.98
    x = eq.sample_x(jax.random.fold_in(key, 1), t)
    tx = jnp.concatenate([t, x], axis=-1)
    return eq, sol, tx, est, m


def timed(fn, key, repeats=6):
    """Chained-salt timing; returns seconds/call."""
    salt = jnp.zeros(())
    salt = fn(key, salt)
    float(salt)  # compile + warmup
    t0 = time.perf_counter()
    for r in range(repeats):
        salt = fn(jax.random.fold_in(key, r), salt)
    float(salt)
    return (time.perf_counter() - t0) / repeats


def bench_terminal(eq, sol, tx, est, m):
    from deeppicarditeration_tpu.ops.pallas_kernels import (
        seed_from_key,
        terminal_with_gradients_pallas,
    )

    gen = est.GenConfig(n_estimate_terminal=m, chunk_elems=2 ** 25)

    @jax.jit
    def xla(key, salt):
        out = est.estimate_terminal_with_gradients(key, eq, tx, gen)
        return jnp.sum(out) * 1e-9 + salt

    results = {"xla_s": timed(xla, jax.random.PRNGKey(11))}
    print(json.dumps({"kernel": "terminal", "variant": "xla",
                      "sec": results["xla_s"]}), flush=True)

    # each variant costs a tunnel compile (1-5 min): keep the grid tight
    for tile_b, mblk, anti in itertools.product((512, 1024), (8, 32),
                                                (False, True)):
        @jax.jit
        def pk(key, salt, tile_b=tile_b, mblk=mblk, anti=anti):
            out = terminal_with_gradients_pallas(
                seed_from_key(key), eq, tx, m, tile_b=tile_b, mblk=mblk,
                antithetic=anti, interpret=False)
            return jnp.sum(out) * 1e-9 + salt

        try:
            sec = timed(pk, jax.random.PRNGKey(12))
        except Exception as e:  # Mosaic compile failures: report, continue
            print(json.dumps({"kernel": "terminal", "tile_b": tile_b,
                              "mblk": mblk, "antithetic": anti,
                              "error": str(e)[:200]}), flush=True)
            continue
        print(json.dumps({"kernel": "terminal", "tile_b": tile_b,
                          "mblk": mblk, "antithetic": anti, "sec": sec,
                          "speedup_vs_xla": results["xla_s"] / sec}),
              flush=True)


def bench_integral(eq, sol, tx, est, m):
    from deeppicarditeration_tpu.ops.pallas_kernels import (
        integral_with_gradients_pallas,
        seed_from_key,
    )

    gen = est.GenConfig(n_estimate_integral=m, chunk_elems=2 ** 25)

    @jax.jit
    def xla(key, salt):
        out = est.estimate_integral_with_gradients(key, eq, sol, tx, gen)
        return jnp.sum(out) * 1e-9 + salt

    base = timed(xla, jax.random.PRNGKey(21))
    print(json.dumps({"kernel": "integral", "variant": "xla", "sec": base}),
          flush=True)

    for tile_b, mblk in itertools.product((128, 256), (8, 16)):
        @jax.jit
        def pk(key, salt, tile_b=tile_b, mblk=mblk):
            out = integral_with_gradients_pallas(
                seed_from_key(key), eq, sol, tx, m, tile_b=tile_b,
                mblk=mblk, interpret=False)
            return jnp.sum(out) * 1e-9 + salt

        try:
            sec = timed(pk, jax.random.PRNGKey(22))
        except Exception as e:
            print(json.dumps({"kernel": "integral", "tile_b": tile_b,
                              "mblk": mblk, "error": str(e)[:200]}),
                  flush=True)
            continue
        print(json.dumps({"kernel": "integral", "tile_b": tile_b,
                          "mblk": mblk, "sec": sec,
                          "speedup_vs_xla": base / sec}), flush=True)


def bench_generate(eq, sol, tx, est, m):
    """Merged dual-estimator kernel vs the one-graph XLA path, both at
    accuracy-policy precision (outer highest; in-kernel dots pinned)."""
    from deeppicarditeration_tpu.ops.pallas_kernels import (
        generate_with_gradients_pallas,
        seed_from_key,
    )

    gen = est.GenConfig(n_estimate_terminal=m, n_estimate_integral=m,
                        chunk_elems=2 ** 25, pallas_generate=False)

    @jax.jit
    def xla(key, salt):
        out = est.generate_with_gradients(key, eq, sol, tx, gen)
        return jnp.sum(out) * 1e-9 + salt

    base = timed(xla, jax.random.PRNGKey(31))
    print(json.dumps({"kernel": "generate", "variant": "xla_highest",
                      "sec": base}), flush=True)

    for tile_b, mblk, prec in itertools.product((128, 512), (8, 16),
                                                ("bf16x3",)):
        @jax.jit
        def pk(key, salt, tile_b=tile_b, mblk=mblk, prec=prec):
            out = generate_with_gradients_pallas(
                seed_from_key(key, 2), eq, sol, tx, m, tile_b=tile_b,
                mblk=mblk, mxu_precision=prec)
            return jnp.sum(out) * 1e-9 + salt

        try:
            sec = timed(pk, jax.random.PRNGKey(32))
        except Exception as e:
            print(json.dumps({"kernel": "generate", "tile_b": tile_b,
                              "mblk": mblk, "prec": prec,
                              "error": str(e)[:200]}), flush=True)
            continue
        print(json.dumps({"kernel": "generate", "tile_b": tile_b,
                          "mblk": mblk, "prec": prec, "sec": sec,
                          "speedup_vs_xla": base / sec}), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--which", default="all",
                    choices=("terminal", "integral", "generate", "all"))
    ap.add_argument("--b", type=int, default=4096)
    ap.add_argument("--m", type=int, default=4096)
    ap.add_argument("--nx", type=int, default=100)
    args = ap.parse_args()
    eq, sol, tx, est, m = make_setup(args.b, args.m, args.nx)
    print(json.dumps({"backend": jax.default_backend(),
                      "b": args.b, "m": args.m, "nx": args.nx}), flush=True)
    if args.which in ("terminal", "all"):
        bench_terminal(eq, sol, tx, est, m)
    if args.which in ("integral", "all"):
        bench_integral(eq, sol, tx, est, m)
    if args.which in ("generate", "all"):
        bench_generate(eq, sol, tx, est, m)


if __name__ == "__main__":
    main()
