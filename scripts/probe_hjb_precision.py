#!/usr/bin/env python
"""A/B the merged generate kernel's in-kernel dot precision on the HJB
PISGradNet (4x512) — the MXU-BOUND case.

Roofline motivation (estimators.py roofline math, r2): at B=M=4096 the
frozen-net fwd+vjp is ~97 TFLOP of bf16 MXU work per pass; bf16x3 triples
it (~292 TFLOP ~ 0.74 s ideal at v5e peak) and the measured 1.60 s/call is
~46% MXU utilization — unlike Burgers (VPU-bound, passes free), HJB pays
the full 3x. This probe measures:

  1. speed: in-kernel PRNG at full scale for bf16x3 / default / highest;
  2. accuracy: SAME external noise through the kernel at each precision,
     max |delta| and gradient-head relative error vs highest (f32).

Usage: python scripts/probe_hjb_precision.py
"""

import json
import pathlib
import sys

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

import jax
import jax.numpy as jnp

from scripts.bench_pallas_kernels import timed

# "highest" (full-f32 dots) overflows Mosaic scoped vmem on this net
# even at tile 16 (measured 22.07M > 16M); bf16x3 is the accuracy
# reference (validated f32-equivalent, PRECISION.md).
PRECISIONS = ["bf16x3", "default"]


def main():
    jax.config.update("jax_default_matmul_precision", "highest")
    from deeppicarditeration_tpu.config import load_cfg
    from deeppicarditeration_tpu.equations import make_equation
    from deeppicarditeration_tpu.models.factory import init_solution
    from deeppicarditeration_tpu.ops.pallas_kernels import (
        generate_with_gradients_pallas,
        seed_from_key,
    )

    cfg = load_cfg(ROOT / "configs/hjb/base_100d_T1.0_w0.1.yaml",
                   ["EVAL.FREQ", "None"])
    eq = make_equation(cfg.EQUATION.cls, **dict(cfg.EQUATION.kwargs))
    sol = init_solution(jax.random.PRNGKey(0), cfg, eq)
    nx = eq.nx
    key0 = jax.random.PRNGKey(7)

    # --- accuracy: SAME in-kernel PRNG seed across precisions, so the
    # draws are identical and outputs differ only by the dot precision
    # (the production path; the external-noise variant overflows Mosaic's
    # scoped vmem on TPU at useful m) -------------------------------------
    b_a, m_a = 512, 512
    t = jax.random.uniform(jax.random.fold_in(key0, 0), (b_a, 1)) * 0.98
    x = eq.sample_x(jax.random.fold_in(key0, 1), t)
    tx_a = jnp.concatenate([t, x], axis=-1)
    outs = {}
    for prec in PRECISIONS:
        # arrays as jit ARGUMENTS: closure constants get inlined into the
        # shipped MLIR and blow up the remote compile (observed 215 MB)
        fn = jax.jit(lambda e, s, t, prec=prec: generate_with_gradients_pallas(
            1234, e, s, t, m_a, tile_b=16, mblk=8,
            mxu_precision=prec, split_chains=False))
        outs[prec] = fn(eq, sol, tx_a)
        outs[prec].block_until_ready()
        print(json.dumps({"which": "accuracy-done", "precision": prec}),
              flush=True)
    ref = outs["bf16x3"]
    g_scale = float(jnp.sqrt(jnp.mean(ref[:, 1:] ** 2)))
    for prec in PRECISIONS:
        d = outs[prec] - ref
        print(json.dumps({
            "which": "accuracy", "precision": prec,
            "max_abs_delta": float(jnp.max(jnp.abs(d))),
            "value_rel_rmse": float(jnp.sqrt(jnp.mean(d[:, 0] ** 2))
                                    / (jnp.sqrt(jnp.mean(ref[:, 0] ** 2))
                                       + 1e-12)),
            "grad_rel_rmse": float(jnp.sqrt(jnp.mean(d[:, 1:] ** 2))
                                   / (g_scale + 1e-12)),
        }), flush=True)

    # --- speed at full scale (in-kernel PRNG) ----------------------------
    b, m = 4096, 4096
    t = jax.random.uniform(jax.random.fold_in(key0, 3), (b, 1)) * 0.98
    x = eq.sample_x(jax.random.fold_in(key0, 4), t)
    tx = jnp.concatenate([t, x], axis=-1)
    print(json.dumps({"backend": jax.default_backend(), "b": b, "m": m}),
          flush=True)
    for prec in PRECISIONS:
        for tile, split in ((32, True), (16, False)):
            @jax.jit
            def pk_args(e, s, t_in, key, salt, prec=prec, tile=tile,
                        split=split):
                out = generate_with_gradients_pallas(
                    seed_from_key(key, 2), e, s, t_in, m, tile_b=tile,
                    mblk=8, mxu_precision=prec, split_chains=split)
                return jnp.sum(out) * 1e-9 + salt

            def pk(key, salt):
                return pk_args(eq, sol, tx, key, salt)

            try:
                sec = timed(pk, jax.random.PRNGKey(32))
            except Exception as e:
                print(json.dumps({"which": "speed", "precision": prec,
                                  "tile": tile, "split": split,
                                  "error": str(e)[:160]}), flush=True)
                continue
            print(json.dumps({"which": "speed", "precision": prec,
                              "tile": tile, "split": split,
                              "sec": round(sec, 4)}), flush=True)


if __name__ == "__main__":
    main()
