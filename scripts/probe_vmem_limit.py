#!/usr/bin/env python
"""Does raising Mosaic's scoped-vmem limit unlock larger HJB tiles?

Every recorded tile-overflow negative result (hjb_tiles_1pass.jsonl,
the 'weight streaming dead end', the 22.07M-at-tile-16 'highest'
failure) hit Mosaic's DEFAULT scoped-vmem limit of 16 MB — a compiler
parameter, not the physical per-core VMEM of a v5e (which is far
larger). This probe re-runs the tile ladder at the shipped 1-pass HJB
precision with vmem_limit_bytes raised, with and without the bf16
activation policy.

Usage: python scripts/probe_vmem_limit.py
"""

import json
import pathlib
import sys

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

import jax
import jax.numpy as jnp

from scripts.bench_pallas_kernels import timed

MB = 2 ** 20
# (tile_b, split_chains, act_bf16, vmem_limit)
CONFIGS = [
    (32, True, False, None),          # shipped baseline
    (64, True, False, 100 * MB),
    (128, True, False, 100 * MB),
    (128, False, False, 100 * MB),
    (64, True, True, 100 * MB),
    (128, True, True, 100 * MB),
    (256, True, False, 100 * MB),
]


def main():
    jax.config.update("jax_default_matmul_precision", "highest")
    from deeppicarditeration_tpu.equations import make_equation
    from deeppicarditeration_tpu.models.factory import init_solution
    from deeppicarditeration_tpu.config import load_cfg
    from deeppicarditeration_tpu.ops.pallas_kernels import (
        generate_with_gradients_pallas,
        seed_from_key,
    )

    cfg = load_cfg(ROOT / "configs/hjb/base_100d_T1.0_w0.1.yaml",
                   ["EVAL.FREQ", "None"])
    eq = make_equation(cfg.EQUATION.cls, **dict(cfg.EQUATION.kwargs))
    sol = init_solution(jax.random.PRNGKey(0), cfg, eq)
    b, m = 4096, 4096
    key0 = jax.random.PRNGKey(7)
    t = jax.random.uniform(jax.random.fold_in(key0, 0), (b, 1)) * 0.98
    x = eq.sample_x(jax.random.fold_in(key0, 1), t)
    tx = jnp.concatenate([t, x], axis=-1)
    print(json.dumps({"backend": jax.default_backend(), "net": "PISGradNet",
                      "b": b, "m": m, "precision": "default"}), flush=True)

    for tile, split, act, lim in CONFIGS:
        @jax.jit
        def pk(key, salt, tile=tile, split=split, act=act, lim=lim):
            out = generate_with_gradients_pallas(
                seed_from_key(key, 2), eq, sol, tx, m, tile_b=tile,
                mblk=8, mxu_precision="default", split_chains=split,
                act_dtype=jnp.bfloat16 if act else None,
                vmem_limit_bytes=lim)
            return jnp.sum(out) * 1e-9 + salt

        rec = {"tile": tile, "split": split, "act_bf16": act,
               "vmem_mb": None if lim is None else lim // MB}
        try:
            rec["sec"] = timed(pk, jax.random.PRNGKey(12))
        except Exception as e:
            rec["error"] = f"{type(e).__name__}: {str(e)[:160]}"
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
