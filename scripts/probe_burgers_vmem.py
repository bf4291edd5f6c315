#!/usr/bin/env python
"""Burgers merged-kernel tile ladder at the raised scoped-vmem limit.

Counterpart of probe_vmem_limit.py for the VPU-bound Burgers flagship
(4x128 MLP, bf16x3 dots): tiles 256/512 previously overflowed the
default 16 MB scoped limit (CLAUDE.md 'tiles 256/512 overflow even
split'). Expectation: little to gain (the kernel is work-bound VPU),
but the unlock is one compile away from being measured.

Usage: python scripts/probe_burgers_vmem.py
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
# (tile_b, mblk, split_chains, vmem_limit)
CONFIGS = [
    (128, 8, False, None),            # shipped baseline
    (256, 8, False, 100 * MB),
    (512, 8, False, 100 * MB),
    (256, 16, False, 100 * MB),
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

    cfg = load_cfg(ROOT / "configs/burgers/base_100d_T1.0_w1.0.yaml",
                   ["EVAL.FREQ", "None"])
    eq = make_equation(cfg.EQUATION.cls, **dict(cfg.EQUATION.kwargs))
    sol = init_solution(jax.random.PRNGKey(0), cfg, eq)
    b, m = 4096, 4096
    key0 = jax.random.PRNGKey(7)
    t = jax.random.uniform(jax.random.fold_in(key0, 0), (b, 1)) * 0.98
    x = eq.sample_x(jax.random.fold_in(key0, 1), t)
    tx = jnp.concatenate([t, x], axis=-1)
    print(json.dumps({"backend": jax.default_backend(), "net": "MLP4x128",
                      "b": b, "m": m, "precision": "bf16x3"}), flush=True)

    for tile, mblk, split, lim in CONFIGS:
        @jax.jit
        def pk(key, salt, tile=tile, mblk=mblk, split=split, lim=lim):
            out = generate_with_gradients_pallas(
                seed_from_key(key, 2), eq, sol, tx, m, tile_b=tile,
                mblk=mblk, mxu_precision="bf16x3", split_chains=split,
                vmem_limit_bytes=lim)
            return jnp.sum(out) * 1e-9 + salt

        rec = {"tile": tile, "mblk": mblk, "split": split,
               "vmem_mb": None if lim is None else lim // MB}
        try:
            rec["sec"] = timed(pk, jax.random.PRNGKey(12))
        except Exception as e:
            rec["error"] = f"{type(e).__name__}: {str(e)[:160]}"
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
