#!/usr/bin/env python
"""Do LARGER merged-kernel tiles compile and pay on the HJB PISGradNet
at the SHIPPED 1-pass dot precision?

The VMEM heuristic (generate_vmem_bytes) is precision-blind and was
calibrated against the bf16x3 emulation, whose hi/lo operand splitting
holds extra copies in scoped vmem; 1-pass dots need less, so the
heuristic's tile-32-split pick may be pessimistic for the shipped HJB
config (DATA.TPU.PALLAS_PRECISION: default). pick_generate_tile only
walks DOWN from the heuristic pick — this probe asks whether walking UP
would have paid.

Usage: python scripts/probe_hjb_tiles_1pass.py
"""

import json
import pathlib
import sys

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

import jax
import jax.numpy as jnp

from scripts.bench_pallas_kernels import timed

# (tile_b, split_chains) — 32/split is the current shipped pick
CONFIGS = [(32, True), (64, False), (64, True), (128, False)]


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

    for tile, split in CONFIGS:
        @jax.jit
        def pk(key, salt, tile=tile, split=split):
            out = generate_with_gradients_pallas(
                seed_from_key(key, 2), eq, sol, tx, m, tile_b=tile,
                mblk=8, mxu_precision="default", split_chains=split)
            return jnp.sum(out) * 1e-9 + salt

        try:
            sec = timed(pk, jax.random.PRNGKey(12))
        except Exception as e:
            print(json.dumps({"tile": tile, "split": split,
                              "error": f"{type(e).__name__}: {str(e)[:160]}"}),
                  flush=True)
            continue
        print(json.dumps({"tile": tile, "split": split, "sec": sec}),
              flush=True)


if __name__ == "__main__":
    main()
