#!/usr/bin/env python
"""Does bf16 in-kernel activation storage pay on the HJB PISGradNet?

The shipped HJB merged-kernel config runs 1-pass bf16 dots at tile 32 /
split_chains (larger tiles overflow scoped vmem — hjb_tiles_1pass.jsonl).
The VMEM working set is activation-dominated (23.4 MB of 27 MB at tile
64), so casting the frozen net's Dense compute to bf16 (flax dtype=bf16:
operands AND saved vjp residuals at half width) should admit tile 64+.
Numerically this is within the already-shipped 1-pass policy: the dot
operands are cast to bf16 on the MXU either way; only the inter-layer
elementwise ops (ELU fwd/vjp) see rounded inputs. CPU probe: 0.39%
relative delta on get_f vs the f32-activation 1-pass path (MC noise at
M=4096 is ~1.6%).

Usage: python scripts/probe_hjb_act_bf16.py
"""

import json
import pathlib
import sys

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

import jax
import jax.numpy as jnp

from scripts.bench_pallas_kernels import timed

# (tile_b, split_chains, act_bf16) — 32/split/f32 is the shipped pick
CONFIGS = [
    (32, True, False),
    (32, True, True),
    (64, True, True),
    (64, False, True),
    (128, True, True),
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

    for tile, split, act in CONFIGS:
        @jax.jit
        def pk(key, salt, tile=tile, split=split, act=act):
            out = generate_with_gradients_pallas(
                seed_from_key(key, 2), eq, sol, tx, m, tile_b=tile,
                mblk=8, mxu_precision="default", split_chains=split,
                act_dtype=jnp.bfloat16 if act else None)
            return jnp.sum(out) * 1e-9 + salt

        try:
            sec = timed(pk, jax.random.PRNGKey(12))
        except Exception as e:
            print(json.dumps({"tile": tile, "split": split, "act_bf16": act,
                              "error": f"{type(e).__name__}: {str(e)[:160]}"}),
                  flush=True)
            continue
        print(json.dumps({"tile": tile, "split": split, "act_bf16": act,
                          "sec": sec}), flush=True)


if __name__ == "__main__":
    main()
