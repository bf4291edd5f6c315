#!/usr/bin/env python
"""mblk ladder at the raised scoped-vmem limit (follow-on to
probe_vmem_limit.py: tile 128 merged f32 @100MB = 0.804 s vs the
shipped 32/split 0.839). Larger mblk => R = tile*mblk-row in-kernel
dots and fewer fori_loop trips.

Usage: python scripts/probe_vmem_mblk.py
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
# (tile_b, mblk, split_chains)
CONFIGS = [
    (128, 16, False),
    (128, 32, False),
    (64, 16, False),
    (64, 32, False),
    (256, 16, False),
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
                      "b": b, "m": m, "precision": "default",
                      "vmem_mb": 100}), flush=True)

    for tile, mblk, split in CONFIGS:
        @jax.jit
        def pk(key, salt, tile=tile, mblk=mblk, split=split):
            out = generate_with_gradients_pallas(
                seed_from_key(key, 2), eq, sol, tx, m, tile_b=tile,
                mblk=mblk, mxu_precision="default", split_chains=split,
                vmem_limit_bytes=100 * MB)
            return jnp.sum(out) * 1e-9 + salt

        rec = {"tile": tile, "mblk": mblk, "split": split}
        try:
            rec["sec"] = timed(pk, jax.random.PRNGKey(12))
        except Exception as e:
            rec["error"] = f"{type(e).__name__}: {str(e)[:160]}"
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
