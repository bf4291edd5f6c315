#!/usr/bin/env python
"""Headroom map for the merged generate kernel: antithetic RNG halving and
MXU precision scaling (is the kernel RNG/VPU-bound or MXU-bound?).

Usage: python scripts/probe_generate_headroom.py
"""

import json
import pathlib
import sys

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

import jax
import jax.numpy as jnp

from scripts.bench_pallas_kernels import make_setup, timed


# (antithetic, mxu_precision)
CONFIGS = [
    (False, "bf16x3"),    # shipped default — same-process baseline
    (True, "bf16x3"),     # RNG draws halved
    (False, "default"),   # 1-pass bf16 dots: MXU floor
    (False, "highest"),   # 6-pass f32 dots: MXU ceiling
    (True, "highest"),    # halved RNG + full-f32 dots
]


def main():
    eq, sol, tx, est, m = make_setup()
    from deeppicarditeration_tpu.ops.pallas_kernels import (
        generate_with_gradients_pallas,
        seed_from_key,
    )

    print(json.dumps({"backend": jax.default_backend(), "m": m,
                      "b": int(tx.shape[0])}), flush=True)
    for anti, prec in CONFIGS:
        @jax.jit
        def pk(key, salt, anti=anti, prec=prec):
            out = generate_with_gradients_pallas(
                seed_from_key(key, 2), eq, sol, tx, m, tile_b=128,
                mblk=8, antithetic=anti, mxu_precision=prec)
            return jnp.sum(out) * 1e-9 + salt

        try:
            sec = timed(pk, jax.random.PRNGKey(32))
        except Exception as e:
            print(json.dumps({"antithetic": anti, "prec": prec,
                              "error": str(e)[:200]}), flush=True)
            continue
        print(json.dumps({"antithetic": anti, "prec": prec, "sec": sec}),
              flush=True)


if __name__ == "__main__":
    main()
