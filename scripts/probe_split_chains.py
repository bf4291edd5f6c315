#!/usr/bin/env python
"""A/B the split_chains merged-kernel layout vs the default interleaved
layout across tile/mblk configs that were previously VMEM-blocked.

Timing rule (CLAUDE.md): chain calls through a scalar data dependency and
force one final host readback. ONE probe process; each config costs a
1-5 min tunnel compile.

Usage: python scripts/probe_split_chains.py
"""

import json
import pathlib
import sys
import time

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

import jax
import jax.numpy as jnp

from scripts.bench_pallas_kernels import make_setup, timed


# (tile_b, mblk, split_chains)
CONFIGS = [
    (128, 8, False),   # shipped default — same-process baseline
    (128, 8, True),    # split overhead at the known-good shape
    (128, 16, False),  # unknown: does mblk=16 fit merged at tile 128?
    (128, 16, True),
    (256, 8, True),    # larger tiles admitted by the lower liveness?
    (512, 8, True),
]


def main():
    eq, sol, tx, est, m = make_setup()
    from deeppicarditeration_tpu.ops.pallas_kernels import (
        generate_with_gradients_pallas,
        seed_from_key,
    )

    print(json.dumps({"backend": jax.default_backend(), "m": m,
                      "b": int(tx.shape[0])}), flush=True)
    for tile_b, mblk, split in CONFIGS:
        @jax.jit
        def pk(key, salt, tile_b=tile_b, mblk=mblk, split=split):
            out = generate_with_gradients_pallas(
                seed_from_key(key, 2), eq, sol, tx, m, tile_b=tile_b,
                mblk=mblk, mxu_precision="bf16x3", split_chains=split)
            return jnp.sum(out) * 1e-9 + salt

        t0 = time.perf_counter()
        try:
            sec = timed(pk, jax.random.PRNGKey(32))
        except Exception as e:
            print(json.dumps({"tile_b": tile_b, "mblk": mblk,
                              "split": split, "error": str(e)[:200]}),
                  flush=True)
            continue
        print(json.dumps({"tile_b": tile_b, "mblk": mblk, "split": split,
                          "sec": sec,
                          "compile_s": time.perf_counter() - t0}),
              flush=True)


if __name__ == "__main__":
    main()
