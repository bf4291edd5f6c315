#!/usr/bin/env python
"""Measure raised-limit tile candidates the bf16x3 budget factor governs.

The r5 decision record for `pick_generate_tile`'s raised-budget scaling
(ops/pallas_kernels.py `passes`): at factor 3 (pass count) the
4x128/nx=512 tile-128-raised candidate was pruned by a 58.87M-vs-58.72M
margin although it compiles and runs 2.1% faster than the admitted
tile 64; factor 2 (hi/lo operand duplication — the thing that actually
scales live memory) admits it, and the x2-admitted tile-64-raised beat
the old default-limit picks on the other measured nets. Measured
(v5e, B=4096, M=4096, chained salt-token timing):

  4x128 nx=512: tile 64 0.5024 / tile 128+vmem 0.4917  (+2.1%)
  4x512 nx=100: tile 32 1.1492 / tile  64+vmem 1.1364  (+1.1%)
  2x1024 nx=100: 32s   1.5752 / tile  64+vmem 1.5643   (+0.7%)
                        tile 128+vmem 1.5831 (worse: 128 stays pruned)

Re-run after dispatcher changes: each case times the named tiles
directly through generate_with_gradients_pallas.
"""

import pathlib
import sys
import time

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))
sys.path.insert(0, str(ROOT / "scripts"))

from deeppicarditeration_tpu.utils.compile_cache import (  # noqa: E402
    enable_persistent_compile_cache,
)

enable_persistent_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bench_dispatcher_matrix import build  # noqa: E402
from deeppicarditeration_tpu.ops import estimators as est  # noqa: E402
from deeppicarditeration_tpu.ops import pallas_kernels as pk  # noqa: E402

CASES = [
    ("4x128", 512, [(64, False, None), (128, False, "raised")]),
    ("4x512", 100, [(32, False, None), (64, False, "raised")]),
    ("2x1024", 100, [(32, True, None), (64, False, "raised"),
                     (128, False, "raised")]),
]


def main():
    jax.config.update("jax_default_matmul_precision", "highest")
    b, m = 4096, 4096
    for net, nx, tiles in CASES:
        eq, sol = build(net, nx)
        for tile, split, lim_tag in tiles:
            lim = pk._VMEM_LIMIT_BYTES if lim_tag else None
            ok = pk._trial_compile_ok(eq, sol, nx, tile, split, 8, False,
                                      mxu_precision="bf16x3",
                                      vmem_limit_bytes=lim)
            if not ok:
                print(f"{net} nx={nx} tile {tile}"
                      f"{'s' if split else ''}: trial REJECTED", flush=True)
                continue

            @jax.jit
            def gen(key, e, s, salt, tile=tile, split=split, lim=lim):
                tx = est.sample_tx(key, e, b, est.GenConfig(
                    n_estimate_terminal=m, n_estimate_integral=m,
                    t_always_uniform=True, t_uniform_eps=0.01))
                out = pk.generate_with_gradients_pallas(
                    pk.seed_from_key(key, 2), e, s, tx, m, tile_b=tile,
                    mxu_precision="bf16x3", split_chains=split,
                    vmem_limit_bytes=lim)
                return jnp.sum(out) * 1e-9 + salt

            key = jax.random.PRNGKey(1)
            salt = gen(key, eq, sol, jnp.zeros(()))
            float(salt)
            t0 = time.perf_counter()
            for r in range(4):
                salt = gen(jax.random.fold_in(key, r), eq, sol, salt)
            float(salt)
            print(f"{net} nx={nx} tile {tile}{'s' if split else ''}"
                  f"{'+vmem' if lim else ''}: "
                  f"{(time.perf_counter() - t0) / 4:.4f} s/call", flush=True)


if __name__ == "__main__":
    main()
