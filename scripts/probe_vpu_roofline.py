#!/usr/bin/env python
"""VPU-roofline microprobes for the merged Burgers estimator kernel.

VERDICT r2 asks whether the merged kernel's ~210 ms non-dot floor (see
CLAUDE.md headroom map: in-kernel dot passes scale at ~22 ms/pass, the
remainder is VPU work) sits at the transcendental-throughput limit or
leaves 2x on the table. These kernels measure the achievable in-VMEM
rates of the floor's three constituents IN ISOLATION, reduce-only (no
HBM materialization, same (rows, 128) layouts the merged kernel uses):

  bits     — prng_random_bits + mantissa-trick uniform (no Box-Muller)
  normals  — full Box-Muller normals (_normals: 1 log + 1 sqrt + 1
             cos/sin pair per 2 normals)
  elu      — ELU forward + derivative chain (1 exp per unit, reused)

Each iteration chains on the accumulator so Mosaic cannot hoist the body
out of the fori_loop. Prints one JSON line per probe with G units/s; the
floor decomposition is: time_bound(component) = units_needed_per_call /
rate. Usage: run on the real TPU (one probe process at a time).
"""

import argparse
import json
import math
import pathlib
import sys
import time

ROOT = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

from deeppicarditeration_tpu.utils.compile_cache import (  # noqa: E402
    enable_persistent_compile_cache,
)

enable_persistent_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from deeppicarditeration_tpu.ops.pallas_kernels import (  # noqa: E402
    LANE,
    _normals,
    _uniform,
)


def _probe_kernel(seed_ref, out_ref, *, iters: int, blk: int, which: str):
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    x0 = _normals((blk, LANE)) if which == "elu" else None

    def body(i, acc):
        if which == "bits":
            z = _uniform((blk, LANE))
        elif which == "normals":
            z = _normals((blk, LANE))
        else:  # elu fwd + vjp chain, dependency-chained through acc
            x = x0 + acc[0, 0] * 1e-30
            y = jnp.where(x > 0, x, jnp.exp(x) - 1.0)
            ge = jnp.where(x > 0, 1.0, y + 1.0)
            z = y * ge
        return acc + jnp.sum(z.reshape(8, blk // 8, LANE), axis=1)

    out_ref[:] = jax.lax.fori_loop(0, iters, body,
                                   jnp.zeros((8, LANE), jnp.float32))


def probe(which: str, blk=256, iters=1024, grid=32, repeats=8):
    kernel = lambda s, o: _probe_kernel(s, o, iters=iters, blk=blk,
                                        which=which)

    @jax.jit
    def run(seed, salt):
        out = pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec((8, LANE), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((grid * 8, LANE), jnp.float32),
        )(seed)
        return jnp.sum(out) * 1e-12 + salt

    seed = jnp.asarray([3], jnp.int32)
    salt = run(seed, jnp.zeros(()))
    float(salt)
    t0 = time.perf_counter()
    for r in range(repeats):
        salt = run(seed, salt)
    float(salt)
    dt = (time.perf_counter() - t0) / repeats
    units = blk * LANE * iters * grid
    return units / dt, dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--which", nargs="*",
                    default=["bits", "normals", "elu"])
    ap.add_argument("--repeats", type=int, default=8)
    args = ap.parse_args()
    rates = {}
    for w in args.which:
        rate, dt = probe(w, repeats=args.repeats)
        rates[w] = rate
        print(json.dumps({"probe": w, "g_units_per_s": round(rate / 1e9, 2),
                          "s_per_call": round(dt, 4)}), flush=True)
    # merged-kernel floor decomposition at the flagship scale
    if {"normals", "elu"} <= rates.keys():
        b, m, nx = 4096, 4096, 100
        normals_needed = b * m * nx * 2            # terminal + integral dW
        elu_units = b * m * (4 * 128 * 2)          # fwd + vjp, 4x128 MLP
        t_rng = normals_needed / rates["normals"]
        t_elu = elu_units / rates["elu"]
        print(json.dumps({
            "decomposition": "burgers merged kernel (B=4096, M=4096)",
            "rng_bound_ms": round(t_rng * 1e3, 1),
            "elu_bound_ms": round(t_elu * 1e3, 1),
            "sum_ms": round((t_rng + t_elu) * 1e3, 1),
            "non_dot_floor_ms": 210.0,
        }), flush=True)


if __name__ == "__main__":
    main()
