#!/usr/bin/env python
"""Forced Pallas flags at a NON-divisor batch, executed on the real TPU.

VERDICT r4 item 6: the r4 sublane/walk-down fixes for forced
DATA.TPU.PALLAS_TERMINAL/INTEGRAL/GENERATE had CPU tests but no TPU
execution record. This runs b=4000 (largest sub-128 divisors 125/100/50
are sublane-astride; the ladder must walk to tile 32) and b=4099 (prime:
the kernels must fall back to XLA with a notice) with every flag FORCED,
on the real chip, and prints per-path steady s/call plus a finite-output
check. One JSON line per case.
"""

import json
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

from deeppicarditeration_tpu.equations import make_equation  # noqa: E402
from deeppicarditeration_tpu.models.networks import MLP  # noqa: E402
from deeppicarditeration_tpu.models.solution import Solution  # noqa: E402
from deeppicarditeration_tpu.ops import estimators as est  # noqa: E402


def main():
    jax.config.update("jax_default_matmul_precision", "highest")
    nx, m = 100, 4096
    eq = make_equation("Cha", nx=nx, alpha=1.0, k=5.0, T=1.0)
    module = MLP(neurons=(128,) * 4, activations=("ELU",) * 4, out_dim=1)
    params = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 1 + nx)))
    sol = Solution.from_net(module, params, "Value", nx)

    cases = [
        ("standalone_b4000", 4000,
         dict(pallas_terminal=True, pallas_integral=True,
              pallas_generate=False)),
        ("merged_b4000", 4000, dict(pallas_generate=True)),
        ("standalone_b4099_prime", 4099,
         dict(pallas_terminal=True, pallas_integral=True,
              pallas_generate=False)),
        ("merged_b4099_prime", 4099, dict(pallas_generate=True)),
    ]
    for name, b, flags in cases:
        gen = est.GenConfig(n_estimate_terminal=m, n_estimate_integral=m,
                            t_always_uniform=True, t_uniform_eps=0.01,
                            chunk_elems=2 ** 25, **flags)

        @jax.jit
        def generate(key, e, s, salt):
            tx = est.sample_tx(key, e, b, gen)  # noqa: B023
            out = est.generate_with_gradients(key, e, s, tx, gen)  # noqa: B023
            return jnp.sum(out) * 1e-9 + salt, jnp.all(jnp.isfinite(out))

        key = jax.random.PRNGKey(1)
        salt, finite = generate(key, eq, sol, jnp.zeros(()))
        float(salt)
        t0 = time.perf_counter()
        for r in range(4):
            salt, finite = generate(jax.random.fold_in(key, r), eq, sol,
                                    salt)
        float(salt)
        dt = (time.perf_counter() - t0) / 4
        print(json.dumps({"case": name, "b": b, "s_per_call": round(dt, 4),
                          "finite": bool(finite)}), flush=True)


if __name__ == "__main__":
    main()
