#!/usr/bin/env python
"""Auto-dispatcher validation matrix beyond the three flagship shapes.

VERDICT r4 ("What's weak" #1): every recorded "auto >= XLA" datum sits at
(4x128, nx=100), (4x512, nx=100) or (3x64, nx=100). This sweeps, on the
real TPU:

  net   in {3x64, 4x128, 4x512, 6x512, 2x1024}  (ELU MLP value nets)
  nx    in {10, 100, 256, 512}
  batch in {4096} x all, plus per-net non-divisor cells (4000, whose
           largest sub-128 divisors 125/100/50 are sublane-astride so the
           ladder must walk to tile 32; 4099 prime -> sublane-degenerate
           => XLA fallback)

and records, per cell, one JSONL row: the heuristic pick, the
trial-confirmed spec the dispatcher actually ships, the wall spent in
trial compiles, steady s/call for the shipped auto path and the forced
XLA path (chained salt-token timing — CLAUDE.md), and which path won.

Resumable: cells already present in --out are skipped, so a killed run
continues where it left off (each cell costs 1-5 min of remote compiles).

Generation policy matches the shipped generic defaults: GenConfig
pallas_precision bf16x3 (emulated f32), XLA matmul precision "highest" —
the accuracy-equivalent pairing (PRECISION.md).
"""

import argparse
import dataclasses
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

NETS = {
    "3x64": (64,) * 3,
    "4x128": (128,) * 4,
    "4x512": (512,) * 4,
    "6x512": (512,) * 6,
    "2x1024": (1024,) * 2,
}
NXS = (10, 100, 256, 512)


def build(net_name, nx):
    from deeppicarditeration_tpu.equations import make_equation
    from deeppicarditeration_tpu.models.networks import MLP
    from deeppicarditeration_tpu.models.solution import Solution

    widths = NETS[net_name]
    eq = make_equation("Cha", nx=nx, alpha=1.0, k=5.0, T=1.0)
    module = MLP(neurons=widths, activations=("ELU",) * len(widths),
                 out_dim=1)
    params = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 1 + nx)))
    return eq, Solution.from_net(module, params, "Value", nx)


def timed(fn, key, eq, sol, max_reps=4):
    """(compile+warm wall, steady s/call) via chained salt tokens."""
    t0 = time.perf_counter()
    salt = fn(key, eq, sol, jnp.zeros(()))
    float(salt)
    warm = time.perf_counter() - t0
    t0 = time.perf_counter()
    salt = fn(jax.random.fold_in(key, 999), eq, sol, salt)
    float(salt)
    dt1 = time.perf_counter() - t0
    reps = 2 if dt1 > 2.0 else max_reps
    t0 = time.perf_counter()
    for r in range(reps):
        salt = fn(jax.random.fold_in(key, r), eq, sol, salt)
    float(salt)
    return warm, (time.perf_counter() - t0) / reps


def run_cell(net_name, nx, b, m, max_reps=4):
    from deeppicarditeration_tpu.ops import estimators as est
    from deeppicarditeration_tpu.ops import pallas_kernels as pk

    eq, sol = build(net_name, nx)
    gen = est.GenConfig(n_estimate_terminal=m, n_estimate_integral=m,
                        t_always_uniform=True, t_uniform_eps=0.01,
                        chunk_elems=2 ** 25)
    heur = pk._heuristic_generate_tile(eq, sol, nx, b)
    t0 = time.perf_counter()
    spec = est._pallas_generate_tile(gen, eq, sol, b)
    pick_s = time.perf_counter() - t0

    def make_fn(g):
        @jax.jit
        def generate(key, e, s, salt):
            tx = est.sample_tx(key, e, b, g)
            out = est.generate_with_gradients(key, e, s, tx, g)
            return jnp.sum(out) * 1e-9 + salt

        return generate

    key = jax.random.PRNGKey(1)
    xla_warm, xla_dt = timed(
        make_fn(dataclasses.replace(gen, pallas_generate=False)),
        key, eq, sol, max_reps)
    rec = {"net": net_name, "nx": nx, "b": b, "m": m,
           "heuristic": list(heur) if heur else None,
           "spec": list(spec) if spec else None,
           "pick_trial_s": round(pick_s, 1),
           "xla_warm_s": round(xla_warm, 1),
           "xla_s_per_call": round(xla_dt, 4)}
    if spec is not None:
        auto_warm, auto_dt = timed(make_fn(gen), key, eq, sol, max_reps)
        rec.update(auto_warm_s=round(auto_warm, 1),
                   auto_s_per_call=round(auto_dt, 4),
                   auto_over_xla=round(xla_dt / auto_dt, 3),
                   winner="auto" if auto_dt <= xla_dt else "xla")
    else:
        rec.update(auto_s_per_call=None, winner="xla(fallback)")
    rec["samples_per_s"] = round(
        b * 2 * m / (rec.get("auto_s_per_call") or xla_dt), 0)
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--m", type=int, default=4096)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--only", default=None,
                    help="comma list of net names to restrict to")
    args = ap.parse_args()
    out = pathlib.Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    done = set()
    if out.exists():
        for line in out.read_text().splitlines():
            try:
                r = json.loads(line)
                done.add((r["net"], r["nx"], r["b"]))
            except Exception:
                pass

    jax.config.update("jax_default_matmul_precision", "highest")
    nets = (args.only.split(",") if args.only else
            ["4x128", "4x512", "2x1024", "6x512", "3x64"])
    cells = [(n, nx, 4096) for n in nets for nx in NXS]
    cells += [(n, 100, 4000) for n in nets]       # non-divisor: tile 32
    cells += [("4x128", 100, 4099)]               # prime: XLA fallback
    with open(out, "a") as f:
        for net, nx, b in cells:
            if (net, nx, b) in done:
                print(f"skip {net} nx={nx} b={b} (done)", flush=True)
                continue
            print(f"=== cell {net} nx={nx} b={b}", flush=True)
            t0 = time.time()
            try:
                rec = run_cell(net, nx, b, args.m, args.reps)
            except Exception as e:
                rec = {"net": net, "nx": nx, "b": b, "m": args.m,
                       "error": f"{type(e).__name__}: {e}"[:500]}
            rec["cell_wall_s"] = round(time.time() - t0, 1)
            line = json.dumps(rec)
            print(line, flush=True)
            f.write(line + "\n")
            f.flush()


if __name__ == "__main__":
    main()
