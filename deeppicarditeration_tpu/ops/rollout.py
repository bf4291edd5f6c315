"""K-step Brownian path rollouts for the time-stepped baselines.

The reference simulates baseline SDE paths step-by-step in Python
(solution.py:591-595 for D-DBSDE, :750-757 for DBDP). For the diffusion
classes this framework supports (drift-free forward sampling with
Sigma = sqrt(alpha) I; equations base.transition), the exact K-step path
is a CLOSED FORM in the increments:

    X_{t_k} = x0 + sqrt(alpha) * sum_{j<k} sqrt(dt_j) * xi_j,
    xi_j ~ N(0, I)

so no sequential simulation is required at all: one (K, B, nx) normal
draw + a cumsum along the step axis replaces the lax.scan, removing the
K-step serial dependency between the threefry draws (survey §7.2 phase-7
"fused K-step rollout"). A Pallas variant fuses the in-kernel hardware
PRNG with the running sum in VMEM (one HBM write per path state, no
random-bit traffic).

Both produce the same law as the scan; the per-step RNG *stream* differs
from fold_in-per-step (statistically equivalent — no estimator here
depends on a specific stream).

Measured end-to-end (v5e, HJB-diffusion scale K=50 B=512 nx=100, full
jitted 20-epoch training chunks; scripts/probe_rollout.py):
scan 1.39 ms/epoch, closed form 1.02 (1.37x, the default), Pallas 1.14
(statistically validated on-chip but it breaks XLA's fusion with the
surrounding training step — same pattern as the standalone tpu_normals
kernel; keep DATA.TPU.PALLAS_ROLLOUT off).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from deeppicarditeration_tpu.ops.pallas_kernels import (
    LANE,
    _normals,
    _round_up,
)


def _uses_base_transition(eq) -> bool:
    """True iff eq inherits the drift-free base-class transition the
    closed form assumes (x -> x + sqrt(s-t) sqrt(a) dW)."""
    from deeppicarditeration_tpu.equations.base import EquationMethods

    return type(eq).transition is EquationMethods.transition


def _closed_form_paths(key, eq, x0, dts, K: int):
    """One (K, B, nx) draw + cumsum: the exact drift-free path."""
    xi = jax.random.normal(key, (K,) + x0.shape, x0.dtype)
    steps = jnp.sqrt(dts)[None] * jnp.asarray(eq.alpha_sqrt, x0.dtype) * xi
    xs = jnp.concatenate([x0[None], x0[None] + jnp.cumsum(steps, 0)],
                         axis=0)
    return xs, xi


def brownian_paths(key, eq, t0, x0, dts, K: int, use_pallas: bool = False):
    """Exact K-step path from (t0, x0) with per-sample step dts.

    Args:
      t0: (B, 1) start times; x0: (B, nx) start states; dts: (B, 1).
    Returns:
      ts: (K+1, B, 1) grid times, xs: (K+1, B, nx) path states,
      xi: (K, B, nx) the standardized N(0, I) increments (the reference's
      per-step dW, solution.py:744-760 — DBDP consumes them directly).

    Equations that OVERRIDE the base-class transition (drift or
    state-dependent diffusion) fall back to a sequential lax.scan through
    their own law — the closed form is only exact for the drift-free
    base transition.
    """
    ks = jnp.arange(K + 1, dtype=t0.dtype)
    ts = t0[None] + dts[None] * ks[:, None, None]
    if not _uses_base_transition(eq):
        def body(carry, k_):
            t, x = carry
            t_next = t + dts
            x_next, dW = eq.transition(jax.random.fold_in(key, k_), t,
                                       t_next, x)
            return (t_next, x_next), (x_next, dW)

        (_, _), (xs_tail, xi) = jax.lax.scan(body, (t0, x0), jnp.arange(K))
        return ts, jnp.concatenate([x0[None], xs_tail], axis=0), xi
    if use_pallas:
        xs, xi = _paths_pallas(key, eq, x0, dts, K)
    else:
        xs, xi = _closed_form_paths(key, eq, x0, dts, K)
    return ts, xs, xi


def _paths_kernel(seed_ref, x0_ref, sdt_ref, xs_ref, xi_ref, *,
                  alpha_sqrt: float, K: int, nx: int, nx_pad: int):
    """One batch tile: running path state in VMEM, hardware-PRNG
    increments, one store per step."""
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    col = jax.lax.broadcasted_iota(jnp.int32, x0_ref.shape, 1)
    mask = (col < nx).astype(x0_ref.dtype)
    scale = sdt_ref[:] * alpha_sqrt  # (tile, 1): sqrt(dts) * sqrt(alpha)
    xs_ref[0] = x0_ref[:]

    def body(k, x):
        xi = _normals(x.shape) * mask
        xi_ref[k] = xi
        x = x + scale * xi
        xs_ref[k + 1] = x
        return x

    jax.lax.fori_loop(0, K, body, x0_ref[:])


def _paths_pallas(key, eq, x0, dts, K: int, tile_b: int | None = None,
                  interpret: bool | None = None):
    """Pallas path generator: returns (xs (K+1,B,nx), xi (K,B,nx)).

    Off-TPU falls back to the closed-form draw (the CPU interpreter stubs
    the in-kernel PRNG), so tests exercise the dispatch shape."""
    from deeppicarditeration_tpu.ops.pallas_kernels import seed_from_key

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if interpret or len(jax.devices()) != 1:
        # CPU interpreter stubs the PRNG; and a pallas_call has no SPMD
        # partitioning rule, so under a multi-chip pjit it would compute
        # replicated — the closed form shards cleanly in both cases.
        return _closed_form_paths(key, eq, x0, dts, K)
    b, nx = x0.shape
    nx_pad = _round_up(nx, LANE)
    if tile_b is None:
        # both whole-K outputs live in VMEM per tile (double-buffered):
        # (2K+1) * tile * nx_pad * 4 bytes, gated well under the ~16 MB
        # budget. K=50, nx_pad=128 -> cap 112; the divisor walk below
        # then lands on the largest divisor of B not above it (the
        # recorded 1.14 ms/epoch A/B ran at tile 64 for B=512).
        budget = 6 * 2 ** 20
        tile_b = max(8, budget // ((2 * K + 1) * nx_pad * 4) // 8 * 8)
    tile = min(tile_b, b)
    while b % tile:
        tile -= 1
    if tile < 8:  # degenerate grid (e.g. prime B): kernel not worth it
        return _closed_form_paths(key, eq, x0, dts, K)
    x0_pad = jnp.pad(x0, ((0, 0), (0, nx_pad - nx)))
    kernel = functools.partial(_paths_kernel,
                               alpha_sqrt=float(eq.alpha_sqrt), K=K,
                               nx=nx, nx_pad=nx_pad)
    seed_arr = seed_from_key(key, 3).reshape((1,))
    xs, xi = pl.pallas_call(
        kernel,
        grid=(b // tile,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tile, nx_pad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((K + 1, tile, nx_pad), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, tile, nx_pad), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((K + 1, b, nx_pad), x0.dtype),
            jax.ShapeDtypeStruct((K, b, nx_pad), x0.dtype),
        ],
        interpret=interpret,
    )(seed_arr, x0_pad, jnp.sqrt(dts).astype(x0.dtype))
    return xs[:, :, :nx], xi[:, :, :nx]
