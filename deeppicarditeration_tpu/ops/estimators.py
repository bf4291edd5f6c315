"""Monte-Carlo target generation: the computational core of DPI.

Reference parity: data.py:369-1223 (OnlineDataGenerator). For each
collocation point (t, x) and M i.i.d. samples the Picard target is

    u_hat(t, x) = terminal + integral
    terminal = E[(g(X_T) - g(x)) (1, Y)] + (g(x), 0),   Y = dW / sqrt(T-t) / sqrt(a)
    integral = E[(T-t) (f(s, X_s, u_k, grad u_k) - f0) (1, Ys)] + (f0 (T-t), 0)
               s ~ U[t, T],  Ys = dW / sqrt(s-t) / sqrt(a),  f0 = f at (t, x)

(data.py:471-527, 899-926; the g(x)/f0 subtractions are variance-reducing
control variates). Hessian targets use the split-increment / antithetic
"double" forms (data.py:823-897, 1153-1201).

TPU-first design (survey §7.1.3-4): the M-sample reduction is a
``lax.scan`` over static-size chunks with Kahan-compensated f32
accumulation — the (batch * M, nx) intermediate of the reference is never
materialized, and chunk size is a static ahead-of-time choice (the entire
GPU OOM-probing subsystem, memory.py, disappears). Outer-product Hessian
accumulations contract over the chunk axis with einsum (batched matmul on
the MXU) instead of materializing (B, M, nx, nx).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from deeppicarditeration_tpu.models.solution import Solution
from deeppicarditeration_tpu.ops.derivatives import (
    diag_hessian_entries,
    get_f,
)
from deeppicarditeration_tpu.ops.samplers import sample_t_picard, sample_t_uniform
from deeppicarditeration_tpu.ops.summation import KahanAcc


def largest_divisor(n: int, cap: int, step: int = 1) -> int:
    """Largest divisor of ``n`` that is <= max(cap, step) and a multiple of
    ``step``. Shared by GenConfig.chunk and the Pallas tile/mblk walks so
    the chunking policy cannot drift between the XLA and kernel paths.

    Raises instead of crashing with ZeroDivisionError when no such divisor
    exists — the one reachable case is antithetic pairing (step=2) with an
    odd sample count."""
    d = min(n, max(cap, step))
    while d >= step:
        if n % d == 0 and d % step == 0:
            return d
        d -= 1
    raise ValueError(
        f"no divisor of {n} <= {max(cap, step)} is a multiple of {step}"
        + (" — antithetic pairing needs an even sample count"
           if step == 2 else ""))


_FALLBACK_NOTICED = set()


def _notice_forced_fallback(flag: str, reason: str,
                            action: str = "using the XLA path") -> None:
    """One-line, once-per-(flag, reason) notice when an EXPLICITLY
    configured flag is overridden (usually a forced Pallas kernel falling
    back to the XLA path; ``action`` names the substitute behavior).
    Mirrors the TRAIN.FUSED gate_fail message: a user who forced a
    setting must not silently get the behavior they opted out of."""
    if (flag, reason) in _FALLBACK_NOTICED:
        return
    _FALLBACK_NOTICED.add((flag, reason))
    print(f"{flag}: requested but unavailable ({reason}); {action}")


def sublane_tile(b: int, cap: int) -> Optional[int]:
    """Batch tile for the Pallas kernels, or None when the batch cannot
    tile to the 8-row f32 sublane.

    The kernels split the batch as largest_divisor(b, tile_b); a batch
    whose only divisors under the cap are < 8 or not multiples of 8 (a
    prime batch, or 4 rows per device after sharding) would produce
    (tile, 1 + nx_pad) blocks below/astride the 8-row sublane — at best
    slow, at worst a Mosaic layout failure that only the merged kernel's
    trial compile would catch. Such batches take the XLA path instead."""
    tile = largest_divisor(b, cap)
    return tile if tile % 8 == 0 else None


@dataclasses.dataclass(frozen=True)
class GenConfig:
    """Static generation parameters (hashable; safe to close over in jit)."""

    n_estimate_terminal: int = 1
    n_estimate_integral: int = 1
    chunk_elems: int = 2 ** 22  # target B * m_chunk * nx elements per step
    t_always_uniform: bool = False
    t_uniform_eps: float = 0.0
    N: int = 1  # total Picard iterations (t power law)
    i: int = 1  # current iteration
    sample_bound: Optional[float] = None
    sdgd_v: Optional[int] = None  # SDGD sampled-diagonal width (None => full)
    # Storage dtype for the second-order-backprop (R, w, w) Hessian chain
    # blocks (derivatives._mlp_second_order): None = f32 (bit-identical
    # baseline) or "bf16" — halves HBM bytes on the BANDWIDTH-bound
    # FN/SDGD generation path (DATA.TPU.HESSIAN_STORE).
    hess_store: Optional[str] = None
    estimate_delta_t: float = 0.0  # >0 => TD (short-horizon) estimators
    tpu_prng: bool = False  # hardware-PRNG increments (Pallas kernel)
    antithetic: bool = False  # +/- dW pairs: half the draws, lower variance
    pallas_terminal: bool = False  # fused VMEM terminal estimator kernel
    pallas_integral: bool = False  # fused VMEM integral estimator kernel
    # Merged terminal+integral kernel: False / True / "auto". "auto"
    # enables it on the TPU backend when the frozen net + equation fit
    # the VMEM budget (pallas_kernels.generate_fits_vmem) — the measured
    # net end-to-end win at full-f32 matmul precision (BASELINE.md).
    pallas_generate: object = "auto"
    # In-kernel matmul precision for the merged kernel's frozen-net dots:
    # "bf16x3" (default; emulated-f32, accuracy-equivalent to
    # PRECISION.MATMUL highest), "default" (1-pass bf16 — 3x less MXU
    # work; the right choice when the frozen net is wide enough to make
    # generation MXU-bound AND the recipe's rRMSE trajectory is measured
    # unchanged, e.g. HJB 4x512 — see BASELINE.md), or "highest" (full
    # f32, 6-pass).
    pallas_precision: str = "bf16x3"
    # In-kernel activation storage for the merged kernel's frozen net:
    # None = f32, "bf16" = the net's Dense layers compute in bf16 (flax
    # dtype), halving the activation/vjp-residual share of the VMEM
    # working set so wide nets admit larger batch tiles. Only meaningful
    # with pallas_precision="default" (the dot operands are cast to bf16
    # on the MXU either way; the elementwise ops between layers see
    # rounded inputs — measured 0.39% relative delta on the HJB get_f,
    # ~4x below the M=4096 MC noise). DATA.TPU.PALLAS_ACT.
    pallas_act: Optional[str] = None
    # Device mesh for the kernel paths: a pallas_call has no SPMD
    # partitioning rule, so on a multi-device mesh the merged kernel is
    # wrapped in jax.shard_map over ``mesh_axis`` (per-device tiles,
    # per-device seed offsets that reproduce the single-device tile->seed
    # assignment exactly). None + multiple devices => XLA path (which
    # shards cleanly under pjit on its own).
    mesh: Optional[object] = None  # jax.sharding.Mesh (hashable, static)
    mesh_axis: str = "data"

    @property
    def act_dtype(self):
        """jnp dtype for pallas_act, or None."""
        if self.pallas_act is None:
            return None
        if str(self.pallas_act) == "bf16":
            return jnp.bfloat16
        raise ValueError(
            f"DATA.TPU.PALLAS_ACT must be null or 'bf16', got "
            f"{self.pallas_act!r}")

    def chunk(self, m: int, batch: int, nx: int, act_width: int = 0) -> int:
        """Largest divisor of m with batch * chunk * nx <= chunk_elems
        (even when antithetic pairing is on).

        ``act_width`` — the summed matmul output widths of the frozen
        net(s) the chunk traces (``_act_width``; 0 when no net) — adds a
        second bound: batch * chunk * act_width <= _ACT_BUDGET_ELEMS.
        The nx-based target alone sizes only the (B, mc, nx) sample
        buffers; the fwd+vjp activation residuals scale with act_width
        instead, and at small nx with a wide net they dominate (measured
        r5, dispatcher matrix: the 4x512 net at nx=10 drew mc=512 ->
        ~34 GB of activations -> device OOM). The budget is calibrated so
        every recorded flagship chunking — and therefore its RNG
        chunk-key stream and bitwise trajectory — is unchanged (HJB
        PISGradNet act_width 2760 -> target 71 >= the nx-based 64)."""
        target = max(1, self.chunk_elems // max(batch * nx, 1))
        if act_width:
            target = min(target, max(
                1, _ACT_BUDGET_ELEMS // max(batch * act_width, 1)))
        step = 2 if self.antithetic else 1
        return largest_divisor(m, target, step)


# Activation-element budget for GenConfig.chunk's second bound: the
# largest batch*mc*act_width the flagship recipes are MEASURED to run
# (HJB 4x512 PISGradNet: 4096 * 64 * 2760 = 7.2e8 elements ~= 5.8 GB of
# fwd+vjp residuals at f32 x ~2 live copies on a 16 GB chip) with ~10%
# headroom. Keeping every recorded recipe's mc unchanged is a hard
# constraint (mc sets the per-chunk RNG key stream).
_ACT_BUDGET_ELEMS = 3 * 2 ** 28


def _act_width(*sols) -> int:
    """Summed matmul output widths of the frozen nets a chunk traces
    (0 for zero/analytic solutions) — the act_width for GenConfig.chunk."""
    w = 0
    for s in sols:
        if s is None or s.params is None:
            continue
        for leaf in jax.tree_util.tree_leaves(s.params):
            if getattr(leaf, "ndim", 0) >= 2:
                w += int(leaf.shape[-1])
    return w


# Floor on (s - t) wherever it appears under 1/sqrt: in f32 the uniform
# s-draw can produce s == t exactly (prob ~2^-24 per sample), which makes
# the likelihood-ratio weight 0 * inf = NaN. The f64 reference never hits
# this (prob ~2^-53); with f32 it fires about once per 10^7 samples and
# a single NaN poisons the whole Kahan accumulator. Relative bias O(eps).
_ST_FLOOR = 1e-6


def _safe(st):
    return jnp.maximum(st, _ST_FLOOR)


def _scan_mean(key, m: int, mc: int, out_shape, chunk_sum_fn, dtype):
    """sum_{c} chunk_sum_fn(key_c, c) / m with Kahan accumulation."""
    n_chunks = m // mc
    acc0 = KahanAcc.zeros(out_shape, dtype=dtype)

    def body(acc, ck):
        k = jax.random.fold_in(key, ck)
        return acc.add(chunk_sum_fn(k, ck)), None

    acc, _ = jax.lax.scan(body, acc0, jnp.arange(n_chunks))
    return acc.value / m


def _draw_normals(gen: "GenConfig", key, shape, dtype):
    """dW draws: hardware-PRNG Pallas kernel when gen.tpu_prng, else
    threefry. The normals are ~2/3 of generation wall time at M=4096
    (see ops/pallas_kernels.py:tpu_normals)."""
    if gen.tpu_prng:
        from deeppicarditeration_tpu.ops.pallas_kernels import (
            seed_from_key,
            tpu_normals,
        )

        return tpu_normals(seed_from_key(key), shape, dtype)
    return jax.random.normal(key, shape, dtype=dtype)


def _draw_increments(gen: "GenConfig", key, b, mc, nx, dtype):
    """Chunk increments dW (b, mc, nx); antithetic => +/- pairs."""
    if gen.antithetic:
        half = _draw_normals(gen, key, (b, mc // 2, nx), dtype)
        return jnp.concatenate([half, -half], axis=1)
    return _draw_normals(gen, key, (b, mc, nx), dtype)


def _sdgd_indices(key, shape, nx: int):
    return jax.random.randint(key, shape, 0, nx, dtype=jnp.int32)


# ---------------------------------------------------------------------------
# value-only estimators (data.py:438-469)
# ---------------------------------------------------------------------------

def estimate_terminal(key, eq, tx, gen: GenConfig):
    """E g(X_T) per point; (B, 1)."""
    t, x = tx[:, :1], tx[:, 1:]
    b, nx = x.shape
    m = gen.n_estimate_terminal
    mc = gen.chunk(m, b, nx)
    sqrt_Tt = jnp.sqrt(eq.T - t)

    def chunk_sum(k, ck):
        dW = _draw_normals(gen, k, (b, mc, nx), x.dtype)
        XT = x[:, None, :] + sqrt_Tt[:, None, :] * eq.alpha_sqrt * dW
        return jnp.sum(eq.g(XT), axis=1)

    return _scan_mean(key, m, mc, (b, 1), chunk_sum, x.dtype)


def estimate_integral(key, eq, sol: Solution, tx, gen: GenConfig):
    """E (T - t) f(s, X_s, u_k(s, X_s), ...), s ~ U[t, T]; (B, 1).

    Unlike the reference (which calls equation.f and therefore only
    supports gradient-free equations here, data.py:454-469), this routes
    through get_f so the MC self-consistency evaluator works for every
    equation family.
    """
    t, x = tx[:, :1], tx[:, 1:]
    b, nx = x.shape
    m = gen.n_estimate_integral
    mc = gen.chunk(m, b, nx, _act_width(sol))

    def chunk_sum(k, ck):
        ks, kw, kh = jax.random.split(k, 3)
        u01 = jax.random.uniform(ks, (b, mc, 1), dtype=x.dtype)
        s = t[:, None, :] + u01 * (eq.T - t)[:, None, :]
        dW = _draw_normals(gen, kw, (b, mc, nx), x.dtype)
        Xs = x[:, None, :] + jnp.sqrt(s - t[:, None, :]) * eq.alpha_sqrt * dW
        idx = (_sdgd_indices(kh, (b, mc, gen.sdgd_v), nx)
               if (eq.has_hessian_term and gen.sdgd_v) else None)
        f = get_f(eq, sol, s, Xs, hess_indices=idx, hutchinson_key=kh,
                  hess_store=gen.hess_store)
        return jnp.sum((eq.T - t)[:, None, :] * f, axis=1)

    return _scan_mean(key, m, mc, (b, 1), chunk_sum, x.dtype)


# ---------------------------------------------------------------------------
# value + gradient estimators (data.py:471-527, 899-926)
# ---------------------------------------------------------------------------

def _forced_pallas_draws(key, tx, m: int, antithetic: bool,
                         with_u01: bool = False):
    """External randomness for FORCED Pallas flags off the TPU backend.

    The Pallas interpreter (used automatically off-TPU) stubs the in-kernel
    hardware PRNG to zeros, which would silently collapse every increment —
    targets would degenerate to the CV baselines with no error. Supplying
    explicit draws keeps forced flags exact anywhere (the kernels'
    documented external-noise test path); on the real TPU return no draws
    so increments are generated in VMEM."""
    if jax.default_backend() == "tpu":
        return {}
    b, nx = tx.shape[0], tx.shape[1] - 1
    m_draw = m // 2 if antithetic else m
    kn, ku = jax.random.split(jax.random.fold_in(key, 0x5eed))
    out = {"noise": jax.random.normal(kn, (b, m_draw, nx), tx.dtype)}
    if with_u01:
        out["u01"] = jax.random.uniform(ku, (b, m_draw, 1), tx.dtype)
    return out


def estimate_terminal_with_gradients(key, eq, tx, gen: GenConfig):
    """E[(g(X_T) - g(x)) (1, Y)] + (g(x), 0); (B, 1 + nx)."""
    if gen.pallas_terminal:
        ndev = _mesh_ndev(gen)
        # tile_b=512/mblk=8: measured best on v5e (93 ms vs 111 ms XLA at
        # B=4096, M=4096, nx=100); tile 1024 or mblk 32 overflow VMEM.
        # Non-divisible batch: single-device kernel (replicated under a
        # multi-chip pjit — wasteful but correct), not a hard error.
        sharded = (ndev is not None and ndev > 1
                   and tx.shape[0] % ndev == 0)
        b_local = tx.shape[0] // ndev if sharded else tx.shape[0]
        # b % 8 != 0 <=> NO divisor of b is a multiple of 8 (8 | d | b
        # would give 8 | b), i.e. no sublane-aligned tile exists at all;
        # any other batch is left to pick_standalone_tile's walk-down
        # (e.g. b = 2008 = 8 * 251 tiles at 8 even though its largest
        # divisors are sublane-astride — review r4 finding)
        if b_local % 8:
            _notice_forced_fallback(
                "DATA.TPU.PALLAS_TERMINAL",
                f"per-device batch {b_local} cannot tile to the 8-row "
                "sublane")
        else:
            from deeppicarditeration_tpu.ops.pallas_kernels import (
                pick_standalone_tile,
                seed_from_key,
                terminal_with_gradients_pallas,
                terminal_with_gradients_pallas_sharded,
            )

            # confirm-or-walk-down, like the merged dispatcher: a forced
            # flag must not reach a runtime Mosaic failure on a net the
            # VMEM heuristics never saw (512 = measured best on v5e at
            # B=4096, M=4096, nx=100; 93 ms vs 111 ms XLA)
            spec = pick_standalone_tile(
                "terminal", eq, None, tx.shape[1] - 1, b_local, 512,
                antithetic=gen.antithetic)
            if spec is None:
                _notice_forced_fallback(
                    "DATA.TPU.PALLAS_TERMINAL",
                    "no batch tile passes the Mosaic trial compile")
            else:
                tile = spec[0]  # terminal traces no net: limit unused
                draws = _forced_pallas_draws(key, tx,
                                             gen.n_estimate_terminal,
                                             gen.antithetic)
                if sharded:
                    return terminal_with_gradients_pallas_sharded(
                        seed_from_key(key), eq, tx, gen.n_estimate_terminal,
                        mesh=gen.mesh, axis=gen.mesh_axis, tile_b=tile,
                        mblk=8, antithetic=gen.antithetic, **draws)
                return terminal_with_gradients_pallas(
                    seed_from_key(key), eq, tx, gen.n_estimate_terminal,
                    tile_b=tile, mblk=8, antithetic=gen.antithetic, **draws)
    t, x = tx[:, :1], tx[:, 1:]
    b, nx = x.shape
    m = gen.n_estimate_terminal
    mc = gen.chunk(m, b, nx)
    g0 = eq.g(x)  # (B, 1) control-variate baseline
    # _safe: a collocation t can hit T exactly in f32 (the t-samplers draw
    # from laws whose support includes T), which would make inv_y = inf and
    # the 0 * inf gradient weight NaN -- same class as the s == t floor.
    sqrt_Tt = jnp.sqrt(_safe(eq.T - t))
    inv_y = 1.0 / (sqrt_Tt * eq.alpha_sqrt)  # Y = dW * inv_y

    def chunk_sum(k, ck):
        dW = _draw_increments(gen, k, b, mc, nx, x.dtype)
        XT = x[:, None, :] + sqrt_Tt[:, None, :] * eq.alpha_sqrt * dW
        diff = eq.g(XT) - g0[:, None, :]  # (B, mc, 1)
        val = jnp.sum(diff, axis=1)  # (B, 1)
        # sum_m diff * Y: contract over the chunk axis (no (B,mc,nx) output)
        grad = jnp.einsum("bmo,bmn->bn", diff, dW) * inv_y
        return jnp.concatenate([val, grad], axis=-1)

    mean = _scan_mean(key, m, mc, (b, 1 + nx), chunk_sum, x.dtype)
    return mean.at[:, 0:1].add(g0)


def _baseline_f(eq, sol: Solution, t, x, key, gen: GenConfig):
    """f at the collocation point itself (the integral CV baseline).

    Returns (f0, d0): f0 (B, 1) for the plain case; d0 (B, nx) full
    diagonal-Hessian entries at (t, x) when SDGD is active — the reference
    evaluates the baseline nonlinearity on the *sampled index subset*
    (data.py:1276-1302), so f0 is then recomputed per-sample in-chunk.
    """
    if eq.has_hessian_term and gen.sdgd_v:
        from deeppicarditeration_tpu.ops.derivatives import (
            _mlp_fast_path,
            mlp_hessian_diag,
        )

        if _mlp_fast_path(sol):
            # the full diagonal directly — no identity-index gather
            return None, mlp_hessian_diag(sol, t, x, store=gen.hess_store)
        full_idx = jnp.broadcast_to(jnp.arange(x.shape[-1], dtype=jnp.int32),
                                    x.shape)
        d0 = diag_hessian_entries(sol, t, x, full_idx,
                                  store=gen.hess_store)
        return None, d0
    f0 = get_f(eq, sol, t, x, hutchinson_key=key,
               hess_store=gen.hess_store)
    return f0, None


def _baseline_f_at_indices(eq, sol: Solution, t, x, d0, idx, u0):
    """SDGD baseline f0 per sampled index subset (B, mc, 1).

    With an ``ffi_stats`` equation the sampled-entry statistics come
    from multiplicity counts contracted against the precomputed full
    diagonal d0 (a batched matvec — no (B, mc, v) gather), and the
    source terms are evaluated once per collocation point through the
    (B, 1, .) singleton sample dim. ``u0 = sol.value(tx)`` is chunk-
    invariant and computed once outside the scan by the callers."""
    v = idx.shape[-1]
    if hasattr(eq, "ffi_stats"):
        from deeppicarditeration_tpu.ops.derivatives import (
            sdgd_index_counts,
        )

        c = sdgd_index_counts(idx, x.shape[-1])  # (B, mc, nx)
        m1 = jnp.einsum("bmn,bn->bm", c, d0)[..., None] / v
        m2 = jnp.einsum("bmn,bn->bm", c, jnp.abs(d0))[..., None] / v
        return eq.ffi_stats(t[:, None, :], x[:, None, :], u0[:, None, :],
                            m1, m2)
    u_ii0 = jnp.take_along_axis(
        jnp.broadcast_to(d0[:, None, :], idx.shape[:-1] + d0.shape[-1:]),
        idx, axis=-1)  # (B, mc, v)
    return eq.ffi(t[:, None, :], x[:, None, :], u0[:, None, :], u_ii0)


def estimate_integral_with_gradients(key, eq, sol: Solution, tx,
                                     gen: GenConfig):
    """E[(T-t)(f - f0)(1, Ys)] + (f0 (T-t), 0); (B, 1 + nx)."""
    if (gen.pallas_integral and eq.has_gradient_term
            and not eq.has_hessian_term and not eq.has_laplacian_term):
        ndev = _mesh_ndev(gen)
        # tile_b=128/mblk=8: measured best on v5e (282 ms vs 347 ms XLA at
        # B=4096, M=4096, nx=100, 4x128 MLP); bigger tiles overflow VMEM
        # (the in-kernel net fwd+vjp holds ~8 MB of activations).
        # Non-divisible batch: single-device kernel, as the terminal path.
        sharded = (ndev is not None and ndev > 1
                   and tx.shape[0] % ndev == 0)
        b_local = tx.shape[0] // ndev if sharded else tx.shape[0]
        if b_local % 8:  # no sublane-aligned divisor exists (see terminal)
            _notice_forced_fallback(
                "DATA.TPU.PALLAS_INTEGRAL",
                f"per-device batch {b_local} cannot tile to the 8-row "
                "sublane")
        else:
            from deeppicarditeration_tpu.ops.pallas_kernels import (
                integral_with_gradients_pallas,
                integral_with_gradients_pallas_sharded,
                pick_standalone_tile,
                seed_from_key,
            )

            # confirm-or-walk-down (see the terminal path; 128 = measured
            # best on v5e — the in-kernel net fwd+vjp holds ~8 MB of
            # activations, so wide nets need smaller tiles or XLA)
            spec = pick_standalone_tile(
                "integral", eq, sol, tx.shape[1] - 1, b_local, 128,
                antithetic=gen.antithetic,
                mxu_precision=gen.pallas_precision)
            if spec is None:
                _notice_forced_fallback(
                    "DATA.TPU.PALLAS_INTEGRAL",
                    "no batch tile passes the Mosaic trial compile")
            else:
                tile, vlim = spec
                draws = _forced_pallas_draws(key, tx,
                                             gen.n_estimate_integral,
                                             gen.antithetic, with_u01=True)
                if sharded:
                    return integral_with_gradients_pallas_sharded(
                        seed_from_key(key, 1), eq, sol, tx,
                        gen.n_estimate_integral, mesh=gen.mesh,
                        axis=gen.mesh_axis, tile_b=tile, mblk=8,
                        antithetic=gen.antithetic,
                        mxu_precision=gen.pallas_precision,
                        vmem_limit_bytes=vlim, **draws)
                return integral_with_gradients_pallas(
                    seed_from_key(key, 1), eq, sol, tx,
                    gen.n_estimate_integral,
                    tile_b=tile, mblk=8, antithetic=gen.antithetic,
                    mxu_precision=gen.pallas_precision,
                    vmem_limit_bytes=vlim, **draws)
    t, x = tx[:, :1], tx[:, 1:]
    b, nx = x.shape
    m = gen.n_estimate_integral
    mc = gen.chunk(m, b, nx, _act_width(sol))
    k_base, k_scan = jax.random.split(key)
    f0, d0 = _baseline_f(eq, sol, t, x, k_base, gen)
    u0 = sol.value(tx) if d0 is not None else None  # chunk-invariant
    Tt = (eq.T - t)

    def chunk_sum(k, ck):
        ks, kw, kh = jax.random.split(k, 3)
        if gen.antithetic:  # pair shares the same s
            u_half = jax.random.uniform(ks, (b, mc // 2, 1), dtype=x.dtype)
            u01 = jnp.concatenate([u_half, u_half], 1)
        else:
            u01 = jax.random.uniform(ks, (b, mc, 1), dtype=x.dtype)
        s = t[:, None, :] + u01 * Tt[:, None, :]
        dW = _draw_increments(gen, kw, b, mc, nx, x.dtype)
        st = s - t[:, None, :]
        Xs = x[:, None, :] + jnp.sqrt(st) * eq.alpha_sqrt * dW
        idx = (_sdgd_indices(kh, (b, mc, gen.sdgd_v), nx)
               if (eq.has_hessian_term and gen.sdgd_v) else None)
        f = get_f(eq, sol, s, Xs, hess_indices=idx, hutchinson_key=kh,
                  hess_store=gen.hess_store)
        if idx is not None:
            f0_b = _baseline_f_at_indices(eq, sol, t, x, d0, idx, u0)
        else:
            f0_b = f0[:, None, :]
        diff = Tt[:, None, :] * (f - f0_b)  # (B, mc, 1)
        val = jnp.sum(diff, axis=1)
        if idx is not None:
            # with a per-sample baseline the value slot keeps +f0_b (T-t)
            val = val + jnp.sum(Tt[:, None, :] * f0_b, axis=1)
        inv_y = 1.0 / (jnp.sqrt(_safe(st)) * eq.alpha_sqrt)  # (B, mc, 1)
        grad = jnp.einsum("bmo,bmn->bn", diff * inv_y, dW)
        return jnp.concatenate([val, grad], axis=-1)

    mean = _scan_mean(k_scan, m, mc, (b, 1 + nx), chunk_sum, x.dtype)
    if f0 is not None:
        mean = mean.at[:, 0:1].add(f0 * Tt)
    return mean


# ---------------------------------------------------------------------------
# value + gradient + Hessian ("double" antithetic forms,
# data.py:823-897 and 1153-1201 — the live variants per data.py:1220-1223)
# ---------------------------------------------------------------------------

def estimate_terminal_with_gradients_and_hessians(key, eq, tx,
                                                  gen: GenConfig):
    """(B, 1 + nx + nx^2): value/gradient part + antithetic Hessian part."""
    t, x = tx[:, :1], tx[:, 1:]
    b, nx = x.shape
    m = gen.n_estimate_terminal
    mc = gen.chunk(m, b, nx)
    g0 = eq.g(x)
    Tt = _safe(eq.T - t)  # floored: divided into inv_y and the dlt weight
    sqrt_Tt = jnp.sqrt(Tt)
    inv_y = 1.0 / (sqrt_Tt * eq.alpha_sqrt)

    def chunk_sum(k, ck):
        kw, kh = jax.random.split(k)
        # value/gradient: one-shot jump (two half-jumps compose to this)
        dW = _draw_normals(gen, kw, (b, mc, nx), x.dtype)
        XT = x[:, None, :] + sqrt_Tt[:, None, :] * eq.alpha_sqrt * dW
        diff = eq.g(XT) - g0[:, None, :]
        val = jnp.sum(diff, axis=1)
        grad = jnp.einsum("bmo,bmn->bn", diff, dW) * inv_y
        # Hessian: antithetic second difference (data.py:1185-1198)
        #   W1 ~ sqrt(T-t) N(0, I);  X± = x ± sqrt(a) W1
        #   dlt = (g(X+) + g(X-) - 2 g(x)) / 2 / (T-t)
        #   H = E[dlt W1 W1^T / (T-t)] - E[dlt] I
        W1 = sqrt_Tt[:, None, :] * _draw_normals(gen, kh, (b, mc, nx),
                                                 x.dtype)
        Xp = x[:, None, :] + eq.alpha_sqrt * W1
        Xm = x[:, None, :] - eq.alpha_sqrt * W1
        dlt = (eq.g(Xp) + eq.g(Xm) - 2.0 * g0[:, None, :]) / 2.0 / Tt[:, None, :]
        w = dlt / Tt[:, None, :]  # (B, mc, 1)
        part1 = jnp.einsum("bmi,bmj->bij", w[..., 0:1] * W1, W1)
        dlt_sum = jnp.sum(dlt, axis=1)  # (B, 1)
        eye = jnp.eye(nx, dtype=x.dtype)
        hess = part1 - dlt_sum[:, :, None] * eye[None]
        return jnp.concatenate([val, grad, hess.reshape(b, nx * nx)], axis=-1)

    mean = _scan_mean(key, m, mc, (b, 1 + nx + nx * nx), chunk_sum, x.dtype)
    return mean.at[:, 0:1].add(g0)


def estimate_integral_with_gradients_and_hessians(key, eq, sol: Solution,
                                                  tx, gen: GenConfig):
    """(B, 1 + nx + nx^2) integral part (data.py:823-897, "double" form)."""
    t, x = tx[:, :1], tx[:, 1:]
    b, nx = x.shape
    m = gen.n_estimate_integral
    mc = gen.chunk(m, b, nx, _act_width(sol))
    k_base, k_scan = jax.random.split(key)
    f0 = get_f(eq, sol, t, x, hutchinson_key=k_base,  # full-Hessian baseline
               hess_store=gen.hess_store)
    Tt = eq.T - t

    def chunk_sum(k, ck):
        ks, kw, kh = jax.random.split(k, 3)
        u01 = jax.random.uniform(ks, (b, mc, 1), dtype=x.dtype)
        # the reference offsets s by 1e-4 to keep (s - t) bounded away from 0
        # in the 1/(s-t)^2 Hessian weight (data.py:848)
        s = jnp.minimum(t[:, None, :] + u01 * Tt[:, None, :] + 1e-4, eq.T)
        st = s - t[:, None, :]
        dW = _draw_normals(gen, kw, (b, mc, nx), x.dtype)
        Xs = x[:, None, :] + jnp.sqrt(st) * eq.alpha_sqrt * dW
        kf, kp, km = jax.random.split(jax.random.fold_in(k, 1), 3)
        f = get_f(eq, sol, s, Xs, hutchinson_key=kf,
                  hess_store=gen.hess_store)
        diff = Tt[:, None, :] * (f - f0[:, None, :])
        val = jnp.sum(diff, axis=1)
        inv_y = 1.0 / (jnp.sqrt(_safe(st)) * eq.alpha_sqrt)
        grad = jnp.einsum("bmo,bmn->bn", diff * inv_y, dW)
        # antithetic Hessian part (data.py:879-894)
        W2 = jnp.sqrt(st) * _draw_normals(gen, kh, (b, mc, nx), x.dtype)
        Xp = x[:, None, :] + eq.alpha_sqrt * W2
        Xm = x[:, None, :] - eq.alpha_sqrt * W2
        fp = get_f(eq, sol, s, Xp, hutchinson_key=kp,
                   hess_store=gen.hess_store)
        fm = get_f(eq, sol, s, Xm, hutchinson_key=km,
                   hess_store=gen.hess_store)
        dlt = (fp + fm - 2.0 * f0[:, None, :]) / 2.0 / _safe(st)
        w = dlt / _safe(st)
        part1 = jnp.einsum("bmi,bmj->bij", w[..., 0:1] * W2, W2)
        dlt_sum = jnp.sum(dlt, axis=1)
        eye = jnp.eye(nx, dtype=x.dtype)
        hess = (part1 - dlt_sum[:, :, None] * eye[None]) * Tt[:, :, None]
        return jnp.concatenate([val, grad, hess.reshape(b, nx * nx)], axis=-1)

    mean = _scan_mean(k_scan, m, mc, (b, 1 + nx + nx * nx), chunk_sum,
                      x.dtype)
    return mean.at[:, 0:1].add(f0 * Tt)


# ---------------------------------------------------------------------------
# TD (short-horizon) estimators, ESTIMATE_DELTA_T > 0
# (data.py:529-578, 928-952, 1037-1058)
# ---------------------------------------------------------------------------

def estimate_terminal_with_gradients_td(key, eq, sol: Solution, tx,
                                        gen: GenConfig):
    """Bootstrap terminal: g replaced by u_k(t_next, .) short of T."""
    t, x = tx[:, :1], tx[:, 1:]
    b, nx = x.shape
    m = gen.n_estimate_terminal
    mc = gen.chunk(m, b, nx, _act_width(sol))
    t_next = jnp.minimum(t + gen.estimate_delta_t, eq.T)
    g0 = eq.g(x)
    sqrt_dt = jnp.sqrt(_safe(t_next - t))  # t can equal T in f32
    inv_y = 1.0 / (sqrt_dt * eq.alpha_sqrt)
    at_T = (t_next >= eq.T)

    def chunk_sum(k, ck):
        dW = _draw_normals(gen, k, (b, mc, nx), x.dtype)
        XT = x[:, None, :] + sqrt_dt[:, None, :] * eq.alpha_sqrt * dW
        t_next_b = jnp.broadcast_to(t_next[:, None, :], (b, mc, 1))
        gT = jnp.where(at_T[:, None, :], eq.g(XT),
                       sol.value(jnp.concatenate([t_next_b, XT], axis=-1)))
        diff = gT - g0[:, None, :]
        val = jnp.sum(diff, axis=1)
        grad = jnp.einsum("bmo,bmn->bn", diff, dW) * inv_y
        return jnp.concatenate([val, grad], axis=-1)

    mean = _scan_mean(key, m, mc, (b, 1 + nx), chunk_sum, x.dtype)
    return mean.at[:, 0:1].add(g0)


def estimate_integral_with_gradients_td(key, eq, sol: Solution, tx,
                                        gen: GenConfig):
    """Integral over the short horizon [t, t_next] (data.py:529-578)."""
    t, x = tx[:, :1], tx[:, 1:]
    b, nx = x.shape
    m = gen.n_estimate_integral
    mc = gen.chunk(m, b, nx, _act_width(sol))
    k_base, k_scan = jax.random.split(key)
    t_next = jnp.minimum(t + gen.estimate_delta_t, eq.T)
    f0, d0 = _baseline_f(eq, sol, t, x, k_base, gen)
    u0 = sol.value(tx) if d0 is not None else None  # chunk-invariant
    horizon = t_next - t

    def chunk_sum(k, ck):
        ks, kw, kh = jax.random.split(k, 3)
        u01 = jax.random.uniform(ks, (b, mc, 1), dtype=x.dtype)
        s = t[:, None, :] + u01 * horizon[:, None, :]
        st = s - t[:, None, :]
        dW = _draw_normals(gen, kw, (b, mc, nx), x.dtype)
        Xs = x[:, None, :] + jnp.sqrt(st) * eq.alpha_sqrt * dW
        idx = (_sdgd_indices(kh, (b, mc, gen.sdgd_v), nx)
               if (eq.has_hessian_term and gen.sdgd_v) else None)
        f = get_f(eq, sol, s, Xs, hess_indices=idx, hutchinson_key=kh,
                  hess_store=gen.hess_store)
        if idx is not None:
            f0_b = _baseline_f_at_indices(eq, sol, t, x, d0, idx, u0)
        else:
            f0_b = f0[:, None, :]
        diff = horizon[:, None, :] * (f - f0_b)
        val = jnp.sum(diff, axis=1)
        if idx is not None:
            val = val + jnp.sum(horizon[:, None, :] * f0_b, axis=1)
        inv_y = 1.0 / (jnp.sqrt(_safe(st)) * eq.alpha_sqrt)
        grad = jnp.einsum("bmo,bmn->bn", diff * inv_y, dW)
        return jnp.concatenate([val, grad], axis=-1)

    mean = _scan_mean(k_scan, m, mc, (b, 1 + nx), chunk_sum, x.dtype)
    if f0 is not None:
        mean = mean.at[:, 0:1].add(f0 * horizon)
    return mean


def estimate_terminal_with_gradients_td_bygx(key, eq, sol: Solution, tx,
                                             gen: GenConfig):
    """Gradient head bootstrapped directly from g_x / previous gradient net
    (data.py:1037-1058); value slot is zero."""
    t, x = tx[:, :1], tx[:, 1:]
    b, nx = x.shape
    m = gen.n_estimate_terminal
    mc = gen.chunk(m, b, nx, _act_width(sol))
    t_next = jnp.minimum(t + gen.estimate_delta_t, eq.T)
    at_T = (t_next >= eq.T)
    sqrt_dt = jnp.sqrt(_safe(t_next - t))  # t can equal T in f32

    def chunk_sum(k, ck):
        dW = _draw_normals(gen, k, (b, mc, nx), x.dtype)
        x_next = x[:, None, :] + sqrt_dt[:, None, :] * eq.alpha_sqrt * dW
        gx = eq.g_x(x_next)
        t_next_b = jnp.broadcast_to(t_next[:, None, :], (b, mc, 1))
        out = sol(jnp.concatenate([t_next_b, x_next], axis=-1))
        u_x = out[..., -nx:] if out.shape[-1] >= nx else jnp.zeros_like(x_next)
        picked = jnp.where(at_T[:, None, :], gx, u_x)
        grad = jnp.sum(picked, axis=1)
        return jnp.concatenate([jnp.zeros((b, 1), x.dtype), grad], axis=-1)

    return _scan_mean(key, m, mc, (b, 1 + nx), chunk_sum, x.dtype)


# ---------------------------------------------------------------------------
# dispatchers (data.py:1203-1223) and two-layer formula (data.py:1328-1379)
# ---------------------------------------------------------------------------

def _mesh_ndev(gen: GenConfig) -> Optional[int]:
    """Size of the gen-config mesh's data axis, or None when no mesh."""
    if gen.mesh is None:
        return None
    return int(gen.mesh.shape[gen.mesh_axis])


def _kernel_worthwhile(sol: Solution, nx: int) -> bool:
    """Is the merged kernel expected to BEAT the XLA path at this
    (net, nx)? Perf gate for "auto" only (forced True bypasses it; the
    trial compile still gates correctness either way).

    Measured boundary (r5 dispatcher matrix,
    bench_results/dispatcher_matrix_r5.jsonl — auto/XLA s-per-call ratio
    on v5e at B=4096, M=4096):
      - nx < 32: the kernel LOSES on every measured net (0.42x on 3x64,
        0.89x on 4x128 at nx=10) — too little VPU work per sample to pay
        the kernel's fixed per-tile overhead;
      - narrow nets (summed matmul widths < 512, e.g. 3x64 = 193) lose
        up to nx=100 (0.75-0.81x) and win from nx=256 (1.58x);
      - everything else wins 1.29-2.0x (4x128 = 513 wins 1.29x at
        nx=100 — the Burgers flagship).
    A zero/analytic frozen iterate (width 0, e.g. Picard iteration 1)
    keeps the kernel at nx >= 32: the flagship trajectories' iteration-1
    targets are generated on that path and are pinned bitwise."""
    if nx < 32:
        return False
    w = _act_width(sol)
    return not (0 < w < 512 and nx < 256)


def _pallas_generate_tile(gen: GenConfig, eq, sol: Solution, b: int):
    """Resolve the pallas_generate tri-state (False / True / "auto") to
    a (batch tile, split_chains, vmem_limit_bytes|None) spec for the
    merged kernel, or None for the XLA path.

    "auto" takes the merged kernel only on the real TPU backend (the CPU
    Pallas interpreter stubs the hardware PRNG to zeros) and only at the
    largest tile whose working set fits the VMEM budget (wide nets are
    upgraded to big merged tiles at the raised scoped-vmem limit, with
    split_chains/small-tile fallbacks; see
    pallas_kernels.pick_generate_tile). Multi-device: a pallas_call has
    no SPMD partitioning rule, so the kernel requires ``gen.mesh`` to
    shard_map over (tile picked against the PER-DEVICE batch); without a
    mesh the XLA path (which pjit shards cleanly on its own) is used."""
    mode = gen.pallas_generate
    if mode is not True and mode != "auto":
        return None
    ndev = _mesh_ndev(gen)
    b_local = b
    if ndev is not None and ndev > 1:
        if b % ndev:
            if mode is True:
                _notice_forced_fallback(
                    "DATA.TPU.PALLAS_GENERATE",
                    f"batch {b} is not divisible by the mesh data axis "
                    f"({ndev})")
            return None
        b_local = b // ndev
    if mode is not True:
        if jax.default_backend() != "tpu":
            return None
        if ndev is None and len(jax.devices()) != 1:
            return None
        if not _kernel_worthwhile(sol, sol.nx):
            return None
    from deeppicarditeration_tpu.ops.pallas_kernels import (
        pick_generate_tile,
    )

    # forced True shares the trial-confirmed pick (symmetry with the
    # standalone flags, VERDICT r3 weak #3): an explicitly forced kernel
    # on an unvalidated wide net walks down / falls back to XLA instead
    # of failing at runtime, and inherits the raised-limit tile upgrade.
    spec = pick_generate_tile(eq, sol, sol.nx, b_local,
                              antithetic=gen.antithetic,
                              mxu_precision=gen.pallas_precision,
                              act_dtype=gen.act_dtype)
    if spec is None or sublane_tile(b_local, spec[0]) is None:
        if mode is True:
            _notice_forced_fallback(
                "DATA.TPU.PALLAS_GENERATE",
                "no batch tile passes the Mosaic trial compile"
                if spec is None else
                f"per-device batch {b_local} cannot tile to the 8-row "
                "sublane")
        return None  # sublane-degenerate batch / no fitting tile: XLA path
    return spec


def generate_values(key, eq, sol: Solution, tx, gen: GenConfig):
    k1, k2 = jax.random.split(key)
    return (estimate_terminal(k1, eq, tx, gen)
            + estimate_integral(k2, eq, sol, tx, gen))


def generate_with_gradients(key, eq, sol: Solution, tx, gen: GenConfig):
    k1, k2 = jax.random.split(key)
    if (gen.estimate_delta_t == 0
            and gen.n_estimate_terminal == gen.n_estimate_integral
            and eq.has_gradient_term and not eq.has_hessian_term
            and not eq.has_laplacian_term):
        tile_spec = _pallas_generate_tile(gen, eq, sol, tx.shape[0])
        if tile_spec is not None:
            from deeppicarditeration_tpu.ops.pallas_kernels import (
                generate_with_gradients_pallas,
                generate_with_gradients_pallas_sharded,
                seed_from_key,
            )

            # In-kernel net dots use the 3-pass-bf16 emulation (max |Δ|
            # ~2e-5 vs full f32 on the 100-d Burgers targets — accuracy-
            # equivalent to the PRECISION.MATMUL: highest policy; Mosaic
            # cannot lower precision=HIGH natively). See
            # pallas_kernels.bf16x3_dot_general.
            tile, split, vmem_limit = tile_spec
            di = _forced_pallas_draws(k2, tx, gen.n_estimate_integral,
                                      gen.antithetic, with_u01=True)
            dt = _forced_pallas_draws(k1, tx, gen.n_estimate_terminal,
                                      gen.antithetic)
            ext = ({"noise_t": dt["noise"], "noise_i": di["noise"],
                    "u01": di["u01"]} if dt else {})
            ndev = _mesh_ndev(gen)
            if ndev is not None and ndev > 1:
                return generate_with_gradients_pallas_sharded(
                    seed_from_key(key, 2), eq, sol, tx,
                    gen.n_estimate_terminal, mesh=gen.mesh,
                    axis=gen.mesh_axis, tile_b=tile,
                    antithetic=gen.antithetic,
                    mxu_precision=gen.pallas_precision,
                    split_chains=split, act_dtype=gen.act_dtype,
                    vmem_limit_bytes=vmem_limit, **ext)
            return generate_with_gradients_pallas(
                seed_from_key(key, 2), eq, sol, tx,
                gen.n_estimate_terminal, tile_b=tile,
                antithetic=gen.antithetic,
                mxu_precision=gen.pallas_precision,
                split_chains=split, act_dtype=gen.act_dtype,
                vmem_limit_bytes=vmem_limit, **ext)
    if gen.estimate_delta_t > 0:
        if sol.output_dim == 1:
            g = estimate_terminal_with_gradients_td(k1, eq, sol, tx, gen)
        else:
            g = estimate_terminal_with_gradients_td_bygx(k1, eq, sol, tx, gen)
        y = estimate_integral_with_gradients_td(k2, eq, sol, tx, gen)
    else:
        g = estimate_terminal_with_gradients(k1, eq, tx, gen)
        y = estimate_integral_with_gradients(k2, eq, sol, tx, gen)
    return g + y


def generate_with_gradients_and_hessians(key, eq, sol: Solution, tx,
                                         gen: GenConfig):
    k1, k2 = jax.random.split(key)
    return (estimate_terminal_with_gradients_and_hessians(k1, eq, tx, gen)
            + estimate_integral_with_gradients_and_hessians(k2, eq, sol, tx,
                                                            gen))


def generate_two_layer(key, eq, sol: Solution, sol_m2: Solution, tx,
                       gen: GenConfig):
    """u_{k-1}(tx) + E (T-t) [f(u_{k-1}) - f(u_{k-2})] (data.py:1359-1379)."""
    t, x = tx[:, :1], tx[:, 1:]
    b, nx = x.shape
    m = gen.n_estimate_integral
    mc = gen.chunk(m, b, nx, _act_width(sol, sol_m2))

    def chunk_sum(k, ck):
        ks, kw, kh = jax.random.split(k, 3)
        u01 = jax.random.uniform(ks, (b, mc, 1), dtype=x.dtype)
        s = t[:, None, :] + u01 * (eq.T - t)[:, None, :]
        dW = _draw_normals(gen, kw, (b, mc, nx), x.dtype)
        Xs = x[:, None, :] + jnp.sqrt(s - t[:, None, :]) * eq.alpha_sqrt * dW
        # both iterates see the SAME Hutchinson probes: the residual
        # f(u_{k-1}) - f(u_{k-2}) then cancels the probe noise exactly
        f1 = get_f(eq, sol, s, Xs, hutchinson_key=kh,
                   hess_store=gen.hess_store)
        f2 = get_f(eq, sol_m2, s, Xs, hutchinson_key=kh,
                   hess_store=gen.hess_store)
        return jnp.sum((eq.T - t)[:, None, :] * (f1 - f2), axis=1)

    residual = _scan_mean(key, m, mc, (b, 1), chunk_sum, x.dtype)
    return sol.value(tx) + residual


# ---------------------------------------------------------------------------
# batch sampling (tx draw + target generation, data.py:196-283)
# ---------------------------------------------------------------------------

def sample_tx(key, eq, n_batch: int, gen: GenConfig, dtype=jnp.float32,
              t_expo=None):
    """Draw (t, x) collocation points. ``t_expo`` optionally overrides the
    power-law factor count N - i + 1 with a TRACED scalar so the caller's
    jit is iteration-independent (see training/picard.py)."""
    kt, kx = jax.random.split(key)
    if gen.t_always_uniform:
        t = sample_t_uniform(kt, n_batch, eq.T, gen.t_uniform_eps, dtype)
    else:
        if t_expo is None:
            t_expo = max(gen.N - gen.i + 1, 1)
        t = sample_t_picard(kt, n_batch, eq.T, t_expo, dtype)
    x = eq.sample_x(kx, t)
    return jnp.concatenate([t, x], axis=-1)


def _clip(u, gen: GenConfig):
    if gen.sample_bound is not None:
        return jnp.clip(u, -gen.sample_bound, gen.sample_bound)
    return u


def sample_batch(key, eq, sol: Solution, n_batch: int, gen: GenConfig,
                 mode: str = "gradient", sol_m2: Optional[Solution] = None,
                 dtype=jnp.float32, t_expo=None):
    """Draw collocation points and their MC targets.

    mode: 'value' | 'gradient' | 'hessian' | 'exact' | 'exact_gradient' |
    'exact_hessian' | 'two_layer' (dataset-variant table, data.py:1620-1661).
    Returns (tx (B, 1+nx), targets (B, target_dim)).
    """
    k_tx, k_gen = jax.random.split(key)
    tx = sample_tx(k_tx, eq, n_batch, gen, dtype, t_expo=t_expo)
    t, x = tx[:, :1], tx[:, 1:]
    if mode == "value":
        u = generate_values(k_gen, eq, sol, tx, gen)
    elif mode == "gradient":
        u = generate_with_gradients(k_gen, eq, sol, tx, gen)
    elif mode == "hessian":
        u = generate_with_gradients_and_hessians(k_gen, eq, sol, tx, gen)
    elif mode == "two_layer":
        u = generate_two_layer(k_gen, eq, sol, sol_m2, tx, gen)
    elif mode == "exact":
        u = eq.exact_solution(t, x)
    elif mode == "exact_gradient":
        uu, ux = eq.u_u_x(t, x)
        u = jnp.concatenate([uu, ux], axis=-1)
    elif mode == "exact_hessian":
        uu, ux, uh = eq.u_u_x_u_hessian(t, x)
        u = jnp.concatenate([uu, ux, uh.reshape(n_batch, -1)], axis=-1)
    else:
        raise ValueError(f"Unknown generation mode {mode!r}")
    return tx, _clip(u, gen)


def target_dim(mode: str, nx: int) -> int:
    """Target width per dataset variant (data.py:1620-1661)."""
    if mode in ("value", "two_layer", "exact"):
        return 1
    if mode in ("gradient", "exact_gradient"):
        return 1 + nx
    if mode in ("hessian", "exact_hessian"):
        return 1 + nx + nx * nx
    raise ValueError(f"Unknown generation mode {mode!r}")
