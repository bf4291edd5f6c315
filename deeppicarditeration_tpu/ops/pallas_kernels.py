"""Pallas TPU kernels for the RNG-bound estimator paths.

The integral estimator is MXU(matmul)-bound through the frozen network and
is left to XLA (measured near bf16 peak). The terminal estimator is
RNG/VPU-bound: per (t, x) point it draws M Gaussian jumps, evaluates the
closed-form terminal g, and reduces a control-variate mean
(data.py:899-926). This kernel fuses all of it in VMEM:

  - Gaussian increments from the in-kernel PRNG (pltpu.prng_random_bits +
    Box-Muller) — no HBM traffic for random bits;
  - g evaluated as a traced closure (any jnp-implemented terminal works);
  - the running (value, gradient) mean accumulated in an f32 VMEM scratch;
  - lane padding to 128 masked out of the increments.

Falls back to interpret mode off-TPU so the CPU test suite exercises the
same code path.
"""

from __future__ import annotations

import functools
import math
from typing import Callable

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _round_up(n: int, k: int) -> int:
    return ((n + k - 1) // k) * k


def _uniform_from_bits(bits):
    """uint32 bits -> float32 uniforms in (0, 1].

    Mantissa bit-trick (no int->float cast; Mosaic-friendly): stuff the top
    23 bits into an f32 mantissa with exponent 0 -> [1, 2), then 2 - u maps
    to (0, 1]."""
    f = jax.lax.bitcast_convert_type(
        (bits >> 9) | jnp.uint32(0x3F800000), jnp.float32)
    return 2.0 - f


def _normals(shape):
    """Standard normals via Box-Muller on in-kernel PRNG bits.

    Uses BOTH outputs of each Box-Muller pair (cos and sin) when the last
    dim is even — one log/sqrt and one uniform pair per TWO normals."""
    if shape[-1] % 2 == 0:
        half = shape[:-1] + (shape[-1] // 2,)
        b1 = pltpu.bitcast(pltpu.prng_random_bits(half), jnp.uint32)
        b2 = pltpu.bitcast(pltpu.prng_random_bits(half), jnp.uint32)
        u1 = _uniform_from_bits(b1)
        u2 = _uniform_from_bits(b2)
        r = jnp.sqrt(-2.0 * jnp.log(u1))
        theta = (2.0 * math.pi) * u2
        return jnp.concatenate([r * jnp.cos(theta), r * jnp.sin(theta)],
                               axis=-1)
    b1 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    b2 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    u1 = _uniform_from_bits(b1)
    u2 = _uniform_from_bits(b2)
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    return r * jnp.cos((2.0 * math.pi) * u2)


def _normals_kernel(seed_ref, out_ref):
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    out_ref[:] = _normals(out_ref.shape)


def tpu_normals(seed, shape, dtype=jnp.float32, row_block: int = 4096,
                interpret: bool | None = None):
    """Standard normals from the hardware PRNG (Box-Muller in VMEM).

    Drop-in replacement for jax.random.normal on the MC-estimator hot path:
    threefry normals cost ~2/3 of DPI generation time at M=4096 (measured:
    ~3.4e9 normals per Burgers-100d generation call); the in-kernel PRNG
    makes random-bit generation ~free relative to the HBM write.

    ``seed`` is an int32 scalar (array or traced); streams are decorrelated
    across grid tiles by program_id. Off-TPU falls back to
    jax.random.normal seeded from the same scalar.
    """
    n = 1
    for d in shape:
        n *= int(d)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    seed = jnp.asarray(seed, jnp.int32).reshape((1,))
    if interpret:
        # CPU fallback: the TPU interpreter stubs the PRNG; use threefry
        key = jax.random.fold_in(jax.random.PRNGKey(0), seed[0])
        return jax.random.normal(key, shape, dtype)
    rows = _round_up(pl.cdiv(n, LANE), 8)
    rb = min(row_block, rows)
    while rows % rb:
        rb -= 1
    flat = pl.pallas_call(
        _normals_kernel,
        grid=(rows // rb,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((rb, LANE), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, LANE), dtype),
    )(seed)
    return flat.reshape(-1)[:n].reshape(shape)


def _uniform(shape):
    """In-kernel uniforms in (0, 1]."""
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    return _uniform_from_bits(bits)


def _flatten_captured(tree):
    """Pytree -> (2D-normalized array leaves, original shapes, treedef).

    Pallas kernels may not close over array constants ("captures constants"
    error) — equation parameters (e.g. the HJB GMM) and frozen-net weights
    are flattened here and passed as whole-array VMEM inputs instead.
    """
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    arrs, shapes = [], []
    for leaf in leaves:
        a = jnp.asarray(leaf)
        shapes.append(a.shape)
        arrs.append(a.reshape((1, -1)) if a.ndim < 2 else a)
    return arrs, shapes, treedef


def _unflatten_captured(refs, shapes, treedef):
    leaves = [r[:].reshape(s) for r, s in zip(refs, shapes)]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def _captured_specs(arrs):
    return [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in arrs]


# ---------------------------------------------------------------------------
# 3-pass-bf16 matmul emulation ("HIGH" precision) for Mosaic bodies
# ---------------------------------------------------------------------------
# Mosaic rejects precision=HIGH on in-kernel dots ("Unsupported dot
# precision: HIGH") — only DEFAULT (1-pass bf16) and HIGHEST (full f32)
# lower. DEFAULT loses ~5% relative accuracy on the gradient head
# (PRECISION.md); HIGHEST pays the full 6-pass cost. This emulates the
# missing middle: split each f32 operand into a bf16 hi part and an f32
# residual, and form hi*hi + lo*hi + hi*lo with three 1-pass bf16 MXU
# dots (the lo*lo term is ~2^-16 relative and dropped — exactly XLA's
# HIGH strategy). Max |Δ| vs full f32 measured ~2e-5 on the 100-d
# Burgers targets.

def _split3(a, b, dimension_numbers):
    a_hi = a.astype(jnp.bfloat16).astype(a.dtype)
    b_hi = b.astype(jnp.bfloat16).astype(b.dtype)
    a_lo = a - a_hi
    b_lo = b - b_hi

    def d(u, v):
        # precision pinned to DEFAULT: the caller's trace may run under
        # default_matmul_precision("highest"), and Mosaic rejects a bf16
        # tpu.matmul carrying contract_precision<fp32> ("Bad lhs type")
        return jax.lax.dot_general(
            u.astype(jnp.bfloat16), v.astype(jnp.bfloat16),
            dimension_numbers, precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32)

    return (d(a_hi, b_hi) + d(a_lo, b_hi) + d(a_hi, b_lo)).astype(a.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _bf16x3_dense_dot(a, b, dimension_numbers):
    return _split3(a, b, dimension_numbers)


def _bf16x3_fwd(a, b, dimension_numbers):
    return _split3(a, b, dimension_numbers), (a, b)


def _bf16x3_bwd(dimension_numbers, res, g):
    # Specialised to the nn.Dense contraction: a (..., K) @ b (K, N).
    (contract, batch) = dimension_numbers
    a, b = res
    assert (batch == ((), ()) and contract[1] == (0,)
            and contract[0] == (a.ndim - 1,)), (
        "bf16x3 dot_general only supports the Dense (..., K) @ (K, N) "
        f"pattern, got {dimension_numbers}")
    # da = g @ b^T : contract g's last dim with b's output dim
    da = _split3(g, b, (((g.ndim - 1,), (1,)), ((), ())))
    # db = a^T @ g : contract the flattened leading dims
    a2 = a.reshape((-1, a.shape[-1]))
    g2 = g.reshape((-1, g.shape[-1]))
    db = _split3(a2, g2, (((0,), (0,)), ((), ())))
    return da, db


_bf16x3_dense_dot.defvjp(_bf16x3_fwd, _bf16x3_bwd)


def bf16x3_dot_general(a, b, dimension_numbers, precision=None,
                       preferred_element_type=None):
    """Drop-in ``dot_general`` for nn.Dense emulating 3-pass-bf16 (HIGH)
    precision with three DEFAULT-precision MXU dots; custom VJP so the
    backward dots are 3-pass too (and never mixed-dtype)."""
    return _bf16x3_dense_dot(a, b, dimension_numbers)


def _rebind_statics(sol_statics, eq_in):
    """Swap equation-closure fields on the module for ones bound to the
    KERNEL-INPUT equation: PISGradNet's g0 (the terminal condition)
    closes over the outer equation's arrays (e.g. the HJB GMM), which a
    Pallas body may not capture as constants — rebinding to eq_in makes
    those arrays flow through the declared VMEM inputs instead."""
    mod = sol_statics["module"]
    if mod is not None and getattr(mod, "g0", None) is not None:
        statics = dict(sol_statics)
        statics["module"] = mod.clone(g0=eq_in.g)
        return statics
    return sol_statics


def _bf16_acc(u, v, dimension_numbers):
    return jax.lax.dot_general(
        u, v, dimension_numbers, precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32).astype(jnp.bfloat16)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _bf16_acc_dense_dot(a, b, dimension_numbers):
    return _bf16_acc(a, b, dimension_numbers)


def _bf16_acc_fwd(a, b, dimension_numbers):
    return _bf16_acc(a, b, dimension_numbers), (a, b)


def _bf16_acc_bwd(dimension_numbers, res, g):
    # Specialised to the nn.Dense contraction (see _bf16x3_bwd).
    (contract, batch) = dimension_numbers
    a, b = res
    assert (batch == ((), ()) and contract[1] == (0,)
            and contract[0] == (a.ndim - 1,)), (
        "bf16-acc dot_general only supports the Dense (..., K) @ (K, N) "
        f"pattern, got {dimension_numbers}")
    da = _bf16_acc(g, b, (((g.ndim - 1,), (1,)), ((), ())))
    a2 = a.reshape((-1, a.shape[-1]))
    g2 = g.reshape((-1, g.shape[-1]))
    db = _bf16_acc(a2, g2, (((0,), (0,)), ((), ())))
    return da, db


_bf16_acc_dense_dot.defvjp(_bf16_acc_fwd, _bf16_acc_bwd)


def bf16_acc_dot_general(a, b, dimension_numbers, precision=None,
                         preferred_element_type=None):
    """Drop-in ``dot_general`` for nn.Dense under the bf16 activation
    policy (pallas_act): bf16-operand dots with f32 MXU accumulation,
    cast back to bf16.

    Mosaic rejects a bf16-OUTPUT tpu.matmul ("Expected matmul acc" —
    the MXU accumulates f32), so flax dtype=bf16 cannot use the stock
    lax.dot_general in a Pallas body. The custom VJP keeps the backward
    dots single-pass bf16 too (the plain transpose rule would promote
    the f32 cast cotangent into a 6-pass f32 matmul) and stores only
    bf16 residuals — the point of the policy."""
    return _bf16_acc_dense_dot(a, b, dimension_numbers)


def _sol_statics(sol, mxu_precision, act_dtype=None):
    """Solution static fields for in-kernel reconstruction. For
    mxu_precision="bf16x3" the module's dots are swapped for the 3-pass
    emulation (modules without a dot_general knob keep their dots and
    rely on the trace-time default precision instead). ``act_dtype``
    (e.g. jnp.bfloat16) sets the module's Dense compute dtype so the
    in-kernel activations/vjp residuals are stored at half width —
    only meaningful with 1-pass dots (mxu_precision="default"), where
    the operands are cast to bf16 on the MXU anyway."""
    module = sol.module
    if act_dtype is not None and mxu_precision in ("bf16x3", "highest"):
        # the act clone replaces the module's dot_general with the
        # 1-pass bf16_acc dot: combining it with bf16x3/highest would
        # SILENTLY downgrade the configured dot precision (None means
        # "trace-time default", which IS single-pass)
        raise ValueError(
            "pallas_act bf16 requires pallas_precision='default' "
            f"(got {mxu_precision!r}): the bf16 activation policy's "
            "dots are single-pass by construction")
    if (mxu_precision == "bf16x3" and module is not None
            and hasattr(module, "dot_general")):
        module = module.clone(dot_general=bf16x3_dot_general)
    if (act_dtype is not None and module is not None
            and hasattr(module, "dtype")):
        module = module.clone(dtype=act_dtype,
                              dot_general=bf16_acc_dot_general)
    return dict(module=module, kind=sol.kind, net_type=sol.net_type,
                nx=sol.nx, gfn=sol.gfn)


# VMEM budget for the auto-dispatch fit check against Mosaic's DEFAULT
# 16 MB scoped-vmem LIMIT (a compiler parameter — physical v5e VMEM is
# far larger; see _VMEM_LIMIT_BYTES for the raised-limit upgrade path).
# Mosaic needs headroom for double-buffered input/output blocks and its
# own temporaries, so the working-set estimate is gated well below.
_VMEM_BUDGET_BYTES = 12 * 2 ** 20


def generate_vmem_bytes(eq, sol, nx: int, tile_b: int = 128,
                        mblk: int = 8, act_bytes: int = 4) -> int:
    """Rough VMEM working-set estimate for the merged dual-estimator
    kernel (``generate_with_gradients_pallas``).

    Components: the captured arrays (frozen-net weights + equation
    parameters, resident whole), per-inner-block sample buffers
    (~3 copies of (tile*mblk, nx_pad) for dW/X_s/masks), the traced
    frozen-net forward+vjp activations (~2 live copies per matmul output
    width), and the (tile, 1+nx_pad) accumulator scratch.

    Calibrated against measured cases (BASELINE.md): the 4x128 ELU MLP
    (Burgers/Cha/FN frozen net) estimates ~7 MB and compiles; the 4x512
    PISGradNet estimates ~24 MB and genuinely overflows Mosaic VMEM
    allocation. The gate at 12 MB separates them with headroom.

    ``act_bytes`` = 2 models the bf16 activation policy (pallas_act):
    the frozen net's per-row activations/vjp residuals halve while the
    sample buffers (dW/X_s) and accumulator stay f32.
    """
    nx_pad = _round_up(nx, LANE)
    cap_arrs, _, _ = _flatten_captured((eq, sol.params))
    params_bytes = sum(int(a.size) * 4 for a in cap_arrs)
    widths = sum(int(a.shape[-1]) for a in cap_arrs if a.ndim >= 2)
    rows = tile_b * mblk
    buf_bytes = rows * (4 * (3 * nx_pad + 2 * (1 + nx_pad))
                        + act_bytes * 2 * widths)
    return params_bytes + buf_bytes + tile_b * (1 + nx_pad) * 4


def generate_fits_vmem(eq, sol, nx: int, tile_b: int = 128,
                       mblk: int = 8, act_bytes: int = 4) -> bool:
    return (generate_vmem_bytes(eq, sol, nx, tile_b, mblk, act_bytes)
            <= _VMEM_BUDGET_BYTES)


# Wide nets that bottom out at tile 16 can take tile 32 with the
# split_chains layout (the terminal chain's buffers retire before the
# integral chain's liveness peak): measured on the 4x512 PISGradNet,
# tile-32 split compiles at a 16.7 MB static estimate (merged tile 32
# does not) and runs 1.599 s vs 1.689 s at tile 16 (5.6% win,
# scripts/probe_hjb_tiles.py). The relaxed budget gates how far past
# the merged budget the split upgrade may reach; split only retires
# TRANSIENT buffers, so the upgrade additionally requires resident
# weights to leave at least the validated case's transient headroom —
# an unvalidated weight-heavy net keeps the safe tile 16 rather than
# risking a Mosaic allocation failure (there is no compile-time
# fallback once the kernel is chosen).
_VMEM_SPLIT_BUDGET_BYTES = 17 * 2 ** 20
_VMEM_SPLIT_MAX_PARAM_BYTES = 8 * 2 ** 20

# Raised scoped-vmem limit for wide nets: Mosaic's DEFAULT limit is
# 16 MB — a compiler parameter, far below a v5e core's physical VMEM —
# and is what every recorded tile-overflow negative result actually hit.
# At 100 MB the HJB 4x512 PISGradNet compiles tiles 64-256; the best,
# tile 128 merged, runs 0.804 s vs 0.838 at the old 32/split pick (4%,
# scripts/probe_vmem_limit.py). The upgrade budget leaves headroom under
# the limit for Mosaic's own temporaries and double buffering (measured
# scoped usage at tile 128 is ~44 MB against a ~48 MB estimate).
_VMEM_LIMIT_BYTES = 100 * 2 ** 20
_VMEM_RAISED_BUDGET_BYTES = 56 * 2 ** 20


def _heuristic_generate_tile(eq, sol, nx: int, b: int, mblk: int = 8,
                             act_bytes: int = 4):
    """Two-point-calibrated VMEM estimate -> preferred (tile, split).

    The ladder walks ``largest_divisor(b, cap)`` (not only the literal
    caps) so small per-device batches — e.g. b_local = 8 under an
    8-device shard_map — still get their sublane-aligned tile."""
    from deeppicarditeration_tpu.ops.estimators import largest_divisor

    seen = set()
    for cap in (128, 64, 32, 16, 8):
        tile = largest_divisor(b, cap)
        if tile % 8 or tile in seen:
            continue
        seen.add(tile)
        if generate_fits_vmem(eq, sol, nx, tile, mblk, act_bytes):
            if tile == 16 and b % 32 == 0:
                cap_arrs, _, _ = _flatten_captured((eq, sol.params))
                params_bytes = sum(int(a.size) * 4 for a in cap_arrs)
                if (generate_vmem_bytes(eq, sol, nx, 32, mblk, act_bytes)
                        <= _VMEM_SPLIT_BUDGET_BYTES
                        and params_bytes <= _VMEM_SPLIT_MAX_PARAM_BYTES):
                    return 32, True
            return tile, False
    return None


# (treedef, leaf shapes, nx, tile, split, mblk, antithetic) -> bool.
# One Mosaic trial compile per NEW frozen-net architecture per process
# (a Picard run reuses one architecture for all N iterations, so this is
# a single extra ~1 min tunnel compile per run on first dispatch).
_TRIAL_COMPILE_CACHE: dict = {}


def _trial_compile_ok(eq, sol, nx: int, tile: int, split: bool,
                      mblk: int, antithetic: bool,
                      mxu_precision: str | None = "bf16x3",
                      act_dtype=None,
                      vmem_limit_bytes: int | None = None) -> bool:
    """Does the merged kernel actually compile at this tile?

    The VMEM estimate is calibrated on two known nets and has no
    compile-time fallback when it mispredicts a new architecture
    (VERDICT r1 item 7): Mosaic's allocation failure would kill the run
    at dispatch. This confirms the pick with an ahead-of-time lowering
    against abstract avals (works under an outer trace — only shapes are
    consumed) of a single-tile call with m == 2 * mblk: the VMEM working
    set depends on (tile, mblk, net) and on the inner sample loop being
    MULTI-trip, not on the sample count beyond that — a single-trip
    (m == mblk) trial measurably under-allocates the loop's stack
    (observed r5: the 2x1024 net at nx=256 trial-passed at m == mblk but
    the full-m dispatch overflowed scoped vmem 17.15M > 16M; dispatcher
    matrix). On failure the dispatcher walks down to smaller tiles, then
    XLA.
    """
    leaves, treedef = jax.tree_util.tree_flatten((eq, sol))
    sig = (treedef, tuple(jnp.shape(l) for l in leaves), nx, tile, split,
           mblk, antithetic, mxu_precision, act_dtype, vmem_limit_bytes)
    try:
        hash(sig)
        cached = _TRIAL_COMPILE_CACHE.get(sig)
    except TypeError:  # unhashable static in the treedef: skip the cache
        sig, cached = None, None
    if cached is not None:
        return cached
    abstract = jax.tree_util.tree_map(
        lambda l: jax.ShapeDtypeStruct(jnp.shape(l),
                                       jnp.result_type(l)), (eq, sol))
    tx_abs = jax.ShapeDtypeStruct((tile, 1 + nx), jnp.float32)
    m_trial = 2 * mblk  # multi-trip inner loop: see docstring
    # mirror the dispatch's noise source: in-kernel PRNG on TPU, external
    # draws off-TPU (prng_seed has no CPU/interpret lowering)
    ext_abs = {}
    if jax.default_backend() != "tpu":
        m_draw = m_trial // 2 if antithetic else m_trial
        ext_abs = dict(
            u01=jax.ShapeDtypeStruct((tile, m_draw, 1), jnp.float32),
            noise_t=jax.ShapeDtypeStruct((tile, m_draw, nx), jnp.float32),
            noise_i=jax.ShapeDtypeStruct((tile, m_draw, nx), jnp.float32))

    def run(eq_sol, tx, ext):
        e, s = eq_sol
        return generate_with_gradients_pallas(
            0, e, s, tx, m_trial, tile_b=tile, mblk=mblk,
            antithetic=antithetic, mxu_precision=mxu_precision,
            split_chains=split, act_dtype=act_dtype,
            vmem_limit_bytes=vmem_limit_bytes, **ext)

    try:
        jax.jit(run).lower(abstract, tx_abs, ext_abs).compile()
        ok = True
    except Exception as e:
        print(f"pallas_generate: tile {tile}{' split' if split else ''} "
              f"failed Mosaic compile ({type(e).__name__}); falling back")
        ok = False
    if sig is not None:
        _TRIAL_COMPILE_CACHE[sig] = ok
    return ok


def pick_generate_tile(eq, sol, nx: int, b: int, mblk: int = 8,
                       antithetic: bool = False, trial: bool = True,
                       mxu_precision: str | None = "bf16x3",
                       act_dtype=None):
    """(tile, split_chains, vmem_limit_bytes|None) for the merged
    kernel, or None for the XLA path.

    Largest batch tile (<= 128, dividing b) whose estimated working set
    fits the VMEM budget. Small nets (4x128 MLP) get tile 128 merged;
    wide nets (4x512 PISGradNet, ~5400 summed matmul widths) that only
    fit merged at tile 16 are upgraded to tile-32 split_chains when the
    relaxed split budget admits it (measured faster; see above).

    The heuristic pick is CONFIRMED by a cached Mosaic trial compile
    (_trial_compile_ok) at the SAME ``mxu_precision`` the dispatcher will
    use (precisions differ in scoped-vmem footprint: "highest" overflows
    on nets where bf16x3 fits); a mispredicting estimate walks down to
    smaller tiles and ultimately to the XLA path instead of failing at
    runtime. ``trial=False`` skips the confirmation (unit tests of the
    estimate). ``act_dtype=jnp.bfloat16`` (pallas_act) halves the
    activation share of the VMEM estimate and is threaded into the trial
    compile.

    Returns ``(tile, split_chains, vmem_limit_bytes|None)``: wide nets
    whose default-limit pick bottoms out below tile 128 are upgraded to
    the largest merged tile fitting the raised-limit budget (see
    _VMEM_LIMIT_BYTES; measured 4% on the HJB PISGradNet), with the
    default-limit pick and the old ladder as trial-confirmed fallbacks.
    """
    if act_dtype is not None and not (sol.module is not None
                                      and hasattr(sol.module, "dtype")):
        # _sol_statics will no-op on a module without the dtype knob:
        # the kernel stores f32 activations, so size the estimate (and
        # the trial signature) accordingly — and say so once: the user
        # explicitly configured DATA.TPU.PALLAS_ACT (ADVICE r4 item 1)
        from deeppicarditeration_tpu.ops.estimators import (
            _notice_forced_fallback,
        )

        _notice_forced_fallback(
            "DATA.TPU.PALLAS_ACT",
            f"solution module {type(sol.module).__name__} has no dtype "
            "knob", action="storing f32 activations")
        act_dtype = None
    if act_dtype is not None and mxu_precision in ("bf16x3", "highest"):
        # fail fast HERE: raised inside the trial lowering, the
        # _sol_statics conflict ValueError would be swallowed by the
        # trial's except and misread as a Mosaic compile failure
        raise ValueError(
            "pallas_act bf16 requires pallas_precision='default' "
            f"(got {mxu_precision!r})")
    from deeppicarditeration_tpu.ops.estimators import largest_divisor

    act_bytes = 2 if act_dtype == jnp.bfloat16 else 4
    base = _heuristic_generate_tile(eq, sol, nx, b, mblk, act_bytes)
    candidates = []
    base_tile = base[0] if base else 0
    # Raised-limit candidates are MERGED-ONLY (like the down-ladder) and
    # their budget gate scales with the precision's extra live
    # temporaries: each rejected candidate costs a remote Mosaic trial
    # compile, and the emulated-precision dots multiply the dots' live
    # operand copies past the f32 estimate — such candidates are pruned
    # up front instead of burning trials (ADVICE r4 item 2). The factor
    # models MEMORY (operand duplication), not MXU pass count: bf16x3
    # splits each operand into hi/lo bf16 copies (~2x live bytes), and
    # x2 is the measured boundary — at x3 the 4x128/nx=512 tile-128
    # candidate was pruned at a 58.87M-vs-58.72M margin yet compiles and
    # runs 2.1% faster than the admitted tile 64 (r5 probes; likewise
    # 4x512@100 tile-64-raised +1.1%, 2x1024@100 +0.7%). "highest"
    # keeps its conservative pass count (no in-kernel measurements).
    # The trial compile remains the correctness gate for whatever
    # survives; the measured raised-limit win (HJB 4x512 tile 128,
    # precision "default") has factor 1 and is unaffected.
    passes = {"bf16x3": 2, "highest": 6}.get(mxu_precision or "", 1)
    raised_seen = set()
    for cap in (128, 64):
        tile = largest_divisor(b, cap)
        if tile % 8 or tile in raised_seen:
            continue
        raised_seen.add(tile)
        if (tile > base_tile
                and generate_vmem_bytes(eq, sol, nx, tile, mblk, act_bytes)
                * passes <= _VMEM_RAISED_BUDGET_BYTES):
            candidates.append((tile, False, _VMEM_LIMIT_BYTES))
    if base is not None:
        candidates.append((base[0], base[1], None))
        if not base[1]:
            # split retires the terminal chain's transients before the
            # integral chain's liveness peak — a merged-reject tile can
            # still compile split (the old measured HJB pick is 32/split)
            candidates.append((base[0], True, None))
        for tile in (64, 32, 16):
            if tile < base[0] and b % tile == 0:
                # merged-only on the down-ladder: each candidate is a
                # 1-5 min remote trial compile on a new architecture,
                # and the split rescue is already offered at the
                # preferred tile
                candidates.append((tile, False, None))
    if not candidates:
        return None
    if not trial:
        return candidates[0]
    for tile, split, lim in candidates:
        if _trial_compile_ok(eq, sol, nx, tile, split, mblk, antithetic,
                             mxu_precision=mxu_precision,
                             act_dtype=act_dtype, vmem_limit_bytes=lim):
            return tile, split, lim
    return None


_STANDALONE_TRIAL_CACHE: dict = {}


def _standalone_trial_ok(kind: str, eq, sol, nx: int, tile: int, mblk: int,
                         antithetic: bool,
                         mxu_precision: str | None,
                         vmem_limit_bytes: int | None = None) -> bool:
    """Does the standalone ``terminal``/``integral`` kernel compile at
    this tile? Same mechanism as _trial_compile_ok for the merged kernel
    (ahead-of-time lowering of a single-tile call with m == 2 * mblk —
    the VMEM working set depends on (tile, mblk, net) and the inner loop
    being multi-trip, not the sample count beyond that), cached per
    (kind, net-architecture, tile)."""
    payload = eq if kind == "terminal" else (eq, sol)
    leaves, treedef = jax.tree_util.tree_flatten(payload)
    sig = (kind, treedef, tuple(jnp.shape(l) for l in leaves), nx, tile,
           mblk, antithetic, mxu_precision, vmem_limit_bytes)
    try:
        hash(sig)
        cached = _STANDALONE_TRIAL_CACHE.get(sig)
    except TypeError:  # unhashable static in the treedef: skip the cache
        sig, cached = None, None
    if cached is not None:
        return cached
    abstract = jax.tree_util.tree_map(
        lambda l: jax.ShapeDtypeStruct(jnp.shape(l), jnp.result_type(l)),
        payload)
    tx_abs = jax.ShapeDtypeStruct((tile, 1 + nx), jnp.float32)
    m_trial = 2 * mblk  # multi-trip inner loop: see _trial_compile_ok
    ext_abs = {}
    if jax.default_backend() != "tpu":  # interpret path: external draws
        m_draw = m_trial // 2 if antithetic else m_trial
        ext_abs["noise"] = jax.ShapeDtypeStruct((tile, m_draw, nx),
                                                jnp.float32)
        if kind == "integral":
            ext_abs["u01"] = jax.ShapeDtypeStruct((tile, m_draw, 1),
                                                  jnp.float32)

    def run(payload_in, tx, ext):
        if kind == "terminal":
            return terminal_with_gradients_pallas(
                0, payload_in, tx, m_trial, tile_b=tile, mblk=mblk,
                antithetic=antithetic, **ext)
        e, s = payload_in
        return integral_with_gradients_pallas(
            0, e, s, tx, m_trial, tile_b=tile, mblk=mblk,
            antithetic=antithetic, mxu_precision=mxu_precision,
            vmem_limit_bytes=vmem_limit_bytes, **ext)

    try:
        jax.jit(run).lower(abstract, tx_abs, ext_abs).compile()
        ok = True
    except Exception as e:
        print(f"pallas_{kind}: tile {tile} failed Mosaic compile "
              f"({type(e).__name__}); falling back")
        ok = False
    if sig is not None:
        _STANDALONE_TRIAL_CACHE[sig] = ok
    return ok


def pick_standalone_tile(kind: str, eq, sol, nx: int, b: int,
                         tile_pref: int, mblk: int = 8,
                         antithetic: bool = False,
                         mxu_precision: str | None = None):
    """(tile, vmem_limit_bytes|None) — the largest batch tile
    (<= tile_pref, dividing b, sublane-aligned) at which the forced
    standalone ``kind`` kernel actually compiles — or None for the XLA
    path.

    The merged dispatcher's tile pick is Mosaic-trial-confirmed; an
    explicitly forced DATA.TPU.PALLAS_TERMINAL/INTEGRAL used to go
    straight to pallas_call and could fail at runtime on a net the VMEM
    heuristics never saw (VERDICT r3 weak #3). This walks the same
    confirm-or-fall-down ladder so no runtime Mosaic failure is reachable
    from config. An integral tile that Mosaic rejects at the DEFAULT
    scoped-vmem limit is retried at the raised limit before walking
    down (the net's fwd+vjp activations are what overflow — see
    _VMEM_LIMIT_BYTES), so wide nets keep big tiles under the forced
    flags too."""
    from deeppicarditeration_tpu.ops.estimators import largest_divisor

    seen = set()
    for cap in (tile_pref, 256, 128, 64, 32, 16, 8):
        if cap > tile_pref:
            continue
        tile = largest_divisor(b, cap)
        if tile % 8 or tile in seen:
            continue
        seen.add(tile)
        if _standalone_trial_ok(kind, eq, sol, nx, tile, mblk, antithetic,
                                mxu_precision):
            return tile, None
        if kind == "integral" and _standalone_trial_ok(
                kind, eq, sol, nx, tile, mblk, antithetic, mxu_precision,
                vmem_limit_bytes=_VMEM_LIMIT_BYTES):
            # the default-limit attempt just printed "falling back" —
            # correct the record: the big tile shipped after all
            print(f"pallas_{kind}: tile {tile} kept at the raised "
                  "scoped-vmem limit")
            return tile, _VMEM_LIMIT_BYTES
    return None


def _integral_kernel(seed_ref, t_ref, x_ref, f0_ref, *rest, f_of: Callable,
                     n_captured: int, captured_shapes, captured_treedef,
                     alpha_sqrt: float, T: float, m: int, nx: int,
                     nx_pad: int, mblk: int, antithetic: bool,
                     st_floor: float, external_noise: bool):
    """One grid tile of the fused integral CV estimator.

    Per inner block of ``mblk`` samples (all in VMEM):
      s ~ U[t, T]  ->  X_s = x + sqrt(s-t) sqrt(a) dW  (hardware PRNG)
      f = f_of(s, X_s)   # frozen-net forward + batched vjp, traced into
                         # the kernel (MXU matmuls); any jnp net works
      acc += (T-t) (f - f0) * (1, dW / sqrt(s-t) / sqrt(a))

    This removes the HBM round trips between the XLA chunk fusions and the
    threefry bit generation from the hot path (data.py:471-527 math).
    ``antithetic`` shares s within +/- increment pairs, as the XLA path.
    """
    captured = _unflatten_captured(rest[:n_captured], captured_shapes,
                                   captured_treedef)
    rest = rest[n_captured:]
    if external_noise:
        u01_ref, noise_ref, out_ref, acc_ref = rest
    else:
        out_ref, acc_ref = rest
    i = pl.program_id(0)
    if not external_noise:
        pltpu.prng_seed(seed_ref[0] + i)
    t = t_ref[:]  # (tile_b, 1)
    x = x_ref[:]  # (tile_b, nx_pad); pad columns zero
    f0 = f0_ref[:]  # (tile_b, 1)
    Tt = T - t
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    mask = (col < nx).astype(x.dtype)[:, None, :]
    tile_b = x.shape[0]
    half = mblk // 2

    acc_ref[:] = jnp.zeros_like(acc_ref)

    def body(k, _):
        if external_noise:
            if antithetic:
                uh = u01_ref[:, pl.ds(k * half, half), :]
                u01 = jnp.concatenate([uh, uh], axis=1)
                h = noise_ref[:, pl.ds(k * half, half), :]
                dW = jnp.concatenate([h, -h], axis=1) * mask
            else:
                u01 = u01_ref[:, pl.ds(k * mblk, mblk), :]
                dW = noise_ref[:, pl.ds(k * mblk, mblk), :] * mask
        else:
            # one (tile_b, LANE) uniform draw covers the mblk s-samples
            # (1/mblk of the dW draw cost); antithetic pairs share s
            u_row = _uniform((tile_b, LANE))
            # slice+reshape, NOT x[:, :k, None]: the newaxis getitem lowers
            # through jnp's gather path, which Mosaic rejects
            if antithetic:
                uh = u_row[:, :half].reshape(tile_b, half, 1)
                u01 = jnp.concatenate([uh, uh], axis=1)
                h = _normals((tile_b, half, nx_pad))
                dW = jnp.concatenate([h, -h], axis=1) * mask
            else:
                u01 = u_row[:, :mblk].reshape(tile_b, mblk, 1)
                dW = _normals((tile_b, mblk, nx_pad)) * mask
        s = t[:, None, :] + u01 * Tt[:, None, :]  # (tile_b, mblk, 1)
        st = s - t[:, None, :]
        xs = x[:, None, :] + jnp.sqrt(st) * alpha_sqrt * dW
        R = tile_b * mblk
        f = f_of(captured, s.reshape(R, 1), xs.reshape(R, nx_pad)[:, :nx])
        diff = Tt[:, None, :] * (f.reshape(tile_b, mblk, 1) - f0[:, None, :])
        inv_y = 1.0 / (jnp.sqrt(jnp.maximum(st, st_floor)) * alpha_sqrt)
        acc_ref[:, 0:1] += jnp.sum(diff, axis=1)
        acc_ref[:, 1:] += jnp.sum(diff * inv_y * dW, axis=1)
        return ()

    jax.lax.fori_loop(0, m // mblk, body, ())
    out = acc_ref[:] / m
    out_ref[:, 0:1] = out[:, 0:1] + f0 * Tt
    out_ref[:, 1:] = out[:, 1:]


def integral_with_gradients_pallas(seed: int, eq, sol, tx: jnp.ndarray,
                                   m: int, tile_b: int = 128, mblk: int = 8,
                                   antithetic: bool = False,
                                   f0: jnp.ndarray | None = None,
                                   u01: jnp.ndarray | None = None,
                                   noise: jnp.ndarray | None = None,
                                   interpret: bool | None = None,
                                   mxu_precision: str | None = None,
                                   vmem_limit_bytes: int | None = None):
    """Pallas drop-in for estimate_integral_with_gradients (the standard
    gradient-term path: no Hessian/SDGD, no TD horizon — those fall back
    to the XLA scan).

    The frozen solution's forward + gradient (get_f) is traced INTO the
    kernel body, so the net matmuls run on the MXU from VMEM-resident
    weights with no HBM intermediates between samples.

    ``u01``/``noise`` (B, m[, /2 when antithetic], 1/nx) switch to external
    randomness — the CPU-exactness path (TPU interpreter stubs the PRNG).
    """
    from deeppicarditeration_tpu.ops.derivatives import get_f

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    t, x = tx[:, :1], tx[:, 1:]
    b, nx = x.shape
    nx_pad = _round_up(nx, LANE)
    from deeppicarditeration_tpu.ops.estimators import largest_divisor

    tile = largest_divisor(b, tile_b)
    mblk = largest_divisor(m, mblk, 2 if antithetic else 1)
    x_pad = jnp.pad(x, ((0, 0), (0, nx_pad - nx)))
    if f0 is None:
        f0 = get_f(eq, sol, t, x)

    # Array-valued equation params (HJB GMM) and frozen-net weights must be
    # kernel INPUTS, not closure constants; statics (module, nx, flags)
    # ride through the treedef / the Solution constructor fields.
    cap_arrs, cap_shapes, cap_treedef = _flatten_captured((eq, sol.params))
    sol_statics = _sol_statics(sol, mxu_precision)

    def f_of(captured, s2, xs2):
        eq_in, params_in = captured
        from deeppicarditeration_tpu.models.solution import Solution

        sol_in = Solution(params=params_in,
                          **_rebind_statics(sol_statics, eq_in))
        if mxu_precision is not None and mxu_precision != "bf16x3":
            with jax.default_matmul_precision(mxu_precision):
                return get_f(eq_in, sol_in, s2, xs2)
        return get_f(eq_in, sol_in, s2, xs2)

    external = noise is not None
    from deeppicarditeration_tpu.ops.estimators import _ST_FLOOR

    kernel = functools.partial(
        _integral_kernel, f_of=f_of, n_captured=len(cap_arrs),
        captured_shapes=cap_shapes, captured_treedef=cap_treedef,
        alpha_sqrt=float(eq.alpha_sqrt),
        T=float(eq.T), m=m, nx=nx, nx_pad=nx_pad, mblk=mblk,
        antithetic=antithetic, st_floor=_ST_FLOOR,
        external_noise=external)
    seed_arr = jnp.asarray([seed], jnp.int32)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, nx_pad), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ] + _captured_specs(cap_arrs)
    args = [seed_arr, t, x_pad, f0] + cap_arrs
    if external:
        m_draw = m // 2 if antithetic else m
        assert noise.shape == (b, m_draw, nx)
        assert u01 is not None and u01.shape == (b, m_draw, 1)
        noise_pad = jnp.pad(noise, ((0, 0), (0, 0), (0, nx_pad - nx)))
        in_specs.append(pl.BlockSpec((tile, m_draw, 1), lambda i: (i, 0, 0),
                                     memory_space=pltpu.VMEM))
        in_specs.append(pl.BlockSpec((tile, m_draw, nx_pad),
                                     lambda i: (i, 0, 0),
                                     memory_space=pltpu.VMEM))
        args += [u01, noise_pad]
    extra = {}
    if vmem_limit_bytes is not None:
        extra["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=int(vmem_limit_bytes))
    out = pl.pallas_call(
        kernel,
        grid=(b // tile,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile, 1 + nx_pad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 1 + nx_pad), x.dtype),
        scratch_shapes=[pltpu.VMEM((tile, 1 + nx_pad), jnp.float32)],
        interpret=interpret,
        **extra,
    )(*args)
    return out[:, :1 + nx]


def _generate_kernel(seed_ref, t_ref, x_ref, g0_ref, f0_ref, *rest,
                     g_fn: Callable, f_of: Callable, n_captured: int,
                     captured_shapes, captured_treedef, alpha_sqrt: float,
                     T: float, m: int, nx: int, nx_pad: int, mblk: int,
                     antithetic: bool, st_floor: float,
                     external_noise: bool, split_chains: bool = False):
    """Merged terminal + integral CV estimator: ONE kernel per tile.

    Rationale (measured, v5e, B=4096 M=4096 nx=100): the standalone
    Pallas terminal (93 ms) and integral (282 ms) kernels each beat their
    XLA counterparts (111/347 ms), but run back-to-back they lose XLA's
    cross-estimator instruction overlap (two kernels 368 ms vs one XLA
    graph 359 ms). Doing both estimators' work in the SAME inner block
    lets the Mosaic scheduler interleave the terminal chain (VPU: PRNG,
    g evals) with the integral chain (MXU: frozen-net forward + vjp).
    Requires n_estimate_terminal == n_estimate_integral (the shipped
    configs' case); the dispatcher falls back to split paths otherwise.

    ``split_chains=True`` runs the terminal chain to its accumulator
    update BEFORE drawing the integral noise, so the terminal dW block
    is dead during the (liveness-peak) frozen-net forward+vjp — lower
    peak VMEM in exchange for less cross-chain interleaving. Measured
    (v5e, B=4096 M=4096 nx=100, bf16x3): it admits mblk=16 at tile 128
    (merged overflows there) but is perf-neutral — 270.5 ms vs the
    268.6 ms merged default; tiles 256/512 still overflow. The kernel
    is work-bound, not loop-overhead-bound, at mblk=8; default stays
    merged.
    """
    captured = _unflatten_captured(rest[:n_captured], captured_shapes,
                                   captured_treedef)
    rest = rest[n_captured:]
    if external_noise:
        u01_ref, noise_t_ref, noise_i_ref, out_ref, acc_ref = rest
    else:
        out_ref, acc_ref = rest
    i = pl.program_id(0)
    if not external_noise:
        pltpu.prng_seed(seed_ref[0] + i)
    t = t_ref[:]
    x = x_ref[:]
    g0 = g0_ref[:]
    f0 = f0_ref[:]
    # floored like estimators._ST_FLOOR: t can hit T exactly in f32 and
    # 1/sqrt(0) would NaN the whole accumulator tile
    Tt = jnp.maximum(T - t, 1e-6)
    sqrt_Tt = jnp.sqrt(Tt)
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    mask = (col < nx).astype(x.dtype)[:, None, :]
    inv_yT = 1.0 / (sqrt_Tt * alpha_sqrt)
    tile_b = x.shape[0]
    half = mblk // 2

    acc_ref[:] = jnp.zeros_like(acc_ref)

    def draw_terminal(k):
        if external_noise:
            if antithetic:
                ht = noise_t_ref[:, pl.ds(k * half, half), :]
                return jnp.concatenate([ht, -ht], axis=1) * mask
            return noise_t_ref[:, pl.ds(k * mblk, mblk), :] * mask
        if antithetic:
            ht = _normals((tile_b, half, nx_pad))
            return jnp.concatenate([ht, -ht], axis=1) * mask
        return _normals((tile_b, mblk, nx_pad)) * mask

    def draw_integral(k):
        if external_noise:
            if antithetic:
                hi = noise_i_ref[:, pl.ds(k * half, half), :]
                dWi = jnp.concatenate([hi, -hi], axis=1) * mask
                uh = u01_ref[:, pl.ds(k * half, half), :]
                u01 = jnp.concatenate([uh, uh], axis=1)
            else:
                dWi = noise_i_ref[:, pl.ds(k * mblk, mblk), :] * mask
                u01 = u01_ref[:, pl.ds(k * mblk, mblk), :]
            return u01, dWi
        u_row = _uniform((tile_b, LANE))
        if antithetic:
            hi = _normals((tile_b, half, nx_pad))
            dWi = jnp.concatenate([hi, -hi], axis=1) * mask
            uh = u_row[:, :half].reshape(tile_b, half, 1)
            u01 = jnp.concatenate([uh, uh], axis=1)
        else:
            dWi = _normals((tile_b, mblk, nx_pad)) * mask
            u01 = u_row[:, :mblk].reshape(tile_b, mblk, 1)
        return u01, dWi

    def terminal_parts(dWt):
        # terminal chain (VPU)
        xT = x[:, None, :] + sqrt_Tt[:, None, :] * alpha_sqrt * dWt
        gT = g_fn(captured, xT)
        return gT - g0[:, None, :]

    def integral_parts(u01, dWi):
        # integral chain (MXU: net fwd + vjp inside f_of)
        s = t[:, None, :] + u01 * Tt[:, None, :]
        st = s - t[:, None, :]
        xs = x[:, None, :] + jnp.sqrt(st) * alpha_sqrt * dWi
        R = tile_b * mblk
        f = f_of(captured, s.reshape(R, 1), xs.reshape(R, nx_pad)[:, :nx])
        diff_i = Tt[:, None, :] * (f.reshape(tile_b, mblk, 1)
                                   - f0[:, None, :])
        inv_ys = 1.0 / (jnp.sqrt(jnp.maximum(st, st_floor)) * alpha_sqrt)
        return diff_i, inv_ys

    def body(k, _):
        if split_chains:
            # terminal first, through its own accumulator stores: dWt is
            # dead before the integral chain's f_of liveness peak, so the
            # allocator can reuse its buffer for dWi/xs.
            dWt = draw_terminal(k)
            diff_t = terminal_parts(dWt)
            acc_ref[:, 0:1] += jnp.sum(diff_t, axis=1)
            acc_ref[:, 1:] += jnp.sum(diff_t * dWt, axis=1) * inv_yT
            u01, dWi = draw_integral(k)
            diff_i, inv_ys = integral_parts(u01, dWi)
            acc_ref[:, 0:1] += jnp.sum(diff_i, axis=1)
            acc_ref[:, 1:] += jnp.sum(diff_i * inv_ys * dWi, axis=1)
            return ()
        dWt = draw_terminal(k)
        u01, dWi = draw_integral(k)
        diff_t = terminal_parts(dWt)
        diff_i, inv_ys = integral_parts(u01, dWi)
        acc_ref[:, 0:1] += jnp.sum(diff_t + diff_i, axis=1)
        acc_ref[:, 1:] += (jnp.sum(diff_t * dWt, axis=1) * inv_yT
                           + jnp.sum(diff_i * inv_ys * dWi, axis=1))
        return ()

    jax.lax.fori_loop(0, m // mblk, body, ())
    out = acc_ref[:] / m
    out_ref[:, 0:1] = out[:, 0:1] + g0 + f0 * Tt
    out_ref[:, 1:] = out[:, 1:]


def generate_with_gradients_pallas(seed: int, eq, sol, tx: jnp.ndarray,
                                   m: int, tile_b: int = 128, mblk: int = 8,
                                   antithetic: bool = False,
                                   u01: jnp.ndarray | None = None,
                                   noise_t: jnp.ndarray | None = None,
                                   noise_i: jnp.ndarray | None = None,
                                   interpret: bool | None = None,
                                   mxu_precision: str | None = None,
                                   split_chains: bool = False,
                                   act_dtype=None,
                                   vmem_limit_bytes: int | None = None):
    """Merged-drop-in for generate_with_gradients (terminal + integral in
    one fused VMEM kernel; see _generate_kernel). ``m`` is the shared
    per-point sample count for both estimators. ``split_chains`` lowers
    peak VMEM liveness (see _generate_kernel) to admit larger tiles/mblk.

    ``mxu_precision`` pins the matmul precision of the in-kernel
    frozen-net dots regardless of the caller's trace-time default
    ("high" = 3-pass bf16, max |Δ| ~2e-5 vs full f32 on the 100-d
    Burgers targets — accuracy-equivalent; see PRECISION.md).
    ``act_dtype`` (jnp.bfloat16) halves the frozen net's in-kernel
    activation/residual storage (see _sol_statics)."""
    from deeppicarditeration_tpu.ops.derivatives import get_f
    from deeppicarditeration_tpu.ops.estimators import _ST_FLOOR

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    t, x = tx[:, :1], tx[:, 1:]
    b, nx = x.shape
    nx_pad = _round_up(nx, LANE)
    from deeppicarditeration_tpu.ops.estimators import largest_divisor

    tile = largest_divisor(b, tile_b)
    mblk = largest_divisor(m, mblk, 2 if antithetic else 1)
    x_pad = jnp.pad(x, ((0, 0), (0, nx_pad - nx)))
    g0 = eq.g(x)
    f0 = get_f(eq, sol, t, x)
    cap_arrs, cap_shapes, cap_treedef = _flatten_captured((eq, sol.params))
    sol_statics = _sol_statics(sol, mxu_precision, act_dtype)

    def g_fn(captured, x_padded):
        eq_in, _ = captured
        return eq_in.g(x_padded[..., :nx])

    def f_of(captured, s2, xs2):
        eq_in, params_in = captured
        from deeppicarditeration_tpu.models.solution import Solution

        sol_in = Solution(params=params_in,
                          **_rebind_statics(sol_statics, eq_in))
        if mxu_precision is not None and mxu_precision != "bf16x3":
            with jax.default_matmul_precision(mxu_precision):
                return get_f(eq_in, sol_in, s2, xs2)
        return get_f(eq_in, sol_in, s2, xs2)

    external = noise_t is not None
    kernel = functools.partial(
        _generate_kernel, g_fn=g_fn, f_of=f_of, n_captured=len(cap_arrs),
        captured_shapes=cap_shapes, captured_treedef=cap_treedef,
        alpha_sqrt=float(eq.alpha_sqrt), T=float(eq.T), m=m, nx=nx,
        nx_pad=nx_pad, mblk=mblk, antithetic=antithetic,
        st_floor=_ST_FLOOR, external_noise=external,
        split_chains=split_chains)
    seed_arr = jnp.asarray([seed], jnp.int32)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, nx_pad), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ] + _captured_specs(cap_arrs)
    args = [seed_arr, t, x_pad, g0, f0] + cap_arrs
    if external:
        m_draw = m // 2 if antithetic else m
        assert noise_t.shape == (b, m_draw, nx)
        assert noise_i is not None and noise_i.shape == (b, m_draw, nx)
        assert u01 is not None and u01.shape == (b, m_draw, 1)
        pad3 = ((0, 0), (0, 0), (0, nx_pad - nx))
        in_specs += [
            pl.BlockSpec((tile, m_draw, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, m_draw, nx_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, m_draw, nx_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        args += [u01, jnp.pad(noise_t, pad3), jnp.pad(noise_i, pad3)]
    extra = {}
    if vmem_limit_bytes is not None:
        # Mosaic's DEFAULT scoped-vmem limit is 16 MB — well below the
        # physical VMEM of a v5e core. Raising it admits larger batch
        # tiles for wide nets (probe_hjb_act_bf16.py).
        extra["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=int(vmem_limit_bytes))
    out = pl.pallas_call(
        kernel,
        grid=(b // tile,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile, 1 + nx_pad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 1 + nx_pad), x.dtype),
        scratch_shapes=[pltpu.VMEM((tile, 1 + nx_pad), jnp.float32)],
        interpret=interpret,
        **extra,
    )(*args)
    return out[:, :1 + nx]


def _shard_map_seeded_kernel(call, seed, repl_tree, tx, ext: dict, *,
                             mesh, axis: str, tile_b: int):
    """shard_map a seeded single-device estimator kernel over ``axis``.

    A pallas_call has no SPMD partitioning rule, so under a multi-device
    pjit it would compute the full batch replicated. This wrapper shards
    the collocation-point axis: each device runs the single-device kernel
    on its (B / ndev)-row slice. Per-device PRNG decorrelation reproduces
    the single-device tile->seed assignment exactly — the kernels seed
    tile i with ``seed + i`` (pl.program_id), so device d offsets by
    ``d * local_tiles``: global tile d * local_tiles + i sees the same
    seed it would in a single-device run at the same tile size, making
    sharded == single-device bitwise when (B / ndev) admits that tile.

    ``call(seed_local, repl_tree, tx_local, tile, **ext_local)`` invokes
    the kernel. ``repl_tree`` (equation / frozen solution — array leaves
    must be operands, not closure constants) is replicated; ``ext``
    (external-noise arrays, the CPU/interpreter exactness path) is data
    and shards alongside tx with no seed bookkeeping.
    """
    from jax.sharding import PartitionSpec

    from deeppicarditeration_tpu.ops.estimators import largest_divisor

    ndev = int(mesh.shape[axis])
    b = tx.shape[0]
    if b % ndev:
        raise ValueError(
            f"batch {b} not divisible by mesh axis {axis!r} size {ndev}")
    b_local = b // ndev
    tile = largest_divisor(b_local, tile_b)
    local_tiles = b_local // tile
    seed = jnp.asarray(seed, jnp.int32)

    data = PartitionSpec(axis)
    repl = PartitionSpec()
    ext = {k: v for k, v in ext.items() if v is not None}
    ext_keys = sorted(ext)
    args = [seed, repl_tree, tx] + [ext[k] for k in ext_keys]
    in_specs = [repl, repl, data] + [data] * len(ext_keys)

    def local_fn(seed_in, repl_in, tx_l, *ext_vals):
        d = jax.lax.axis_index(axis)
        return call(seed_in + d * local_tiles, repl_in, tx_l, tile,
                    **dict(zip(ext_keys, ext_vals)))

    # check_vma off: pallas_call's out_shape carries no varying-mesh-axes
    # annotation, which the checker (jax >= 0.9) rejects outright.
    fn = jax.shard_map(local_fn, mesh=mesh, in_specs=tuple(in_specs),
                       out_specs=data, check_vma=False)
    return fn(*args)


def generate_with_gradients_pallas_sharded(seed, eq, sol, tx: jnp.ndarray,
                                           m: int, *, mesh, axis: str = "data",
                                           tile_b: int = 128, mblk: int = 8,
                                           antithetic: bool = False,
                                           u01: jnp.ndarray | None = None,
                                           noise_t: jnp.ndarray | None = None,
                                           noise_i: jnp.ndarray | None = None,
                                           interpret: bool | None = None,
                                           mxu_precision: str | None = None,
                                           split_chains: bool = False,
                                           act_dtype=None,
                                           vmem_limit_bytes: int | None = None):
    """Multi-device merged estimator (see _shard_map_seeded_kernel)."""

    def call(seed_l, eq_sol, tx_l, tile, **ext_l):
        eq_in, sol_in = eq_sol
        return generate_with_gradients_pallas(
            seed_l, eq_in, sol_in, tx_l, m, tile_b=tile, mblk=mblk,
            antithetic=antithetic, interpret=interpret,
            mxu_precision=mxu_precision, split_chains=split_chains,
            act_dtype=act_dtype, vmem_limit_bytes=vmem_limit_bytes, **ext_l)

    return _shard_map_seeded_kernel(
        call, seed, (eq, sol), tx,
        dict(u01=u01, noise_t=noise_t, noise_i=noise_i),
        mesh=mesh, axis=axis, tile_b=tile_b)


def terminal_with_gradients_pallas_sharded(seed, eq, tx: jnp.ndarray, m: int,
                                           *, mesh, axis: str = "data",
                                           tile_b: int = 256, mblk: int = 8,
                                           antithetic: bool = False,
                                           noise: jnp.ndarray | None = None,
                                           interpret: bool | None = None):
    """Multi-device standalone terminal estimator kernel."""

    def call(seed_l, eq_in, tx_l, tile, **ext_l):
        return terminal_with_gradients_pallas(
            seed_l, eq_in, tx_l, m, tile_b=tile, mblk=mblk,
            antithetic=antithetic, interpret=interpret, **ext_l)

    return _shard_map_seeded_kernel(call, seed, eq, tx, dict(noise=noise),
                                    mesh=mesh, axis=axis, tile_b=tile_b)


def integral_with_gradients_pallas_sharded(seed, eq, sol, tx: jnp.ndarray,
                                           m: int, *, mesh,
                                           axis: str = "data",
                                           tile_b: int = 128, mblk: int = 8,
                                           antithetic: bool = False,
                                           u01: jnp.ndarray | None = None,
                                           noise: jnp.ndarray | None = None,
                                           interpret: bool | None = None,
                                           mxu_precision: str | None = None,
                                           vmem_limit_bytes: int | None = None):
    """Multi-device standalone integral estimator kernel (f0 is computed
    per shard inside the kernel wrapper — pointwise, so exact)."""

    def call(seed_l, eq_sol, tx_l, tile, **ext_l):
        eq_in, sol_in = eq_sol
        return integral_with_gradients_pallas(
            seed_l, eq_in, sol_in, tx_l, m, tile_b=tile, mblk=mblk,
            antithetic=antithetic, interpret=interpret,
            vmem_limit_bytes=vmem_limit_bytes,
            mxu_precision=mxu_precision, **ext_l)

    return _shard_map_seeded_kernel(
        call, seed, (eq, sol), tx, dict(u01=u01, noise=noise),
        mesh=mesh, axis=axis, tile_b=tile_b)


def seed_from_key(key, salt: int = 0):
    """Derive an int32 scalar seed from a jax PRNG key (for tpu_normals)."""
    data = jax.random.key_data(key).astype(jnp.uint32)
    mixed = data.reshape(-1)[0] ^ (data.reshape(-1)[-1] * jnp.uint32(2654435761))
    return (mixed ^ jnp.uint32((salt * 0x9E3779B9) & 0xFFFFFFFF)).astype(
        jnp.int32)


def _terminal_kernel(seed_ref, t_ref, x_ref, g0_ref, *rest, g_fn: Callable,
                     n_captured: int, captured_shapes, captured_treedef,
                     alpha_sqrt: float, T: float, m: int, nx: int,
                     nx_pad: int, mblk: int, antithetic: bool,
                     external_noise: bool):
    """One grid tile of the terminal CV estimator.

    Processes ``mblk`` MC samples per fori_loop step as a
    (tile_b, mblk, nx_pad) VMEM block — at mblk=1 the loop itself
    dominates (measured 254 ms vs 114 ms XLA at M=4096); multi-sample
    blocks amortize it and keep the (8, 128)-tiled VPU busy.
    ``antithetic=True`` draws mblk/2 increments and mirrors them (half
    the PRNG work, lower estimator variance).

    ``external_noise=True`` reads pre-generated standard normals from an
    extra input ref (CPU interpreter path: the TPU interpreter stubs
    prng_random_bits); on TPU the kernel generates them in VMEM."""
    captured = _unflatten_captured(rest[:n_captured], captured_shapes,
                                   captured_treedef)
    rest = rest[n_captured:]
    if external_noise:
        noise_ref, out_ref, acc_ref = rest
    else:
        (out_ref, acc_ref) = rest
    i = pl.program_id(0)
    if not external_noise:
        pltpu.prng_seed(seed_ref[0] + i)
    t = t_ref[:]  # (tile_b, 1)
    x = x_ref[:]  # (tile_b, nx_pad); pad columns are zero
    g0 = g0_ref[:]  # (tile_b, 1)
    sqrt_tt = jnp.sqrt(jnp.maximum(T - t, 1e-6))  # estimators._ST_FLOOR
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    mask = (col < nx).astype(x.dtype)[:, None, :]  # (tile_b, 1, nx_pad)
    inv_y = 1.0 / (sqrt_tt * alpha_sqrt)
    tile_b = x.shape[0]
    half = mblk // 2

    acc_ref[:] = jnp.zeros_like(acc_ref)

    def body(k, _):
        if external_noise:
            if antithetic:
                h = noise_ref[:, pl.ds(k * half, half), :]
                dW = jnp.concatenate([h, -h], axis=1) * mask
            else:
                dW = noise_ref[:, pl.ds(k * mblk, mblk), :] * mask
        else:
            if antithetic:
                h = _normals((tile_b, half, nx_pad))
                dW = jnp.concatenate([h, -h], axis=1) * mask
            else:
                dW = _normals((tile_b, mblk, nx_pad)) * mask
        xT = x[:, None, :] + sqrt_tt[:, None, :] * alpha_sqrt * dW
        gT = g_fn(captured, xT)  # (tile_b, mblk, 1); pad cols zero
        diff = gT - g0[:, None, :]
        acc_ref[:, 0:1] += jnp.sum(diff, axis=1)
        acc_ref[:, 1:] += jnp.sum(diff * dW, axis=1) * inv_y
        return ()

    jax.lax.fori_loop(0, m // mblk, body, ())
    out = acc_ref[:] / m
    # two sliced stores (Mosaic has no scatter-add on values)
    out_ref[:, 0:1] = out[:, 0:1] + g0
    out_ref[:, 1:] = out[:, 1:]


def terminal_with_gradients_pallas(seed: int, eq, tx: jnp.ndarray, m: int,
                                   tile_b: int = 256, mblk: int = 8,
                                   antithetic: bool = False,
                                   noise: jnp.ndarray | None = None,
                                   interpret: bool | None = None):
    """Pallas drop-in for estimate_terminal_with_gradients.

    tx: (B, 1+nx) -> (B, 1+nx) terminal CV estimate. ``eq`` must expose
    static alpha_sqrt/T and a closed-form jnp ``g`` (all DPI equations do;
    the g's array params are traced into the kernel as constants).
    ``mblk`` = MC samples per inner VMEM block (multiple of 8 keeps the
    (sublane, lane) tiling aligned); ``antithetic`` mirrors half-blocks.

    ``noise`` standard normals switch the kernel to external increments —
    the CPU-testable path (the TPU interpreter stubs the in-kernel PRNG to
    zeros): (B, m, nx) normally, (B, m/2, nx) when antithetic. On TPU
    leave None for in-VMEM generation.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    t, x = tx[:, :1], tx[:, 1:]
    b, nx = x.shape
    nx_pad = _round_up(nx, LANE)
    from deeppicarditeration_tpu.ops.estimators import largest_divisor

    tile = largest_divisor(b, tile_b)
    mblk = largest_divisor(m, mblk, 2 if antithetic else 1)
    x_pad = jnp.pad(x, ((0, 0), (0, nx_pad - nx)))
    g0 = eq.g(x)
    cap_arrs, cap_shapes, cap_treedef = _flatten_captured(eq)

    def g_fn(eq_in, x_padded):
        return eq_in.g(x_padded[..., :nx])

    external = noise is not None
    kernel = functools.partial(
        _terminal_kernel, g_fn=g_fn, n_captured=len(cap_arrs),
        captured_shapes=cap_shapes, captured_treedef=cap_treedef,
        alpha_sqrt=float(eq.alpha_sqrt),
        T=float(eq.T), m=m, nx=nx, nx_pad=nx_pad, mblk=mblk,
        antithetic=antithetic, external_noise=external)
    seed_arr = jnp.asarray([seed], jnp.int32)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, nx_pad), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ] + _captured_specs(cap_arrs)
    args = [seed_arr, t, x_pad, g0] + cap_arrs
    if external:
        m_draw = m // 2 if antithetic else m
        assert noise.shape == (b, m_draw, nx)
        noise_pad = jnp.pad(noise, ((0, 0), (0, 0), (0, nx_pad - nx)))
        in_specs.append(pl.BlockSpec((tile, m_draw, nx_pad),
                                     lambda i: (i, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(noise_pad)
    out = pl.pallas_call(
        kernel,
        grid=(b // tile,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile, 1 + nx_pad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 1 + nx_pad), x.dtype),
        scratch_shapes=[pltpu.VMEM((tile, 1 + nx_pad), jnp.float32)],
        interpret=interpret,
    )(*args)
    return out[:, :1 + nx]
