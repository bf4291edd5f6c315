"""Pallas fused terminal-estimator kernel: correctness tests.

On CPU the kernel runs under the interpreter with externally supplied
increments (the TPU interpreter stubs the in-kernel PRNG), so the math can
be checked EXACTLY against a plain jnp reference computation. The in-kernel
PRNG path is validated statistically on real TPU hardware
(@pytest.mark.tpu; skipped on CPU).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deeppicarditeration_tpu.equations import make_equation
from deeppicarditeration_tpu.models.networks import MLP
from deeppicarditeration_tpu.models.solution import Solution
from deeppicarditeration_tpu.ops.derivatives import get_f
from deeppicarditeration_tpu.ops.estimators import _ST_FLOOR
from deeppicarditeration_tpu.ops.pallas_kernels import (
    _uniform_from_bits,
    integral_with_gradients_pallas,
    terminal_with_gradients_pallas,
)
from tests.test_estimators import QuadraticToy

ON_TPU = jax.default_backend() == "tpu"


def _reference_terminal(eq, tx, noise):
    """Plain jnp version of the terminal CV estimator with given noise."""
    t, x = tx[:, :1], tx[:, 1:]
    b, nx = x.shape
    m = noise.shape[1]
    g0 = eq.g(x)
    sqrt_tt = jnp.sqrt(eq.T - t)
    XT = x[:, None, :] + sqrt_tt[:, None, :] * eq.alpha_sqrt * noise
    diff = eq.g(XT) - g0[:, None, :]
    val = jnp.mean(diff, axis=1) + g0
    Y = noise / sqrt_tt[:, None, :] / eq.alpha_sqrt
    grad = jnp.mean(diff * Y, axis=1)
    return jnp.concatenate([val, grad], axis=-1)


def test_uniform_from_bits_range():
    bits = jnp.asarray([0, 1, 2 ** 32 - 1, 123456789], jnp.uint32)
    u = _uniform_from_bits(bits)
    assert float(u.min()) > 0.0
    assert float(u.max()) <= 1.0


@pytest.mark.parametrize("mblk", [1, 8, 64])
@pytest.mark.parametrize("eq_factory", [
    lambda: QuadraticToy(nx=3),
    lambda: make_equation("Cha", nx=5, alpha=1.3, k=1.0, T=1.0),
    # OU carries array leaves (the GMM): exercises the captured-input path
    lambda: make_equation("OUProcessEquation", seed=0, nx=4, alpha=1.0,
                          T=1.0),
])
def test_pallas_terminal_exact_vs_reference(eq_factory, mblk, key):
    """Same noise through the kernel and the jnp reference: must agree to
    float tolerance for every inner block size (validates the masked lane
    padding and the multi-sample block reduction)."""
    eq = eq_factory()
    nx, b, m = eq.nx, 16, 64
    kt, kx, kn = jax.random.split(key, 3)
    t = jax.random.uniform(kt, (b, 1)) * 0.8
    x = jax.random.normal(kx, (b, nx))
    tx = jnp.concatenate([t, x], axis=-1)
    noise = jax.random.normal(kn, (b, m, nx))
    out = terminal_with_gradients_pallas(0, eq, tx, m, tile_b=8, mblk=mblk,
                                         noise=noise)
    ref = _reference_terminal(eq, tx, noise)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5,
                               atol=2e-5)


def test_pallas_terminal_antithetic_vs_reference(key):
    """Antithetic half-block mirroring == reference on [h, -h] noise."""
    eq = make_equation("Cha", nx=5, alpha=1.3, k=1.0, T=1.0)
    nx, b, m = eq.nx, 16, 64
    kt, kx, kn = jax.random.split(key, 3)
    t = jax.random.uniform(kt, (b, 1)) * 0.8
    x = jax.random.normal(kx, (b, nx))
    tx = jnp.concatenate([t, x], axis=-1)
    half = jax.random.normal(kn, (b, m // 2, nx))
    out = terminal_with_gradients_pallas(0, eq, tx, m, tile_b=8, mblk=8,
                                         antithetic=True, noise=half)
    # kernel mirrors per inner block: [h0, -h0, h1, -h1, ...]
    blocks = half.reshape(b, m // 8, 4, nx)
    mirrored = jnp.concatenate([blocks, -blocks], axis=2).reshape(b, m, nx)
    ref = _reference_terminal(eq, tx, mirrored)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5,
                               atol=2e-5)


def _reference_integral(eq, sol, tx, u01, noise):
    """Plain jnp integral CV estimator with given (u01, noise)."""
    t, x = tx[:, :1], tx[:, 1:]
    Tt = eq.T - t
    s = t[:, None, :] + u01 * Tt[:, None, :]
    st = s - t[:, None, :]
    Xs = x[:, None, :] + jnp.sqrt(st) * eq.alpha_sqrt * noise
    f = get_f(eq, sol, s, Xs)
    f0 = get_f(eq, sol, t, x)
    diff = Tt[:, None, :] * (f - f0[:, None, :])
    val = jnp.mean(diff, axis=1) + f0 * Tt
    inv_y = 1.0 / (jnp.sqrt(jnp.maximum(st, _ST_FLOOR)) * eq.alpha_sqrt)
    grad = jnp.mean(diff * inv_y * noise, axis=1)
    return jnp.concatenate([val, grad], axis=-1)


def _frozen_mlp_solution(key, nx, net_type="Value"):
    out_dim = {"Value": 1, "ValueGradient": 1 + nx}[net_type]
    module = MLP(neurons=(16, 16), activations=("ELU", "ELU"),
                 out_dim=out_dim)
    params = module.init(key, jnp.zeros((1, 1 + nx)))
    return Solution.from_net(module, params, net_type, nx)


@pytest.mark.parametrize("mblk", [1, 8])
@pytest.mark.parametrize("net_type", ["Value", "ValueGradient"])
@pytest.mark.parametrize("eq_name", ["Cha", "OUProcessEquation"])
def test_pallas_integral_exact_vs_reference(eq_name, net_type, mblk, key):
    """Same (u01, noise) through the fused kernel (frozen-net vjp traced
    in-kernel) and the plain jnp estimator: exact to float tolerance."""
    if eq_name == "Cha":
        eq = make_equation("Cha", nx=5, alpha=1.3, k=1.0, T=1.0)
    else:
        eq = make_equation("OUProcessEquation", seed=0, nx=5, alpha=1.0,
                           T=1.0)
    nx, b, m = eq.nx, 16, 32
    kt, kx, kn, ku, kp = jax.random.split(key, 5)
    sol = _frozen_mlp_solution(kp, nx, net_type)
    t = jax.random.uniform(kt, (b, 1)) * 0.8
    x = jax.random.normal(kx, (b, nx))
    tx = jnp.concatenate([t, x], axis=-1)
    u01 = jax.random.uniform(ku, (b, m, 1))
    noise = jax.random.normal(kn, (b, m, nx))
    out = integral_with_gradients_pallas(0, eq, sol, tx, m, tile_b=8,
                                         mblk=mblk, u01=u01, noise=noise)
    ref = _reference_integral(eq, sol, tx, u01, noise)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=3e-5,
                               atol=3e-5)


def test_pallas_integral_antithetic_vs_reference(key):
    eq = make_equation("Cha", nx=5, alpha=1.3, k=1.0, T=1.0)
    nx, b, m, mblk = eq.nx, 8, 32, 8
    kt, kx, kn, ku, kp = jax.random.split(key, 5)
    sol = _frozen_mlp_solution(kp, nx)
    t = jax.random.uniform(kt, (b, 1)) * 0.8
    x = jax.random.normal(kx, (b, nx))
    tx = jnp.concatenate([t, x], axis=-1)
    u01_h = jax.random.uniform(ku, (b, m // 2, 1))
    half = jax.random.normal(kn, (b, m // 2, nx))
    out = integral_with_gradients_pallas(0, eq, sol, tx, m, tile_b=8,
                                         mblk=mblk, antithetic=True,
                                         u01=u01_h, noise=half)
    # kernel expands per inner block: s shared, dW mirrored
    hb = half.reshape(b, m // mblk, mblk // 2, nx)
    noise_full = jnp.concatenate([hb, -hb], axis=2).reshape(b, m, nx)
    ub = u01_h.reshape(b, m // mblk, mblk // 2, 1)
    u01_full = jnp.concatenate([ub, ub], axis=2).reshape(b, m, 1)
    ref = _reference_integral(eq, sol, tx, u01_full, noise_full)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=3e-5,
                               atol=3e-5)


def test_pallas_integral_zero_solution(key):
    """u_0 = 0 frozen iterate (first Picard iteration) goes through the
    kernel's get_f tracing too."""
    eq = make_equation("Cha", nx=5, alpha=1.3, k=1.0, T=1.0)
    nx, b, m = eq.nx, 8, 16
    kt, kx, kn, ku = jax.random.split(key, 4)
    sol = Solution.zero(nx, "Value")
    t = jax.random.uniform(kt, (b, 1)) * 0.8
    x = jax.random.normal(kx, (b, nx))
    tx = jnp.concatenate([t, x], axis=-1)
    u01 = jax.random.uniform(ku, (b, m, 1))
    noise = jax.random.normal(kn, (b, m, nx))
    out = integral_with_gradients_pallas(0, eq, sol, tx, m, tile_b=8,
                                         mblk=8, u01=u01, noise=noise)
    ref = _reference_integral(eq, sol, tx, u01, noise)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=3e-5,
                               atol=3e-5)


@pytest.mark.parametrize("split_chains", [False, True])
@pytest.mark.parametrize("eq_name", ["Cha", "OUProcessEquation"])
def test_pallas_generate_merged_exact_vs_reference(eq_name, split_chains,
                                                   key):
    """Merged terminal+integral kernel == sum of the two jnp references on
    the same external randomness (both chain layouts)."""
    from deeppicarditeration_tpu.ops.pallas_kernels import (
        generate_with_gradients_pallas,
    )

    if eq_name == "Cha":
        eq = make_equation("Cha", nx=5, alpha=1.3, k=1.0, T=1.0)
    else:
        eq = make_equation("OUProcessEquation", seed=0, nx=5, alpha=1.0,
                           T=1.0)
    nx, b, m = eq.nx, 16, 32
    kt, kx, kn1, kn2, ku, kp = jax.random.split(key, 6)
    sol = _frozen_mlp_solution(kp, nx)
    t = jax.random.uniform(kt, (b, 1)) * 0.8
    x = jax.random.normal(kx, (b, nx))
    tx = jnp.concatenate([t, x], axis=-1)
    noise_t = jax.random.normal(kn1, (b, m, nx))
    noise_i = jax.random.normal(kn2, (b, m, nx))
    u01 = jax.random.uniform(ku, (b, m, 1))
    out = generate_with_gradients_pallas(0, eq, sol, tx, m, tile_b=8,
                                         mblk=8, u01=u01, noise_t=noise_t,
                                         noise_i=noise_i,
                                         split_chains=split_chains)
    ref = (_reference_terminal(eq, tx, noise_t)
           + _reference_integral(eq, sol, tx, u01, noise_i))
    # the references each add the value-slot baseline once; the merged
    # kernel also adds both baselines once => identical composition
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=5e-5,
                               atol=5e-5)


@pytest.mark.skipif(not ON_TPU, reason="in-kernel PRNG requires real TPU")
def test_pallas_terminal_inkernel_prng_semigroup(key):
    nx, b, m = 3, 16, 8192
    eq = QuadraticToy(nx=nx)
    kt, kx = jax.random.split(key)
    t = jax.random.uniform(kt, (b, 1)) * 0.8
    x = jax.random.normal(kx, (b, nx))
    tx = jnp.concatenate([t, x], axis=-1)
    out = terminal_with_gradients_pallas(42, eq, tx, m, tile_b=8)
    expected_val = np.asarray(eq.g(x) + (eq.T - t) * eq.alpha * nx)
    expected_grad = np.asarray(eq.g_x(x))
    np.testing.assert_allclose(np.asarray(out[:, :1]), expected_val,
                               rtol=0.1, atol=0.15)
    np.testing.assert_allclose(np.asarray(out[:, 1:]), expected_grad,
                               rtol=0.2, atol=0.3)


# ---------------------------------------------------------------------------
# auto-dispatch (PALLAS_GENERATE: auto)
# ---------------------------------------------------------------------------

def _mlp_solution(nx, neurons, net_type="Value", out_dim=1):
    module = MLP(neurons=neurons, activations=("ELU",) * len(neurons),
                 out_dim=out_dim)
    params = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 1 + nx)))
    return Solution.from_net(module, params, net_type, nx)


def test_generate_vmem_fit_heuristic():
    """The known-good 4x128 MLP fits; the known-overflow 4x512 PISGradNet
    does not (BASELINE.md measured cases)."""
    from deeppicarditeration_tpu.models.networks import PISGradNet
    from deeppicarditeration_tpu.ops.pallas_kernels import (
        generate_fits_vmem,
        generate_vmem_bytes,
    )

    nx = 100
    eq = make_equation("Cha", nx=nx, alpha=1.0, k=5.0, T=1.0)
    small = _mlp_solution(nx, (128, 128, 128, 128))
    assert generate_fits_vmem(eq, small, nx)

    eq_hjb = make_equation("OUProcessEquation", seed=0, nx=nx, alpha=1.0,
                           T=1.0)
    big_mod = PISGradNet(hidden_shapes=(512, 512, 512, 512), dim=nx,
                         g0=eq_hjb.g, T=1.0)
    big_params = big_mod.init(jax.random.PRNGKey(0), jnp.zeros((1, 1 + nx)))
    big = Solution.from_net(big_mod, big_params, "Value", nx)
    assert not generate_fits_vmem(eq, big, nx)
    assert generate_vmem_bytes(eq, big, nx) > generate_vmem_bytes(
        eq, small, nx)


def test_use_pallas_generate_tri_state():
    from deeppicarditeration_tpu.ops import estimators as est

    nx = 5
    eq = make_equation("Cha", nx=nx, alpha=1.0, k=1.0, T=1.0)
    sol = _mlp_solution(nx, (8, 8))
    on_tpu = (jax.default_backend() == "tpu" and len(jax.devices()) == 1)
    mk = lambda mode: est.GenConfig(pallas_generate=mode)
    assert est._pallas_generate_tile(mk(True), eq, sol, 256) == (128, False,
                                                                 None)
    assert est._pallas_generate_tile(mk(False), eq, sol, 256) is None
    # "auto" requires the real single-device TPU backend
    spec = est._pallas_generate_tile(mk("auto"), eq, sol, 256)
    assert (spec == (128, False, None)) is on_tpu
    assert (spec is None) is not on_tpu


def test_pick_generate_tile_by_net_size():
    from deeppicarditeration_tpu.models.networks import PISGradNet
    from deeppicarditeration_tpu.ops.pallas_kernels import pick_generate_tile

    nx = 100
    eq = make_equation("Cha", nx=nx, alpha=1.0, k=5.0, T=1.0)
    small = _mlp_solution(nx, (128, 128, 128, 128))
    # small net: default-limit tile 128, NO raised limit (the shipped
    # Burgers pick is bitwise-stable across the raised-limit feature)
    assert pick_generate_tile(eq, small, nx, 4096) == (128, False, None)

    eq_hjb = make_equation("OUProcessEquation", seed=0, nx=nx, alpha=1.0,
                           T=1.0)
    big_mod = PISGradNet(hidden_shapes=(512, 512, 512, 512), dim=nx,
                         g0=eq_hjb.g, T=1.0)
    big_params = big_mod.init(jax.random.PRNGKey(0), jnp.zeros((1, 1 + nx)))
    big = Solution.from_net(big_mod, big_params, "Value", nx)
    # wide net at 1-pass dots (the shipped HJB precision): upgraded to
    # tile 128 merged at the RAISED scoped-vmem limit (measured 4% over
    # the old 32/split pick; probe_vmem_limit.py); off-TPU the trial
    # lowers in interpret mode, which accepts the first candidate
    from deeppicarditeration_tpu.ops import pallas_kernels as pk
    spec = pick_generate_tile(eq_hjb, big, nx, 4096,
                              mxu_precision="default")
    assert spec == (128, False, pk._VMEM_LIMIT_BYTES)
    # at bf16x3 the x2 operand-duplication-scaled raised budget prunes
    # tile 128 (52.9M x2 > 56M budget — ADVICE r4 item 2, factor
    # re-measured r5) but admits tile 64 (28.4M x2 fits; the measured
    # +1.1% class on the 4x512 MLP probe); off-TPU the trial accepts it
    assert pick_generate_tile(eq_hjb, big, nx, 4096) \
        == (64, False, pk._VMEM_LIMIT_BYTES)
    # the default-limit fallback (what the trial walk-down reaches if
    # Mosaic rejects the raised candidates) is the old measured pick
    assert pk._heuristic_generate_tile(eq_hjb, big, nx, 4096) == (32, True)


def test_pick_generate_tile_trial_compile_fallback(monkeypatch):
    """A net the two-point-calibrated estimate mispredicts must WALK DOWN
    (tile 128 -> 64 -> ... -> XLA) via the Mosaic trial compile instead of
    failing at runtime (VERDICT r1 item 7). Simulated by failing the trial
    for specific tiles; also checks the result is cached per signature."""
    from deeppicarditeration_tpu.ops import pallas_kernels as pk

    nx = 100
    eq = make_equation("Cha", nx=nx, alpha=1.0, k=5.0, T=1.0)
    small = _mlp_solution(nx, (128, 128, 128, 128))

    calls = []

    def fake_trial(eq_, sol_, nx_, tile, split, mblk, antithetic,
                   mxu_precision="bf16x3", act_dtype=None,
                   vmem_limit_bytes=None):
        calls.append((tile, split, mxu_precision))
        return tile <= 32  # "Mosaic rejects" 128 and 64

    monkeypatch.setattr(pk, "_trial_compile_ok", fake_trial)
    # the trial must compile at the precision the DISPATCH will use:
    # precisions differ in scoped-vmem footprint (review finding); a
    # merged-reject tile retries split before walking down (the measured
    # HJB pick is 32/split)
    assert pk.pick_generate_tile(eq, small, nx, 4096,
                                 mxu_precision="default") == (32, False,
                                                              None)
    # split is retried at the preferred tile only; the down-ladder stays
    # merged-only (each candidate is a 1-5 min remote trial compile)
    assert calls == [(128, False, "default"), (128, True, "default"),
                     (64, False, "default"), (32, False, "default")]

    calls.clear()
    monkeypatch.setattr(pk, "_trial_compile_ok",
                        lambda *a, **k: False)
    assert pk.pick_generate_tile(eq, small, nx, 4096) is None  # -> XLA


def test_trial_compile_ok_real_lowering():
    """The trial lowering actually compiles the kernel from abstract avals
    (interpret mode off-TPU) and caches per signature."""
    from deeppicarditeration_tpu.ops import pallas_kernels as pk

    nx = 5
    eq = make_equation("Cha", nx=nx, alpha=1.0, k=1.0, T=1.0)
    sol = _mlp_solution(nx, (8, 8))
    pk._TRIAL_COMPILE_CACHE.clear()
    assert pk._trial_compile_ok(eq, sol, nx, 16, False, 8, False)
    assert len(pk._TRIAL_COMPILE_CACHE) == 1
    # second call hits the cache (same signature)
    assert pk._trial_compile_ok(eq, sol, nx, 16, False, 8, False)
    assert len(pk._TRIAL_COMPILE_CACHE) == 1


def test_tri_state_config_parse():
    from deeppicarditeration_tpu.training.picard import _tri_state

    assert _tri_state("auto") == "auto"
    assert _tri_state("AUTO") == "auto"
    assert _tri_state(True) is True
    assert _tri_state("false") is False
    assert _tri_state("on") is True
    assert _tri_state(0) is False


@pytest.mark.parametrize("eq_name", ["Cha", "OUProcessEquation"])
def test_pallas_generate_merged_act_bf16_close(eq_name, key):
    """Merged kernel with the bf16 activation policy (pallas_act) tracks
    the f32 path at bf16 resolution on the same external randomness."""
    from deeppicarditeration_tpu.ops.pallas_kernels import (
        generate_with_gradients_pallas,
    )

    if eq_name == "Cha":
        eq = make_equation("Cha", nx=5, alpha=1.3, k=1.0, T=1.0)
    else:
        eq = make_equation("OUProcessEquation", seed=0, nx=5, alpha=1.0,
                           T=1.0)
    nx, b, m = eq.nx, 16, 32
    kt, kx, kn1, kn2, ku, kp = jax.random.split(key, 6)
    sol = _frozen_mlp_solution(kp, nx)
    t = jax.random.uniform(kt, (b, 1)) * 0.8
    x = jax.random.normal(kx, (b, nx))
    tx = jnp.concatenate([t, x], axis=-1)
    noise_t = jax.random.normal(kn1, (b, m, nx))
    noise_i = jax.random.normal(kn2, (b, m, nx))
    u01 = jax.random.uniform(ku, (b, m, 1))
    kw = dict(tile_b=8, mblk=8, u01=u01, noise_t=noise_t, noise_i=noise_i)
    f32 = generate_with_gradients_pallas(0, eq, sol, tx, m, **kw)
    bf = generate_with_gradients_pallas(0, eq, sol, tx, m,
                                        act_dtype=jnp.bfloat16, **kw)
    assert bf.dtype == f32.dtype
    scale = float(jnp.max(jnp.abs(f32)))
    np.testing.assert_allclose(np.asarray(bf), np.asarray(f32),
                               rtol=0, atol=0.03 * scale)


def test_forced_generate_notices_total_trial_failure(monkeypatch, capsys):
    """Forced PALLAS_GENERATE whose every tile fails the trial compile
    must say so (like the forced standalone flags), not silently take
    the XLA path the user opted out of."""
    from deeppicarditeration_tpu.ops import estimators as est
    from deeppicarditeration_tpu.ops import pallas_kernels as pk

    nx = 5
    eq = make_equation("Cha", nx=nx, alpha=1.0, k=1.0, T=1.0)
    sol = _mlp_solution(nx, (8, 8))
    monkeypatch.setattr(pk, "_trial_compile_ok", lambda *a, **k: False)
    est._FALLBACK_NOTICED.clear()
    gen = est.GenConfig(pallas_generate=True)
    assert est._pallas_generate_tile(gen, eq, sol, 256) is None
    out = capsys.readouterr().out
    assert "PALLAS_GENERATE" in out and "Mosaic trial compile" in out


def test_pick_generate_tile_act_precision_fail_fast():
    """The act/precision conflict must raise from pick_generate_tile
    itself: raised inside the trial lowering it would be swallowed by
    the trial's except and misread as a Mosaic failure."""
    from deeppicarditeration_tpu.ops import pallas_kernels as pk

    nx = 5
    eq = make_equation("Cha", nx=nx, alpha=1.0, k=1.0, T=1.0)
    sol = _mlp_solution(nx, (8, 8))
    with pytest.raises(ValueError, match="pallas_act"):
        pk.pick_generate_tile(eq, sol, nx, 256, mxu_precision="bf16x3",
                              act_dtype=jnp.bfloat16)


def test_genconfig_act_dtype_parse():
    from deeppicarditeration_tpu.ops.estimators import GenConfig

    assert GenConfig().act_dtype is None
    assert GenConfig(pallas_act="bf16").act_dtype == jnp.bfloat16
    with pytest.raises(ValueError, match="PALLAS_ACT"):
        GenConfig(pallas_act="fp8").act_dtype


def test_pallas_act_precision_conflict_raises():
    """pallas_act bf16 forces 1-pass dots: combining it with bf16x3 or
    highest must fail loudly (config-time AND kernel-time), not silently
    downgrade the configured precision."""
    from deeppicarditeration_tpu.config import default_cfg
    from deeppicarditeration_tpu.ops import pallas_kernels as pk
    from deeppicarditeration_tpu.training.picard import gen_config_from_cfg

    nx = 5
    sol = _mlp_solution(nx, (8, 8))
    for prec in ("bf16x3", "highest"):
        with pytest.raises(ValueError, match="pallas_act"):
            pk._sol_statics(sol, prec, jnp.bfloat16)
    # None = trace-time default (single-pass): allowed
    assert pk._sol_statics(sol, None, jnp.bfloat16)["module"].dtype \
        == jnp.bfloat16
    # no-dtype-knob module (Zero solution): pick normalizes act_dtype
    # away so the VMEM estimate sizes the f32 kernel actually built
    eq = make_equation("Cha", nx=nx, alpha=1.0, k=1.0, T=1.0)
    zero = Solution.zero(nx)
    assert (pk.pick_generate_tile(eq, zero, nx, 256, trial=False,
                                  act_dtype=jnp.bfloat16)
            == pk.pick_generate_tile(eq, zero, nx, 256, trial=False))

    cfg = default_cfg()
    cfg.DATA.TPU.PALLAS_ACT = "bf16"  # precision left at bf16x3 default
    with pytest.raises(ValueError, match="PALLAS_PRECISION"):
        gen_config_from_cfg(cfg, 1)
    cfg.DATA.TPU.PALLAS_PRECISION = "default"
    assert gen_config_from_cfg(cfg, 1).pallas_act == "bf16"
    cfg.DATA.TPU.PALLAS_ACT = "fp8"
    with pytest.raises(ValueError, match="PALLAS_ACT"):
        gen_config_from_cfg(cfg, 1)


def test_vmem_estimate_act_bytes_halves_activations():
    """act_bytes=2 (pallas_act bf16) shrinks only the width-proportional
    activation term, admitting larger tiles for wide nets."""
    from deeppicarditeration_tpu.models.networks import PISGradNet
    from deeppicarditeration_tpu.ops.pallas_kernels import (
        generate_vmem_bytes,
        pick_generate_tile,
    )

    nx = 100
    eq_hjb = make_equation("OUProcessEquation", seed=0, nx=nx, alpha=1.0,
                           T=1.0)
    big_mod = PISGradNet(hidden_shapes=(512, 512, 512, 512), dim=nx,
                         g0=eq_hjb.g, T=1.0)
    big_params = big_mod.init(jax.random.PRNGKey(0), jnp.zeros((1, 1 + nx)))
    big = Solution.from_net(big_mod, big_params, "Value", nx)
    f32_bytes = generate_vmem_bytes(eq_hjb, big, nx, 32)
    bf_bytes = generate_vmem_bytes(eq_hjb, big, nx, 32, act_bytes=2)
    assert bf_bytes < f32_bytes
    spec_f32 = pick_generate_tile(eq_hjb, big, nx, 4096, trial=False)
    spec_bf = pick_generate_tile(eq_hjb, big, nx, 4096, trial=False,
                                 mxu_precision="default",
                                 act_dtype=jnp.bfloat16)
    assert spec_bf[0] * (2 - spec_bf[1]) >= spec_f32[0] * (2 - spec_f32[1])


def test_bf16_acc_dot_matches_f32_at_bf16_resolution():
    """The pallas_act dot (bf16 operands, f32 accumulation, custom vjp):
    fwd and vjp within bf16 resolution of the f32 dot, bf16 outputs."""
    from deeppicarditeration_tpu.ops.pallas_kernels import (
        bf16_acc_dot_general,
    )

    key = jax.random.PRNGKey(5)
    ka, kb, kg = jax.random.split(key, 3)
    a = jax.random.normal(ka, (64, 101)).astype(jnp.bfloat16)
    b = (jax.random.normal(kb, (101, 128)) / 10.0).astype(jnp.bfloat16)
    dn = (((1,), (0,)), ((), ()))

    exact = jax.lax.dot_general(a.astype(jnp.float32),
                                b.astype(jnp.float32), dn,
                                precision=jax.lax.Precision.HIGHEST)
    approx = bf16_acc_dot_general(a, b, dn)
    assert approx.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(approx, np.float32),
                               np.asarray(exact), rtol=0, atol=0.05)

    g = jax.random.normal(kg, exact.shape).astype(jnp.bfloat16)
    _, vjp_e = jax.vjp(lambda u, v: jax.lax.dot_general(
        u.astype(jnp.float32), v.astype(jnp.float32), dn,
        precision=jax.lax.Precision.HIGHEST), a, b)
    _, vjp_a = jax.vjp(lambda u, v: bf16_acc_dot_general(u, v, dn), a, b)
    for e, ap in zip(vjp_e(g.astype(jnp.float32)), vjp_a(g)):
        assert ap.dtype == jnp.bfloat16
        np.testing.assert_allclose(np.asarray(ap, np.float32),
                                   np.asarray(e, np.float32),
                                   rtol=0, atol=0.5)


def test_bf16x3_dot_matches_f32():
    """3-pass-bf16 emulated dot: fwd and vjp within ~2^-16 of full f32."""
    from deeppicarditeration_tpu.ops.pallas_kernels import bf16x3_dot_general

    key = jax.random.PRNGKey(3)
    ka, kb, kg = jax.random.split(key, 3)
    a = jax.random.normal(ka, (64, 101))
    b = jax.random.normal(kb, (101, 128)) / 10.0
    dn = (((1,), (0,)), ((), ()))

    exact = jax.lax.dot_general(a, b, dn,
                                precision=jax.lax.Precision.HIGHEST)
    approx = bf16x3_dot_general(a, b, dn)
    np.testing.assert_allclose(np.asarray(approx), np.asarray(exact),
                               rtol=0, atol=2e-4)

    g = jax.random.normal(kg, exact.shape)
    _, vjp_e = jax.vjp(lambda u, v: jax.lax.dot_general(
        u, v, dn, precision=jax.lax.Precision.HIGHEST), a, b)
    _, vjp_a = jax.vjp(lambda u, v: bf16x3_dot_general(u, v, dn), a, b)
    for e, ap in zip(vjp_e(g), vjp_a(g)):
        np.testing.assert_allclose(np.asarray(ap), np.asarray(e),
                                   rtol=0, atol=5e-3)


def test_mlp_bf16x3_clone_close_and_param_compatible():
    """MLP.clone(dot_general=bf16x3) keeps the param tree and tracks the
    f32 forward/input-gradient to ~1e-4 — the merged kernel swaps the
    module this way when mxu_precision='bf16x3'."""
    from deeppicarditeration_tpu.ops.pallas_kernels import bf16x3_dot_general

    nx = 7
    mod = MLP(neurons=(32, 32), activations=("ELU", "ELU"), out_dim=1)
    params = mod.init(jax.random.PRNGKey(0), jnp.zeros((1, 1 + nx)))
    mod3 = mod.clone(dot_general=bf16x3_dot_general)
    assert jax.tree_util.tree_structure(
        mod3.init(jax.random.PRNGKey(0), jnp.zeros((1, 1 + nx)))
    ) == jax.tree_util.tree_structure(params)

    tx = jax.random.normal(jax.random.PRNGKey(1), (16, 1 + nx))
    with jax.default_matmul_precision("highest"):
        y = mod.apply(params, tx)
        gy = jax.grad(lambda t: mod.apply(params, t).sum())(tx)
    y3 = mod3.apply(params, tx)
    gy3 = jax.grad(lambda t: mod3.apply(params, t).sum())(tx)
    np.testing.assert_allclose(np.asarray(y3), np.asarray(y), atol=1e-4)
    np.testing.assert_allclose(np.asarray(gy3), np.asarray(gy), atol=1e-3)
