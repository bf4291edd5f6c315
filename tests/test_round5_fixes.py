"""Round-5 hardening (ADVICE r4): null-spelling normalization for the
optional TPU string flags, the PALLAS_ACT no-dtype-knob notice, and the
pass-count-scaled raised-limit candidate pruning."""

import jax
import jax.numpy as jnp
import pytest

from deeppicarditeration_tpu.config import default_cfg
from deeppicarditeration_tpu.equations import make_equation
from deeppicarditeration_tpu.models.solution import Solution
from deeppicarditeration_tpu.ops import estimators as est
from deeppicarditeration_tpu.ops import pallas_kernels as pk
from deeppicarditeration_tpu.training.picard import (
    _opt_str,
    gen_config_from_cfg,
)


def test_opt_str_null_spellings():
    for v in (None, False, "", 0, "none", "None", "NULL", "off", "false",
              "0"):
        assert _opt_str(v) is None, repr(v)
    assert _opt_str("bf16") == "bf16"
    assert _opt_str("BF16") == "bf16"


def test_pallas_act_none_string_disables():
    """YAML 'PALLAS_ACT: "none"' (the reference-compat "None"-string
    spelling) must disable the knob, not raise (ADVICE r4 item 4) —
    likewise HESSIAN_STORE."""
    cfg = default_cfg()
    cfg.DATA.TPU.PALLAS_ACT = "none"
    cfg.DATA.TPU.HESSIAN_STORE = "Null"
    gen = gen_config_from_cfg(cfg, 1)
    assert gen.pallas_act is None
    assert gen.hess_store is None
    # real typos still fail loudly
    cfg.DATA.TPU.HESSIAN_STORE = "bf17"
    with pytest.raises(ValueError, match="HESSIAN_STORE"):
        gen_config_from_cfg(cfg, 1)


def test_pallas_act_no_dtype_knob_notice(capsys, monkeypatch):
    """An explicitly configured PALLAS_ACT on a module without the dtype
    knob must say it is storing f32 activations, once (ADVICE r4
    item 1)."""
    monkeypatch.setattr(est, "_FALLBACK_NOTICED", set())
    nx = 5
    eq = make_equation("Cha", nx=nx, alpha=1.0, k=1.0, T=1.0)
    zero = Solution.zero(nx)
    for _ in range(2):
        pk.pick_generate_tile(eq, zero, nx, 256, trial=False,
                              act_dtype=jnp.bfloat16)
    out = capsys.readouterr().out
    assert out.count("DATA.TPU.PALLAS_ACT: requested but unavailable") == 1
    assert "storing f32 activations" in out


def _wide_solution(nx=100):
    from deeppicarditeration_tpu.models.networks import PISGradNet

    eq = make_equation("OUProcessEquation", seed=0, nx=nx, alpha=1.0,
                       T=1.0)
    mod = PISGradNet(hidden_shapes=(512, 512, 512, 512), dim=nx, g0=eq.g,
                     T=1.0)
    params = mod.init(jax.random.PRNGKey(0), jnp.zeros((1, 1 + nx)))
    return eq, Solution.from_net(mod, params, "Value", nx)


def test_raised_ladder_merged_only_and_pass_scaled(monkeypatch):
    """The raised-limit candidates are merged-only and pruned when the
    precision's pass count scales the estimate past the raised budget
    (ADVICE r4 item 2): each rejected candidate is a 1-5 min remote
    Mosaic trial compile."""
    eq, big = _wide_solution()
    trials = []

    def fake_trial(eq_, sol_, nx_, tile, split, mblk, antithetic,
                   mxu_precision="bf16x3", act_dtype=None,
                   vmem_limit_bytes=None):
        trials.append((tile, split, vmem_limit_bytes))
        return True

    monkeypatch.setattr(pk, "_trial_compile_ok", fake_trial)
    # 1-pass dots: raised merged candidates only — no split-at-raised
    spec = pk.pick_generate_tile(eq, big, 100, 4096,
                                 mxu_precision="default")
    assert spec == (128, False, pk._VMEM_LIMIT_BYTES)
    assert trials == [(128, False, pk._VMEM_LIMIT_BYTES)]

    trials.clear()
    # bf16x3 (x2 operand-duplication factor, re-measured r5): tile 128
    # is pruned up front (52.9M x2 > the 56M raised budget); tile 64
    # survives the scaled gate and is trial-confirmed first
    spec = pk.pick_generate_tile(eq, big, 100, 4096,
                                 mxu_precision="bf16x3")
    assert spec == (64, False, pk._VMEM_LIMIT_BYTES)
    assert trials[0] == (64, False, pk._VMEM_LIMIT_BYTES)
    assert (128, False, pk._VMEM_LIMIT_BYTES) not in trials


# ---------------------------------------------------------------------------
# TPU-idiomatic memory adaptation (VERDICT r4 weak #4)
# ---------------------------------------------------------------------------

def test_format_memory_analysis_and_fmt():
    from deeppicarditeration_tpu.utils import memory as mem

    class MA:
        argument_size_in_bytes = 3 * 2 ** 20
        output_size_in_bytes = 2 ** 10
        temp_size_in_bytes = 5 * 2 ** 30
        peak_memory_in_bytes = None

    s = mem.format_memory_analysis(MA())
    assert "args=3MB" in s and "temp=5GB" in s and "out=1KB" in s
    assert "peak" not in s  # None fields are dropped


def test_oom_advice_reraises_with_knobs():
    from deeppicarditeration_tpu.utils.memory import oom_advice

    with pytest.raises(RuntimeError, match="DATA.GEN_BATCH") as ei:
        with oom_advice("target generation", "lower DATA.GEN_BATCH."):
            raise Exception(
                "RESOURCE_EXHAUSTED: Out of memory while trying to "
                "allocate 17179869184 bytes.")
    assert "RESOURCE_EXHAUSTED" in str(ei.value)  # original first line kept
    assert isinstance(ei.value.__cause__, Exception)

    # non-OOM errors pass through untouched
    with pytest.raises(ValueError, match="unrelated"):
        with oom_advice("x", "y"):
            raise ValueError("unrelated")


def test_log_compiled_memory_real_jit(monkeypatch, capsys):
    from deeppicarditeration_tpu.utils import memory as mem

    monkeypatch.setattr(mem, "_PROFILE", True)

    @jax.jit
    def f(x):
        return x * 2.0

    mem.log_compiled_memory("probe", f, jnp.ones((8, 8)))
    out = capsys.readouterr().out
    assert "[dpi-memory] probe:" in out

    monkeypatch.setattr(mem, "_PROFILE", False)
    mem.log_compiled_memory("probe2", f, jnp.ones((8, 8)))
    assert "probe2" not in capsys.readouterr().out


def test_runner_oom_advice_on_generation(tmp_path, monkeypatch):
    """A RESOURCE_EXHAUSTED escaping the generation dispatch reaches the
    user with the three actionable knobs, not as a raw XLA dump."""
    import deeppicarditeration_tpu.training.picard as picard_mod
    from test_round4_fixes import _cfg
    from deeppicarditeration_tpu.training.picard import PicardRunner

    cfg = _cfg("r5_oom")
    runner = PicardRunner(cfg, exp_root=tmp_path)

    def boom(*a, **k):
        raise Exception("RESOURCE_EXHAUSTED: Out of memory while trying "
                        "to allocate 17179869184 bytes.")

    monkeypatch.setattr(picard_mod, "generate_dataset", boom)
    with pytest.raises(RuntimeError, match="DATA.GEN_BATCH"):
        runner.run_one()


# ---------------------------------------------------------------------------
# dispatcher-matrix findings (r5): auto perf gate + activation chunk cap
# ---------------------------------------------------------------------------

def test_kernel_worthwhile_measured_boundary():
    """The auto gate encodes the r5 matrix boundary: small-nx and
    narrow-net workloads keep the measured-faster XLA path; wide nets,
    large nx, and the zero iterate (flagship iteration 1) keep the
    kernel."""
    def sol_of(widths, nx):
        from deeppicarditeration_tpu.models.networks import MLP

        mod = MLP(neurons=widths, activations=("ELU",) * len(widths),
                  out_dim=1)
        p = mod.init(jax.random.PRNGKey(0), jnp.zeros((1, 1 + nx)))
        return Solution.from_net(mod, p, "Value", nx)

    wk = est._kernel_worthwhile
    assert not wk(sol_of((64,) * 3, 10), 10)       # 0.42x measured
    assert not wk(sol_of((128,) * 4, 10), 10)      # 0.89x measured
    assert not wk(sol_of((64,) * 3, 100), 100)     # 0.81x measured
    assert wk(sol_of((64,) * 3, 256), 256)         # 1.58x measured
    assert wk(sol_of((128,) * 4, 100), 100)        # 1.29x (Burgers)
    assert wk(sol_of((512,) * 4, 100), 100)        # 1.79x (HJB-class)
    assert wk(Solution.zero(100), 100)             # iteration-1 pinned
    assert not wk(Solution.zero(10), 10)


def test_chunk_activation_cap():
    """chunk() bounds the chunk by the frozen net's activation footprint
    (batch * mc * act_width <= _ACT_BUDGET_ELEMS) without touching any
    flagship chunking (the mc choice sets the per-chunk RNG streams)."""
    g = est.GenConfig(chunk_elems=2 ** 25)
    # the crash case: wide MLP (width sum 2049) at nx=10, B=4096 — the
    # nx-based target alone admitted mc=512 (~34 GB of activations)
    assert g.chunk(4096, 4096, 10) == 512
    assert g.chunk(4096, 4096, 10, act_width=2049) == 64
    # flagship chunkings unchanged (bitwise-pinned trajectories):
    assert g.chunk(4096, 4096, 100, act_width=513) \
        == g.chunk(4096, 4096, 100)                      # Burgers 4x128
    assert g.chunk(4096, 4096, 100, act_width=2760) \
        == g.chunk(4096, 4096, 100)                      # HJB PISGradNet
    g_fn = est.GenConfig(chunk_elems=8388608)
    assert g_fn.chunk(1024, 2048, 100, act_width=193) \
        == g_fn.chunk(1024, 2048, 100)                   # FN 3x64
    # two-layer (two nets) unchanged at the recorded 100-d scale
    assert g.chunk(4096, 4096, 100, act_width=1026) \
        == g.chunk(4096, 4096, 100)


def test_act_width_sums_matmul_outputs():
    from deeppicarditeration_tpu.models.networks import MLP

    nx = 5
    mod = MLP(neurons=(8, 8), activations=("ELU", "ELU"), out_dim=1)
    p = mod.init(jax.random.PRNGKey(0), jnp.zeros((1, 1 + nx)))
    s = Solution.from_net(mod, p, "Value", nx)
    assert est._act_width(s) == 8 + 8 + 1
    assert est._act_width(Solution.zero(nx)) == 0
    assert est._act_width(s, s) == 2 * 17
    assert est._act_width(None, s) == 17
