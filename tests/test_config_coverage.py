"""Every shipped recipe config must load, resolve its BASE chain, and
construct its equation + network + GenConfig without error (catches config
drift against the factories; the reference has no such check)."""

import pathlib

import jax
import pytest

from deeppicarditeration_tpu.config import load_cfg
from deeppicarditeration_tpu.equations import make_equation
from deeppicarditeration_tpu.models.factory import build_network, init_solution
from deeppicarditeration_tpu.models.solution import output_dim_for
from deeppicarditeration_tpu.training.picard import gen_config_from_cfg

ROOT = pathlib.Path(__file__).resolve().parents[1]
CONFIGS = sorted((ROOT / "configs").rglob("*.yaml"))


@pytest.mark.parametrize("cfg_path", CONFIGS, ids=lambda p: str(
    p.relative_to(ROOT / "configs")))
def test_config_constructs(cfg_path):
    cfg = load_cfg(cfg_path)
    eq = make_equation(cfg.EQUATION.cls, seed=int(cfg.SEED),
                       **(cfg.EQUATION.kwargs or {}))
    assert eq.nx >= 1
    module = build_network(cfg, eq)
    # a full-size init would be slow for the 4x512 nets; just check the
    # module builds and the declared output dim is consistent
    assert output_dim_for(cfg.NETWORK.TYPE, eq.nx) >= 1
    gen = gen_config_from_cfg(cfg, 1)
    assert gen.n_estimate_terminal >= 1
    assert gen.n_estimate_integral >= 1
    assert cfg.PICARD.N >= 1
    assert module is not None


def test_config_count_matches_reference_recipes():
    """One config per runnable reference recipe (burgers 4, hjb 6, FN 3)."""
    fam = {p.parent.name for p in CONFIGS}
    assert fam == {"burgers", "hjb", "fully_nonlinear"}
    assert len(CONFIGS) == 13
