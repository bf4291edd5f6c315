"""Network construction from config (NETWORK.* keys).

Reference parity: PicardRunner.get_solution_cls / PicardSolution
construction (picard_iteration.py:94-118, solution.py:292-327) and the
terminal-enforcing ansatz (solution_enforce_terminal.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from deeppicarditeration_tpu.models.networks import MLP, EnforceTerminal, PISGradNet
from deeppicarditeration_tpu.models.solution import (
    ONLY_GRADIENT,
    VALUE,
    Solution,
    output_dim_for,
)
from deeppicarditeration_tpu.utils.static_fn import StaticFn


# NETWORK.cls values with a construction branch here. The reference accepts
# any class in solution.py / solution_enforce_terminal.py and raises
# ValueError otherwise (picard_iteration.py:96-102); unknown names MUST fail
# loudly — a silent fallback to a plain MLP would drop e.g. the terminal
# anchoring while is_enforce_terminal() still reported it as present.
_KNOWN_NETWORK_CLS = (None, "PicardSolution", "PicardSolutionEnforceTerminal")


def build_network(cfg, eq):
    """Build the flax module described by cfg.NETWORK for equation eq.

    Parameter dtype follows DATA.FLOAT when the double family is requested
    AND JAX x64 is active (the CPU-backend path PicardRunner enables;
    reference set_default_dtype parity, config.py:170-195) — on TPU the
    request stays f32 per the PRECISION.md policy."""
    import jax as _jax

    from deeppicarditeration_tpu.config import wants_float64

    net_cfg = cfg.NETWORK
    if net_cfg.cls not in _KNOWN_NETWORK_CLS:
        raise ValueError(
            f"Unknown solution class {net_cfg.cls!r} "
            f"(known: {_KNOWN_NETWORK_CLS}; picard_iteration.py:102)")
    param_dtype = (jnp.float64 if (wants_float64(cfg.DATA.FLOAT)
                                   and _jax.config.jax_enable_x64)
                   else jnp.float32)
    net_type = net_cfg.TYPE
    out_dim = output_dim_for(net_type, eq.nx)
    neurons = tuple(net_cfg.NEURONS)
    activations = tuple(net_cfg.ACTIVATIONS)
    if len(activations) != len(neurons):
        raise ValueError(
            f"NETWORK.ACTIVATIONS has {len(activations)} entries for "
            f"{len(neurons)} NEURONS — lengths must match")
    bound = net_cfg.BOUND

    if net_cfg.PISGRADNET:
        assert net_type == VALUE, "PISGradNet is a value ansatz"
        return PISGradNet(hidden_shapes=neurons, dim=eq.nx,
                          g0=StaticFn(eq.g, ("g", id(eq))), T=eq.T,
                          param_dtype=param_dtype)

    inner = MLP(neurons=neurons, activations=activations, out_dim=out_dim,
                bound=bound, param_dtype=param_dtype)
    if net_cfg.cls == "PicardSolutionEnforceTerminal":
        if net_type == VALUE:
            anchor = StaticFn(eq.g, ("g", id(eq)))
        elif net_type == ONLY_GRADIENT:
            anchor = StaticFn(eq.g_x, ("g_x", id(eq)))
        else:
            raise ValueError(
                "EnforceTerminal supports Value or OnlyGradient TYPE "
                "(solution_enforce_terminal.py:14-19)")
        return EnforceTerminal(inner=inner, anchor=anchor, T=eq.T)
    return inner


_INIT_CACHE: dict = {}


def init_solution(key, cfg, eq, module=None) -> Solution:
    """Initialize parameters and wrap as a Solution.

    The init is jitted and cached per (module, input dim): the Picard
    loop re-initializes a fresh network EVERY iteration
    (picard_iteration.py:241-247), and an eager flax init measured
    ~265 ms/call through the remote-TPU tunnel."""
    module = module if module is not None else build_network(cfg, eq)
    ck = (module, eq.nx)
    init = _INIT_CACHE.get(ck)
    if init is None:
        init = _INIT_CACHE[ck] = jax.jit(
            lambda k: module.init(k, jnp.zeros((1, 1 + eq.nx))))
    params = init(key)
    return Solution.from_net(module, params, cfg.NETWORK.TYPE, eq.nx)


def is_enforce_terminal(cfg) -> bool:
    # Exact match on the same class table build_network dispatches on, so
    # the two can never disagree about whether the ansatz anchors g. The
    # cls validation is repeated here because some callers (the DBDP
    # baseline builds its own per-timestep modules) never go through
    # build_network — an unsupported name must fail loudly on every path,
    # not silently report enforce=False.
    if cfg.NETWORK.cls not in _KNOWN_NETWORK_CLS:
        raise ValueError(
            f"Unknown solution class {cfg.NETWORK.cls!r} "
            f"(known: {_KNOWN_NETWORK_CLS}; picard_iteration.py:102)")
    return cfg.NETWORK.cls == "PicardSolutionEnforceTerminal" \
        or bool(cfg.NETWORK.PISGRADNET)
