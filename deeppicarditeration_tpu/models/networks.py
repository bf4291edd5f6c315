"""Solution-ansatz networks (flax.linen).

Reference parity: construct_mlp (solution.py:123-135), PISGradNet
(solution.py:138-289), PicardSolutionEnforceTerminal
(solution_enforce_terminal.py:9-27). Inputs are ``tx`` of shape
(..., 1 + nx); output dim is 1 (Value), 1 + nx (ValueGradient) or nx
(OnlyGradient) per NETWORK.TYPE (solution.py:304-311).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

def _elu_bf16_impl(x):
    # compare and exp in f32: Mosaic (v5e) rejects arith.cmpf on bf16
    # vectors ("Target does not support this comparison")
    xf = x.astype(jnp.float32)
    pos = xf > 0.0
    y = jnp.where(pos, xf, jnp.exp(jnp.where(pos, 0.0, xf)) - 1.0)
    return y.astype(jnp.bfloat16), pos


@jax.custom_vjp
def _elu_bf16(x):
    return _elu_bf16_impl(x)[0]


def _elu_bf16_fwd(x):
    y, pos = _elu_bf16_impl(x)
    return y, (y, pos)


def _elu_bf16_bwd(res, g):
    y, pos = res
    # elu'(x) = 1 for x > 0 else elu(x) + 1; residuals stay bf16 — the
    # point of the pallas_act policy (f32 exp residuals would put the
    # width-sized buffers back)
    return (g * jnp.where(pos, jnp.ones_like(y), y + 1.0),)


_elu_bf16.defvjp(_elu_bf16_fwd, _elu_bf16_bwd)


def _elu(x):
    """ELU via exp, not jax.nn.elu's expm1: Mosaic (Pallas TPU) has no
    expm1 lowering, and the frozen net is traced INTO the fused integral
    kernel (ops/pallas_kernels.py). f32 deviation from expm1 is ~1 ulp
    near 0 — orders of magnitude below MC estimator noise.

    jnp.where on the exp argument too, so the gradient has no inf * 0.

    bf16 inputs (the pallas_act bf16 activation policy) dispatch to a
    custom-vjp variant that compares/exps in f32 (Mosaic has no bf16
    cmpf) while storing only bf16 residuals. It is reverse-mode-only;
    the policy applies solely to the frozen net inside the merged
    kernel, which takes exactly one vjp."""
    if x.dtype == jnp.bfloat16:
        return _elu_bf16(x)
    safe = jnp.where(x > 0, 0.0, x)
    return jnp.where(x > 0, x, jnp.exp(safe) - 1.0)


_ACTIVATIONS = {
    "Tanh": jnp.tanh,
    "ELU": _elu,
    "ReLU": jax.nn.relu,
    "GELU": jax.nn.gelu,
    "SiLU": jax.nn.silu,
    "Swish": jax.nn.silu,
    "Sigmoid": jax.nn.sigmoid,
    "Softplus": jax.nn.softplus,
    "Sin": jnp.sin,
}


def get_activation(name: str) -> Callable:
    if name not in _ACTIVATIONS:
        raise ValueError(f"Unknown activation {name!r}; known: {sorted(_ACTIVATIONS)}")
    return _ACTIVATIONS[name]


class MLP(nn.Module):
    """Plain MLP with per-layer activations and optional output clamp.

    Matches construct_mlp semantics (solution.py:123-135): hidden widths
    ``neurons`` with ``activations`` after each hidden layer, a final linear
    head, and an optional hardtanh-style clamp to [-bound, bound].
    """

    neurons: Sequence[int]
    activations: Sequence[str]
    out_dim: int
    bound: Optional[float] = None
    param_dtype: jnp.dtype = jnp.float32
    # Optional custom contraction (lax.dot_general signature). Used by the
    # fused Pallas estimator kernels to emulate 3-pass-bf16 matmuls in a
    # Mosaic body where precision=HIGH does not lower (see
    # ops/pallas_kernels.py:bf16x3_dot_general). None => lax.dot_general.
    dot_general: Optional[Callable] = None
    # Compute dtype for the Dense layers (flax semantics: inputs and params
    # are cast to it). None => promote from inputs (f32). bf16 halves the
    # activation/residual working set where this module is traced into a
    # VMEM-resident Pallas body (DATA.TPU.PALLAS_ACT); output is cast back
    # to the input dtype.
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, tx):
        h = tx
        assert len(self.neurons) == len(self.activations)
        dg = {} if self.dot_general is None else {"dot_general": self.dot_general}
        if self.dtype is not None:
            dg["dtype"] = self.dtype
        for width, act in zip(self.neurons, self.activations):
            h = nn.Dense(width, param_dtype=self.param_dtype, **dg)(h)
            h = get_activation(act)(h)
        h = nn.Dense(self.out_dim, param_dtype=self.param_dtype, **dg)(h)
        if self.dtype is not None:
            h = h.astype(tx.dtype)
        if self.bound is not None:
            assert self.bound > 0
            h = jnp.clip(h, -self.bound, self.bound)
        return h


class PISGradNet(nn.Module):
    """Terminal-aware architecture for the HJB configs.

    Reference parity: solution.py:138-289. Sinusoidal time embedding with a
    learned phase; a smoothing gate interpolating between <net(t, x), x> and
    the decayed terminal condition g0(e^{-lbd/2} x). Output dim is 1.
    ``g0`` is the equation's terminal function (a traced closure; it carries
    no parameters).
    """

    hidden_shapes: Sequence[int]
    dim: int
    g0: Callable = None
    T: float = 1.0
    channels: int = 64
    param_dtype: jnp.dtype = jnp.float32
    # see MLP.dot_general (bf16x3 swap for in-kernel tracing)
    dot_general: Optional[Callable] = None
    # see MLP.dtype (bf16 compute for in-kernel tracing). The terminal
    # mix (g0 residual, exp decay) stays in the input dtype: bf16 * f32
    # promotes, so the module's output remains f32.
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        self.timestep_phase = self.param(
            "timestep_phase", nn.initializers.zeros, (1, self.channels),
            self.param_dtype)
        # linspace(0.1, 100, C) via integer iota + affine map: jnp.linspace
        # lowers to a FLOAT iota, which Mosaic rejects when this module is
        # traced into a Pallas body ('tpu.iota' must be integer).
        idx = jax.lax.broadcasted_iota(jnp.int32, (1, self.channels), 1)
        step = (100.0 - 0.1) / max(self.channels - 1, 1)
        self.timestep_coeff = 0.1 + idx.astype(self.param_dtype) * step
        dg = {} if self.dot_general is None else {"dot_general": self.dot_general}
        if self.dtype is not None:
            dg["dtype"] = self.dtype
        self.t_encoder = [nn.Dense(self.channels, param_dtype=self.param_dtype,
                                   **dg)
                          for _ in range(2)]
        widths = [self.channels] * (1 + len(self.hidden_shapes)) + [self.dim]
        self.smooth_net = [nn.Dense(w, param_dtype=self.param_dtype, **dg)
                           for w in widths]
        self.nn_module = [nn.Dense(w, param_dtype=self.param_dtype, **dg)
                          for w in list(self.hidden_shapes) + [self.dim]]

    def _timestep_embedding(self, lbd):
        arg = self.timestep_coeff.astype(lbd.dtype) * lbd + self.timestep_phase
        return jnp.concatenate([jnp.sin(arg), jnp.cos(arg)], axis=-1)

    def _smooth(self, emb):
        h = emb
        h = self.smooth_net[0](h)
        for layer in self.smooth_net[1:]:
            h = layer(_elu(h))
        return h[..., 0:1]

    def __call__(self, tx):
        lbd, x = tx[..., 0:1], tx[..., 1:]
        lbd = self.T - lbd

        emb = self._timestep_embedding(lbd)
        zero_emb = self._timestep_embedding(jnp.zeros_like(lbd))
        smooth = self._smooth(emb) - self._smooth(zero_emb)

        t_emb = self.t_encoder[0](emb)
        t_emb = self.t_encoder[1](_elu(t_emb))

        h = jnp.concatenate([t_emb, x], axis=-1)
        for layer in self.nn_module[:-1]:
            h = _elu(layer(h))
        net_out = self.nn_module[-1](h)

        sp_out = jnp.sum(net_out * x, axis=-1, keepdims=True)
        decay = jnp.exp(-0.5 * lbd)
        residual = self.g0(decay * x)
        return smooth * sp_out + (1.0 - smooth) * residual


class EnforceTerminal(nn.Module):
    """u(t, x) = anchor(x) + (T - t) * net(tx).

    Reference parity: PicardSolutionEnforceTerminal
    (solution_enforce_terminal.py:9-27). ``anchor`` is g for the value form
    or g_x for the gradient form; the network's output dim must match.
    """

    inner: nn.Module
    anchor: Callable
    T: float = 1.0

    @nn.compact
    def __call__(self, tx):
        t, x = tx[..., 0:1], tx[..., 1:]
        return self.anchor(x) + (self.T - t) * self.inner(tx)
