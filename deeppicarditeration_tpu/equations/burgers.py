"""The 100-d Burgers-type benchmark equation "Cha".

Reference parity: equations.py:266-338. The PDE

    u_t + alpha/2 u_xx + [alpha k u - 1/(k d) - alpha k / 2] sum_i u_{x_i} = 0

in standard form ``fff(t, x, y, z) = sqrt(a) [k y - (2 + k^2 a d)/(2 k a d)]
sum_i z_i`` with exact solution ``u(t, x) = sigmoid(t + k sum_i x_i)``.
The user-facing ``k`` is scaled by 1/sqrt(nx) (equations.py:285).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import struct

from deeppicarditeration_tpu.equations.base import (
    SimpleDiffusionWithZ,
    register_equation,
)


@register_equation
@struct.dataclass
class Cha(SimpleDiffusionWithZ):
    nx: int = struct.field(pytree_node=False, default=100)
    T: float = struct.field(pytree_node=False, default=1.0)
    alpha: float = struct.field(pytree_node=False, default=1.0)
    k: float = struct.field(pytree_node=False, default=1.0)  # already /sqrt(nx)

    @classmethod
    def create(cls, nx: int = 100, alpha: float = 1.0, k: float = 1.0,
               T: float = 1.0, seed: int = 0):
        del seed
        return cls(nx=nx, T=T, alpha=alpha, k=k / math.sqrt(nx))

    def fff(self, t, x, y, z):
        alpha_d = self.alpha * self.nx
        k_alpha_d = self.k * alpha_d
        coef = self.k * y - (2.0 + self.k * k_alpha_d) / (2.0 * k_alpha_d)
        return self.alpha_sqrt * coef * jnp.sum(z, axis=-1, keepdims=True)

    def g(self, x):
        return jax.nn.sigmoid(self.T + self.k * jnp.sum(x, axis=-1, keepdims=True))

    def g_x(self, x):
        s = self.g(x)
        return jnp.broadcast_to(self.k * s * (1.0 - s), x.shape)

    def exact_solution(self, t, x):
        return jax.nn.sigmoid(t + self.k * jnp.sum(x, axis=-1, keepdims=True))

    def u_t(self, t, x):
        u = self.exact_solution(t, x)
        return u * (1.0 - u)

    def u_x(self, t, x):
        u = self.exact_solution(t, x)
        return jnp.broadcast_to(self.k * u * (1.0 - u), x.shape)

    def u_u_x(self, t, x):
        u = self.exact_solution(t, x)
        return u, jnp.broadcast_to(self.k * u * (1.0 - u), x.shape)

    def sample_x0(self, key, n: int, dtype=jnp.float32):
        del key
        return jnp.zeros((n, self.nx), dtype=dtype)

    def ffh(self, t, x, y, w, hess):
        return self.ff(t, x, y, w)
