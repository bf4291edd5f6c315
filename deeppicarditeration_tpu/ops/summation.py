"""Compensated (Kahan) accumulation for long Monte-Carlo reductions.

The reference runs everything in float64 (``DATA.FLOAT: double`` in all
shipped 100-d configs, config.py:170-195). TPUs have no native f64, so the
MC means over up to 10^6 samples accumulate in f32 carried with a Kahan
compensation term — this restores ~f64-quality summation where it matters
(survey §7.1.8, §7.3.1) while keeping all FLOPs on the fast path.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class KahanAcc(NamedTuple):
    """A compensated accumulator: value ``sum`` plus error term ``comp``."""

    sum: jnp.ndarray
    comp: jnp.ndarray

    @classmethod
    def zeros(cls, shape, dtype=jnp.float32) -> "KahanAcc":
        z = jnp.zeros(shape, dtype=dtype)
        return cls(sum=z, comp=jnp.zeros_like(z))

    def add(self, value: jnp.ndarray) -> "KahanAcc":
        """Kahan-Babuska (Neumaier) update; safe for any magnitude order."""
        t = self.sum + value
        big = jnp.abs(self.sum) >= jnp.abs(value)
        comp = self.comp + jnp.where(big, (self.sum - t) + value,
                                     (value - t) + self.sum)
        return KahanAcc(sum=t, comp=comp)

    @property
    def value(self) -> jnp.ndarray:
        return self.sum + self.comp
