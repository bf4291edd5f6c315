"""Equation layer (reference parity: picard/equations.py)."""

from deeppicarditeration_tpu.equations.base import (
    EquationMethods,
    SimpleDiffusionMethods,
    SimpleDiffusionWithHessian,
    SimpleDiffusionWithLaplacian,
    SimpleDiffusionWithZ,
    SimpleDiffusionWithoutZ,
    get_equation_cls,
    make_equation,
    register_equation,
)
from deeppicarditeration_tpu.equations.burgers import Cha
from deeppicarditeration_tpu.equations.fully_nonlinear import GBMEquationComplexExact
from deeppicarditeration_tpu.equations.hjb import OUProcessEquation

__all__ = [
    "EquationMethods",
    "SimpleDiffusionMethods",
    "SimpleDiffusionWithZ",
    "SimpleDiffusionWithoutZ",
    "SimpleDiffusionWithLaplacian",
    "SimpleDiffusionWithHessian",
    "register_equation",
    "get_equation_cls",
    "make_equation",
    "Cha",
    "OUProcessEquation",
    "GBMEquationComplexExact",
]
