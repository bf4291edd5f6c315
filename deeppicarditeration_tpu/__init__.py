"""deeppicarditeration_tpu — a TPU-native Deep Picard Iteration framework.

A from-scratch JAX/XLA/Pallas implementation of the capabilities of the
DeepPicardIteration reference (arXiv:2409.08526): solving terminal-value
semilinear / fully-nonlinear parabolic PDEs in up to 100+ dimensions by
Picard fixed-point iteration on the Feynman-Kac representation, plus the
PINN / D-DBSDE / DBDP baselines.

Design (TPU-first, not a port):
  - equations are pure-function pytree dataclasses (no device state),
  - Monte-Carlo target generation is a chunked, fused, compensated-sum
    reduction that never materializes the (batch * M, nx) intermediate,
  - training is one jitted step over a `jax.sharding.Mesh` data axis,
  - f32 compute with Kahan accumulation replaces the reference's f64.
"""

__version__ = "0.1.0"

from deeppicarditeration_tpu.config import Config, load_cfg, default_cfg

__all__ = ["Config", "load_cfg", "default_cfg", "__version__",
           "PicardRunner", "ExperimentEvaluator", "make_equation",
           "Solution", "GenConfig"]


def __getattr__(name):
    # lazy heavy imports so `import deeppicarditeration_tpu` stays light
    if name == "PicardRunner":
        from deeppicarditeration_tpu.training.picard import PicardRunner

        return PicardRunner
    if name == "ExperimentEvaluator":
        from deeppicarditeration_tpu.evaluation.experiment import (
            ExperimentEvaluator,
        )

        return ExperimentEvaluator
    if name == "make_equation":
        from deeppicarditeration_tpu.equations import make_equation

        return make_equation
    if name == "Solution":
        from deeppicarditeration_tpu.models.solution import Solution

        return Solution
    if name == "GenConfig":
        from deeppicarditeration_tpu.ops.estimators import GenConfig

        return GenConfig
    raise AttributeError(name)
