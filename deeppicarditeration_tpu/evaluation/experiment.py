"""Post-hoc experiment evaluation (the ``evaluate`` CLI backend).

Reference parity: ExperimentEvaluator (experiment_evaluator.py): reload any
iteration's checkpoint, run the MC self-consistency check at (0, 0)
(monte_carlo_at_zero, :74-82) and L2 sweeps over the Picard time law
(:84-111).
"""

from __future__ import annotations

import pathlib
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp

from deeppicarditeration_tpu.config import load_cfg
from deeppicarditeration_tpu.equations import make_equation
from deeppicarditeration_tpu.models.factory import (
    build_network,
    init_solution,
    is_enforce_terminal,
)
from deeppicarditeration_tpu.models.solution import Solution, output_dim_for
from deeppicarditeration_tpu.evaluation.evaluator import (
    l2_at_t,
    monte_carlo_at_zero,
    value_batched,
)
from deeppicarditeration_tpu.ops.samplers import sample_t_picard
from deeppicarditeration_tpu.training import checkpoint as ckpt
from deeppicarditeration_tpu.utils.static_fn import StaticFn


class ExperimentEvaluator:
    def __init__(self, exp_dir, n_estimate_terminal: int = 1_000_000,
                 n_estimate_integral: int = 1_000_000):
        self.exp_dir = pathlib.Path(exp_dir)
        self.cfg = load_cfg(self.exp_dir / "config.yaml")
        self.equation = make_equation(self.cfg.EQUATION.cls,
                                      run_seed=int(self.cfg.SEED),
                                      **(self.cfg.EQUATION.kwargs or {}))
        self.module = build_network(self.cfg, self.equation)
        self.n_terminal = n_estimate_terminal
        self.n_integral = n_estimate_integral
        # EVAL.BATCH_SIZE bounds every post-hoc net forward so a large
        # --sol-file cannot OOM (the in-training evaluator already honors
        # it; utils.py:141-183 parity)
        self.eval_bs = self.cfg.EVAL.BATCH_SIZE
        self._cache: Dict[int, Solution] = {}

    def get_solution(self, i: int) -> Solution:
        """Iteration i's solution; i == 0 is the zero/gx ansatz
        (experiment_evaluator.py:33-58)."""
        if i in self._cache:
            return self._cache[i]
        eq = self.equation
        if i == 0:
            if is_enforce_terminal(self.cfg):
                sol = Solution.gx(StaticFn(eq.g, ("g", id(eq))), eq.nx)
            else:
                sol = Solution.zero(eq.nx, self.cfg.NETWORK.TYPE)
        else:
            template = init_solution(jax.random.PRNGKey(0), self.cfg, eq,
                                     module=self.module)
            params = ckpt.load_params(ckpt.ckpt_path(self.exp_dir, i),
                                      template.params)
            sol = Solution.from_net(self.module, params,
                                    self.cfg.NETWORK.TYPE, eq.nx)
        self._cache[i] = sol
        return sol

    def monte_carlo_at_zero(self, iters: Optional[List[int]] = None,
                            key=None) -> List[Dict[str, float]]:
        key = key if key is not None else jax.random.PRNGKey(1234)
        out = []
        iters = iters if iters is not None else range(self.cfg.PICARD.N + 1)
        for i in iters:
            sol = self.get_solution(i)
            rec = monte_carlo_at_zero(jax.random.fold_in(key, i),
                                      self.equation, sol,
                                      n_estimate=self.n_terminal,
                                      n_estimate_integral=self.n_integral)
            rec["iter"] = i
            print(f"{i}: u(0,0)={rec['u_net_at_zero']:.6f}\t"
                  f"Picard Estimate: {rec['u_mc_at_zero']:.6f}")
            out.append(rec)
        return out

    def l2(self, n_points: int, key=None,
           plots: bool = True) -> List[Dict[str, float]]:
        """L2 under the Picard t-law and at t = 0 per iteration, with
        error-scatter plots (experiment_evaluator.py:84-103)."""
        from deeppicarditeration_tpu.evaluation.plots import plot_error

        key = key if key is not None else jax.random.PRNGKey(1234)
        eq, N = self.equation, self.cfg.PICARD.N
        out = []
        for i in range(1, N + 1):
            sol = self.get_solution(i)
            kt = jax.random.fold_in(key, i)
            t_rand = sample_t_picard(jax.random.fold_in(kt, 0), n_points,
                                     eq.T, max(N - i + 1, 1))
            rec = {"iter": i}
            rec["l2_td"] = l2_at_t(jax.random.fold_in(kt, 1), sol, eq,
                                   t_rand,
                                   batch_size=self.eval_bs)["l2_error"]
            t0 = jnp.zeros((n_points, 1))
            rec["l2_t0"] = l2_at_t(jax.random.fold_in(kt, 2), sol, eq,
                                   t0, batch_size=self.eval_bs)["l2_error"]
            if plots:
                x = eq.sample_x(jax.random.fold_in(kt, 3), t_rand)
                tx = jnp.concatenate([t_rand, x], axis=-1)
                err = jnp.abs(value_batched(sol, tx, self.eval_bs)
                              - eq.exact_solution(t_rand, x))
                plot_error(self.exp_dir, t_rand, x, err, f"iter_{i:03d}")
            print(f"Iter {i}: L2(td) = {rec['l2_td']:.4e}  "
                  f"L2(t0) = {rec['l2_t0']:.4e}")
            out.append(rec)
        return out

    def l2_file(self, sol_file, plots: bool = True
                ) -> List[Dict[str, float]]:
        """Per-iteration L2 against a given (tx, u) solution file
        (experiment_evaluator.py:103-111). Accepts .h5/.hdf5 with tx/u
        datasets (reference format), .npz with tx/u, or .npy columns
        [t, x(nx), u]."""
        import numpy as np

        from deeppicarditeration_tpu.evaluation.plots import plot_error

        sol_file = pathlib.Path(sol_file)
        if sol_file.suffix in (".h5", ".hdf5"):
            import h5py

            with h5py.File(sol_file, "r") as h5f:
                tx = jnp.asarray(h5f["tx"][()])
                u = jnp.asarray(h5f["u"][()])
        elif sol_file.suffix == ".npz":
            z = np.load(sol_file)
            tx, u = jnp.asarray(z["tx"]), jnp.asarray(z["u"])
        else:
            data = jnp.asarray(np.load(sol_file))
            nx = self.equation.nx
            tx, u = data[:, :1 + nx], data[:, 1 + nx:2 + nx]
        u = u.reshape(tx.shape[0], 1)
        out = []
        for i in range(1, self.cfg.PICARD.N + 1):
            sol = self.get_solution(i)
            u_sol = value_batched(sol, tx, self.eval_bs)
            err = jnp.abs(u_sol - u)
            l2 = float(jnp.sqrt(jnp.mean(err ** 2)))
            rec = {"iter": i, "l2": l2}
            if plots:
                plot_error(self.exp_dir, tx[:, 0], tx[:, 1:], err,
                           f"iter_{i:03d}_of_given_file")
            print(f"Iter {i}: L2 error = {l2:.4e}")
            out.append(rec)
        return out
