"""The outer Picard loop: generate -> fit -> checkpoint -> swap.

Reference parity: PicardRunner (picard_iteration.py:76-307). Per iteration:
fresh (or reloaded) network, dataset generated from the FROZEN previous
iterate, supervised fit for TRAIN.N_EPOCHS, checkpoint, swap. Baselines
(PINN / Diffusion / FullyNonlinearSolver) dispatch by METHOD.cls
(picard_iteration.py:253-264).

TPU design: equation and frozen solution are pytree arguments to ONE jitted
generation function and ONE jitted multi-step train function — same treedef
every iteration, so the whole run compiles exactly once per shape
(survey §7.3.4). Epochs run as lax.scan segments of EVAL.FREQ steps with
donated train state.
"""

from __future__ import annotations

import pathlib
import shutil
from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp

from deeppicarditeration_tpu.data.dataset import (
    DeviceDataset,
    default_gen_batch,
    epoch_batches,
    generate_dataset,
    load_dataset,
    load_provenance,
    data_save_ext,
    save_dataset,
)
from deeppicarditeration_tpu.config import wants_float64
from deeppicarditeration_tpu.equations import make_equation
from deeppicarditeration_tpu.evaluation.evaluator import eval_solution
from deeppicarditeration_tpu.models.factory import (
    build_network,
    init_solution,
    is_enforce_terminal,
)
from deeppicarditeration_tpu.models.solution import Solution, output_dim_for
from deeppicarditeration_tpu.ops.estimators import GenConfig, sample_batch
from jax.sharding import NamedSharding, PartitionSpec as P

from deeppicarditeration_tpu.parallel.mesh import (
    data_sharding,
    make_mesh,
    replicated,
)
from deeppicarditeration_tpu.parallel.distributed import (
    barrier,
    host_local_copy,
    is_multiprocess,
    is_primary,
)
from deeppicarditeration_tpu.training import checkpoint as ckpt
from deeppicarditeration_tpu.training.logging import MetricLogger
from deeppicarditeration_tpu.training.trainer import (
    TrainSpec,
    TrainState,
    lr_schedule_fn,
    make_optimizer,
    make_step_body,
    model_summary,
)
from deeppicarditeration_tpu.utils.memory import (
    log_compiled_memory,
    oom_advice,
)
from deeppicarditeration_tpu.utils.profiling import step_timer
from deeppicarditeration_tpu.utils.progress import PicardProgress


def _train_keys(key, n_epochs: int):
    """(shuffle_keys, step_keys), each (n_epochs, ...): the CANONICAL
    per-epoch training-key derivation shared by all three training paths
    (EVAL.FREQ=None epoch scan, fused freq scan, unfused segmented loop).

    The derivation is part of the framework's reproducibility contract:
    a recipe's trajectory must not depend on which execution path runs
    it. This is not cosmetic — the HJB 100-d recipe (unbounded -log GMM
    targets, RELOAD warm starts) is chaotically sensitive to the shuffle
    stream: an earlier fold_in(key, epoch)-based derivation used only by
    the segmented path converged to rRMSE 0.033 by iteration 30 and then
    diverged to 1e7 by iteration 36, bitwise-reproduced through two
    independent execution paths (bench_results/
    hjb100d_tpu_fusedfreq_full.jsonl), while this derivation has four
    recorded stable 40-iteration runs. SAMPLE_BOUND remains the
    reference-parity guard for such recipes (data.py:208-222)."""
    return (jax.random.split(jax.random.fold_in(key, 0), n_epochs),
            jax.random.split(jax.random.fold_in(key, 1), n_epochs))


def _fetch_metrics(metrics) -> dict:
    """Dict of device scalars -> dict of floats in ONE host readback
    (per-scalar float() each pays the remote-tunnel round trip)."""
    if not metrics:
        return {}
    keys = list(metrics)
    vals = jax.device_get(jnp.stack([metrics[k] for k in keys]))
    return {k: float(v) for k, v in zip(keys, vals)}


def _tri_state(v):
    """Parse a false/true/"auto" config value (YAML bool or string)."""
    if isinstance(v, str):
        s = v.strip().lower()
        if s == "auto":
            return "auto"
        return s in ("1", "true", "yes", "on")
    return bool(v)


def _opt_str(v):
    """Optional-string config value: None for every null-ish spelling
    (None, False, "", "none"/"null"/"off"/"false"/"0" — the reference-
    YAML compat shim's "None"-string convention, ADVICE r4 item 4),
    else the lowercased string."""
    if v is None or v is False or v == "" or v == 0:
        return None
    s = str(v).strip().lower()
    return None if s in ("none", "null", "off", "false", "0") else s


def gen_config_from_cfg(cfg, i: int, mesh=None) -> GenConfig:
    """``mesh`` (the runner's device mesh) lets the merged Pallas kernel
    shard_map over the data axis on multi-device runs (estimators.py
    _pallas_generate_tile); without it multi-device generation takes the
    XLA path."""
    d = cfg.DATA
    kwargs = d.kwargs or {}
    hess = d.HESSIAN_APPROXIMATION
    sdgd_v = None
    if hess.method == "SDGD":
        v = (hess.kwargs or {}).get("v")
        if v is None:
            raise ValueError(
                "DATA.HESSIAN_APPROXIMATION.method is SDGD but "
                "DATA.HESSIAN_APPROXIMATION.kwargs.v is not set")
        sdgd_v = int(v)
    eps = 0.0
    if ("ByGx" in (d.ESTIMATE_TERMINAL or "")
            or "Joint" in (d.ESTIMATE_INTEGRAL or "")):
        eps = 0.01  # reference data.py:134-137
    hess_store = _opt_str(d.TPU.get("HESSIAN_STORE"))
    if hess_store not in (None, "bf16"):
        # a typo would otherwise silently run the f32 chain
        raise ValueError(
            f"DATA.TPU.HESSIAN_STORE must be null or 'bf16', got "
            f"{d.TPU.HESSIAN_STORE!r}")
    pallas_act = _opt_str(d.TPU.get("PALLAS_ACT"))
    if pallas_act not in (None, "bf16"):
        # eager: the lazy GenConfig.act_dtype check is only reached on
        # the TPU merged-kernel dispatch, so a typo would pass silently
        # on CPU or non-kernel paths
        raise ValueError(
            f"DATA.TPU.PALLAS_ACT must be null or 'bf16', got "
            f"{d.TPU.PALLAS_ACT!r}")
    if (pallas_act is not None
            and str(d.TPU.get("PALLAS_PRECISION", "bf16x3")) != "default"):
        raise ValueError(
            "DATA.TPU.PALLAS_ACT: bf16 requires DATA.TPU.PALLAS_PRECISION:"
            " default (the bf16 activation policy's dots are single-pass"
            " by construction)")
    return GenConfig(
        n_estimate_terminal=int(kwargs.get("n_estimate_terminal", 1)),
        n_estimate_integral=int(kwargs.get("n_estimate_integral", 1)),
        chunk_elems=int(d.CHUNK_ELEMS),
        t_always_uniform=bool(kwargs.get("t_always_uniform", False)),
        t_uniform_eps=eps,
        N=int(cfg.PICARD.N),
        i=i,
        sample_bound=(float(d.SAMPLE_BOUND)
                      if d.SAMPLE_BOUND is not None else None),
        sdgd_v=sdgd_v,
        estimate_delta_t=float(d.ESTIMATE_DELTA_T),
        tpu_prng=bool(d.TPU.PRNG),
        antithetic=bool(d.TPU.ANTITHETIC),
        pallas_terminal=bool(d.TPU.PALLAS_TERMINAL),
        pallas_integral=bool(d.TPU.PALLAS_INTEGRAL),
        pallas_generate=_tri_state(d.TPU.PALLAS_GENERATE),
        pallas_precision=str(d.TPU.get("PALLAS_PRECISION", "bf16x3")),
        pallas_act=pallas_act,
        hess_store=hess_store,
        mesh=mesh,
    )


class PicardRunner:
    """Drives PICARD.N iterations of generate -> fit -> checkpoint."""

    def __init__(self, cfg, exp_root: Optional[pathlib.Path] = None):
        self.cfg = cfg
        self.exp_dir = pathlib.Path(exp_root or ".") / cfg.NAME
        self._prepare_exp_dir()

        self.seed = int(cfg.SEED)
        self.root_key = jax.random.PRNGKey(self.seed)
        matmul_prec = (cfg.get("PRECISION") or {}).get("MATMUL", "default")
        if matmul_prec and matmul_prec != "default":
            jax.config.update("jax_default_matmul_precision", matmul_prec)
        # DATA.FLOAT drives the end-to-end dtype like the reference's
        # set_default_dtype (config.py:170-195): on the CPU backend
        # "double" enables JAX x64 and threads float64 through generation
        # and network params; TPUs have no native f64, so there the
        # documented policy is f32 + Kahan-compensated accumulation
        # (PRECISION.md), announced rather than silently ignored.
        self.dtype = jnp.float32
        if wants_float64(cfg.DATA.FLOAT):
            if jax.default_backend() == "cpu":
                if not jax.config.jax_enable_x64:
                    jax.config.update("jax_enable_x64", True)
                    print("DATA.FLOAT: double — JAX x64 enabled "
                          "(CPU backend)")
                self.dtype = jnp.float64
            else:
                print("DATA.FLOAT: double requested; TPUs have no native "
                      "f64 — running f32 + Kahan-compensated accumulation "
                      "(run on the CPU backend for true f64)")
        self.equation = make_equation(cfg.EQUATION.cls, run_seed=self.seed,
                                      **(cfg.EQUATION.kwargs or {}))
        eq = self.equation

        self.supervise_gradient = bool(cfg.TRAIN.SUPERVISE_GRADIENT
                                       or eq.has_gradient_term)
        self.supervise_hessian = bool(cfg.TRAIN.SUPERVISE_HESSIAN)
        self.net_type = cfg.NETWORK.TYPE
        self.output_dim = output_dim_for(self.net_type, eq.nx)

        self.N = int(cfg.PICARD.N)
        self.i = 0
        self.mesh = make_mesh(cfg.MESH.SHAPE, tuple(cfg.MESH.AXES))
        self.sharding = data_sharding(self.mesh)
        # stacked epoch batches: (steps, batch, feat) with batch sharded
        self.batch_sharding = NamedSharding(self.mesh, P(None, "data"))
        self.repl = replicated(self.mesh)

        self.module = build_network(cfg, eq)
        self.spec = TrainSpec.from_cfg(cfg, eq.nx)
        self.tx_opt, self._opt_needs_value = make_optimizer(
            cfg.TRAIN.OPTIMIZER)
        self._lr_fn = lr_schedule_fn(cfg.TRAIN.OPTIMIZER)

        self.u_current: Solution = Solution.zero(eq.nx, self.net_type)
        self.u_history: List[Solution] = [self.u_current]
        self.logger = MetricLogger(self.exp_dir, cfg.LOGGING.LOGGER,
                                   cfg.LOGGING.TENSORBOARD_DIR,
                                   name=cfg.NAME,
                                   logger_kwargs=(cfg.LOGGING.kwargs or {}),
                                   hparams=cfg.to_dict(),
                                   primary=is_primary())
        self.global_step = 0
        self._jit_cache = {}
        self._memlogged = set()
        self.progress = PicardProgress(self.N, enabled=False)
        if cfg.RESUME:
            self._maybe_resume()

    # ------------------------------------------------------------------
    def _prepare_exp_dir(self):
        """Create/wipe the experiment dir and dump the config
        (picard_iteration.py:124-145 semantics).

        Multi-process: the conflict CHECK runs on every process (so a
        refusal raises everywhere in unison instead of leaving
        non-primaries blocked at the barrier), but only the primary
        mutates the filesystem — N concurrent rmtree/write of the same
        path is exactly the race VERDICT r3 flagged. The barrier BETWEEN
        check and mutation keeps a slow rank's probe from racing the
        primary's rmtree (iterdir on a vanishing dir raises); the
        trailing barrier keeps non-primaries from reading exp-dir state
        (RESUME replay, checkpoints) before the primary prepared it."""
        cfg_file = self.exp_dir / "config.yaml"
        wipe = False
        if self.exp_dir.exists() and any(self.exp_dir.iterdir()):
            contents = list(self.exp_dir.iterdir())
            if not (len(contents) == 1 and contents[0].name == cfg_file.name):
                if self.cfg.RESUME:
                    pass  # keep checkpoints; _maybe_resume picks up from them
                elif not self.cfg.FORCE:
                    raise FileExistsError(
                        f"Experiment directory {self.exp_dir} already exists; "
                        "set FORCE: true to overwrite "
                        "(picard_iteration.py:124-141 semantics)")
                else:
                    wipe = True
        barrier("prepare_exp_dir_checked")  # every probe done, FS quiescent
        if is_primary():
            if wipe:
                shutil.rmtree(self.exp_dir)
            self.exp_dir.mkdir(parents=True, exist_ok=True)
            cfg_file.write_text(self.cfg.dump())
        barrier("prepare_exp_dir")

    def _maybe_resume(self):
        """Pick up from the latest model_{i} checkpoint in exp_dir.

        Restores u_current (and u_history[-2] for the TwoLayer formula) so
        that iteration i+1 generates targets from exactly the network a
        continuous run would have used. The reference has no resume at all;
        its granularity would anyway be the Picard iteration (survey §5.4)."""
        ckpt.wait_all()  # async saves from an earlier in-process run
        latest = 0
        while ckpt.ckpt_path(self.exp_dir, latest + 1).exists():
            latest += 1
        if latest == 0:
            return
        if self.cfg.METHOD.cls == "FullyNonlinearSolver":
            # DBDP's model_{i} holds the STACKED per-timestep pair pytree,
            # not a Solution params tree — skip completed iterations but
            # do not try to restore it into the single-net template
            self.i = latest
            print(f"RESUME: DBDP iterations 1..{latest} already complete "
                  f"({self.exp_dir}); skipping them")
            return
        template = init_solution(jax.random.PRNGKey(0), self.cfg,
                                 self.equation, module=self.module)
        # replicate the template over the mesh so the abstract restore
        # tree carries a GLOBAL sharding — under multi-process orbax needs
        # one (restore is a collective), and single-process it is the
        # sharding the params end up with anyway
        template_params = jax.device_put(template.params, self.repl)

        def load(i):
            params = ckpt.load_params(ckpt.ckpt_path(self.exp_dir, i),
                                      template_params)
            return Solution.from_net(self.module, params, self.net_type,
                                     self.equation.nx)

        if latest >= 2 and self.cfg.PICARD.FORMULA == "TwoLayer":
            self.u_history.append(load(latest - 1))
        self.u_current = load(latest)
        self.u_history.append(self.u_current)
        self.i = latest
        print(f"RESUME: continuing from iteration {latest} "
              f"({self.exp_dir})")

    # ------------------------------------------------------------------
    @property
    def generation_mode(self) -> str:
        """Dataset-variant selection (data.py:1620-1661)."""
        cfg = self.cfg
        if cfg.PICARD.FORMULA == "TwoLayer" and len(self.u_history) >= 2:
            assert not self.supervise_gradient, (
                "TwoLayer formula generates value-only targets "
                "(data.py:1332-1333)")
            return "two_layer"
        if cfg.DATA.EXACT:
            if self.supervise_hessian:
                return "exact_hessian"
            return "exact_gradient" if self.supervise_gradient else "exact"
        if self.supervise_hessian:
            return "hessian"
        return "gradient" if self.supervise_gradient else "value"

    def _jitted(self, name, builder):
        if name not in self._jit_cache:
            self._jit_cache[name] = builder()
        return self._jit_cache[name]

    def _log_jit_memory(self, name, label, jitted, *args):
        """DPI_PROFILE=1: log the compiled device-memory footprint of a
        runner jit, once per _jitted cache key (the AOT analysis costs
        one extra compile, so it must not repeat per iteration)."""
        if name in self._memlogged:
            return
        self._memlogged.add(name)
        log_compiled_memory(label, jitted, *args)

    # ------------------------------------------------------------------
    def _provenance(self, gen: GenConfig, mode: str, n_total: int,
                    gen_batch: int) -> dict:
        """Stamp identifying what determines a generated dataset's values:
        run seed, Picard iteration (the t-law exponent), generation mode,
        sizes, dtype, mesh width (the kernel path's per-device seed
        offsets depend on it) and the full estimator fingerprint. A saved
        data_iter_{i} file from an earlier FORCE run with ANY of these
        different must not be replayed as iteration i's targets."""
        import dataclasses as _dc

        ndev = int(self.mesh.devices.size)
        return {"seed": self.seed, "iteration": self.i, "mode": mode,
                "data_size": n_total, "gen_batch": gen_batch,
                "dtype": str(jnp.dtype(self.dtype)), "ndev": ndev,
                "gen": repr(_dc.replace(gen, i=0, mesh=None))}

    def _make_dataset(self, key, gen: GenConfig, mode: str) -> DeviceDataset:
        cfg = self.cfg
        if not cfg.DATA.ONLINE:
            # same placement as the RESUME-replay path below: a host-local
            # file becomes a mesh-sharded global dataset (a local array
            # mixed into the globally-sharded training jits would raise
            # under multi-process — review r4 finding)
            ds = load_dataset(cfg.DATA.TRAIN_FILE, dtype=self.dtype)
            ndev = int(self.mesh.devices.size)
            if ndev > 1 and ds.size % ndev:
                raise ValueError(
                    f"offline dataset {cfg.DATA.TRAIN_FILE} has {ds.size} "
                    f"rows, not divisible by the mesh data axis ({ndev})")
            return DeviceDataset(tx=jax.device_put(ds.tx, self.sharding),
                                 y=jax.device_put(ds.y, self.sharding))
        n_total = int(cfg.DATA.DATA_SIZE)
        ndev = int(self.mesh.devices.size)
        gen_batch = cfg.DATA.get("GEN_BATCH")
        if gen_batch:
            gen_batch = int(gen_batch)
            if ndev > 1 and gen_batch % ndev:
                # fail at config time with the key's name, not deep inside
                # pjit with an opaque output-sharding error
                raise ValueError(
                    f"DATA.GEN_BATCH ({gen_batch}) must be divisible by "
                    f"the mesh data-axis size ({ndev})")
        else:
            gen_batch = default_gen_batch(n_total, gen.chunk_elems,
                                          self.equation.nx, ndev)
        prov = self._provenance(gen, mode, n_total, gen_batch)
        if cfg.RESUME and cfg.DATA.SAVE:
            # mid-iteration resume: a run killed AFTER generating iteration
            # i's dataset but BEFORE its checkpoint replays the saved data
            # instead of regenerating (beyond reference, survey §5.4: "no
            # mid-iteration resume")
            ext = data_save_ext(cfg.DATA.SAVE_FORMAT)
            saved = self.exp_dir / f"data_iter_{self.i}.{ext}"
            if saved.exists():
                saved_prov = load_provenance(saved)
                if saved_prov != prov:
                    # stale/unstamped file (earlier FORCE run, different
                    # SEED or estimator config): refuse the replay
                    print(f"RESUME: saved dataset {saved.name} provenance "
                          f"mismatch ({saved_prov} != {prov}); "
                          "regenerating")
                else:
                    ds = load_dataset(saved, dtype=self.dtype)
                    if ds.size == n_total:
                        ds = DeviceDataset(
                            tx=jax.device_put(ds.tx, self.sharding),
                            y=jax.device_put(ds.y, self.sharding))
                        print(f"RESUME: replaying saved dataset "
                              f"{saved.name}")
                        return ds
        sol_m2 = self.u_history[-2] if mode == "two_layer" else None

        def builder():
            # out_shardings partitions generation over the mesh data axis:
            # each device draws and reduces only its slice of collocation
            # points (threefry is partitionable, the estimator is pointwise
            # across the batch). Without it a multi-chip pjit computes the
            # whole batch replicated and reshards afterwards. in_shardings
            # is replicated explicitly: checkpoint-restored keys/params are
            # committed to device 0 and would otherwise clash with the
            # multi-device output sharding.
            shd, repl = self.sharding, self.repl

            @partial(jax.jit, in_shardings=(repl, repl, repl, repl, repl),
                     out_shardings=(shd, shd))
            def sample(k, e, s, s2, expo):
                return sample_batch(k, e, s, gen_batch, gen_keyed,
                                    mode=mode, sol_m2=s2, dtype=self.dtype,
                                    t_expo=expo)

            return sample

        # ONE jit across ALL Picard iterations: gen is normalized to i=0
        # for both the closure and the cache key, and the iteration-
        # dependent t-law exponent N - i + 1 rides in as a traced scalar.
        # With i in the key, every iteration recompiled the same graph
        # through the remote-TPU tunnel (10-20 s per iteration, measured).
        import dataclasses as _dc

        gen_keyed = _dc.replace(gen, i=0)
        jit_name = ("sample", mode, gen_keyed, gen_batch)
        jit_sample = self._jitted(jit_name, builder)
        self._log_jit_memory(
            jit_name, f"generate[{mode} B={gen_batch}]", jit_sample,
            key, self.equation, self.u_current, sol_m2,
            jnp.asarray(float(max(gen.N - gen.i + 1, 1)), self.dtype))
        with oom_advice(
                f"target generation (iteration {self.i})",
                "lower DATA.GEN_BATCH (collocation points per dispatch), "
                "lower DATA.CHUNK_ELEMS (per-chunk sample-buffer "
                "elements), or set DATA.TPU.PALLAS_GENERATE: false."):
            ds = generate_dataset(key, self.equation, self.u_current,
                                  n_total, gen, mode, sol_m2=sol_m2,
                                  gen_batch=gen_batch,
                                  sharding=self.sharding, dtype=self.dtype,
                                  jit_sample=jit_sample,
                                  t_expo=float(max(gen.N - gen.i + 1, 1)))
        if cfg.DATA.SAVE:
            ext = data_save_ext(cfg.DATA.SAVE_FORMAT)
            save_dataset(self.exp_dir / f"data_iter_{self.i}.{ext}", ds,
                         provenance=prov)
        return ds

    # ------------------------------------------------------------------
    def _make_multi_step(self):
        step_body = make_step_body(self.module, self.tx_opt, self.spec,
                                   self._opt_needs_value)

        def run_steps(state: TrainState, txs, ys, keys):
            def body(st, batch):
                tx, y, k = batch
                return step_body(st, tx, y, k)

            state, ms = jax.lax.scan(body, state, (txs, ys, keys))
            last = jax.tree_util.tree_map(lambda x: x[-1], ms)
            return state, last

        return jax.jit(run_steps, donate_argnums=(0,))

    # ------------------------------------------------------------------
    def _dispatch_epoch_chunk(self, steps: int, n_epochs: int) -> int:
        """Epochs per training dispatch, bounding steps/dispatch by
        TRAIN.DISPATCH_STEPS (default 65536, ~30 s of device time). One
        measured 800k-step dispatch (the hjb_control 100k-epoch recipe in
        a single fused scan) crashed the TPU worker mid-execution;
        chunking epochs across dispatches with the SAME per-epoch key
        streams keeps trajectories bitwise identical (tested) while every
        dispatch stays bounded. A non-divisor count simply gets a smaller
        (ragged) final chunk — one extra jit signature, not a dispatch
        per epoch. Shipped recipes (128-512 steps/iteration) keep their
        single dispatch.

        Limitation: the chunk granularity is one epoch — a SINGLE epoch
        above the bound (steps = DATA_SIZE/BATCH_SIZE > DISPATCH_STEPS)
        cannot be split and is dispatched whole, with a warning.

        TRAIN.DISPATCH_STEPS: None/absent = the default bound; 0 =
        explicitly unbounded (all epochs in one dispatch — the user
        accepts the worker-crash risk the default guards against);
        negative = config error."""
        raw = self.cfg.TRAIN.get("DISPATCH_STEPS")
        target = 65536 if raw is None else int(raw)
        if target < 0:
            raise ValueError(
                f"TRAIN.DISPATCH_STEPS must be >= 0 (0 = unbounded), "
                f"got {raw!r}")
        if target == 0:
            return n_epochs
        if steps > target and not getattr(self, "_warned_dispatch", False):
            self._warned_dispatch = True  # once per run, not per iteration
            print(f"warning: one epoch is {steps} steps > "
                  f"TRAIN.DISPATCH_STEPS ({target}); dispatches cannot be "
                  "chunked below one epoch — raise BATCH_SIZE or lower "
                  "DATA_SIZE if the device rejects long dispatches")
        ep_target = max(1, target // max(steps, 1))
        return min(n_epochs, ep_target) if n_epochs else 0

    def _make_epoch_scan(self, steps: int, bs: int, shuffle: bool):
        """All epochs of one chunk in ONE dispatch: scan(epochs) of
        scan(steps), with on-device permutation per epoch. Used when
        EVAL.FREQ is None — minimizes host round trips (the per-iteration
        wall through remote dispatch paths is latency-, not compute-,
        dominated). The caller slices the per-epoch key arrays per chunk
        (_dispatch_epoch_chunk), so chunked == unchunked bitwise."""
        step_body = make_step_body(self.module, self.tx_opt, self.spec,
                                   self._opt_needs_value)

        def run_epochs(state: TrainState, ds_tx, ds_y, shuffle_keys,
                       step_keys):
            n = ds_tx.shape[0]

            def epoch_body(st, ek):
                k_shuf, k_steps = ek
                if shuffle:
                    perm = jax.random.permutation(k_shuf, n)[: steps * bs]
                else:
                    perm = jnp.arange(steps * bs)
                txs = jnp.take(ds_tx, perm, axis=0).reshape(steps, bs, -1)
                ys = jnp.take(ds_y, perm, axis=0).reshape(steps, bs, -1)
                keys = jax.random.split(k_steps, steps)

                def body(s, batch):
                    tx, y, k = batch
                    return step_body(s, tx, y, k)

                st, ms = jax.lax.scan(body, st, (txs, ys, keys))
                return st, jax.tree_util.tree_map(lambda x: x[-1], ms)

            state, ms = jax.lax.scan(epoch_body, state,
                                     (shuffle_keys, step_keys))
            return state, jax.tree_util.tree_map(lambda x: x[-1], ms)

        return jax.jit(run_epochs, donate_argnums=(0,))

    def _make_fused_freq_scan(self, steps: int, bs: int, seg: int,
                              shuffle: bool, ep_chunk: int, eval_cfg):
        """All epochs AND the in-training eval in ONE dispatch.

        The segmented loop in _train_iteration pays, per EVAL.FREQ
        segment, a blocking metric readback plus an eval_solution call
        with its own readback — ~70 ms each through the remote-TPU
        tunnel, x16 segments/iteration in the shipped recipes (the
        dominant non-generation cost; see PERFORMANCE.md). Here the
        epoch/segment/step structure runs as nested lax.scans with the
        eval traced in at segment boundaries, and everything crosses to
        host in one readback afterwards. Key derivation (epoch fold_in,
        permutation, step-key split, eval fold_in(k_ep, 2 + s0)) matches
        the unfused loop exactly, so both paths produce the same
        trajectory (tests/test_eval_freq_path.py asserts it).

        ``eval_cfg``: None (no in-training eval; train metrics only) or
        (n_points, test_grad, test_hessian). Returns (jitted_run, names).

        ``ep_chunk`` epochs run per dispatch (_dispatch_epoch_chunk); the
        caller passes the chunk's slice of the canonical key arrays plus
        the global epoch offset ``e0`` (the eval-key stream folds in the
        GLOBAL epoch index, so chunked == unchunked bitwise).
        """
        step_body = make_step_body(self.module, self.tx_opt, self.spec,
                                   self._opt_needs_value)
        nseg = steps // seg
        names = eval_fn = None
        if eval_cfg is not None:
            from deeppicarditeration_tpu.evaluation.evaluator import (
                make_traced_eval,
            )

            names, eval_fn = make_traced_eval(*eval_cfg)
        module, net_type, nx = self.module, self.net_type, self.equation.nx

        def run(state: TrainState, ds_tx, ds_y, key, eq, e0, shuffle_keys,
                step_keys):
            n = ds_tx.shape[0]

            def epoch_body(st, ek_in):
                epoch, k_shuf, k_steps = ek_in
                k_ep = jax.random.fold_in(key, epoch)
                perm = (jax.random.permutation(k_shuf, n)
                        if shuffle else jnp.arange(n))[: steps * bs]
                txs = jnp.take(ds_tx, perm, axis=0).reshape(
                    nseg, seg, bs, -1)
                ys = jnp.take(ds_y, perm, axis=0).reshape(nseg, seg, bs, -1)
                keys = jax.random.split(k_steps, steps)
                keys = keys.reshape(nseg, seg, *keys.shape[1:])

                def seg_body(st2, seg_in):
                    txs_s, ys_s, keys_s, j = seg_in

                    def body(s, batch):
                        tx, y, k = batch
                        return step_body(s, tx, y, k)

                    st2, ms = jax.lax.scan(body, st2, (txs_s, ys_s, keys_s))
                    last = jax.tree_util.tree_map(lambda x: x[-1], ms)
                    if eval_fn is None:
                        return st2, (last, jnp.zeros((0,)))
                    sol = Solution.from_net(module, st2.params, net_type, nx)
                    ek = jax.random.fold_in(k_ep, 2 + j * seg)
                    return st2, (last, eval_fn(sol, eq, ek))

                return jax.lax.scan(seg_body, st,
                                    (txs, ys, keys, jnp.arange(nseg)))

            return jax.lax.scan(epoch_body, state,
                                (e0 + jnp.arange(ep_chunk), shuffle_keys,
                                 step_keys))

        return jax.jit(run, donate_argnums=(0,)), names

    def _run_fused_freq(self, key, state: TrainState, ds: DeviceDataset,
                        steps: int, bs: int, seg: int, n_epochs: int,
                        eval_cfg) -> TrainState:
        shuffle = self.cfg.DATA.SHUFFLE is not False
        nseg = steps // seg
        ep_chunk = self._dispatch_epoch_chunk(steps, n_epochs)
        shuffle_keys, step_keys = _train_keys(key, n_epochs)
        chunks = []
        names = None
        with step_timer("train[fused+eval]") as tm:
            for e0 in range(0, n_epochs, ep_chunk):
                n_e = min(ep_chunk, n_epochs - e0)  # ragged final chunk
                run, names = self._jitted(
                    ("fused_freq", steps, bs, seg, shuffle, n_e, eval_cfg),
                    lambda: self._make_fused_freq_scan(
                        steps, bs, seg, shuffle, n_e, eval_cfg))
                self._log_jit_memory(
                    ("fused_freq_mem", steps, bs, seg, shuffle, n_e,
                     eval_cfg),
                    f"train[fused+eval {steps}x{n_e}ep bs={bs}]", run,
                    state, ds.tx, ds.y, key, self.equation,
                    jnp.asarray(e0), shuffle_keys[e0:e0 + n_e],
                    step_keys[e0:e0 + n_e])
                state, ms = run(state, ds.tx, ds.y, key, self.equation,
                                jnp.asarray(e0),
                                shuffle_keys[e0:e0 + n_e],
                                step_keys[e0:e0 + n_e])
                chunks.append(ms)
            tm.set(chunks[-1][0])
        # ONE readback per chunk's train + eval metrics (one total in the
        # shipped recipes' single-chunk case)
        chunks = jax.device_get(chunks)
        import numpy as _np

        train_ms = {k: _np.concatenate([c[0][k] for c in chunks])
                    for k in chunks[0][0]}
        eval_vals = _np.concatenate([c[1] for c in chunks])
        start = self.global_step
        for e in range(n_epochs):
            for j in range(nseg):
                gs = start + e * steps + (j + 1) * seg
                row = {k: float(v[e, j]) for k, v in train_ms.items()}
                self.logger.log({**row, "iter": self.i, "epoch": e}, gs,
                                context="train")
                if eval_cfg is not None:
                    em = {nm: float(eval_vals[e, j, ki])
                          for ki, nm in enumerate(names)}
                    em["iter"] = self.i
                    em["lr"] = self._lr_fn(gs) * row.get("lr_scale", 1.0)
                    self.logger.log(em, gs, context="eval")
        self.global_step += n_epochs * steps
        last_loss = {k: float(v[-1, -1]) for k, v in train_ms.items()}
        self.progress.update_train(n_epochs * steps,
                                   last_loss.get("train_loss"))
        return state

    def _train_iteration(self, key, state: TrainState,
                         ds: DeviceDataset) -> TrainState:
        cfg = self.cfg
        bs = int(cfg.TRAIN.BATCH_SIZE)
        n_epochs = int(cfg.TRAIN.N_EPOCHS)
        if n_epochs <= 0:
            return state  # generation-only config: nothing to fit
        freq = cfg.EVAL.FREQ
        shuffle = cfg.DATA.SHUFFLE is not False

        if freq is None:
            # fused path: one dispatch per epoch chunk (usually one total)
            steps = ds.size // bs
            run_epochs = self._jitted(("epoch_scan", steps, bs, shuffle),
                                      lambda: self._make_epoch_scan(
                                          steps, bs, shuffle))
            shuffle_keys, step_keys = _train_keys(key, n_epochs)
            ep_chunk = self._dispatch_epoch_chunk(steps, n_epochs)
            self._log_jit_memory(
                ("epoch_scan", steps, bs, shuffle, ep_chunk),
                f"train[fused {steps}x{ep_chunk}ep bs={bs}]", run_epochs,
                state, ds.tx, ds.y, shuffle_keys[:ep_chunk],
                step_keys[:ep_chunk])
            with step_timer("train[fused]") as tm:
                for e0 in range(0, n_epochs, ep_chunk):
                    state, metrics = run_epochs(
                        state, ds.tx, ds.y,
                        shuffle_keys[e0:e0 + ep_chunk],
                        step_keys[e0:e0 + ep_chunk])
                tm.set(metrics)
            self.global_step += n_epochs * steps
            metrics = _fetch_metrics(metrics)
            self.logger.log({**metrics, "iter": self.i,
                             "epoch": n_epochs - 1},
                            self.global_step, context="train")
            self.progress.update_train(n_epochs * steps,
                                       metrics.get("train_loss"))
            return state

        steps = ds.size // bs
        seg = min(int(freq), steps)
        n_points = int(cfg.EVAL.L2_N_POINTS)
        do_eval = bool(self.equation.has_exact_solution)
        eval_bs = cfg.EVAL.BATCH_SIZE
        fused = _tri_state(cfg.TRAIN.FUSED)
        # seg > 0 guards EVAL.FREQ: 0 (falsy semantics -> no eval, unfused
        # loop) and steps == 0 (BATCH_SIZE > dataset: fall through to
        # epoch_batches' informative error) from a ZeroDivisionError here
        gate_fail = None
        if seg <= 0:
            gate_fail = ("EVAL.FREQ/steps <= 0" if freq else None)
        elif steps % seg != 0:
            gate_fail = (f"steps ({steps}) is not a multiple of "
                         f"EVAL.FREQ ({seg})")
        elif cfg.EVAL.REFERENCE_FILE:
            gate_fail = "EVAL.REFERENCE_FILE is set"
        elif do_eval and eval_bs is not None and int(eval_bs) < n_points:
            gate_fail = (f"EVAL.BATCH_SIZE ({eval_bs}) < EVAL.L2_N_POINTS "
                         f"({n_points})")
        if fused is not False and gate_fail is None and seg > 0:
            eval_cfg = ((n_points, bool(cfg.EVAL.TEST_GRAD),
                         bool(cfg.EVAL.TEST_HESSIAN)) if do_eval else None)
            return self._run_fused_freq(key, state, ds, steps, bs, seg,
                                        n_epochs, eval_cfg)
        if fused is True and gate_fail:
            # an explicit TRAIN.FUSED: true (not "auto") must not silently
            # take the slow segmented loop
            print(f"TRAIN.FUSED: true requested but unavailable "
                  f"({gate_fail}); using the segmented loop")

        run_steps = self._jitted("multi_step", self._make_multi_step)

        # canonical derivation: see _train_keys — all three training paths
        # must batch and key identically so trajectories are
        # path-independent
        shuffle_keys, step_keys_e = _train_keys(key, n_epochs)
        for epoch in range(n_epochs):
            k_ep = jax.random.fold_in(key, epoch)  # eval-key stream only
            txs, ys = epoch_batches(shuffle_keys[epoch], ds, bs,
                                    shuffle=cfg.DATA.SHUFFLE is not False)
            txs = jax.device_put(txs, self.batch_sharding)
            ys = jax.device_put(ys, self.batch_sharding)
            steps = txs.shape[0]
            keys = jax.random.split(step_keys_e[epoch], steps)
            seg = int(freq) if freq else steps
            for s0 in range(0, steps, seg):
                s1 = min(s0 + seg, steps)
                with step_timer(f"train[{s0}:{s1}]") as tm:
                    state, metrics = run_steps(state, txs[s0:s1], ys[s0:s1],
                                               keys[s0:s1])
                    tm.set(metrics)
                self.global_step += s1 - s0
                metrics = _fetch_metrics(metrics)
                self.logger.log({**metrics, "iter": self.i, "epoch": epoch},
                                self.global_step, context="train")
                self.progress.update_train(epoch * steps + s1,
                                           metrics.get("train_loss"))
                if freq and self.equation.has_exact_solution:
                    sol = Solution.from_net(self.module, state.params,
                                            self.net_type, self.equation.nx)
                    em = eval_solution(
                        jax.random.fold_in(k_ep, 2 + s0), sol, self.equation,
                        int(cfg.EVAL.L2_N_POINTS),
                        test_grad=bool(cfg.EVAL.TEST_GRAD),
                        test_hessian=bool(cfg.EVAL.TEST_HESSIAN),
                        batch_size=cfg.EVAL.BATCH_SIZE)
                    em["iter"] = self.i
                    em["lr"] = (self._lr_fn(self.global_step)
                                * metrics.get("lr_scale", 1.0))
                    self.logger.log(em, self.global_step, context="eval")
                elif freq and cfg.EVAL.REFERENCE_FILE:
                    from deeppicarditeration_tpu.evaluation.evaluator import (
                        eval_solution_against_file,
                    )

                    sol = Solution.from_net(self.module, state.params,
                                            self.net_type, self.equation.nx)
                    em = eval_solution_against_file(
                        sol, cfg.EVAL.REFERENCE_FILE, self.equation.nx,
                        batch_size=cfg.EVAL.BATCH_SIZE)
                    em["iter"] = self.i
                    self.logger.log(em, self.global_step, context="eval")
        return state

    # ------------------------------------------------------------------
    def run_one(self) -> bool:
        cfg = self.cfg
        self.i += 1
        key_iter = jax.random.fold_in(self.root_key, self.i)
        # per-iteration run grouping (wandb backend; no-op otherwise)
        self.logger.start_iteration(self.i)

        if cfg.METHOD.cls in ("PINN", "Diffusion", "FullyNonlinearSolver"):
            from deeppicarditeration_tpu.training import baselines

            baselines.run_baseline(self, key_iter)
            return True

        # fresh network (+ optional warm start, picard_iteration.py:244-251)
        sol = init_solution(jax.random.fold_in(key_iter, 0), cfg,
                            self.equation, module=self.module)
        params = sol.params
        if self.i == 1 and is_primary():  # ModelSummary parity, once/run
            print(model_summary(self.module, params))
        if cfg.NETWORK.PRETRAIN_PATH is not None and self.i == 1:
            params = ckpt.load_params(cfg.NETWORK.PRETRAIN_PATH,
                                      jax.device_put(params, self.repl))
            self.u_current = Solution.from_net(self.module, params,
                                               self.net_type,
                                               self.equation.nx)
        if cfg.NETWORK.RELOAD and self.i > 1:
            params = ckpt.load_params(ckpt.ckpt_path(self.exp_dir, self.i - 1),
                                      jax.device_put(params, self.repl))

        gen = gen_config_from_cfg(cfg, self.i, mesh=self.mesh)
        mode = self.generation_mode
        with step_timer(f"generate[iter {self.i}]") as tm:
            ds = self._make_dataset(jax.random.fold_in(key_iter, 1), gen,
                                    mode)
            tm.set(ds.y)
        self.progress.start_iteration(
            self.i, int(cfg.TRAIN.N_EPOCHS) * (ds.size
                                               // int(cfg.TRAIN.BATCH_SIZE)))

        state = TrainState.create(params, self.tx_opt)
        state = jax.device_put(state, self.repl)
        with oom_advice(
                f"training (iteration {self.i})",
                "lower TRAIN.BATCH_SIZE, lower TRAIN.DISPATCH_STEPS "
                "(optimizer steps per dispatch), or lower EVAL.BATCH_SIZE "
                "(fused in-training eval)."):
            state = self._train_iteration(jax.random.fold_in(key_iter, 2),
                                          state, ds)

        ckpt.save_params(ckpt.ckpt_path(self.exp_dir, self.i), state.params)
        self.u_current = Solution.from_net(self.module, state.params,
                                           self.net_type, self.equation.nx)
        if cfg.EVAL.PLOT and self.equation.has_exact_solution:
            self._plot_iteration_error(jax.random.fold_in(key_iter, 3))
        return True

    def _plot_iteration_error(self, key):
        """In-training |u - u_exact| scatter under the Picard t-law
        (the reference draws these only post-hoc, evaluate.py:171-212)."""
        from deeppicarditeration_tpu.evaluation.plots import plot_error
        from deeppicarditeration_tpu.ops.samplers import sample_t_picard

        eq, cfg = self.equation, self.cfg
        n = int(cfg.EVAL.PLOT_N_POINTS)
        t = sample_t_picard(jax.random.fold_in(key, 0), n, eq.T,
                            max(self.N - self.i + 1, 1))
        x = eq.sample_x(jax.random.fold_in(key, 1), t)
        tx = jnp.concatenate([t, x], axis=-1)
        # eager host-side compute: under multi-process the trained params
        # are replicated GLOBAL arrays — take the process-local replica so
        # this stays a per-host computation, and only the primary writes
        sol = (host_local_copy(self.u_current) if is_multiprocess()
               else self.u_current)
        err = jnp.abs(sol.value(tx) - eq.exact_solution(t, x))
        if is_primary():
            plot_error(self.exp_dir, t, x, err, f"iter_{self.i:03d}")

    def run(self):
        # progress bars are primary-only UX (None = the TTY auto-gate);
        # every other process keeps a disabled bar
        self.progress = PicardProgress(
            self.N, enabled=None if is_primary() else False)
        self.progress.update_completed(self.i)
        while self.i < self.N:
            try:
                if not self.run_one():
                    break
            except KeyboardInterrupt:
                print("Interrupted... stopping the Picard loop "
                      "(picard_iteration.py:290-294 semantics)")
                break
            self.u_history.append(self.u_current)
            self.progress.finish_iteration()
        self.progress.close()
        self.logger.close()
        ckpt.wait_all()  # commit any in-flight async checkpoint writes
        return self.u_current
