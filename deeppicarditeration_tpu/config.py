"""Config system: YAML tree with single-inheritance ``BASE:`` chains.

Behavioral parity with the reference config layer
(/root/reference/picard/config.py:229-266): configs may point at a parent
file via ``BASE:``; chains are resolved deep -> shallow; ``NAME`` fields are
concatenated along the chain; CLI ``KEY.SUBKEY value`` overrides are merged
last and may not touch ``BASE``; the result is frozen.

The schema keeps the reference's key layout (EQUATION/METHOD/PICARD/TRAIN/
NETWORK/DATA/EVAL/LOGGING) so reference users can port run recipes
unchanged: the GPU-memory-probing / DataLoader keys those recipes carry
(NEW_SAMPLING, N_WORKERS, MEMORY.*, PRELOAD, ...) are meaningless under
static-shape jit and are accepted-and-warned (_OBSOLETE_KEYS — the
reference's own deprecation-shim pattern, config.py:119-125); every YAML
under /root/reference/scripts loads as-is (tests/test_config.py). TPU-
specific keys (MESH, chunking, precision policy) are additions.
"""

from __future__ import annotations

import ast
import copy
import pathlib
from typing import Any, Dict, List, Optional

import yaml


class FrozenConfigError(AttributeError):
    pass


class Config(dict):
    """A nested attribute-accessible dict that can be frozen."""

    _FROZEN_KEY = "__frozen__"

    def __init__(self, init: Optional[Dict[str, Any]] = None):
        super().__init__()
        object.__setattr__(self, "_frozen", False)
        if init:
            for k, v in init.items():
                self[k] = self._wrap(v)

    @classmethod
    def _wrap(cls, value):
        if isinstance(value, Config):
            return value
        if isinstance(value, dict):
            return cls(value)
        if isinstance(value, list):
            return [cls._wrap(v) for v in value]
        return value

    # --- attribute access -------------------------------------------------
    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name, value):
        if object.__getattribute__(self, "_frozen"):
            raise FrozenConfigError(f"Config is frozen; cannot set {name}")
        self[name] = self._wrap(value)

    def __setitem__(self, name, value):
        if object.__getattribute__(self, "_frozen"):
            raise FrozenConfigError(f"Config is frozen; cannot set {name}")
        super().__setitem__(name, self._wrap(value))

    # --- freeze -----------------------------------------------------------
    def freeze(self):
        object.__setattr__(self, "_frozen", True)
        for v in self.values():
            if isinstance(v, Config):
                v.freeze()
        return self

    def defrost(self):
        object.__setattr__(self, "_frozen", False)
        for v in self.values():
            if isinstance(v, Config):
                v.defrost()
        return self

    def clone(self) -> "Config":
        return Config(copy.deepcopy(self.to_dict()))

    def to_dict(self) -> Dict[str, Any]:
        out = {}
        for k, v in self.items():
            if isinstance(v, Config):
                out[k] = v.to_dict()
            elif isinstance(v, list):
                out[k] = [x.to_dict() if isinstance(x, Config) else x for x in v]
            else:
                out[k] = v
        return out

    def dump(self) -> str:
        return yaml.safe_dump(self.to_dict(), sort_keys=False)

    # --- merging ----------------------------------------------------------
    # Nodes holding arbitrary user-defined keys (exempt from strict-key
    # checking): every *.kwargs subtree.
    _FREEFORM = ("kwargs",)

    def merge(self, other: Dict[str, Any], allow_new: bool = True):
        """Recursively merge ``other`` into self (other wins).

        With allow_new=False a key absent from the default tree raises
        (yacs "Non-existent config key" parity, so typo'd recipe keys
        fail loudly) — except inside free-form ``kwargs`` subtrees."""
        if object.__getattribute__(self, "_frozen"):
            raise FrozenConfigError("Config is frozen; cannot merge")
        for k, v in other.items():
            if isinstance(v, dict) and isinstance(self.get(k), Config):
                self[k].merge(v, allow_new=allow_new or k in self._FREEFORM)
            else:
                if not allow_new and k not in self:
                    raise KeyError(f"Non-existent config key: {k}")
                self[k] = self._wrap(v)
        return self

    def merge_from_list(self, override: List[str]):
        """Merge ``["KEY.SUBKEY", "value", ...]`` pairs (CLI overrides).
        Unknown keys raise unless under a free-form kwargs subtree;
        obsolete reference keys warn and are ignored (same shim as YAML
        loading — reference users pass e.g. ``DATA.N_WORKERS 0``)."""
        assert len(override) % 2 == 0, "override list must be key/value pairs"
        for key, raw in zip(override[::2], override[1::2]):
            key = key.lstrip("-")
            if any(key == k or key.startswith(k + ".")
                   for k in _OBSOLETE_KEYS):
                import warnings

                warnings.warn(
                    f"config key {key} is obsolete on TPU; accepted for "
                    "reference-recipe compatibility and ignored",
                    stacklevel=2)
                continue
            node = self
            parts = key.split(".")
            for p in parts[:-1]:
                node = node[p]
            if (parts[-1] not in node
                    and not any(p in self._FREEFORM for p in parts[:-1])):
                raise KeyError(f"Non-existent config key: {key}")
            node[parts[-1]] = _parse_value(raw)
        return self


def _parse_value(raw: str) -> Any:
    """Parse a CLI override value: try python literal, fall back to str."""
    if raw in ("None", "none", "null"):
        return None
    if raw in ("true", "True"):
        return True
    if raw in ("false", "False"):
        return False
    try:
        return ast.literal_eval(raw)
    except (ValueError, SyntaxError):
        return raw


def wants_float64(float_value) -> bool:
    """DATA.FLOAT string table (reference get_standard_float_dtype,
    config.py:170-195): truthy for the double family."""
    return str(float_value).strip().lower() in (
        "double", "float64", "f64", "64")


def default_cfg() -> Config:
    """The fully-specified default tree (reference parity: config.py:9-116)."""
    c = Config()
    c.BASE = None
    c.FORCE = False
    # Continue an interrupted run from its latest per-iteration checkpoint
    # (improvement over the reference, which only has FORCE-or-fail,
    # picard_iteration.py:124-141).
    c.RESUME = False
    c.NAME = "exp"
    c.SEED = 0

    c.EQUATION = Config()
    c.EQUATION.cls = "Cha"
    c.EQUATION.kwargs = Config()

    c.METHOD = Config()
    c.METHOD.cls = "Picard"  # Picard | PINN | Diffusion | FullyNonlinearSolver
    c.METHOD.num_v_samples = 16  # Hutchinson probes; -1 => exact laplacian
    c.METHOD.K = 20  # rollout steps (Diffusion baseline)
    c.METHOD.dt = 0.005
    c.METHOD.num_sub_iter = 100  # DBDP sub-iterations per timestep

    c.PICARD = Config()
    c.PICARD.N = 1
    c.PICARD.FORMULA = None  # None | "TwoLayer"

    c.TRAIN = Config()
    c.TRAIN.BATCH_SIZE = 2048
    c.TRAIN.N_EPOCHS = 1
    c.TRAIN.SUPERVISE_GRADIENT = None
    c.TRAIN.SUPERVISE_HESSIAN = None
    c.TRAIN.NUM_HESS_SAMPLES = -1
    # Fuse the EVAL.FREQ-segmented fit AND its in-training eval into ONE
    # jitted scan per Picard iteration ("auto"/true/false). The unfused
    # loop pays a blocking metric readback + an eval dispatch per segment
    # (~70 ms each through a remote-TPU tunnel; 16 segments/iteration in
    # the shipped recipes). Key derivation matches the unfused loop
    # exactly, so the two paths produce identical trajectories; "auto"
    # falls back to the loop when EVAL.REFERENCE_FILE is set, when steps
    # is not a multiple of EVAL.FREQ, or when EVAL.BATCH_SIZE asks for
    # eval chunking the fused graph does not do.
    c.TRAIN.FUSED = "auto"
    # Upper bound on train steps per device dispatch. The fused paths
    # split an iteration's epochs into equal chunks below this bound with
    # identical per-epoch key streams (bitwise-equal trajectories); a
    # single 800k-step dispatch (hjb_control's 100k epochs in one scan)
    # was measured to crash the TPU worker mid-execution. 65536 steps
    # ~= 30 s of device time on the shipped nets; recipes with
    # steps/iteration below the bound keep their single dispatch.
    c.TRAIN.DISPATCH_STEPS = 65536
    c.TRAIN.LOSS = Config()
    c.TRAIN.LOSS.beta = 0.0  # exp(beta * t) sample weighting
    c.TRAIN.LOSS.SCALER = Config()
    c.TRAIN.LOSS.SCALER.cls = None
    c.TRAIN.LOSS.SCALER.kwargs = Config()
    c.TRAIN.LOSS.FN = Config()
    c.TRAIN.LOSS.FN.cls = None  # None => square; "LossFnLinearClip" => huber-ish
    c.TRAIN.LOSS.FN.kwargs = Config()
    c.TRAIN.LOSS.use_aux_loss = False
    c.TRAIN.LOSS.weight_aux_loss = 0.1
    c.TRAIN.OPTIMIZER = Config()
    c.TRAIN.OPTIMIZER.cls = "Adam"
    c.TRAIN.OPTIMIZER.kwargs = Config()
    c.TRAIN.OPTIMIZER.SCHEDULER = Config()
    c.TRAIN.OPTIMIZER.SCHEDULER.cls = None
    c.TRAIN.OPTIMIZER.SCHEDULER.kwargs = Config()
    c.TRAIN.OPTIMIZER.SCHEDULER.config = Config()

    c.NETWORK = Config()
    c.NETWORK.cls = None  # None => PicardSolution
    c.NETWORK.TYPE = "Value"  # Value | ValueGradient | OnlyGradient
    c.NETWORK.NEURONS = [10, 10]
    c.NETWORK.ACTIVATIONS = ["Tanh", "Tanh"]
    c.NETWORK.BOUND = None
    c.NETWORK.RELOAD = False
    c.NETWORK.PISGRADNET = False
    c.NETWORK.PRETRAIN_PATH = None
    c.NETWORK.kwargs = Config()

    c.DATA = Config()
    c.DATA.kwargs = Config()  # t_always_uniform, n_estimate_terminal/integral
    c.DATA.SAVE = False
    c.DATA.SAVE_FORMAT = "npz"  # "npz" | "h5"/"hdf5" (reference H5 layout;
    # validated by data.dataset.data_save_ext, needs the h5py extra)
    c.DATA.ONLINE = True
    c.DATA.TRAIN_FILE = ""
    c.DATA.DATA_SIZE = 2048 * 5000
    c.DATA.DEVICE = None  # unused on TPU; kept for recipe compatibility
    c.DATA.FLOAT = "float"  # "float" | "double" (double only honored on CPU)
    c.DATA.EXACT = False
    c.DATA.SHUFFLE = None
    c.DATA.HESSIAN_APPROXIMATION = Config()
    c.DATA.HESSIAN_APPROXIMATION.method = None  # None | "SDGD"
    c.DATA.HESSIAN_APPROXIMATION.kwargs = Config()
    c.DATA.SAMPLE_BOUND = None
    # estimator-type strings; their only live effect in the reference is the
    # epsilon of the uniform t-sampler (data.py:134-137): eps = 0.01 iff
    # "ByGx" in ESTIMATE_TERMINAL or "Joint" in ESTIMATE_INTEGRAL. The
    # shipped defaults hit that branch, so t ~ U[0.01, T - 0.01].
    c.DATA.ESTIMATE_TERMINAL = "OU_ByGx"
    c.DATA.ESTIMATE_INTEGRAL = "OU_Simple"
    c.DATA.ESTIMATE_DELTA_T = 0.0  # >0 => TD-style short-horizon estimators
    # TPU-specific: static per-step MC chunk (replaces the reference's
    # OOM-probing GPUMemoryTracker, memory.py:117-208 -- static shapes
    # make ahead-of-time sizing exact).
    c.DATA.CHUNK_ELEMS = 2 ** 22  # target batch*m_chunk elements per scan step
    # Collocation points per generation DISPATCH. None (default) derives a
    # bound from CHUNK_ELEMS (data.dataset.default_gen_batch) so that the
    # reference-default DATA_SIZE = 10.24M generates in bounded dispatches
    # with a sane per-step MC chunk instead of one jit whose B*nx alone
    # exceeds CHUNK_ELEMS (mc degenerates to 1 and every scan step
    # materializes a multi-GB intermediate).
    c.DATA.GEN_BATCH = None
    # TPU estimator-kernel switches (GenConfig flags; see ops/estimators.py
    # and ops/pallas_kernels.py; defaults reflect measured v5e A/Bs)
    c.DATA.TPU = Config()
    c.DATA.TPU.ANTITHETIC = False  # +/- dW pairs: half the draws
    c.DATA.TPU.PRNG = False  # hardware-PRNG normals kernel (off: threefry)
    c.DATA.TPU.PALLAS_TERMINAL = False  # fused VMEM terminal estimator
    c.DATA.TPU.PALLAS_INTEGRAL = False  # fused VMEM integral estimator
    # Merged terminal+integral estimator kernel: false | true | auto.
    # "auto" (default) takes the kernel on TPU when the frozen net fits
    # the VMEM budget — the measured net win at full-f32 matmul precision
    # (BASELINE.md "Fused Pallas estimator kernels"). Oversized nets
    # (e.g. 4x512 PISGradNet) stay on the XLA scan path automatically.
    c.DATA.TPU.PALLAS_GENERATE = "auto"
    # In-kernel matmul precision of the merged kernel's frozen-net dots:
    # bf16x3 (emulated f32; Burgers default — the kernel is VPU-bound
    # there so the passes are free) | default (1-pass bf16; 3x less MXU
    # work — the measured choice for MXU-bound wide nets like the HJB
    # 4x512 PISGradNet) | highest (full f32).
    c.DATA.TPU.PALLAS_PRECISION = "bf16x3"
    # In-kernel activation storage for the merged kernel's frozen net:
    # null = f32 | bf16 (flax compute-dtype bf16 on the Dense layers —
    # halves the activation/vjp-residual VMEM share so wide nets admit
    # larger batch tiles; only meaningful with PALLAS_PRECISION default,
    # where the dot operands are bf16 on the MXU anyway).
    c.DATA.TPU.PALLAS_ACT = None
    # Baseline K-step path rollouts: fused in-kernel-PRNG+cumsum Pallas
    # path generator (ops/rollout.py). Off: closed-form XLA draw+cumsum
    # (already scan-free; measured on-par — see rollout.py docstring).
    c.DATA.TPU.PALLAS_ROLLOUT = False
    # Storage dtype for the second-order-backprop Hessian chain's
    # (R, w, w) G blocks (FN/SDGD generation, derivatives.py):
    # null = f32 | bf16 (halves HBM bytes on that bandwidth-bound path;
    # MXU consumes bf16 natively with f32 accumulation).
    c.DATA.TPU.HESSIAN_STORE = None

    c.MESH = Config()
    c.MESH.AXES = ["data"]
    c.MESH.SHAPE = None  # None => all local devices on one axis

    # Matmul precision on the MXU: "default" (1-pass bf16), "high"
    # (3-pass bf16), "float32"/"highest" (full f32), "tensorfloat32".
    # Measured on v5e (scripts/check_matmul_precision.py): "highest" costs
    # ~18% wall on the XLA generation path but removes a ~0.3% value /
    # ~3% gradient-head rounding divergence — accuracy wins (PRECISION.md).
    # The merged Pallas estimator kernel (PALLAS_GENERATE: auto) avoids
    # the trade: bf16x3 emulated-f32 dots, faster than even lossy bf16.
    c.PRECISION = Config()
    c.PRECISION.MATMUL = "highest"

    c.LOGGING = Config()
    c.LOGGING.LOGGER = "jsonl"  # jsonl | tensorboard | none
    c.LOGGING.kwargs = Config()
    c.LOGGING.TENSORBOARD_DIR = "tensorboard"

    c.EVAL = Config()
    c.EVAL.L2_N_POINTS = 10_000
    c.EVAL.FREQ = None
    c.EVAL.BATCH_SIZE = None
    c.EVAL.TEST_GRAD = False
    c.EVAL.TEST_HESSIAN = False
    # Per-iteration |u - u_exact| scatter plots during training (the
    # reference only draws these post-hoc, evaluate.py:171-212).
    c.EVAL.PLOT = False
    c.EVAL.PLOT_N_POINTS = 2000
    # Precomputed reference-solution file for equations without a closed
    # form (EvalCallback fallback, utils.py:343-353): npy columns
    # [t, x(nx), u[, u_x(nx)]] or npz with tx/u[/ux].
    c.EVAL.REFERENCE_FILE = None
    return c


# Reference config keys accepted for recipe compatibility but with no TPU
# meaning (reference compatibility_check analogue, config.py:119-125): the
# GPU-memory-autosizing / DataLoader-worker machinery collapses under
# static-shape jit generation (survey §7.1.3), and USE_T_EMBEDDING is dead
# in the reference itself (defined config.py:64, never read). These are
# stripped from loaded YAMLs with a warning so every shipped reference
# recipe loads unchanged; dotted paths name either a leaf or a whole
# subtree.
_OBSOLETE_KEYS = {
    "DATA.N_WORKERS": "DataLoader workers — generation is one sharded jit",
    "DATA.PREFETCH_FACTOR": "DataLoader prefetch — no host dataloader",
    "DATA.PRELOAD": "cache preload — the dataset is HBM-resident",
    "DATA.PRELOAD_N_WORKERS": "cache preload — the dataset is HBM-resident",
    "DATA.NEW_SAMPLING": "OOM-probe chunk sizing — DATA.CHUNK_ELEMS is "
                         "static and exact under jit",
    "DATA.N_BUFFER": "buffer autosizing — static shapes",
    "DATA.RESERVED_MEMORY": "GPU-memory reservation — no CUDA allocator",
    "DATA.MEMORY": "GPU-memory autosizing subtree — no CUDA allocator",
    "NETWORK.USE_T_EMBEDDING": "dead key (never read by the reference "
                               "either)",
}


def _strip_obsolete(raw: Dict[str, Any], path: str = "",
                    warned: Optional[set] = None) -> Dict[str, Any]:
    """Drop-and-warn obsolete reference keys from a raw YAML dict."""
    import warnings

    out = {}
    for k, v in (raw or {}).items():
        p = f"{path}.{k}" if path else k
        if p in _OBSOLETE_KEYS:
            if warned is None or p not in warned:
                warnings.warn(
                    f"config key {p} is obsolete on TPU ({_OBSOLETE_KEYS[p]})"
                    "; accepted for reference-recipe compatibility and "
                    "ignored", stacklevel=2)
                if warned is not None:
                    warned.add(p)
            continue
        if isinstance(v, dict):
            v = _strip_obsolete(v, p, warned)
        out[k] = v
    return out


def _normalize_none(obj):
    """Map bare "None" strings to null (recursively).

    The reference YAMLs write ``BOUND: None`` / ``PREFETCH_FACTOR: None``,
    which YAML parses as the *string* 'None'; yacs's type coercion lets
    those through against None defaults, so recipe files rely on it. Same
    treatment as CLI overrides (_parse_value)."""
    if isinstance(obj, dict):
        return {k: _normalize_none(v) for k, v in obj.items()}
    if isinstance(obj, list):
        return [_normalize_none(v) for v in obj]
    if obj in ("None", "none", "null"):
        return None
    return obj


def _read_yaml(path: pathlib.Path) -> Dict[str, Any]:
    with open(path) as f:
        return _normalize_none(yaml.safe_load(f) or {})


def load_cfg(cfg_file, override: Optional[List[str]] = None) -> Config:
    """Load a config file, resolving its BASE chain and applying overrides.

    BASE paths are resolved relative to the file that references them.
    NAME values along the chain are joined with underscores
    (reference parity: config.py:247-254).
    """
    cfg_file = pathlib.Path(cfg_file)
    chain = []  # shallow -> deep
    path = cfg_file
    seen = set()
    while path is not None:
        path = path.resolve()
        if path in seen:
            raise ValueError(f"Circular BASE chain at {path}")
        seen.add(path)
        raw = _read_yaml(path)
        chain.append(raw)
        base = raw.get("BASE")
        path = (path.parent / base) if base else None

    cfg = default_cfg()
    names = []
    warned: set = set()
    for raw in reversed(chain):  # deep -> shallow
        raw = _strip_obsolete(dict(raw), warned=warned)
        raw.pop("BASE", None)
        if "NAME" in raw:
            names.append(raw["NAME"])
        cfg.merge(raw, allow_new=False)
    cfg.NAME = "_".join(names) if names else cfg.NAME
    cfg.BASE = None

    if override:
        for k in override[::2]:
            if k.lstrip("-").split(".")[0] == "BASE":
                raise ValueError("override should not contain BASE")
        cfg.merge_from_list(override)
    cfg.freeze()
    return cfg
