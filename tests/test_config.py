import pathlib

import pytest

from deeppicarditeration_tpu.config import Config, FrozenConfigError, default_cfg, load_cfg


def test_default_cfg_keys():
    c = default_cfg()
    assert c.EQUATION.cls == "Cha"
    assert c.TRAIN.BATCH_SIZE == 2048
    assert c.PICARD.N == 1
    assert c.MESH.AXES == ["data"]


def test_freeze():
    c = default_cfg()
    c.freeze()
    with pytest.raises(FrozenConfigError):
        c.NAME = "x"
    with pytest.raises(FrozenConfigError):
        c.TRAIN.BATCH_SIZE = 1
    c.defrost()
    c.NAME = "x"
    assert c.NAME == "x"


def test_base_chain_and_name_join(tmp_path: pathlib.Path):
    base = tmp_path / "base.yaml"
    base.write_text(
        "NAME: base\nTRAIN:\n  BATCH_SIZE: 64\n  N_EPOCHS: 3\nPICARD:\n  N: 7\n"
    )
    child = tmp_path / "child.yaml"
    child.write_text("BASE: base.yaml\nNAME: child\nTRAIN:\n  N_EPOCHS: 5\n")
    cfg = load_cfg(child)
    # deep -> shallow merge: child overrides base, base overrides default
    assert cfg.TRAIN.BATCH_SIZE == 64
    assert cfg.TRAIN.N_EPOCHS == 5
    assert cfg.PICARD.N == 7
    # NAME concatenation along the chain (reference config.py:247-254)
    assert cfg.NAME == "base_child"
    assert cfg.BASE is None


def test_cli_overrides(tmp_path):
    f = tmp_path / "c.yaml"
    f.write_text("NAME: a\n")
    cfg = load_cfg(f, ["TRAIN.BATCH_SIZE", "128", "NETWORK.NEURONS", "[32, 32]",
                      "EVAL.FREQ", "None", "DATA.FLOAT", "double"])
    assert cfg.TRAIN.BATCH_SIZE == 128
    assert cfg.NETWORK.NEURONS == [32, 32]
    assert cfg.EVAL.FREQ is None
    assert cfg.DATA.FLOAT == "double"


def test_override_base_forbidden(tmp_path):
    f = tmp_path / "c.yaml"
    f.write_text("NAME: a\n")
    with pytest.raises(ValueError):
        load_cfg(f, ["BASE", "other.yaml"])


def test_dump_roundtrip(tmp_path):
    c = default_cfg()
    c.NAME = "rt"
    p = tmp_path / "dump.yaml"
    p.write_text(c.dump())
    c2 = load_cfg(p)
    assert c2.NAME == "rt"
    assert c2.to_dict()["TRAIN"] == c.to_dict()["TRAIN"]


def test_frozen_is_recursive_and_clone_defrosts():
    c = default_cfg().freeze()
    c2 = c.clone()
    c2.TRAIN.BATCH_SIZE = 4
    assert c.TRAIN.BATCH_SIZE == 2048


def test_obsolete_reference_keys_accepted_with_warning(tmp_path):
    """The reference recipes carry GPU-memory/DataLoader keys
    (NEW_SAMPLING, N_WORKERS, MEMORY.*, PRELOAD, ...) that are meaningless
    under static-shape jit: they must load with a warning, not raise
    (reference compatibility_check pattern, config.py:119-125;
    VERDICT r1 item 3)."""
    f = tmp_path / "legacy.yaml"
    f.write_text(
        "NAME: legacy\n"
        "DATA:\n"
        "  NEW_SAMPLING: true\n"
        "  N_WORKERS: 0\n"
        "  PREFETCH_FACTOR: None\n"
        "  PRELOAD: true\n"
        "  N_BUFFER: 8\n"
        "  MEMORY:\n"
        "    RESERVED: 0.0\n"
        "    REDUCE_FACTOR: 1.0\n"
        "    REUSE: 2\n"
        "  DATA_SIZE: 128\n")
    with pytest.warns(UserWarning, match="obsolete on TPU"):
        cfg = load_cfg(f)
    assert cfg.DATA.DATA_SIZE == 128
    assert "NEW_SAMPLING" not in cfg.DATA
    assert "MEMORY" not in cfg.DATA


def test_obsolete_keys_in_cli_overrides_warn_not_raise(tmp_path):
    """Reference users pass e.g. ``DATA.N_WORKERS 0`` on the command line
    too — the shim covers CLI overrides, not only YAML files."""
    f = tmp_path / "c.yaml"
    f.write_text("NAME: a\n")
    with pytest.warns(UserWarning, match="obsolete on TPU"):
        cfg = load_cfg(f, ["DATA.N_WORKERS", "0",
                           "DATA.MEMORY.RESERVED", "0.5",
                           "TRAIN.BATCH_SIZE", "128"])
    assert cfg.TRAIN.BATCH_SIZE == 128
    assert "N_WORKERS" not in cfg.DATA


def test_yaml_none_string_normalized(tmp_path):
    """Reference YAMLs write ``BOUND: None`` — YAML parses that as the
    string 'None'; it must become null like the CLI's _parse_value does."""
    f = tmp_path / "n.yaml"
    f.write_text("NETWORK:\n  BOUND: None\nEVAL:\n  FREQ: None\n")
    cfg = load_cfg(f)
    assert cfg.NETWORK.BOUND is None
    assert cfg.EVAL.FREQ is None


def _reference_yamls():
    root = pathlib.Path("/root/reference/scripts")
    if not root.exists():
        return []
    return sorted(root.rglob("*.yaml"))


@pytest.mark.skipif(not _reference_yamls(), reason="reference not present")
def test_all_reference_yamls_load_unchanged():
    """Every shipped reference recipe loads as-is (the module docstring's
    parity claim, now true)."""
    import warnings

    for f in _reference_yamls():
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            cfg = load_cfg(f)
        assert cfg.NAME


@pytest.mark.skipif(not _reference_yamls(), reason="reference not present")
def test_reference_yamls_construct_runner(tmp_path):
    """Beyond loading: each reference recipe constructs the runner,
    equation, and GenConfig. Run in a subprocess because the recipes set
    DATA.FLOAT: double, which flips global JAX x64 on the CPU backend."""
    import json
    import os
    import subprocess
    import sys
    import textwrap

    repo = str(pathlib.Path(__file__).resolve().parent.parent)
    payload = textwrap.dedent(f"""
        import json, pathlib, sys, warnings
        sys.path.insert(0, {repo!r})
        import jax
        jax.config.update("jax_platforms", "cpu")
        from deeppicarditeration_tpu.config import load_cfg
        from deeppicarditeration_tpu.training.picard import (
            PicardRunner, gen_config_from_cfg)
        ok = []
        for f in sorted(pathlib.Path("/root/reference/scripts").rglob(
                "*.yaml")):
            with warnings.catch_warnings():
                warnings.simplefilter("ignore")
                cfg = load_cfg(f).clone()
            cfg.FORCE = True
            cfg.freeze()
            runner = PicardRunner(cfg, exp_root={str(tmp_path)!r})
            gen = gen_config_from_cfg(cfg, 1, mesh=runner.mesh)
            assert gen.n_estimate_terminal >= 1
            ok.append(f.name)
        print(json.dumps(ok))
    """)
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    out = subprocess.run([sys.executable, "-c", payload], env=env,
                         capture_output=True, text=True, timeout=600)
    assert out.returncode == 0, out.stderr[-3000:]
    names = json.loads(out.stdout.strip().splitlines()[-1])
    assert len(names) == len(_reference_yamls())


def test_typod_keys_raise(tmp_path):
    """Unknown keys in a recipe or CLI override fail loudly (yacs
    'Non-existent config key' parity); *.kwargs subtrees stay free-form."""
    import pytest

    from deeppicarditeration_tpu.config import load_cfg

    bad = tmp_path / "bad.yaml"
    bad.write_text("TRAIN:\n  BATCHSIZE: 4096\n")
    with pytest.raises(KeyError, match="Non-existent"):
        load_cfg(bad)
    ok = tmp_path / "ok.yaml"
    ok.write_text("EQUATION:\n  kwargs: {whatever_new_param: 3}\n")
    cfg = load_cfg(ok)
    assert cfg.EQUATION.kwargs.whatever_new_param == 3
    with pytest.raises(KeyError, match="Non-existent"):
        load_cfg(ok, ["TRAIN.BATCHSIZE", "64"])
    cfg = load_cfg(ok, ["DATA.kwargs.n_estimate_terminal", "4"])
    assert cfg.DATA.kwargs.n_estimate_terminal == 4
