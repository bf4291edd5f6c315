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
