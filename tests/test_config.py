"""Tests for the yacs-compatible config system."""

import pytest

from vae2_tpu.config import get_default_config
from vae2_tpu.config.node import ConfigNode


def test_defaults_have_reference_keys():
    cfg = get_default_config()
    assert cfg.TRAIN.CLIP_LENGTH == 3
    assert cfg.MODEL.EXTRA.BASELINE_MODE == "VAE_NATIVE"
    assert cfg.DATASET.NUM_CLASSES == 3  # one RGB frame per prediction head
    assert cfg.TRAIN.IMAGE_SIZE == [256, 128]


def test_merge_from_list_and_freeze():
    cfg = get_default_config()
    cfg.merge_from_list(["TRAIN.LR", "0.1", "MODEL.NAME", "toy_fc",
                         "TRAIN.NESTEROV", "True"])
    assert cfg.TRAIN.LR == 0.1
    assert cfg.MODEL.NAME == "toy_fc"
    assert cfg.TRAIN.NESTEROV is True
    cfg.freeze()
    with pytest.raises(AttributeError):
        cfg.TRAIN.LR = 0.2
    cfg.defrost()
    cfg.TRAIN.LR = 0.2
    assert cfg.TRAIN.LR == 0.2


def test_unknown_key_rejected_but_extra_open():
    cfg = get_default_config()
    with pytest.raises(KeyError):
        cfg.merge_from_list(["TRAIN.NOPE", "1"])
    # MODEL.EXTRA is an open node (reference default.py:38)
    cfg.merge_from_list(["MODEL.EXTRA.NEW_KNOB", "7"])
    assert cfg.MODEL.EXTRA.NEW_KNOB == 7


def test_merge_from_yaml(tmp_path):
    cfg = get_default_config()
    f = tmp_path / "exp.yaml"
    f.write_text(
        "TRAIN:\n  LR: 0.005\n  IMAGE_SIZE: [512, 256]\n"
        "MODEL:\n  EXTRA:\n    Z_DIM: 16\n"
    )
    cfg.merge_from_file(str(f))
    assert cfg.TRAIN.LR == 0.005
    assert cfg.TRAIN.IMAGE_SIZE == [512, 256]
    assert cfg.MODEL.EXTRA.Z_DIM == 16


def test_clone_independent():
    cfg = get_default_config()
    c2 = cfg.clone()
    c2.TRAIN.LR = 123.0
    assert cfg.TRAIN.LR != 123.0


def test_type_coercion_errors():
    cfg = ConfigNode({"A": 1, "B": "s"})
    with pytest.raises(TypeError):
        cfg.merge_from_dict({"B": [1, 2]})
