import os
import tempfile

import pytest

from crog_tpu.config import CfgNode, load_cfg_from_cfg_file, merge_cfg_from_list

YAML = """
DATA:
  dataset: OCID-VLG
  root_path: ./datasets/OCID-VLG
TRAIN:
  input_size: 416
  word_len: 17
  fpn_in: [512, 1024, 1024]
  base_lr: 0.0001
  sync_bn: true
TEST:
  test_split: val-test
"""


def _write_cfg():
    f = tempfile.NamedTemporaryFile(
        "w", suffix=".yaml", delete=False, dir=tempfile.gettempdir()
    )
    f.write(YAML)
    f.close()
    return f.name


def test_flattening_and_attr_access():
    path = _write_cfg()
    cfg = load_cfg_from_cfg_file(path)
    os.unlink(path)
    # sections are flattened into a single namespace
    assert cfg.dataset == "OCID-VLG"
    assert cfg.input_size == 416
    assert cfg.test_split == "val-test"
    assert cfg.fpn_in == [512, 1024, 1024]
    assert isinstance(cfg, dict)
    cfg.new_key = 7
    assert cfg["new_key"] == 7


def test_opts_override_with_literal_eval():
    path = _write_cfg()
    cfg = load_cfg_from_cfg_file(path)
    os.unlink(path)
    new = merge_cfg_from_list(
        cfg, ["input_size", "224", "fpn_in", "[1,2,3]", "dataset", "foo"]
    )
    assert new.input_size == 224
    assert new.fpn_in == [1, 2, 3]
    assert new.dataset == "foo"
    # original untouched
    assert cfg.input_size == 416


def test_opts_reject_unknown_key_and_type_mismatch():
    cfg = CfgNode({"a": 1})
    with pytest.raises(AssertionError):
        merge_cfg_from_list(cfg, ["nope", "1"])
    with pytest.raises(ValueError):
        merge_cfg_from_list(cfg, ["a", "'str'"])
