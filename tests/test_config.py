import textwrap

import pytest

from detzero_tpu.core import Config, cfg_from_list, cfg_from_yaml_file


def _write(tmp_path, name, body):
    p = tmp_path / name
    p.write_text(textwrap.dedent(body))
    return p


def test_base_config_include_and_override(tmp_path):
    base = _write(
        tmp_path,
        "base.yaml",
        """
        POINT_CLOUD_RANGE: [-75.2, -75.2, -2.0, 75.2, 75.2, 4.0]
        VOXEL_SIZE: [0.1, 0.1, 0.15]
        MAX_SWEEPS: 1
        """,
    )
    model = _write(
        tmp_path,
        "model.yaml",
        f"""
        DATA_CONFIG:
          _BASE_CONFIG_: {base}
          MAX_SWEEPS: 5
        MODEL:
          NAME: CenterPoint
        """,
    )
    cfg = cfg_from_yaml_file(model)
    assert cfg.DATA_CONFIG.MAX_SWEEPS == 5  # sibling overrides base
    assert cfg.DATA_CONFIG.VOXEL_SIZE == [0.1, 0.1, 0.15]
    assert cfg.MODEL.NAME == "CenterPoint"
    assert cfg.TAG == "model"


def test_cfg_from_list_type_enforcement():
    cfg = Config({"MODEL": {"LR": 0.003, "EPOCHS": 30, "TTA": False, "RANGE": [1, 2]}})
    cfg_from_list(["MODEL.LR", "0.01", "MODEL.TTA", "True", "MODEL.RANGE", "[3, 4]"], cfg)
    assert cfg.MODEL.LR == 0.01
    assert cfg.MODEL.TTA is True
    assert cfg.MODEL.RANGE == [3, 4]
    with pytest.raises(ValueError):
        cfg_from_list(["MODEL.EPOCHS", "'abc'"], cfg)


def test_cfg_from_list_new_nested_key():
    cfg = Config()
    cfg_from_list(["A.B.C", "7"], cfg)
    assert cfg.A.B.C == 7


def test_attribute_access_nested():
    c = Config({"a": {"b": [{"c": 1}]}})
    assert c.a.b[0].c == 1
    c.a.d = {"e": 2}
    assert c.a.d.e == 2
