"""Config system tests: YAML loading of the shipped experiment files."""

import glob

import pytest

from dit4sr_tpu.config import (
    MMDiTConfig,
    TrainConfig,
    load_yaml_config,
    mmdit_base,
    mmdit_ocr2hq,
    mmdit_ocr2hq2ocr,
)


@pytest.mark.parametrize("path", sorted(glob.glob("configs/*.yaml")))
def test_shipped_configs_load(path):
    cfgs = load_yaml_config(path)
    assert cfgs, f"no sections parsed from {path}"
    if "model" in cfgs:
        assert isinstance(cfgs["model"], MMDiTConfig)
        assert cfgs["model"].streams[0] == "hq"
    if "train" in cfgs:
        assert isinstance(cfgs["train"], TrainConfig)


def test_variant_presets():
    assert mmdit_base().num_streams == 2
    assert mmdit_ocr2hq().num_streams == 3
    assert mmdit_ocr2hq2ocr().ffn_couplings[-1] == ("hq", "ocr")
    # SD3.5-medium geometry pinned
    cfg = mmdit_base()
    assert cfg.inner_dim == 1536
    assert cfg.num_layers == 24
    assert cfg.dual_attention_layers == tuple(range(13))


def test_with_override():
    cfg = mmdit_base().with_(num_layers=2)
    assert cfg.num_layers == 2
    assert mmdit_base().num_layers == 24  # frozen original unchanged
