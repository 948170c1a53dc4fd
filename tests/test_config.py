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
        # nested dataclass must be built (PEP 563 made f.type a string and
        # silently left `optim:` a raw dict in round 1)
        from dit4sr_tpu.config import OptimConfig

        assert isinstance(cfgs["train"].optim, OptimConfig)
        assert isinstance(cfgs["train"].optim.lr, float)
        assert cfgs["train"].optim.lr > 0


def test_yaml_numeric_string_coercion(tmp_path):
    """YAML 1.1 parses `5e-5` (no dot) as a *string*; the loader must coerce."""
    p = tmp_path / "exp.yaml"
    p.write_text(
        "train:\n"
        "  stage: stage1\n"
        "  batch_size: '8'\n"
        "  optim:\n"
        "    lr: 5e-5\n"
        "    betas: [0.9, 0.999]\n"
        "    max_grad_norm: '1.0'\n"
        "model:\n"
        "  dtype: bfloat16\n"
        "  dual_attention_layers: [0, 1]\n"
    )
    cfgs = load_yaml_config(str(p))
    t = cfgs["train"]
    assert t.optim.lr == 5e-5 and isinstance(t.optim.lr, float)
    assert t.optim.max_grad_norm == 1.0
    assert t.optim.betas == (0.9, 0.999)
    assert t.batch_size == 8 and isinstance(t.batch_size, int)
    import jax.numpy as jnp

    assert cfgs["model"].dtype == jnp.bfloat16
    assert cfgs["model"].dual_attention_layers == (0, 1)


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


def test_yaml_sampler_cache_fields(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text(
        "sampler:\n"
        "  num_inference_steps: 14\n"
        "  cache_interval: 2\n"
        "  cache_span: [12, 24]\n"
    )
    s = load_yaml_config(str(p))["sampler"]
    assert s.cache_interval == 2
    assert s.cache_span == (12, 24)
    assert all(isinstance(x, int) for x in s.cache_span)
