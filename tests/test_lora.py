"""LoRA adapters (models/lora.py): functional merge semantics, diffusers/PEFT
checkpoint conversion, and the adapter-only finetune step.

Reference surface: SD3LoraLoaderMixin on the pipeline
(pipelines/pipeline_dit4sr.py:147) + PEFT layer scaling in the transformer
forward (model_dit4sr/transformer_sd3.py:311-400). Here LoRA is a merge into
the kernels before jit, so inference costs zero."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import traverse_util

from dit4sr_tpu.config import TrainConfig, mmdit_tiny
from dit4sr_tpu.models.lora import (
    convert_sd3_lora,
    count_lora_params,
    init_lora_params,
    make_lora_train_step,
    merge_lora,
)
from dit4sr_tpu.models.mmdit import init_mmdit
from dit4sr_tpu.train.train_step import Batch


def _tiny():
    cfg = mmdit_tiny()
    model, params = init_mmdit(jax.random.PRNGKey(0), cfg, text_len=12)
    return cfg, model, params


def _inputs(cfg, b=2):
    rng = np.random.default_rng(3)
    return (
        jnp.asarray(rng.normal(size=(b, 16, 16, cfg.in_channels)), jnp.float32),
        jnp.asarray(rng.normal(size=(b, 16, 16, cfg.in_channels)), jnp.float32),
        jnp.asarray(rng.normal(size=(b, 12, cfg.joint_attention_dim)), jnp.float32),
        jnp.asarray(rng.normal(size=(b, cfg.pooled_projection_dim)), jnp.float32),
        jnp.full((b,), 500.0, jnp.float32),
    )


def test_fresh_lora_is_identity():
    cfg, model, params = _tiny()
    lora = init_lora_params(jax.random.PRNGKey(1), params, rank=4)
    merged = merge_lora(params, lora)
    # b = 0 at init -> merge must be exact identity
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(merged)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_merge_matches_manual_delta():
    _, _, params = _tiny()
    lora = init_lora_params(jax.random.PRNGKey(1), params, rank=4)
    # give b random values so deltas are nonzero
    lora = jax.tree.map(
        lambda x: x + 0.1 * jax.random.normal(jax.random.PRNGKey(2), x.shape),
        lora,
    )
    scale = 0.7
    merged = merge_lora(params, lora, scale)

    flat_p = traverse_util.flatten_dict(params)
    flat_m = traverse_util.flatten_dict(merged)
    flat_l = traverse_util.flatten_dict(lora)
    n_sites = 0
    for k in flat_p:
        if k[:-1] + ("a",) in flat_l and k[-1] == "kernel":
            want = np.asarray(flat_p[k]) + scale * (
                np.asarray(flat_l[k[:-1] + ("a",)])
                @ np.asarray(flat_l[k[:-1] + ("b",)])
            )
            np.testing.assert_allclose(
                np.asarray(flat_m[k]), want, rtol=1e-5, atol=1e-5
            )
            n_sites += 1
        else:
            np.testing.assert_array_equal(np.asarray(flat_p[k]), np.asarray(flat_m[k]))
    assert n_sites > 0


def test_lora_targets_attention_and_ffn_only():
    _, _, params = _tiny()
    lora = init_lora_params(jax.random.PRNGKey(1), params, rank=4)
    paths = {"/".join(k) for k in traverse_util.flatten_dict(lora)}
    assert any("/attn/" in p for p in paths)
    assert any("/ff/" in p for p in paths)
    # AdaLN modulation, embedders, and output head must stay un-adapted
    assert not any("norm1" in p for p in paths)
    assert not any("time_text_embed" in p for p in paths)
    assert not any("proj_out" in p.split("/")[1:2] for p in paths)


def test_convert_sd3_lora_peft_format_with_alpha():
    cfg, model, params = _tiny()
    D = cfg.inner_dim
    r = 4
    rng = np.random.default_rng(0)
    a = rng.normal(size=(r, D)).astype(np.float32)  # torch lora_A (r, in)
    b = rng.normal(size=(D, r)).astype(np.float32)  # torch lora_B (out, r)
    sd = {
        "transformer.transformer_blocks.1.attn.to_q.lora_A.weight": a,
        "transformer.transformer_blocks.1.attn.to_q.lora_B.weight": b,
        "transformer.transformer_blocks.1.attn.to_q.alpha": np.float32(8.0),
        # text-encoder entries must be ignored
        "text_encoder.x.lora_A.weight": a,
    }
    lora = convert_sd3_lora(sd)
    merged = merge_lora(params, lora, scale=1.0)
    base_k = np.asarray(params["params"]["blocks_1"]["attn"]["to_q"]["kernel"])
    got_k = np.asarray(merged["params"]["blocks_1"]["attn"]["to_q"]["kernel"])
    want = base_k + (a.T @ b.T) * (8.0 / r)  # alpha/r folded at conversion
    np.testing.assert_allclose(got_k, want, rtol=1e-5, atol=1e-6)


def test_convert_sd3_lora_kohya_format():
    cfg, _, params = _tiny()
    D = cfg.inner_dim
    r = 2
    rng = np.random.default_rng(1)
    # ff.net.0.proj: in = D, out = 4D -> down (r, in) up (out, r)
    down = rng.normal(size=(r, D)).astype(np.float32)
    up = rng.normal(size=(4 * D, r)).astype(np.float32)
    sd = {
        "transformer_blocks.0.ff.net.0.proj.lora.down.weight": down,
        "transformer_blocks.0.ff.net.0.proj.lora.up.weight": up,
    }
    lora = convert_sd3_lora(sd)
    merged = merge_lora(params, lora)
    base_k = np.asarray(params["params"]["blocks_0"]["ff"]["proj_in"]["kernel"])
    got_k = np.asarray(merged["params"]["blocks_0"]["ff"]["proj_in"]["kernel"])
    np.testing.assert_allclose(got_k, base_k + down.T @ up.T, rtol=1e-5, atol=1e-6)


def test_merged_forward_shifts_output():
    cfg, model, params = _tiny()
    lora = init_lora_params(jax.random.PRNGKey(1), params, rank=4)
    lora = jax.tree.map(
        lambda x: x + 0.05 * jax.random.normal(jax.random.PRNGKey(5), x.shape),
        lora,
    )
    inputs = _inputs(cfg)
    base_out, _ = model.apply(params, *inputs)
    lora_out, _ = model.apply(merge_lora(params, lora), *inputs)
    assert not np.allclose(np.asarray(base_out), np.asarray(lora_out))
    # scale 0 recovers the base model exactly
    zero_out, _ = model.apply(merge_lora(params, lora, scale=0.0), *inputs)
    np.testing.assert_array_equal(np.asarray(base_out), np.asarray(zero_out))


def test_lora_train_step_learns_and_freezes_base():
    cfg, model, params = _tiny()
    lora = init_lora_params(jax.random.PRNGKey(1), params, rank=4)
    assert count_lora_params(lora) > 0
    tx = optax.adam(1e-3)
    opt_state = tx.init(lora)
    tcfg = TrainConfig(stage="stage1", finetune_layer_names=())
    step = jax.jit(make_lora_train_step(model, tx, tcfg))

    hq, lq, text, pooled, _ = _inputs(cfg, b=2)
    batch = Batch(hq, lq, text, pooled)
    base_before = jax.tree.map(lambda x: np.asarray(x).copy(), params)

    losses = []
    for _ in range(8):
        lora, opt_state, metrics = step(
            lora, opt_state, params, batch, jax.random.PRNGKey(0)
        )
        losses.append(float(metrics["diff_loss"]))
    # same rng/batch reused -> a deterministic objective the adapter must descend
    assert losses[-1] < losses[0], losses
    assert all(np.isfinite(losses))
    # the base tree is an untouched argument
    for a, b in zip(jax.tree.leaves(base_before), jax.tree.leaves(params)):
        np.testing.assert_array_equal(a, np.asarray(b))
    # b is no longer zero after training
    flat_l = traverse_util.flatten_dict(lora)
    assert any(
        float(np.abs(np.asarray(v)).max()) > 0
        for k, v in flat_l.items()
        if k[-1] == "b"
    )


def test_merge_lora_skips_mismatched_sites():
    """A LoRA for a different geometry must merge what matches and skip the
    rest (crash only when nothing matches)."""
    import pytest

    cfg, _, params = _tiny()
    D = cfg.inner_dim
    rng = np.random.default_rng(0)
    sd = {
        # matches the tiny model
        "transformer.transformer_blocks.1.attn.to_q.lora_A.weight":
            rng.normal(size=(2, D)).astype(np.float32),
        "transformer.transformer_blocks.1.attn.to_q.lora_B.weight":
            rng.normal(size=(D, 2)).astype(np.float32),
        # absent block index (larger model)
        "transformer.transformer_blocks.37.attn.to_q.lora_A.weight":
            rng.normal(size=(2, D)).astype(np.float32),
        "transformer.transformer_blocks.37.attn.to_q.lora_B.weight":
            rng.normal(size=(D, 2)).astype(np.float32),
        # wrong width
        "transformer.transformer_blocks.0.attn.to_k.lora_A.weight":
            rng.normal(size=(2, 2 * D)).astype(np.float32),
        "transformer.transformer_blocks.0.attn.to_k.lora_B.weight":
            rng.normal(size=(2 * D, 2)).astype(np.float32),
    }
    merged = merge_lora(params, convert_sd3_lora(sd))
    changed = np.asarray(merged["params"]["blocks_1"]["attn"]["to_q"]["kernel"])
    base = np.asarray(params["params"]["blocks_1"]["attn"]["to_q"]["kernel"])
    assert not np.array_equal(changed, base)
    same = np.asarray(merged["params"]["blocks_0"]["attn"]["to_k"]["kernel"])
    np.testing.assert_array_equal(
        same, np.asarray(params["params"]["blocks_0"]["attn"]["to_k"]["kernel"])
    )

    # nothing matches -> loud error
    bad = {
        "transformer.transformer_blocks.99.ff.net.2.lora_A.weight":
            rng.normal(size=(2, D)).astype(np.float32),
        "transformer.transformer_blocks.99.ff.net.2.lora_B.weight":
            rng.normal(size=(D, 2)).astype(np.float32),
    }
    with pytest.raises(ValueError, match="no LoRA site matched"):
        merge_lora(params, convert_sd3_lora(bad))
