"""Block-wise 8-bit Adam (train/adam8bit.py) — bnb AdamW8bit parity.

Reference: initialize.py:563-590 offers bitsandbytes AdamW8bit; here the
moments are int8/uint8 with per-block fp32 scales."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from dit4sr_tpu.config import OptimConfig, TrainConfig
from dit4sr_tpu.train.adam8bit import (
    dequantize_signed,
    dequantize_sqrt,
    quantize_signed,
    quantize_sqrt,
    scale_by_adam_8bit,
)


def test_quantize_roundtrip_error_bound():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1000,)).astype(np.float32)) * 0.01
    q, s = quantize_signed(x, 256)
    assert q.dtype == jnp.int8
    back = dequantize_signed(q, s, x)
    # per-block absmax scaling: error <= absmax/254 per element
    err = np.abs(np.asarray(back - x))
    bound = np.abs(np.asarray(x)).max() / 254 + 1e-9
    assert err.max() <= bound * 1.01

    v = jnp.square(x)  # non-negative
    qv, sv = quantize_sqrt(v, 256)
    assert qv.dtype == jnp.uint8
    backv = dequantize_sqrt(qv, sv, v)
    assert np.all(np.asarray(backv) >= 0.0)
    # sqrt-domain: relative error on sqrt <= 1/510 of block max
    rootsq = np.sqrt(np.asarray(v))
    err = np.abs(np.sqrt(np.asarray(backv)) - rootsq)
    assert err.max() <= rootsq.max() / 510 * 1.01


def test_zero_leaf_and_padding():
    x = jnp.zeros((37,), jnp.float32)  # size not a block multiple
    q, s = quantize_signed(x, 16)
    assert q.shape == (3, 16)
    np.testing.assert_array_equal(np.asarray(dequantize_signed(q, s, x)), 0.0)
    qv, sv = quantize_sqrt(x, 16)
    np.testing.assert_array_equal(np.asarray(dequantize_sqrt(qv, sv, x)), 0.0)


def test_converges_like_fp32_adam():
    """Least squares: 8-bit Adam must track fp32 Adam to a close final loss."""
    rng = np.random.default_rng(1)
    A = jnp.asarray(rng.normal(size=(64, 32)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(64,)).astype(np.float32))

    def loss(w):
        return jnp.mean((A @ w["w"] - b) ** 2)

    def run(tx, steps=300):
        w = {"w": jnp.zeros((32,), jnp.float32)}
        state = tx.init(w)

        @jax.jit
        def step(w, state):
            l, g = jax.value_and_grad(loss)(w)
            upd, state = tx.update(g, state, w)
            return optax.apply_updates(w, upd), state, l

        for _ in range(steps):
            w, state, l = step(w, state)
        return float(loss(w))

    lr = 3e-2
    l8 = run(optax.chain(scale_by_adam_8bit(), optax.scale(-lr)))
    l32 = run(optax.chain(optax.scale_by_adam(), optax.scale(-lr)))
    assert l8 < l32 * 1.5 + 1e-3, f"8-bit {l8} vs fp32 {l32}"


def test_state_dtypes_and_partition_holes():
    """make_optimizer('adamw_8bit') over a partitioned tree (None holes):
    moment state is int8/uint8 and exists only for trainable leaves."""
    from dit4sr_tpu.train.train_state import make_optimizer, partition_params

    params = {
        "mmdit": {"a": {"kernel": jnp.ones((8, 8))}, "b": {"kernel": jnp.ones((4,))}},
    }
    cfg = TrainConfig(
        stage="stage1",
        finetune_layer_names=("a",),
        optim=OptimConfig(optimizer="adamw_8bit", quant_block_size=16),
    )
    tx, mask = make_optimizer(params, cfg)
    trainable, _ = partition_params(params, mask)
    state = tx.init(trainable)
    leaves = jax.tree.leaves(state)
    dtypes = {np.dtype(l.dtype) for l in leaves if hasattr(l, "dtype")}
    assert np.dtype(np.int8) in dtypes and np.dtype(np.uint8) in dtypes

    grads = jax.tree.map(lambda p: jnp.full_like(p, 0.1), trainable)
    upd, state2 = jax.jit(tx.update)(grads, state, trainable)
    for l in jax.tree.leaves(upd):
        assert np.all(np.isfinite(np.asarray(l)))


def test_8bit_in_train_step():
    """One jitted MMDiT train step with the 8-bit optimizer runs and the
    loss is finite (same harness as tests/test_train.py)."""
    from dit4sr_tpu.config import mmdit_tiny
    from dit4sr_tpu.models.mmdit import init_mmdit
    from dit4sr_tpu.train.train_state import make_optimizer
    from dit4sr_tpu.train.train_step import Batch, TrainState, make_train_step

    cfg = mmdit_tiny(feat_extract_layers=())
    model, params = init_mmdit(jax.random.PRNGKey(0), cfg, text_len=8)
    params = {"mmdit": params}
    tcfg = TrainConfig(
        stage="stage1",
        gradient_accumulation_steps=1,
        finetune_layer_names=(),
        optim=OptimConfig(optimizer="adamw_8bit"),
    )
    tx, mask = make_optimizer(params, tcfg)
    from dit4sr_tpu.train.train_state import partition_params

    state = TrainState(
        params, tx.init(partition_params(params, mask)[0]),
        jnp.zeros((), jnp.int32),
    )
    b, size = 2, 8
    batch = Batch(
        hq_latent=jnp.ones((b, size, size, cfg.in_channels)) * 0.1,
        lq_latent=jnp.ones((b, size, size, cfg.in_channels)) * 0.2,
        text_embeds=jnp.ones((b, 8, cfg.joint_attention_dim)) * 0.1,
        pooled_embeds=jnp.ones((b, cfg.pooled_projection_dim)) * 0.1,
    )
    step = jax.jit(make_train_step(model, tx, tcfg, mask=mask))
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["diff_loss"]))
