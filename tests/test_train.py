"""Training-step tests: loss math, trainability masks, mesh-sharded update."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from dit4sr_tpu.config import MeshConfig, SchedulerConfig, TrainConfig, mmdit_tiny
from dit4sr_tpu.models.mmdit import init_mmdit
from dit4sr_tpu.parallel.mesh import fsdp_shard_params, make_mesh
from dit4sr_tpu.train.train_state import (
    count_trainable,
    make_optimizer,
    partition_params,
    trainable_mask,
)
from dit4sr_tpu.train.train_step import Batch, TrainState, make_train_step

TEXT_LEN = 8


def _setup(train_kw=None):
    cfg = mmdit_tiny()
    model, params = init_mmdit(jax.random.PRNGKey(0), cfg, text_len=TEXT_LEN)
    tcfg = TrainConfig(
        stage="stage1", gradient_accumulation_steps=1, **(train_kw or {})
    )
    tx, mask = make_optimizer(params, tcfg)
    state = TrainState(
        params, tx.init(partition_params(params, mask)[0]), jnp.zeros((), jnp.int32)
    )
    step = make_train_step(model, tx, tcfg, mask=mask)
    return cfg, model, state, step, mask


def _batch(cfg, b=2, size=16):
    rng = np.random.default_rng(0)
    return Batch(
        hq_latent=jnp.asarray(rng.normal(size=(b, size, size, cfg.in_channels)), jnp.float32),
        lq_latent=jnp.asarray(rng.normal(size=(b, size, size, cfg.in_channels)), jnp.float32),
        text_embeds=jnp.asarray(rng.normal(size=(b, TEXT_LEN, cfg.joint_attention_dim)), jnp.float32),
        pooled_embeds=jnp.asarray(rng.normal(size=(b, cfg.pooled_projection_dim)), jnp.float32),
    )


def test_train_step_decreases_nothing_frozen():
    cfg, model, state, step, mask = _setup({"finetune_layer_names": ()})
    batch = _batch(cfg)
    new_state, metrics = jax.jit(step)(state, batch, jax.random.PRNGKey(1))
    assert float(metrics["diff_loss"]) > 0
    assert float(metrics["grad_norm"]) > 0
    assert int(new_state.step) == 1
    # params actually moved
    moved = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), state.params, new_state.params
    )
    assert max(jax.tree.leaves(moved)) > 0


def test_finetune_mask_freezes_non_control_params():
    cfg, model, state, step, mask = _setup()  # default control-only finetune
    train, total = count_trainable(state.params, mask)
    assert 0 < train < total
    batch = _batch(cfg)
    new_state, _ = jax.jit(step)(state, batch, jax.random.PRNGKey(1))

    from flax import traverse_util

    old = traverse_util.flatten_dict(state.params, sep="/")
    new = traverse_util.flatten_dict(new_state.params, sep="/")
    m = traverse_util.flatten_dict(mask, sep="/")
    for k in old:
        delta = float(jnp.abs(old[k] - new[k]).max())
        if m[k]:
            continue  # trainable params may or may not move (zero grads ok)
        assert delta == 0.0, f"frozen param {k} moved by {delta}"
    # at least one control param must move
    moved_control = [
        k for k in old if m[k] and float(jnp.abs(old[k] - new[k]).max()) > 0
    ]
    assert moved_control


def test_trainable_mask_substring_semantics():
    params = {"a": {"to_q_control": {"kernel": jnp.zeros(1)}, "to_q": {"kernel": jnp.zeros(1)}}}
    mask = trainable_mask(params, ("q_control",))
    assert mask["a"]["to_q_control"]["kernel"] is True
    assert mask["a"]["to_q"]["kernel"] is False


def test_data_parallel_step_matches_single_device():
    """Batch sharded over 8 CPU devices must give the same loss as one."""
    cfg, model, state, step, _ = _setup({"finetune_layer_names": ()})
    batch = _batch(cfg, b=8)
    jstep = jax.jit(step)
    _, metrics_single = jstep(state, batch, jax.random.PRNGKey(1))

    mesh = make_mesh(MeshConfig(data=8), jax.devices()[:8])
    sharded_batch = jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P("data"))), batch
    )
    sharded_params = jax.device_put(state.params, NamedSharding(mesh, P()))
    sharded_state = TrainState(sharded_params, state.opt_state, state.step)
    with mesh:
        _, metrics_dp = jstep(sharded_state, sharded_batch, jax.random.PRNGKey(1))
    np.testing.assert_allclose(
        float(metrics_single["diff_loss"]), float(metrics_dp["diff_loss"]), rtol=1e-5
    )


def test_fsdp_sharding_runs():
    cfg, model, state, step, _ = _setup({"finetune_layer_names": ()})
    mesh = make_mesh(MeshConfig(data=2, fsdp=4), jax.devices()[:8])
    shardings = fsdp_shard_params(mesh, state.params)
    params = jax.device_put(state.params, shardings)
    state = TrainState(params, state.opt_state, state.step)
    batch = jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P("data"))), _batch(cfg, b=2)
    )
    with mesh:
        new_state, metrics = jax.jit(step)(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["diff_loss"]))


def test_ema_tracks_trainable_partition_and_swaps():
    from dit4sr_tpu.train.train_step import ema_params

    cfg = mmdit_tiny()
    model, params = init_mmdit(jax.random.PRNGKey(0), cfg, text_len=TEXT_LEN)
    tcfg = TrainConfig(
        stage="stage1", gradient_accumulation_steps=1,
        finetune_layer_names=(), ema_decay=0.999,
    )
    tx, mask = make_optimizer(params, tcfg)
    t0 = partition_params(params, mask)[0]
    ema0 = jax.tree.map(lambda x: x.astype(jnp.float32), t0)
    state = TrainState(params, tx.init(t0), jnp.zeros((), jnp.int32), ema0)
    step = jax.jit(make_train_step(model, tx, tcfg, mask=mask))
    batch = _batch(cfg)

    for _ in range(3):
        state, _ = step(state, batch, jax.random.PRNGKey(1))

    t_now = partition_params(state.params, mask)[0]
    d_init = max(
        float(jnp.abs(e - i).max())
        for e, i in zip(jax.tree.leaves(state.ema), jax.tree.leaves(ema0))
    )
    d_now = max(
        float(jnp.abs(e - p).max())
        for e, p in zip(jax.tree.leaves(state.ema), jax.tree.leaves(t_now))
    )
    assert d_init > 0, "EMA never moved"
    assert d_now > 0, "EMA must lag the raw params"
    # warmup ramp: effective decay at steps 1-3 is (2/11, 3/12, 4/13), so the
    # EMA hugs the current params much more than the init
    assert d_now < d_init

    # swap: frozen/untargeted leaves identical to params, trainable = ema
    full = ema_params(state, mask)
    from flax import traverse_util

    flat_f = traverse_util.flatten_dict(full)
    flat_p = traverse_util.flatten_dict(state.params)
    flat_e = traverse_util.flatten_dict(state.ema)
    for k, v in flat_e.items():
        if v is not None:
            np.testing.assert_array_equal(np.asarray(flat_f[k]), np.asarray(v))
    assert set(flat_f) == set(flat_p)

    # ema off -> passthrough
    off = TrainState(state.params, state.opt_state, state.step)
    assert ema_params(off, mask) is state.params


def test_per_module_grad_norm_metrics():
    cfg, model, state, step, _ = _setup(
        {"finetune_layer_names": (), "log_grad_norms": True}
    )
    batch = _batch(cfg)
    _, metrics = jax.jit(step)(state, batch, jax.random.PRNGKey(1))
    gn_keys = [k for k in metrics if k.startswith("gn/")]
    assert any("blocks_0" in k for k in gn_keys), gn_keys
    total = float(metrics["grad_norm"])
    recon = float(jnp.sqrt(sum(metrics[k] ** 2 for k in gn_keys)))
    np.testing.assert_allclose(recon, total, rtol=1e-5)
