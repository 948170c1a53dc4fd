"""GPipe pipeline parallelism (parallel/pipeline.py): the engine must be
exact vs sequential layer application — forward AND gradients — since the
schedule only reorders compute. The reference has no pipeline parallelism
at all (SURVEY.md §2.3: DDP only)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dit4sr_tpu.config import MeshConfig, mmdit_tiny
from dit4sr_tpu.models.mmdit import init_mmdit
from dit4sr_tpu.parallel.mesh import make_mesh
from dit4sr_tpu.parallel.pipeline import (
    gpipe,
    mmdit_pipeline_forward,
    stack_block_params,
)

pytestmark = pytest.mark.slow


def _toy_stack(rng, L, d):
    ws = rng.normal(size=(L, d, d)).astype(np.float32) * 0.3
    bs = rng.normal(size=(L, d)).astype(np.float32) * 0.1
    return {"w": jnp.asarray(ws), "b": jnp.asarray(bs)}


def _toy_block(p, act):
    x, aux = act
    return (jnp.tanh(x @ p["w"] + p["b"]) + aux, aux)


def _sequential(stacked, act):
    L = stacked["w"].shape[0]
    for i in range(L):
        act = _toy_block(jax.tree.map(lambda a: a[i], stacked), act)
    return act


@pytest.mark.parametrize(
    "mesh_cfg,n_dev,microbatches,data_axis",
    [
        (MeshConfig(pipe=4), 4, 4, None),
        (MeshConfig(pipe=8), 8, 2, None),
        (MeshConfig(data=2, pipe=4), 8, 2, "data"),
    ],
)
def test_gpipe_matches_sequential(mesh_cfg, n_dev, microbatches, data_axis):
    mesh = make_mesh(mesh_cfg, jax.devices()[:n_dev])
    rng = np.random.default_rng(0)
    L, d, B = 8, 16, 8
    stacked = _toy_stack(rng, L, d)
    x = jnp.asarray(rng.normal(size=(B, d)).astype(np.float32))
    aux = jnp.asarray(rng.normal(size=(B, d)).astype(np.float32))

    want, _ = _sequential(stacked, (x, aux))
    with mesh:
        got, _ = jax.jit(
            lambda s, a: gpipe(
                _toy_block, s, a, mesh,
                num_microbatches=microbatches, data_axis=data_axis,
            )
        )(stacked, (x, aux))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_gpipe_gradients_match_sequential():
    mesh = make_mesh(MeshConfig(pipe=4), jax.devices()[:4])
    rng = np.random.default_rng(1)
    L, d, B = 4, 8, 4
    stacked = _toy_stack(rng, L, d)
    x = jnp.asarray(rng.normal(size=(B, d)).astype(np.float32))
    aux = jnp.zeros((B, d), jnp.float32)

    def loss_seq(s):
        out, _ = _sequential(s, (x, aux))
        return jnp.sum(out**2)

    def loss_pipe(s):
        with mesh:
            out, _ = gpipe(
                _toy_block, s, (x, aux), mesh, num_microbatches=2
            )
        return jnp.sum(out**2)

    g_seq = jax.grad(loss_seq)(stacked)
    g_pipe = jax.jit(jax.grad(loss_pipe))(stacked)
    for k in ("w", "b"):
        np.testing.assert_allclose(
            np.asarray(g_pipe[k]), np.asarray(g_seq[k]), atol=1e-4
        )


def _uniform_cfg():
    # pipelining needs a homogeneous interior stack: no dual-attention blocks
    return mmdit_tiny(
        num_layers=5, dual_attention_layers=(), feat_extract_layers=()
    )


def test_mmdit_pipeline_forward_parity():
    cfg = _uniform_cfg()
    model, params = init_mmdit(jax.random.PRNGKey(0), cfg, text_len=12)
    mesh = make_mesh(MeshConfig(pipe=4), jax.devices()[:4])

    B = 4
    rng = np.random.default_rng(2)
    latent = jnp.asarray(
        rng.normal(size=(B, 16, 16, cfg.in_channels)).astype(np.float32)
    )
    control = jnp.asarray(
        rng.normal(size=(B, 16, 16, cfg.in_channels)).astype(np.float32)
    )
    text = jnp.asarray(
        rng.normal(size=(B, 12, cfg.joint_attention_dim)).astype(np.float32)
    )
    pooled = jnp.asarray(
        rng.normal(size=(B, cfg.pooled_projection_dim)).astype(np.float32)
    )
    t = jnp.full((B,), 500.0, jnp.float32)

    want, _ = model.apply(params, latent, control, text, pooled, t)
    with mesh:
        got = jax.jit(
            lambda p: mmdit_pipeline_forward(
                cfg, p, latent, control, text, pooled, t, mesh,
                num_microbatches=2,
            )
        )(params)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=5e-5, rtol=1e-5
    )


def test_mmdit_pipeline_grad_flows():
    cfg = _uniform_cfg()
    model, params = init_mmdit(jax.random.PRNGKey(0), cfg, text_len=12)
    mesh = make_mesh(MeshConfig(pipe=4), jax.devices()[:4])

    B = 4
    latent = jnp.ones((B, 16, 16, cfg.in_channels), jnp.float32) * 0.1
    control = jnp.ones((B, 16, 16, cfg.in_channels), jnp.float32) * 0.2
    text = jnp.ones((B, 12, cfg.joint_attention_dim), jnp.float32) * 0.1
    pooled = jnp.ones((B, cfg.pooled_projection_dim), jnp.float32) * 0.1
    t = jnp.full((B,), 500.0, jnp.float32)

    def loss_pipe(p):
        with mesh:
            out = mmdit_pipeline_forward(
                cfg, p, latent, control, text, pooled, t, mesh,
                num_microbatches=2,
            )
        return jnp.mean(out**2)

    def loss_seq(p):
        out, _ = model.apply(p, latent, control, text, pooled, t)
        return jnp.mean(out**2)

    g_pipe = jax.jit(jax.grad(loss_pipe))(params)
    g_seq = jax.grad(loss_seq)(params)
    # a pipelined interior block and the replicated head must both match
    for path in ("blocks_1", "proj_out"):
        gp = jax.tree.leaves(g_pipe["params"][path])
        gs = jax.tree.leaves(g_seq["params"][path])
        for a, b in zip(gp, gs):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=5e-5, rtol=1e-4
            )


def _pipeline_inputs(cfg, B=4, seed=2):
    rng = np.random.default_rng(seed)
    return (
        jnp.asarray(rng.normal(size=(B, 16, 16, cfg.in_channels)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(B, 16, 16, cfg.in_channels)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(B, 12, cfg.joint_attention_dim)).astype(np.float32)),
        jnp.asarray(rng.normal(size=(B, cfg.pooled_projection_dim)).astype(np.float32)),
        jnp.full((B,), 500.0, jnp.float32),
    )


@pytest.mark.parametrize(
    "num_layers,dual",
    [
        (5, (0, 1)),        # flagship pattern: dual prefix, interior L=4 = S
        (6, (0, 1, 2)),     # interior L=5, NOT divisible by S=4 -> zero-pad
    ],
)
def test_mmdit_pipeline_heterogeneous_parity(num_layers, dual):
    """The flagship SD3.5 block pattern (dual-attention prefix,
    transformer_sd3.py:63-114) must pipeline exactly: plain layers embed
    into the dual structure with zero padding, layer count pads to the
    stage multiple with identity (all-zero) blocks."""
    cfg = mmdit_tiny(
        num_layers=num_layers, dual_attention_layers=dual,
        feat_extract_layers=(),
    )
    model, params = init_mmdit(jax.random.PRNGKey(0), cfg, text_len=12)
    mesh = make_mesh(MeshConfig(pipe=4), jax.devices()[:4])
    latent, control, text, pooled, t = _pipeline_inputs(cfg)

    want, _ = model.apply(params, latent, control, text, pooled, t)
    with mesh:
        got = jax.jit(
            lambda p: mmdit_pipeline_forward(
                cfg, p, latent, control, text, pooled, t, mesh,
                num_microbatches=2,
            )
        )(params)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=5e-5, rtol=1e-5
    )


def test_mmdit_pipeline_heterogeneous_grads():
    """Gradients through the homogenized stack must land on the ORIGINAL
    param shapes (the pad/slice adjoints route them back) and match the
    unpipelined model for both block kinds."""
    cfg = mmdit_tiny(
        num_layers=5, dual_attention_layers=(0, 1), feat_extract_layers=()
    )
    model, params = init_mmdit(jax.random.PRNGKey(0), cfg, text_len=12)
    mesh = make_mesh(MeshConfig(pipe=4), jax.devices()[:4])
    latent, control, text, pooled, t = _pipeline_inputs(cfg)

    def loss_pipe(p):
        with mesh:
            out = mmdit_pipeline_forward(
                cfg, p, latent, control, text, pooled, t, mesh,
                num_microbatches=2,
            )
        return jnp.mean(out**2)

    def loss_seq(p):
        out, _ = model.apply(p, latent, control, text, pooled, t)
        return jnp.mean(out**2)

    g_pipe = jax.jit(jax.grad(loss_pipe))(params)
    g_seq = jax.grad(loss_seq)(params)
    # blocks_1 is dual, blocks_2 plain-in-padded-form, head replicated
    for path in ("blocks_1", "blocks_2", "proj_out"):
        gp = jax.tree.leaves(g_pipe["params"][path])
        gs = jax.tree.leaves(g_seq["params"][path])
        assert len(gp) == len(gs)
        for a, b in zip(gp, gs):
            assert a.shape == b.shape
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=5e-5, rtol=1e-4
            )
