"""Ring (sequence-parallel) attention vs the dense reference, on the
8-device virtual CPU mesh (tests/conftest.py provisions the devices)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dit4sr_tpu.config import MeshConfig
from dit4sr_tpu.ops.attention import attention, mha_reference
from dit4sr_tpu.parallel.mesh import make_mesh
from dit4sr_tpu.parallel.ring_attention import ring_attention_sharded


def _qkv(B=2, H=4, N=256, D=16, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    shape = (B, H, N, D)
    return tuple(jax.random.normal(k, shape, jnp.float32) for k in ks)


@pytest.mark.parametrize("mesh_cfg", [
    MeshConfig(seq=8),
    MeshConfig(data=2, seq=4),
    MeshConfig(tensor=2, seq=4),
])
def test_ring_matches_reference(mesh_cfg):
    q, k, v = _qkv()
    ref = mha_reference(q, k, v)
    mesh = make_mesh(mesh_cfg, jax.devices()[:8])
    with mesh:
        out = jax.jit(
            lambda q, k, v: ring_attention_sharded(q, k, v, mesh)
        )(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_ring_valid_len_masks_pad_keys():
    q, k, v = _qkv(N=256)
    valid = 200
    mask = (jnp.arange(256) < valid)[None]
    ref = mha_reference(q, k, v, key_mask=mask)
    mesh = make_mesh(MeshConfig(seq=8), jax.devices()[:8])
    with mesh:
        out = jax.jit(
            lambda q, k, v: ring_attention_sharded(q, k, v, mesh, valid_len=valid)
        )(q, k, v)
    # pad-query rows are garbage in both paths; compare valid rows only
    np.testing.assert_allclose(
        np.asarray(out)[:, :, :valid], np.asarray(ref)[:, :, :valid], atol=2e-5
    )


def test_attention_auto_dispatches_to_ring():
    """ops.attention 'auto' must take the ring path when a seq>1 mesh is
    active (and produce the same values as the dense path)."""
    q, k, v = _qkv()
    ref = mha_reference(q, k, v)
    mesh = make_mesh(MeshConfig(seq=8), jax.devices()[:8])
    with mesh:
        out = jax.jit(lambda q, k, v: attention(q, k, v, impl="auto"))(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_ring_gradients_match_reference():
    q, k, v = _qkv(B=1, H=2, N=128, D=8)
    mesh = make_mesh(MeshConfig(seq=8), jax.devices()[:8])

    def loss_ring(q, k, v):
        with mesh:
            return jnp.sum(ring_attention_sharded(q, k, v, mesh) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(mha_reference(q, k, v) ** 2)

    gr = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    gd = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gr, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)


def test_mmdit_forward_matches_under_seq_mesh():
    """Full tiny-MMDiT forward: ring attention under a (data=2, seq=4) mesh
    must reproduce the unsharded output."""
    from dit4sr_tpu.config import mmdit_tiny
    from dit4sr_tpu.models.mmdit import init_mmdit

    cfg = mmdit_tiny()
    model, params = init_mmdit(jax.random.PRNGKey(0), cfg, text_len=16)
    rng = np.random.default_rng(0)
    lat = jnp.asarray(rng.normal(size=(2, 16, 16, cfg.in_channels)), jnp.float32)
    txt = jnp.asarray(rng.normal(size=(2, 16, cfg.joint_attention_dim)), jnp.float32)
    pool = jnp.asarray(rng.normal(size=(2, cfg.pooled_projection_dim)), jnp.float32)
    t = jnp.full((2,), 500.0, jnp.float32)

    def fwd(p, lat, txt, pool, t):
        out, _ = model.apply(p, lat, lat, txt, pool, t)
        return out

    base = jax.jit(fwd)(params, lat, txt, pool, t)
    mesh = make_mesh(MeshConfig(data=2, seq=4), jax.devices()[:8])
    with mesh:
        sharded = jax.jit(fwd)(params, lat, txt, pool, t)
    np.testing.assert_allclose(
        np.asarray(sharded), np.asarray(base), atol=3e-5
    )
