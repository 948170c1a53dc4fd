"""Deformable-attention numeric parity vs torch grid_sample (the reference's
own correctness oracle, testr/adet/layers/ms_deform_attn.py:39-60)."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from dit4sr_tpu.ops.deform_attn import ms_deform_attn_core


def torch_oracle(value, spatial_shapes, sampling_locations, attention_weights):
    """Independent reimplementation of the grid_sample formulation in torch."""
    value = torch.from_numpy(value)
    sampling_locations = torch.from_numpy(sampling_locations)
    attention_weights = torch.from_numpy(attention_weights)
    N_, S_, M_, D_ = value.shape
    _, Lq_, _, L_, P_, _ = sampling_locations.shape
    splits = [h * w for h, w in spatial_shapes]
    value_list = value.split(splits, dim=1)
    grids = 2 * sampling_locations - 1
    sampled = []
    for lid, (H_, W_) in enumerate(spatial_shapes):
        v = value_list[lid].flatten(2).transpose(1, 2).reshape(N_ * M_, D_, H_, W_)
        g = grids[:, :, :, lid].transpose(1, 2).flatten(0, 1)
        s = F.grid_sample(v, g, mode="bilinear", padding_mode="zeros", align_corners=False)
        sampled.append(s)
    attention_weights = attention_weights.transpose(1, 2).reshape(N_ * M_, 1, Lq_, L_ * P_)
    out = (torch.stack(sampled, dim=-2).flatten(-2) * attention_weights).sum(-1)
    return out.view(N_, M_ * D_, Lq_).transpose(1, 2).contiguous().numpy()


@pytest.mark.parametrize("seed", [0, 1])
def test_parity_with_grid_sample(seed):
    rng = np.random.default_rng(seed)
    B, M, D, Q, P = 2, 4, 8, 10, 4
    shapes = [(8, 8), (4, 6), (4, 4), (2, 2)]
    S = sum(h * w for h, w in shapes)
    L = len(shapes)

    value = rng.normal(size=(B, S, M, D)).astype(np.float32)
    # cover in-range and out-of-range sampling locations
    loc = rng.uniform(-0.2, 1.2, size=(B, Q, M, L, P, 2)).astype(np.float32)
    w = rng.uniform(size=(B, Q, M, L, P)).astype(np.float32)
    w = w / w.sum(axis=(-2, -1), keepdims=True)

    ref = torch_oracle(value, shapes, loc, w)
    got = np.asarray(
        ms_deform_attn_core(jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(w))
    )
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_gradients_flow():
    import jax

    rng = np.random.default_rng(0)
    B, M, D, Q, P = 1, 2, 4, 5, 2
    shapes = [(4, 4), (2, 2)]
    S = sum(h * w for h, w in shapes)
    value = jnp.asarray(rng.normal(size=(B, S, M, D)), jnp.float32)
    loc = jnp.asarray(rng.uniform(0.1, 0.9, size=(B, Q, M, 2, P, 2)), jnp.float32)
    w = jnp.asarray(rng.uniform(size=(B, Q, M, 2, P)), jnp.float32)

    def f(value, loc, w):
        return jnp.sum(ms_deform_attn_core(value, shapes, loc, w) ** 2)

    gv, gl, gw = jax.grad(f, argnums=(0, 1, 2))(value, loc, w)
    for g in (gv, gl, gw):
        assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(gv).max()) > 0
    assert float(jnp.abs(gl).max()) > 0


@pytest.mark.parametrize("impl", ["pallas", "pallas_phased"])
@pytest.mark.parametrize("seed", [0, 1])
def test_pallas_matches_xla_core(seed, impl):
    """Pallas VMEM-gather kernels (interpret mode on CPU) vs the XLA core:
    values and all three gradients, including out-of-range locations. Covers
    both the looped and the phase-split variants."""
    import jax

    from dit4sr_tpu.ops.deform_attn import ms_deform_attn

    rng = np.random.default_rng(seed)
    B, M, D, Q, P = 2, 2, 8, 7, 3
    shapes = [(6, 8), (6, 8)]  # uniform levels (pallas requirement)
    S = sum(h * w for h, w in shapes)
    L = len(shapes)

    value = jnp.asarray(rng.normal(size=(B, S, M, D)), jnp.float32)
    loc = jnp.asarray(rng.uniform(-0.2, 1.2, size=(B, Q, M, L, P, 2)), jnp.float32)
    w = jnp.asarray(rng.uniform(size=(B, Q, M, L, P)), jnp.float32)
    w = w / w.sum(axis=(-2, -1), keepdims=True)

    ref = np.asarray(ms_deform_attn_core(value, shapes, loc, w))
    got = np.asarray(ms_deform_attn(value, shapes, loc, w, impl=impl))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)

    def loss(fn):
        return lambda v, l, a: jnp.sum(fn(v, shapes, l, a) ** 2)

    g_ref = jax.grad(loss(ms_deform_attn_core), argnums=(0, 1, 2))(value, loc, w)
    g_new = jax.grad(
        loss(lambda v, s, l, a: ms_deform_attn(v, s, l, a, impl=impl)),
        argnums=(0, 1, 2),
    )(value, loc, w)
    for a, b, name in zip(g_new, g_ref, ("dvalue", "dloc", "dweights")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5, err_msg=name
        )


def test_pallas_q_padding():
    """Q not a multiple of the query block exercises the pad/crop path."""
    from dit4sr_tpu.ops.deform_attn import ms_deform_attn

    rng = np.random.default_rng(3)
    B, M, D, Q, P = 1, 2, 4, 130, 2  # 130 > _QB=128 -> 2 blocks, 126 pad rows
    shapes = [(4, 4)]
    S = 16
    value = jnp.asarray(rng.normal(size=(B, S, M, D)), jnp.float32)
    loc = jnp.asarray(rng.uniform(0, 1, size=(B, Q, M, 1, P, 2)), jnp.float32)
    w = jnp.asarray(rng.uniform(size=(B, Q, M, 1, P)), jnp.float32)

    ref = np.asarray(ms_deform_attn_core(value, shapes, loc, w))
    got = np.asarray(ms_deform_attn(value, shapes, loc, w, impl="pallas"))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)
