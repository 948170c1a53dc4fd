"""Tensor/head-parallel forward tests on the virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from dit4sr_tpu.config import MeshConfig, mmdit_tiny
from dit4sr_tpu.models.mmdit import init_mmdit
from dit4sr_tpu.parallel.mesh import make_mesh

TEXT_LEN = 8


def _inputs(cfg, batch=2):
    rng = np.random.default_rng(0)
    lat = jnp.asarray(rng.normal(size=(batch, 16, 16, cfg.in_channels)), cfg.dtype)
    ctrl = jnp.asarray(rng.normal(size=(batch, 16, 16, cfg.in_channels)), cfg.dtype)
    txt = jnp.asarray(rng.normal(size=(batch, TEXT_LEN, cfg.joint_attention_dim)), cfg.dtype)
    pool = jnp.asarray(rng.normal(size=(batch, cfg.pooled_projection_dim)), cfg.dtype)
    t = jnp.asarray(rng.uniform(0, 1000, size=(batch,)), jnp.float32)
    return lat, ctrl, txt, pool, t


def test_tensor_parallel_forward_matches_single_device():
    """Head-sharded (tensor=4) + batch-sharded (data=2) forward must equal
    the unsharded forward — XLA inserts the collectives."""
    cfg = mmdit_tiny()  # 4 heads -> tensor axis of 4 divides
    model, params = init_mmdit(jax.random.PRNGKey(0), cfg, text_len=TEXT_LEN)
    args = _inputs(cfg)

    fwd = jax.jit(lambda p, *a: model.apply(p, *a)[0])
    ref = fwd(params, *args)

    mesh = make_mesh(MeshConfig(data=2, fsdp=1, tensor=4), jax.devices()[:8])
    sharded_params = jax.device_put(params, NamedSharding(mesh, P()))
    sharded_args = [
        jax.device_put(a, NamedSharding(mesh, P("data"))) for a in args
    ]
    with mesh:
        out = fwd(sharded_params, *sharded_args)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5
    )
