"""Head-parallel flash attention via shard_map on the virtual CPU mesh."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dit4sr_tpu.config import MeshConfig
from dit4sr_tpu.ops.attention import attention, mha_reference
from dit4sr_tpu.parallel.mesh import make_mesh


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    from jax.experimental import pallas as pl

    orig = pl.pallas_call
    monkeypatch.setattr(pl, "pallas_call", functools.partial(orig, interpret=True))
    yield


def test_head_parallel_pallas_matches_reference():
    B, H, N, D = 2, 4, 256, 64
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (B, H, N, D), jnp.float32)
    k = jax.random.normal(ks[1], (B, H, N, D), jnp.float32)
    v = jax.random.normal(ks[2], (B, H, N, D), jnp.float32)
    ref = mha_reference(q, k, v)

    mesh = make_mesh(MeshConfig(data=2, fsdp=1, tensor=4), jax.devices()[:8])
    from jax.sharding import NamedSharding, PartitionSpec as P

    spec = NamedSharding(mesh, P("data", "tensor"))
    qs, ks_, vs = (jax.device_put(x, spec) for x in (q, k, v))
    with mesh:
        out = jax.jit(lambda q, k, v: attention(q, k, v, impl="pallas"))(qs, ks_, vs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)
