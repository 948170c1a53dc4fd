"""Sharding constraints for model internals.

The reference's only parallelism is DDP (SURVEY.md §2.3). Beyond batch
sharding, the mesh's `tensor` axis can partition the joint attention across
heads and the FFN across its hidden dim — XLA inserts the ICI collectives.
These helpers are no-ops outside a mesh context, so the same model code runs
single-chip and sharded.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P


def _current_mesh():
    try:
        from jax._src.mesh import thread_resources
    except ImportError:  # pragma: no cover - older jax layout
        from jax.interpreters import pxla as thread_resources_mod

        thread_resources = thread_resources_mod.thread_resources
    mesh = thread_resources.env.physical_mesh
    return None if mesh.empty else mesh


def constrain(x: jnp.ndarray, *spec) -> jnp.ndarray:
    """with_sharding_constraint if a mesh with the named axes is active."""
    mesh = _current_mesh()
    if mesh is None:
        return x
    names = set(mesh.axis_names)
    if any(s is not None and s not in names for s in spec):
        return x
    return jax.lax.with_sharding_constraint(
        x, jax.sharding.NamedSharding(mesh, P(*spec))
    )


def shard_heads(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, N, D) attention tensors: batch over data, heads over tensor."""
    return constrain(x, ("data", "fsdp"), "tensor", None, None)


def shard_tokens(x: jnp.ndarray) -> jnp.ndarray:
    """(B, N, D) token streams: batch over data axes."""
    return constrain(x, ("data", "fsdp"), None, None)


def shard_ffn_hidden(x: jnp.ndarray) -> jnp.ndarray:
    """(B, ..., 4D) FFN hidden: split the hidden dim over tensor (rank-
    agnostic: the MMDiT carries streams on their own axis)."""
    return constrain(x, ("data", "fsdp"), *([None] * (x.ndim - 2)), "tensor")
