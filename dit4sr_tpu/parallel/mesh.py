"""Device mesh + sharding rules.

The reference's only parallelism is single-node DDP via HF Accelerate + NCCL
(SURVEY.md §2.3, initialize.py:96-103). Here the whole strategy is one
`jax.sharding.Mesh` with three logical axes:

  * data   — batch sharding (replaces DDP; XLA all-reduces grads over ICI)
  * fsdp   — parameter/optimizer sharding (capability the reference lacks)
  * tensor — reserved for tensor/sequence sharding of the 2048-3226-token
             joint attention on larger meshes

Multi-host runs reuse the same program over a multi-slice mesh; there is no
per-library distributed init (jax.distributed.initialize handles rendezvous).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dit4sr_tpu.config import MeshConfig


def make_mesh(cfg: Optional[MeshConfig] = None, devices=None) -> Mesh:
    """Build a mesh. With cfg=None, put all devices on the data axis."""
    devices = devices if devices is not None else jax.devices()
    if cfg is None:
        cfg = MeshConfig(data=len(devices))
    n = int(np.prod(cfg.shape))
    if n != len(devices):
        raise ValueError(
            f"mesh shape {cfg.shape} needs {n} devices, have {len(devices)}"
        )
    arr = np.asarray(devices).reshape(cfg.shape)
    return Mesh(arr, cfg.axis_names)


def shard_batch(mesh: Mesh) -> NamedSharding:
    """Batch-dim sharding over (data, fsdp) — the DP replacement."""
    return NamedSharding(mesh, P(("data", "fsdp")))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def fsdp_shard_params(mesh: Mesh, params):
    """Shard every large 2D+ param's largest divisible axis over 'fsdp';
    replicate the rest. Gives ZeRO-3-style memory scaling for free — the
    reference has no equivalent (no FSDP/ZeRO, SURVEY.md §2.3)."""
    fsdp = mesh.shape["fsdp"]

    def spec_for(x):
        if fsdp == 1 or x.ndim < 2:
            return NamedSharding(mesh, P())
        # shard the largest axis divisible by the fsdp size
        axes = sorted(range(x.ndim), key=lambda a: -x.shape[a])
        for a in axes:
            if x.shape[a] % fsdp == 0 and x.shape[a] >= 2 * fsdp:
                spec = [None] * x.ndim
                spec[a] = "fsdp"
                return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree.map(spec_for, params)
