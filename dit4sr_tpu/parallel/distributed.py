"""Multi-host bootstrap: one call before building the mesh.

The reference's distributed init is accelerate/NCCL process spawning plus
vendored SLURM helpers (SURVEY.md §2.3, basicsr/utils/dist_util.py). On TPU
there is no per-library init: every host runs the SAME pjit program and the
runtime just needs rendezvous. `maybe_initialize_multihost()` performs it
when (and only when) a multi-host environment is detected, so single-host
runs — and the CI CPU mesh — are untouched.

Detection order:
  * TPU pods: `jax.distributed.initialize()` with no args — the TPU runtime
    autodetects coordinator/process count from the pod metadata.
  * generic clusters: JAX_COORDINATOR_ADDRESS (+ JAX_NUM_PROCESSES and
    JAX_PROCESS_ID) env vars, mirroring jax's own cluster-env support.

After it returns True, `jax.devices()` spans every host's chips and
`make_mesh` over them gives DCN-crossing meshes; shardings/collectives are
unchanged (the scaling-book recipe: same program, bigger mesh).
"""

from __future__ import annotations

import os


def multihost_env_detected() -> bool:
    """True when a rendezvous is configured/needed (never for single host)."""
    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        return True
    # TPU pod metadata: multiple workers in the slice
    hosts = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    return len([h for h in hosts.split(",") if h]) > 1


def maybe_initialize_multihost() -> bool:
    """Initialize jax's distributed runtime when a multi-host env is
    detected; no-op (returns False) otherwise."""
    if not multihost_env_detected():
        return False
    import jax

    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    nproc = os.environ.get("JAX_NUM_PROCESSES")
    pid = os.environ.get("JAX_PROCESS_ID")
    if addr and nproc is not None and pid is not None:
        jax.distributed.initialize(
            coordinator_address=addr,
            num_processes=int(nproc),
            process_id=int(pid),
        )
    else:
        # TPU pod metadata, or a cluster env jax's own detectors understand
        # (an address without NUM_PROCESSES/PROCESS_ID falls through here)
        jax.distributed.initialize()
    return True
