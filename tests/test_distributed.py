"""Multi-host bootstrap helper (parallel/distributed.py): detection must be
conservative — single-host (and the CI CPU mesh) must never trigger an
initialize; env-configured rendezvous must be recognized."""

import os

from dit4sr_tpu.parallel.distributed import (
    maybe_initialize_multihost,
    multihost_env_detected,
)


def test_single_host_is_noop(monkeypatch):
    for var in ("JAX_COORDINATOR_ADDRESS", "TPU_WORKER_HOSTNAMES"):
        monkeypatch.delenv(var, raising=False)
    assert not multihost_env_detected()
    assert maybe_initialize_multihost() is False


def test_env_detection(monkeypatch):
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "10.0.0.1:1234")
    assert multihost_env_detected()
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS")
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "host-a,host-b")
    assert multihost_env_detected()
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "host-a")
    assert not multihost_env_detected()
