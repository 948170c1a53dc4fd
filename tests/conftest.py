"""Test harness: force an 8-device virtual CPU mesh before JAX initializes.

This is the TPU-native answer to multi-device testing without a cluster
(SURVEY.md §4): every sharding/pjit test runs against 8 virtual CPU devices.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "float32")
