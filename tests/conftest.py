"""Test harness: force an 8-device virtual CPU mesh before JAX initializes.

This is the TPU-native answer to multi-device testing without a cluster
(SURVEY.md §4): every sharding/pjit test runs against 8 virtual CPU devices.
The environment pins JAX_PLATFORMS=axon (the real TPU); tests must override
it *before* jax initializes.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# the axon sitecustomize force-updates jax_platforms to "axon,cpu" at
# interpreter start; counter-update before any backend initializes
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_default_matmul_precision", "float32")
