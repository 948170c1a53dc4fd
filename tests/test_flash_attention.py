"""Flash-attention kernel parity vs the einsum reference (values + grads).

Runs in Pallas interpret mode on CPU; the same kernel compiles for TPU.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dit4sr_tpu.ops import flash_attention as fa
from dit4sr_tpu.ops.attention import mha_reference


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    from jax.experimental import pallas as pl

    orig = pl.pallas_call
    monkeypatch.setattr(
        pl, "pallas_call", functools.partial(orig, interpret=True)
    )
    yield


def _qkv(B=1, H=2, N=512, D=64, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    q = jax.random.normal(ks[0], (B, H, N, D), jnp.float32)
    k = jax.random.normal(ks[1], (B, H, N, D), jnp.float32)
    v = jax.random.normal(ks[2], (B, H, N, D), jnp.float32)
    return q, k, v


def test_forward_parity_no_pad():
    q, k, v = _qkv()
    ref = mha_reference(q, k, v)
    got = fa.flash_attention(q, k, v, block_q=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_forward_parity_with_internal_padding():
    """N not a block multiple: the wrapper pads and statically masks, and the
    result must equal unpadded attention."""
    q, k, v = _qkv(N=300, B=2)
    ref = mha_reference(q, k, v)
    got = fa.flash_attention(q, k, v, block_q=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_gradient_parity():
    q, k, v = _qkv(N=256)

    def loss_ref(q, k, v):
        return jnp.sum(mha_reference(q, k, v) ** 2)

    def loss_fa(q, k, v):
        return jnp.sum(fa.flash_attention(q, k, v, block_q=128) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_fa = jax.grad(loss_fa, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_fa, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-4,
            err_msg=f"grad mismatch for {name}",
        )


def test_gradient_parity_with_internal_padding():
    q, k, v = _qkv(N=300)

    def loss_ref(q, k, v):
        return jnp.sum(mha_reference(q, k, v) ** 2)

    def loss_fa(q, k, v):
        return jnp.sum(fa.flash_attention(q, k, v, block_q=128) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_fa = jax.grad(loss_fa, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_fa, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-4)


def test_bwd_vmem_fallback_gradient_parity():
    """Geometries whose resident k/v/dk/dv alone overflow the 16 MB scoped
    VMEM (e.g. a D=512 VAE bottleneck) must route the backward to the
    chunked XLA fallback at any block size — and the gradients must still
    match the einsum reference."""
    assert fa._bwd_vmem_bytes(64, 2048, 512, 4) > fa._BWD_VMEM_BUDGET

    q, k, v = _qkv(B=1, H=1, N=2048, D=512)

    def loss_ref(q, k, v):
        return jnp.sum(mha_reference(q, k, v) ** 2)

    def loss_fa(q, k, v):
        return jnp.sum(fa.flash_attention(q, k, v) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_fa = jax.grad(loss_fa, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_fa, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-4,
            err_msg=f"grad mismatch for {name}",
        )


def test_runtime_mask_rejected():
    q, k, v = _qkv(N=128)
    with pytest.raises(NotImplementedError):
        fa.flash_attention(q, k, v, key_mask=jnp.ones((1, 128), bool))


def test_caller_aligned_valid_len():
    """Pre-aligned N + valid_len must equal attention over the valid prefix."""
    q, k, v = _qkv(N=512)
    out = fa.flash_attention(q, k, v, block_q=128, valid_len=300)
    ref = mha_reference(q[:, :, :300], k[:, :, :300], v[:, :, :300])
    np.testing.assert_allclose(
        np.asarray(out[:, :, :300]), np.asarray(ref), rtol=2e-4, atol=2e-4
    )


# ---------------------------------------------------------------------------
# KV-blocked (online-softmax) variant — the long-sequence path
# ---------------------------------------------------------------------------


def test_kv_blocked_forward_parity():
    q, k, v = _qkv(N=512, B=2)
    ref = mha_reference(q, k, v)
    got = fa.flash_attention(q, k, v, block_q=128, block_k=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_kv_blocked_forward_parity_padded_and_valid_len():
    """N not a block multiple AND caller valid_len: both mask paths compose."""
    q, k, v = _qkv(N=300)
    ref = mha_reference(q, k, v)
    got = fa.flash_attention(q, k, v, block_q=128, block_k=256)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)

    q2, k2, v2 = _qkv(N=512, seed=1)
    out = fa.flash_attention(q2, k2, v2, block_q=128, block_k=128, valid_len=300)
    ref2 = mha_reference(q2[:, :, :300], k2[:, :, :300], v2[:, :, :300])
    np.testing.assert_allclose(
        np.asarray(out[:, :, :300]), np.asarray(ref2), rtol=2e-4, atol=2e-4
    )


def test_kv_blocked_matches_full_kv_kernel():
    q, k, v = _qkv(N=384, seed=2)
    full = fa.flash_attention(q, k, v, block_q=128)
    blocked = fa.flash_attention(q, k, v, block_q=128, block_k=128)
    np.testing.assert_allclose(
        np.asarray(blocked), np.asarray(full), rtol=2e-4, atol=2e-4
    )


def test_kv_blocked_gradient_parity():
    q, k, v = _qkv(N=384)

    def loss_ref(q, k, v):
        return jnp.sum(mha_reference(q, k, v) ** 2)

    def loss_fa(q, k, v):
        return jnp.sum(
            fa.flash_attention(q, k, v, block_q=128, block_k=128) ** 2
        )

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_fa = jax.grad(loss_fa, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_fa, g_ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-4,
            err_msg=f"grad mismatch for {name}",
        )


def test_kv_blocked_gradient_parity_padded():
    q, k, v = _qkv(N=300, seed=3)

    def loss_ref(q, k, v):
        return jnp.sum(mha_reference(q, k, v) ** 2)

    def loss_fa(q, k, v):
        return jnp.sum(
            fa.flash_attention(q, k, v, block_q=128, block_k=256) ** 2
        )

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_fa = jax.grad(loss_fa, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_fa, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-4)


def test_auto_dispatch_above_threshold(monkeypatch):
    """N > MAX_FULL_KV_LEN silently takes the blocked path (tiny threshold
    stand-in so the test stays fast)."""
    monkeypatch.setattr(fa, "MAX_FULL_KV_LEN", 256)
    q, k, v = _qkv(N=512, seed=4)
    ref = mha_reference(q, k, v)
    got = fa.flash_attention(q, k, v, block_q=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_auto_dispatch_by_kv_bytes(monkeypatch):
    """Resident K+V over MAX_FULL_KV_BYTES takes the blocked path even when
    N is under the token threshold (wide-D VAE bottlenecks)."""
    monkeypatch.setattr(fa, "MAX_FULL_KV_BYTES", 128 * 1024)
    q, k, v = _qkv(N=512, D=128, seed=5)  # K+V = 512 KB > capped 128 KB
    ref = mha_reference(q, k, v)
    got = fa.flash_attention(q, k, v, block_q=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)
