"""Multi-head attention ops for the joint [streams|text] token axis.

The reference runs one fused torch SDPA over the concatenated
[hq | control (| ocr) | text] sequence (model_dit4sr/attention.py:508-528).
Here the same contract is a single attention over (B, H, N, Dh) arrays with an
optional key mask for padded text tokens, with two interchangeable backends:

  * ``mha_reference`` — jnp einsum + fp32 softmax; the correctness oracle and
    the XLA path (XLA already fuses this well on TPU for moderate N).
  * ``flash_attention`` — Pallas kernel (ops/flash_attention.py), used when
    MMDiTConfig.attn_impl == "pallas".
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def mha_reference(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    key_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Plain scaled-dot-product attention.

    Args:
      q, k, v: (B, H, N, Dh) / (B, H, M, Dh)
      key_mask: optional (B, M) bool; False keys are excluded.

    Returns (B, H, N, Dh) in q.dtype. Softmax runs in fp32.
    """
    dh = q.shape[-1]
    scale = 1.0 / jnp.sqrt(jnp.float32(dh))
    logits = jnp.einsum(
        "bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32
    ) * scale
    if key_mask is not None:
        neg = jnp.finfo(jnp.float32).min
        logits = jnp.where(key_mask[:, None, None, :], logits, neg)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bhnm,bhmd->bhnd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(q.dtype)


def attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    key_mask: Optional[jnp.ndarray] = None,
    impl: str = "auto",
    valid_len: Optional[int] = None,
) -> jnp.ndarray:
    """Dispatch between attention backends.

    impl:
      * "auto"    — pallas on TPU, xla elsewhere
      * "xla"     — einsum + fp32 softmax reference
      * "xla_dpa" — jax.nn.dot_product_attention (XLA fused path)
      * "pallas"  — custom Pallas flash kernel (ops/flash_attention.py)

    `valid_len` statically masks trailing pad keys (callers that align N to
    the flash block size themselves).
    """
    if impl in ("auto", "ring"):
        # sequence-parallel plan: token axis sharded over the mesh 'seq'
        # axis -> exact ring attention (parallel/ring_attention.py)
        from dit4sr_tpu.parallel.sharding import _current_mesh

        mesh = _current_mesh()
        if (
            mesh is not None
            and mesh.shape.get("seq", 1) > 1
            and key_mask is None
        ):
            from dit4sr_tpu.parallel.ring_attention import (
                ring_attention_sharded,
            )

            return ring_attention_sharded(q, k, v, mesh, valid_len=valid_len)
        if impl == "ring":
            raise ValueError(
                "impl='ring' needs an active mesh with a 'seq' axis > 1 "
                "and no runtime key_mask"
            )
        # the flash kernel is a bf16 kernel: fp32 operands quarter the MXU
        # rate (3-pass decomposition) and the decomposition's extra scoped
        # VMEM OOMs Mosaic at moderate shapes (measured: N=4096, D=128 fp32
        # fails to compile at any block size). fp32 callers (VAE training)
        # get the XLA path, which XLA fuses fine.
        impl = (
            "pallas"
            if jax.default_backend() != "cpu" and q.dtype == jnp.bfloat16
            else "xla"
        )
    if valid_len is not None and valid_len < q.shape[2] and impl != "pallas":
        tail = jnp.arange(q.shape[2]) < valid_len
        key_mask = tail[None] if key_mask is None else key_mask & tail[None]
    if impl == "pallas":
        if key_mask is None:
            from dit4sr_tpu.ops.flash_attention import flash_attention
            from dit4sr_tpu.parallel.sharding import _current_mesh

            mesh = _current_mesh()
            if mesh is not None and mesh.shape.get("tensor", 1) > 1:
                # head-parallel: attention is head-local, so shard_map over
                # the tensor axis runs the kernel per head shard with no
                # collectives
                from jax.sharding import PartitionSpec as P

                spec = P(("data", "fsdp"), "tensor", None, None)
                return jax.shard_map(
                    lambda q, k, v: flash_attention(q, k, v, valid_len=valid_len),
                    mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
                    check_vma=False,  # pallas_call outputs carry no vma info
                )(q, k, v)
            return flash_attention(q, k, v, valid_len=valid_len)
        # the pallas kernel only supports static padding masks; runtime
        # masks (rare: test-only) take the XLA path
    if impl == "xla_dpa":
        mask = None
        if key_mask is not None:
            mask = key_mask[:, None, None, :]
        out = jax.nn.dot_product_attention(
            q.transpose(0, 2, 1, 3),
            k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3),
            mask=mask,
            implementation="xla",
        )
        return out.transpose(0, 2, 1, 3)
    return mha_reference(q, k, v, key_mask=key_mask)


def split_heads(x: jnp.ndarray, num_heads: int) -> jnp.ndarray:
    """(B, N, H*Dh) -> (B, H, N, Dh)."""
    b, n, d = x.shape
    return x.reshape(b, n, num_heads, d // num_heads).transpose(0, 2, 1, 3)


def merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, N, Dh) -> (B, N, H*Dh)."""
    b, h, n, dh = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, n, h * dh)
