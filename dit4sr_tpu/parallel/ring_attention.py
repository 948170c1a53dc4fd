"""Ring (sequence-parallel) attention over a named mesh axis.

The reference's only parallelism is DDP (SURVEY.md §2.3) — it has no answer
for sequences or activation footprints that exceed one device. Here the
joint [streams|text] token axis can be sharded over the mesh's `seq` axis:
each device keeps its query shard and the K/V shards rotate around the ring
with `jax.lax.ppermute` (one ICI hop per step, overlappable with compute),
while an online-softmax merge keeps the result EXACT — this is blockwise
ring attention recast onto jax collectives.

Head parallelism (`tensor` axis, parallel/sharding.py) scales to
num_heads=24 chips; the `seq` axis composes with it for larger meshes, and
cuts per-chip activation memory linearly for long-token plans (2048px+
untiled latents).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P


def _chunk_attention(q, k, v, scale, col_offset, valid_len):
    """Partial attention of local q against one K/V chunk.

    Returns (o, m, l): unnormalized output, row max, row sum — the online
    softmax statistics merged across ring steps.
    q: (B, H, Nq, D); k/v: (B, H, Nk, D). col_offset is the GLOBAL token
    index of k's first column (traced: depends on the ring step).
    """
    logits = jnp.einsum(
        "bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32
    ) * scale
    if valid_len is not None:
        col = col_offset + jnp.arange(k.shape[2])
        logits = jnp.where(col[None, None, None, :] < valid_len, logits, -1e30)
    m = jnp.max(logits, axis=-1, keepdims=True)
    # guard fully-masked chunks (m = -1e30): exp(logits - m) would be exp(0)=1
    # on masked columns; shift by a safe max instead
    m_safe = jnp.maximum(m, -1e29)
    p = jnp.exp(logits - m_safe)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.einsum(
        "bhnm,bhmd->bhnd", p.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return o, m_safe, l


def ring_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    axis_name: str,
    valid_len: Optional[int] = None,
) -> jnp.ndarray:
    """Exact attention with q/k/v token-sharded over `axis_name`.

    Must run inside shard_map; q/k/v are the LOCAL shards (B, H, Nloc, Dh).
    Each of the `p` ring steps attends local queries to the currently-held
    K/V chunk, then rotates K/V one hop; online-softmax statistics make the
    merged result exactly softmax(QK^T)V over the full sequence.
    """
    p_size = jax.lax.axis_size(axis_name)
    my_idx = jax.lax.axis_index(axis_name)
    n_loc = k.shape[2]
    scale = 1.0 / (q.shape[-1] ** 0.5)
    perm = [(j, (j + 1) % p_size) for j in range(p_size)]

    def body(i, carry):
        kc, vc, acc, m, l = carry
        # after i rotations we hold the chunk originally on device (my - i)
        owner = (my_idx - i) % p_size
        o_i, m_i, l_i = _chunk_attention(
            q, kc, vc, scale, owner * n_loc, valid_len
        )
        new_m = jnp.maximum(m, m_i)
        w_old = jnp.exp(m - new_m)
        w_new = jnp.exp(m_i - new_m)
        acc = acc * w_old + o_i * w_new
        l = l * w_old + l_i * w_new
        kc = jax.lax.ppermute(kc, axis_name, perm)
        vc = jax.lax.ppermute(vc, axis_name, perm)
        return kc, vc, acc, new_m, l

    B, H, Nq, D = q.shape
    acc0 = jnp.zeros((B, H, Nq, D), jnp.float32)
    m0 = jnp.full((B, H, Nq, 1), -1e30, jnp.float32)
    l0 = jnp.zeros((B, H, Nq, 1), jnp.float32)
    _, _, acc, _, l = jax.lax.fori_loop(
        0, p_size, body, (k, v, acc0, m0, l0)
    )
    return (acc / jnp.maximum(l, 1e-30)).astype(q.dtype)


def ring_attention_sharded(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh,
    valid_len: Optional[int] = None,
    axis: str = "seq",
) -> jnp.ndarray:
    """shard_map entry: global (B, H, N, Dh) arrays, token axis sharded over
    `axis` (batch over data/fsdp, heads over tensor compose as usual)."""
    spec = P(("data", "fsdp"), "tensor", axis, None)
    fn = partial(ring_attention, axis_name=axis, valid_len=valid_len)
    return jax.shard_map(
        fn, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False,
    )(q, k, v)
