"""GPipe-style pipeline parallelism over a named `pipe` mesh axis.

The reference's only parallelism is single-node DDP (SURVEY.md §2.3,
initialize.py:96-103) — it has no way to split a model that does not fit
one device. This module adds pipeline parallelism the TPU way:

  * the homogeneous block stack is stacked into ONE pytree with a leading
    layer axis `[L, ...]`, sharded over the mesh's `pipe` axis — each stage
    (device group) physically holds only `L / S` layers' weights;
  * activations rotate stage-to-stage with `jax.lax.ppermute` (one ICI hop
    per tick) inside `shard_map`;
  * a `lax.scan` over `M + S - 1` ticks implements the GPipe schedule for
    `M` microbatches over `S` stages (bubble fraction `(S-1)/(M+S-1)`);
  * everything is ordinary differentiable jax, so the backward pass (the
    reverse pipeline schedule) falls out of AD — `gpipe` works inside a
    training step.

`mmdit_pipeline_forward` wires this into the MMDiT: embed and output heads
run replicated, the homogeneous interior blocks run through the pipe. The
flagship SD3.5-medium config has heterogeneous dual-attention blocks at
layers 0-12 (transformer_sd3.py:63-114), so whole-model pipelining applies
to configs with uniform blocks (`dual_attention_layers=()`); the engine
itself is model-agnostic.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.sharding import PartitionSpec as P

from dit4sr_tpu.config import MMDiTConfig


def stack_block_params(block_params: list) -> Any:
    """Stack per-block param pytrees (identical structure) along a new
    leading layer axis, giving the `[L, ...]` tree `gpipe` shards."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *block_params)


def gpipe(
    block_fn: Callable[[Any, Any], Any],
    stacked_params: Any,
    x: Any,
    mesh,
    *,
    num_microbatches: int,
    pipe_axis: str = "pipe",
    data_axis: Optional[str] = None,
):
    """Run `block_fn` over all L stacked layers with GPipe scheduling.

    block_fn(layer_params, act) -> act applies ONE layer; `act` is a pytree
    of arrays with a leading batch axis. `stacked_params` has leading axis
    L with L % S == 0 (S = mesh.shape[pipe_axis]); stage i holds layers
    [i*L/S, (i+1)*L/S) and applies them with an inner scan. If `data_axis`
    is given the batch axis of `x` is additionally sharded over it (DP x PP).
    """
    S = mesh.shape[pipe_axis]
    M = int(num_microbatches)
    L = jax.tree.leaves(stacked_params)[0].shape[0]
    if L % S != 0:
        raise ValueError(f"{L} layers not divisible by {S} pipeline stages")

    def per_stage(local_params, x_local):
        B = jax.tree.leaves(x_local)[0].shape[0]
        if B % M != 0:
            raise ValueError(f"local batch {B} not divisible by {M} microbatches")
        mb = jax.tree.map(
            lambda a: a.reshape((M, B // M) + a.shape[1:]), x_local
        )
        idx = jax.lax.axis_index(pipe_axis)
        perm = [(i, (i + 1) % S) for i in range(S)]

        def run_stage(act):
            def one_layer(carry, p):
                return block_fn(p, carry), None

            out, _ = jax.lax.scan(one_layer, act, local_params)
            return out

        zero_mb = jax.tree.map(lambda a: jnp.zeros_like(a[0]), mb)

        def tick(carry, t):
            recv, out_buf = carry
            fresh = jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(
                    a, jnp.minimum(t, M - 1), 0, keepdims=False
                ),
                mb,
            )
            # stage 0 consumes a fresh microbatch; later stages consume what
            # the previous stage sent last tick
            inp = jax.tree.map(
                lambda f, r: jnp.where(idx == 0, f, r), fresh, recv
            )
            y = run_stage(inp)
            sent = jax.tree.map(
                lambda a: jax.lax.ppermute(a, pipe_axis, perm), y
            )
            # the last stage's results for ticks < S-1 land at slot 0 and are
            # overwritten by the real tick-(S-1) write — no mask needed
            j = jnp.maximum(t - (S - 1), 0)
            out_buf = jax.tree.map(
                lambda buf, a: jax.lax.dynamic_update_index_in_dim(
                    buf, a, j, 0
                ),
                out_buf,
                y,
            )
            return (sent, out_buf), None

        out0 = jax.tree.map(lambda a: jnp.zeros_like(a), mb)
        (_, out_buf), _ = jax.lax.scan(
            tick, (zero_mb, out0), jnp.arange(M + S - 1)
        )
        # only the last stage holds real outputs; psum over the pipe axis of
        # the masked buffer replicates them everywhere
        out = jax.tree.map(
            lambda a: jax.lax.psum(
                jnp.where(idx == S - 1, a, jnp.zeros_like(a)), pipe_axis
            ),
            out_buf,
        )
        return jax.tree.map(lambda a: a.reshape((B,) + a.shape[2:]), out)

    x_spec = P(data_axis) if data_axis else P()
    return jax.shard_map(
        per_stage,
        mesh=mesh,
        in_specs=(P(pipe_axis), jax.tree.map(lambda _: x_spec, x)),
        out_specs=jax.tree.map(lambda _: x_spec, x),
        check_vma=False,
    )(stacked_params, x)


def mmdit_pipeline_forward(
    cfg: MMDiTConfig,
    params: Any,
    hidden_states: jnp.ndarray,   # (B, H, W, C) noisy HQ latent, NHWC
    control_image: jnp.ndarray,   # (B, H, W, C) LQ latent
    text_embeds: jnp.ndarray,     # (B, T, joint_attention_dim)
    pooled_embeds: jnp.ndarray,   # (B, pooled_projection_dim)
    timestep: jnp.ndarray,        # (B,)
    mesh,
    *,
    num_microbatches: int,
    data_axis: Optional[str] = None,
) -> jnp.ndarray:
    """MMDiT forward with blocks [0, L-1) pipelined over the `pipe` axis.

    Embedding (PatchEmbed / TimeTextEmbed / context_embedder) and the output
    head (final context_pre_only block, norm_out, proj_out, unpatchify) run
    replicated; they are a small fraction of the FLOPs. Requires a uniform
    interior block stack (`dual_attention_layers=()`) and no feature
    extraction (TESTR training composes with dp/fsdp/tensor instead).
    """
    from dit4sr_tpu.models.embeddings import PatchEmbed, TimeTextEmbed, unpatchify
    from dit4sr_tpu.models.mmdit import JointBlock
    from dit4sr_tpu.models.norms import AdaLayerNormContinuous

    if cfg.dual_attention_layers:
        raise ValueError(
            "pipelined forward needs a homogeneous block stack "
            "(dual_attention_layers=()); the flagship dual-attention config "
            "shards over data/fsdp/tensor/seq instead"
        )
    p = params["params"]
    B, H, W, _ = hidden_states.shape
    h, w = H // cfg.patch_size, W // cfg.patch_size

    pos_embed = PatchEmbed(
        patch_size=cfg.patch_size,
        in_channels=cfg.in_channels,
        embed_dim=cfg.inner_dim,
        pos_embed_max_size=cfg.pos_embed_max_size,
        base_size=cfg.sample_size // cfg.patch_size,
        dtype=cfg.dtype,
        param_dtype=cfg.param_dtype,
    )
    parts = [pos_embed.apply({"params": p["pos_embed"]}, hidden_states)]
    for _name in cfg.streams[1:]:
        parts.append(pos_embed.apply({"params": p["pos_embed"]}, control_image))
    stream_x = jnp.stack(parts, axis=1)

    temb = TimeTextEmbed(
        embedding_dim=cfg.inner_dim,
        pooled_projection_dim=cfg.pooled_projection_dim,
        dtype=cfg.dtype,
        param_dtype=cfg.param_dtype,
    ).apply({"params": p["time_text_embed"]}, timestep, pooled_embeds)
    text_x = nn.Dense(
        cfg.caption_projection_dim, dtype=cfg.dtype, param_dtype=cfg.param_dtype
    ).apply({"params": p["context_embedder"]}, text_embeds)

    interior = stack_block_params(
        [p[f"blocks_{i}"] for i in range(cfg.num_layers - 1)]
    )
    block = JointBlock(cfg, use_dual_attention=False, context_pre_only=False)

    def block_fn(layer_params, act):
        sx, tx, te = act
        sx, tx = block.apply({"params": layer_params}, sx, tx, te)
        return (sx, tx, te)

    stream_x, text_x, _ = gpipe(
        block_fn,
        interior,
        (stream_x, text_x, temb),
        mesh,
        num_microbatches=num_microbatches,
        data_axis=data_axis,
    )

    last = JointBlock(cfg, use_dual_attention=False, context_pre_only=True)
    stream_x, _ = last.apply(
        {"params": p[f"blocks_{cfg.num_layers - 1}"]}, stream_x, text_x, temb
    )

    hq = stream_x[:, 0]
    hq = AdaLayerNormContinuous(
        cfg.inner_dim, dtype=cfg.dtype, param_dtype=cfg.param_dtype
    ).apply({"params": p["norm_out"]}, hq, temb)
    hq = nn.Dense(
        cfg.patch_size * cfg.patch_size * cfg.out_channels,
        dtype=cfg.dtype,
        param_dtype=cfg.param_dtype,
    ).apply({"params": p["proj_out"]}, hq)
    return unpatchify(hq, h, w, cfg.patch_size)
