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
run replicated, the interior blocks run through the pipe. The flagship
SD3.5-medium config has heterogeneous dual-attention blocks at layers 0-12
(transformer_sd3.py:63-114); heterogeneity is handled by HOMOGENIZING the
stack instead of special-casing stages:

  * a plain block's params embed exactly into the dual-attention structure —
    AdaLayerNormZeroX's 9 modulation chunks are AdaLayerNormZero's 6 plus
    (shift2, scale2, gate2) appended (models/norms.py:61,83), so zero-padding
    the norm1 kernel columns and zeroing attn2 gives gate_msa2 = 0 and the
    dual math degenerates to the plain block bit-for-bit;
  * a per-layer `use_dual` flag dispatches `lax.cond` between the real dual
    block and a plain block that slices the padded norm1 back down — so the
    zero attn2 is never computed, only stored (cond executes one branch);
  * an all-zero JointBlock is an exact identity (every AdaLN gate is zero),
    so the stack zero-pads to a multiple of the stage count for free.

The padding/slicing happens inside the differentiable path, so gradients
come out on the ORIGINAL per-layer param shapes.
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
    replicated; they are a small fraction of the FLOPs. Dual-attention
    layers (the flagship's 0-12, transformer_sd3.py:63-114) are supported by
    homogenizing the stack (see module docstring): plain layers are
    zero-padded into the dual param structure and a per-layer flag `cond`s
    between the two block forms. No feature extraction (TESTR training
    composes with dp/fsdp/tensor instead).
    """
    from dit4sr_tpu.models.embeddings import PatchEmbed, TimeTextEmbed, unpatchify
    from dit4sr_tpu.models.mmdit import JointBlock
    from dit4sr_tpu.models.norms import AdaLayerNormContinuous

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

    L = cfg.num_layers - 1          # interior; the pre-only block replicates
    dual_set = set(cfg.dual_attention_layers)
    if (cfg.num_layers - 1) in dual_set:
        raise ValueError(
            "the final (context_pre_only) block cannot be dual-attention "
            "(SD3.5 never is; transformer_sd3.py:63-114)"
        )
    D = cfg.inner_dim

    def pad_plain(lp, tmpl_attn2):
        """Embed a plain block's params into the dual structure: zero-pad
        norm1's 6->9 modulation chunks and zero attn2 (gate_msa2 = 0 makes
        the dual math reproduce the plain block exactly)."""
        lp = dict(lp)
        lin = lp["norm1"]["linear"]
        lp["norm1"] = {"linear": {
            "kernel": jnp.pad(lin["kernel"], ((0, 0), (0, 3 * D))),
            "bias": jnp.pad(lin["bias"], ((0, 3 * D),)),
        }}
        lp["attn2"] = jax.tree.map(jnp.zeros_like, tmpl_attn2)
        return lp

    def strip_pad(lp):
        """Slice a padded layer back to the plain structure (differentiable;
        the adjoint routes grads onto the original 6-chunk params)."""
        lp = dict(lp)
        lin = lp["norm1"]["linear"]
        lp["norm1"] = {"linear": {
            "kernel": lin["kernel"][:, : 6 * D], "bias": lin["bias"][: 6 * D],
        }}
        lp.pop("attn2")
        return lp

    mixed = bool(dual_set) and len(dual_set) < L
    if mixed:
        tmpl_attn2 = p[f"blocks_{next(iter(sorted(dual_set)))}"]["attn2"]
        stack = [
            p[f"blocks_{i}"] if i in dual_set
            else pad_plain(p[f"blocks_{i}"], tmpl_attn2)
            for i in range(L)
        ]
    else:
        stack = [p[f"blocks_{i}"] for i in range(L)]
    interior = stack_block_params(stack)
    flags = jnp.asarray([i in dual_set for i in range(L)])

    # an all-zero JointBlock is an exact identity (every AdaLN gate is 0),
    # so zero-padding the stack satisfies gpipe's L % S == 0 for any L
    S = mesh.shape["pipe"]
    n_pad = (-L) % S
    if n_pad:
        interior = jax.tree.map(
            lambda a: jnp.concatenate(
                [a, jnp.zeros((n_pad,) + a.shape[1:], a.dtype)]
            ),
            interior,
        )
        flags = jnp.concatenate([flags, jnp.zeros((n_pad,), flags.dtype)])

    dual_block = JointBlock(cfg, use_dual_attention=True, context_pre_only=False)
    plain_block = JointBlock(cfg, use_dual_attention=False, context_pre_only=False)

    if mixed:
        def block_fn(layer_params, act):
            flag, lp = layer_params
            sx, tx, te = act
            sx, tx = jax.lax.cond(
                flag,
                lambda _: dual_block.apply({"params": lp}, sx, tx, te),
                lambda _: plain_block.apply({"params": strip_pad(lp)}, sx, tx, te),
                None,
            )
            return (sx, tx, te)

        stacked = (flags, interior)
    else:
        one_block = dual_block if dual_set else plain_block

        def block_fn(layer_params, act):
            sx, tx, te = act
            sx, tx = one_block.apply({"params": layer_params}, sx, tx, te)
            return (sx, tx, te)

        stacked = interior

    stream_x, text_x, _ = gpipe(
        block_fn,
        stacked,
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
