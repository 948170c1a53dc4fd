"""Multi-stream MMDiT (SD3.5-medium geometry) with zero-init control branches.

One model covers all three reference variants (dit4sr /
dit4sr_ocrbranch_ocr2hq / dit4sr_ocrbranch_ocr2hq2ocr — reference
model_dit4sr/transformer_sd3*.py + attention*.py) through
``MMDiTConfig.streams`` and ``MMDiTConfig.ffn_couplings``:

  * every image-token stream is patch-embedded with the *same* PatchEmbed
    (transformer_sd3.py:326-331) and concatenated on the token axis;
  * each extra stream adds composed zero-init attention projections
    ``W_s(W_base(x_s))`` plus its own out projection initialized from the base
    out projection (attention.py:401-431,475-477);
  * inside every FFN the streams exchange information through zero-init
    depthwise 3x3 convs per ``ffn_couplings`` (attention.py:150,165-177;
    attention_ocrbranch_ocr2hq2ocr.py:156-210);
  * after the blocks only the hq stream is decoded
    (transformer_sd3.py:379-391).

All image I/O is NHWC. Attention runs over the fused
[streams | text] axis via ops.attention (XLA or Pallas backend).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from dit4sr_tpu.config import MMDiTConfig
from dit4sr_tpu.models.embeddings import PatchEmbed, TimeTextEmbed, unpatchify
from dit4sr_tpu.models.norms import (
    AdaLayerNormContinuous,
    AdaLayerNormZero,
    AdaLayerNormZeroX,
    RMSNorm,
    bcast_mod,
    layer_norm,
)
from dit4sr_tpu.ops.attention import attention, merge_heads, split_heads
from dit4sr_tpu.ops.quant import QuantDense
from dit4sr_tpu.parallel.sharding import shard_ffn_hidden, shard_heads

_zeros = nn.initializers.zeros_init()


class JointAttention(nn.Module):
    """Fused joint attention over [stream_0 .. stream_{S-1} | text].

    Stream 0 ("hq") uses the base projections; streams 1.. use composed
    zero-init projections. Extra streams receive a pre-out-projection
    residual of their normed input (attention.py:543-545).
    """

    cfg: MMDiTConfig
    context_pre_only: bool = False

    @nn.compact
    def __call__(
        self,
        stream_x: jnp.ndarray,            # (B, S, N, D) stream-axis layout
        text_x: Optional[jnp.ndarray],    # (B, T, D) or None (dual attn)
        text_mask: Optional[jnp.ndarray] = None,  # (B, T) bool
    ):
        cfg = self.cfg
        S = cfg.num_streams
        H, Dh = cfg.num_attention_heads, cfg.attention_head_dim
        D = cfg.inner_dim
        dense_cls = QuantDense if cfg.w8a8 else nn.Dense
        dense = lambda name, init=None: dense_cls(  # noqa: E731
            D,
            dtype=cfg.dtype,
            param_dtype=cfg.param_dtype,
            name=name,
            **({"kernel_init": init, "bias_init": _zeros} if init is not None else {}),
        )

        to_q, to_k, to_v = dense("to_q"), dense("to_k"), dense("to_v")
        to_out = dense("to_out")
        if cfg.qk_norm == "rms_norm":
            norm_q = RMSNorm(Dh, param_dtype=cfg.param_dtype, name="norm_q")
            norm_k = RMSNorm(Dh, param_dtype=cfg.param_dtype, name="norm_k")
        else:
            norm_q = norm_k = lambda x: x  # noqa: E731

        # streams live on their own axis: per-stream access is a leading-axis
        # index (an XLA bitcast), not a token slice — the previous
        # token-concat layout cost ~7 GB/fwd in slice/copy plumbing.
        xs = [stream_x[:, i] for i in range(S)]
        n_img = xs[0].shape[1]

        # one base projection over all streams (a single (S*N, D)x(D, D)
        # matmul feeds the MXU better than S separate ones); the zero-init
        # composed projections then act per stream (attention.py:463-477).
        # With cfg.folded_control, the base+control composition is
        # pre-multiplied into to_*_{stream} (see fold_control_projections),
        # so base projections only run on hq.
        if cfg.folded_control:
            base_q = [to_q(xs[0])] + xs[1:]
            base_k = [to_k(xs[0])] + xs[1:]
            base_v = [to_v(xs[0])] + xs[1:]
        else:
            bq, bk, bv = to_q(stream_x), to_k(stream_x), to_v(stream_x)
            base_q = [bq[:, i] for i in range(S)]
            base_k = [bk[:, i] for i in range(S)]
            base_v = [bv[:, i] for i in range(S)]

        qs, ks, vs = [], [], []
        for i, name in enumerate(cfg.streams):
            q, k, v = base_q[i], base_k[i], base_v[i]
            if i > 0:
                # composed zero-init control projections (attention.py:475-477)
                q = dense(f"to_q_{name}", _zeros)(q)
                k = dense(f"to_k_{name}", _zeros)(k)
                v = dense(f"to_v_{name}", _zeros)(v)
            q, k, v = (split_heads(t, H) for t in (q, k, v))
            q = norm_q(q)
            if i == 1 and cfg.ref_norm_k_quirk:
                # reference overwrites the control key with the re-normalized
                # hq key (attention.py:489); keep behind a parity flag
                k = norm_k(ks[0])
            else:
                k = norm_k(k)
            qs.append(q)
            ks.append(k)
            vs.append(v)

        key_mask = None
        valid_len = None
        if text_x is not None:
            tq = dense("add_q_proj")(text_x)
            tk = dense("add_k_proj")(text_x)
            tv = dense("add_v_proj")(text_x)
            tq, tk, tv = (split_heads(t, H) for t in (tq, tk, tv))
            if cfg.qk_norm == "rms_norm":
                tq = RMSNorm(Dh, param_dtype=cfg.param_dtype, name="norm_added_q")(tq)
                tk = RMSNorm(Dh, param_dtype=cfg.param_dtype, name="norm_added_k")(tk)
            use_pallas = cfg.attn_impl == "pallas" or (
                cfg.attn_impl == "auto" and jax.default_backend() != "cpu"
            )
            if text_mask is None and use_pallas and not cfg.capture_attention:
                # align the joint sequence to the flash block size at the
                # source: padding the small text q/k/v here is 3 tiny copies
                # instead of 3 full (B,H,N,D) pads inside the kernel wrapper
                total = S * n_img + tq.shape[2]
                n_pad = (-total) % 256
                if n_pad > 0:
                    pad4 = ((0, 0), (0, 0), (0, n_pad), (0, 0))
                    tq = jnp.pad(tq, pad4)
                    tk = jnp.pad(tk, pad4)
                    tv = jnp.pad(tv, pad4)
                    valid_len = total
            qs.append(tq)
            ks.append(tk)
            vs.append(tv)
            if text_mask is not None:
                img_true = jnp.ones(
                    (stream_x.shape[0], S * n_img), dtype=jnp.bool_
                )  # noqa: E501 (joint attention still runs over the token concat)
                key_mask = jnp.concatenate([img_true, text_mask], axis=1)

        # head-sharding over the mesh 'tensor' axis (no-op single chip);
        # NOTE: composes with attn_impl 'xla'/'xla_dpa' — the pallas kernel
        # is not auto-partitioned (wrap in shard_map for tensor parallelism)
        q = shard_heads(jnp.concatenate(qs, axis=2))
        k = shard_heads(jnp.concatenate(ks, axis=2))
        v = shard_heads(jnp.concatenate(vs, axis=2))

        if cfg.capture_attention:
            # visualization harness: sow softmax probabilities
            # (apply with mutable=["intermediates"] to collect)
            dh = q.shape[-1]
            logits = jnp.einsum(
                "bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32
            ) / jnp.sqrt(jnp.float32(dh))
            if key_mask is not None:
                logits = jnp.where(
                    key_mask[:, None, None, :], logits, jnp.finfo(jnp.float32).min
                )
            if valid_len is not None:
                col = jnp.arange(logits.shape[-1]) < valid_len
                logits = jnp.where(
                    col[None, None, None, :], logits, jnp.finfo(jnp.float32).min
                )
            probs = jax.nn.softmax(logits, axis=-1)
            self.sow("intermediates", "attn_probs", probs)
            out = merge_heads(
                jnp.einsum(
                    "bhnm,bhmd->bhnd", probs.astype(v.dtype), v,
                    preferred_element_type=jnp.float32,
                ).astype(q.dtype)
            )
        else:
            out = merge_heads(
                attention(
                    q, k, v, key_mask=key_mask, impl=cfg.attn_impl,
                    valid_len=valid_len,
                )
            )

        B = stream_x.shape[0]
        img_out = out[:, : S * n_img].reshape(B, S, n_img, D)
        if text_x is not None:
            # slice the true text length (drops any alignment padding)
            text_out = out[:, S * n_img : S * n_img + text_x.shape[1]]
        else:
            text_out = out[:, S * n_img :]

        final = [to_out(img_out[:, 0])]
        for i, name in enumerate(cfg.streams[1:], start=1):
            # residual of the normed input before the control out projection
            # (attention.py:543-552); to_out_<s> starts as a copy of to_out
            # (done by init surgery / weight conversion, attention.py:429-431)
            final.append(dense(f"to_out_{name}")(img_out[:, i] + xs[i]))

        img = jnp.stack(final, axis=1)
        if text_x is None:
            return img, None
        if self.context_pre_only:
            return img, None
        return img, dense("to_add_out")(text_out)


_COUPLING_NAMES = {
    ("control", "hq"): "control_conv",
    ("ocr", "hq"): "ocr_to_hidden_conv",
    ("hq", "ocr"): "hidden_to_ocr_conv",
}


class DepthwiseConv(nn.Module):
    """Zero-init depthwise 3x3 conv over the (h, w)-shaped token grid.

    Implemented as a 9-tap shift-and-add instead of
    lax.conv(feature_group_count=C): XLA lowers huge-group depthwise convs
    through an iota/gather path; the explicit taps stay on the VPU and fuse
    into a handful of elementwise passes."""

    channels: int
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # (B, h, w, C)
        kernel = self.param(
            "kernel", _zeros, (3, 3, 1, self.channels), self.param_dtype
        )
        bias = self.param("bias", _zeros, (self.channels,), self.param_dtype)
        xp = jnp.pad(x.astype(self.dtype), ((0, 0), (1, 1), (1, 1), (0, 0)))
        h, w = x.shape[1], x.shape[2]
        k = kernel.astype(self.dtype)
        out = jnp.zeros_like(x, self.dtype)
        for di in range(3):
            for dj in range(3):
                out = out + xp[:, di : di + h, dj : dj + w, :] * k[di, dj, 0]
        return out + bias.astype(self.dtype)


class StreamFFN(nn.Module):
    """FeedForwardControl: gelu-in -> stream coupling convs -> linear-out.

    The couplings run in declaration order on the *current* values, which
    reproduces all three reference variants (attention.py:165-177,
    attention_ocrbranch_ocr2hq2ocr.py:175-208)."""

    cfg: MMDiTConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # (B, S, N, D)
        cfg = self.cfg
        D = cfg.inner_dim
        hidden_dim = 4 * D
        dense_cls = QuantDense if cfg.w8a8 else nn.Dense
        h = dense_cls(
            hidden_dim, dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="proj_in"
        )(x)
        h = shard_ffn_hidden(nn.gelu(h, approximate=True))

        if cfg.ffn_couplings:
            # stream-axis layout: coupling sources/destinations are leading-
            # axis indices, no token splits/concats
            cur = {name: h[:, i] for i, name in enumerate(cfg.streams)}
            n = cur["hq"].shape[1]
            side = int(round(n ** 0.5))
            assert side * side == n, "stream token count must be a square grid"
            for src, dst in cfg.ffn_couplings:
                name = _COUPLING_NAMES.get((src, dst), f"{src}_to_{dst}_conv")
                grid = cur[src].reshape(-1, side, side, hidden_dim)
                cond = DepthwiseConv(
                    hidden_dim, dtype=cfg.dtype, param_dtype=cfg.param_dtype, name=name
                )(grid).reshape(-1, n, hidden_dim)
                cur[dst] = cur[dst] + cond
            # non-hq streams pass through their *pre-in-coupling* values except
            # when they are coupling destinations (ocr in ocr2hq2ocr)
            h = jnp.stack([cur[s] for s in cfg.streams], axis=1)

        return dense_cls(
            D, dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="proj_out"
        )(h)


class TextFFN(nn.Module):
    """Plain gelu-tanh MLP for the text stream."""

    dim: int
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    w8a8: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dense_cls = QuantDense if self.w8a8 else nn.Dense
        h = dense_cls(
            4 * self.dim, dtype=self.dtype, param_dtype=self.param_dtype,
            name="proj_in",
        )(x)
        h = nn.gelu(h, approximate=True)
        return dense_cls(
            self.dim, dtype=self.dtype, param_dtype=self.param_dtype, name="proj_out"
        )(h)


class JointBlock(nn.Module):
    """One MMDiT block: AdaLN(-ZeroX) + joint attention (+ dual image-only
    attention) + stream-coupled FFN (reference attention.py:187-398)."""

    cfg: MMDiTConfig
    use_dual_attention: bool = False
    context_pre_only: bool = False

    @nn.compact
    def __call__(
        self,
        stream_x: jnp.ndarray,
        text_x: jnp.ndarray,
        temb: jnp.ndarray,
        text_mask: Optional[jnp.ndarray] = None,
    ):
        cfg = self.cfg
        D = cfg.inner_dim

        if self.use_dual_attention:
            normed, gate_msa, shift_mlp, scale_mlp, gate_mlp, normed2, gate_msa2 = (
                AdaLayerNormZeroX(
                    D, dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="norm1"
                )(stream_x, temb)
            )
        else:
            normed, gate_msa, shift_mlp, scale_mlp, gate_mlp = AdaLayerNormZero(
                D, dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="norm1"
            )(stream_x, temb)

        if self.context_pre_only:
            normed_text = AdaLayerNormContinuous(
                D, dtype=cfg.dtype, param_dtype=cfg.param_dtype, name="norm1_context"
            )(text_x, temb)
            c_gate_msa = c_shift_mlp = c_scale_mlp = c_gate_mlp = None
        else:
            normed_text, c_gate_msa, c_shift_mlp, c_scale_mlp, c_gate_mlp = (
                AdaLayerNormZero(
                    D, dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                    name="norm1_context",
                )(text_x, temb)
            )

        attn_out, text_attn_out = JointAttention(
            cfg, context_pre_only=self.context_pre_only, name="attn"
        )(normed, normed_text, text_mask)

        b4 = lambda v: bcast_mod(v, stream_x.ndim)  # noqa: E731
        stream_x = stream_x + b4(gate_msa) * attn_out

        if self.use_dual_attention:
            attn2_out, _ = JointAttention(cfg, name="attn2")(normed2, None)
            stream_x = stream_x + b4(gate_msa2) * attn2_out

        ff_in = layer_norm(stream_x) * (1 + b4(scale_mlp)) + b4(shift_mlp)
        ff_out = StreamFFN(cfg, name="ff")(ff_in)
        stream_x = stream_x + b4(gate_mlp) * ff_out

        if self.context_pre_only:
            new_text = text_x
        else:
            text_x = text_x + c_gate_msa[:, None, :] * text_attn_out
            tf_in = (
                layer_norm(text_x) * (1 + c_scale_mlp[:, None, :])
                + c_shift_mlp[:, None, :]
            )
            tf_out = TextFFN(
                D, dtype=cfg.dtype, param_dtype=cfg.param_dtype,
                w8a8=cfg.w8a8, name="ff_context",
            )(tf_in)
            new_text = text_x + c_gate_mlp[:, None, :] * tf_out

        return stream_x, new_text


def _extract_slice(cfg: MMDiTConfig, stream_x: jnp.ndarray) -> jnp.ndarray:
    """Per-layer feature slice for the text-spotting head
    (attention.py:353-374). Input (B, S, N, D); output keeps the historic
    token-concat layout the TESTR head consumes."""
    B, _, n, D = stream_x.shape
    idx = {"hq": 0, "control": 1, "ocr": 2}
    if cfg.feat_extract == "hq+control":
        feat = stream_x[:, 0:2].reshape(B, 2 * n, D)
    else:
        feat = stream_x[:, idx[cfg.feat_extract]]
    if cfg.feat_extract_stop_gradient:
        feat = jax.lax.stop_gradient(feat)
    return feat


class MMDiT(nn.Module):
    """Top-level model. Inputs NHWC latents; returns (velocity-space output,
    optional per-layer features for TESTR)."""

    cfg: MMDiTConfig

    @nn.compact
    def __call__(
        self,
        hidden_states: jnp.ndarray,       # (B, h, w, C) noisy HQ latent, NHWC
        control_image: jnp.ndarray,       # (B, h, w, C) LQ latent, NHWC
        text_embeds: jnp.ndarray,         # (B, T, joint_attention_dim)
        pooled_embeds: jnp.ndarray,       # (B, pooled_projection_dim)
        timestep: jnp.ndarray,            # (B,) in [0, 1000]
        text_mask: Optional[jnp.ndarray] = None,  # (B, T) bool
        extract_features: bool = False,
        cache_span: Optional[Tuple[int, int]] = None,  # static (lo, hi)
        cache_mode: Optional[str] = None,              # None|"capture"|"apply"
        cache: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    ):
        """Standard call returns (out, feats). Block-span caching (Delta-DiT,
        arXiv 2406.01125; the reference has no fast-sampling path):

          * cache_mode="capture": run ALL blocks, additionally return the
            fp32 hidden-state deltas accumulated by blocks [lo, hi) —
            (out, feats, (d_stream, d_text)).
          * cache_mode="apply": run blocks [0, lo), add the given deltas,
            skip straight to block hi, run [hi, N) — (out, feats). The
            skipped blocks' cost is saved; their effect is approximated by
            the cached deltas from a nearby step.

        cache_span/cache_mode are static (trace-time) arguments."""
        cfg = self.cfg
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
            name="pos_embed",
        )

        # every stream is embedded with the same PatchEmbed; streams beyond
        # "hq" all consume the LQ control latent (transformer_sd3.py:326-338,
        # transformer_sd3_ocrbranch_ocr2hq.py:334-338)
        parts = [pos_embed(hidden_states)]
        for _name in cfg.streams[1:]:
            parts.append(pos_embed(control_image))
        stream_x = jnp.stack(parts, axis=1)          # (B, S, N, D)

        temb = TimeTextEmbed(
            embedding_dim=cfg.inner_dim,
            pooled_projection_dim=cfg.pooled_projection_dim,
            dtype=cfg.dtype,
            param_dtype=cfg.param_dtype,
            name="time_text_embed",
        )(timestep, pooled_embeds)

        text_x = nn.Dense(
            cfg.caption_projection_dim,
            dtype=cfg.dtype,
            param_dtype=cfg.param_dtype,
            name="context_embedder",
        )(text_embeds)

        if cache_mode is not None:
            if cache_span is None:
                raise ValueError("cache_mode requires cache_span=(lo, hi)")
            lo, hi = cache_span
            if not (0 <= lo < hi <= cfg.num_layers):
                raise ValueError(f"cache_span {cache_span} out of range")
            if cache_mode == "apply":
                if cache is None:
                    raise ValueError('cache_mode="apply" requires cache deltas')
                if extract_features and any(
                    lo <= j < hi for j in cfg.feat_extract_layers
                ):
                    raise ValueError(
                        "extract_features conflicts with caching a span that "
                        "contains feat_extract_layers"
                    )
        else:
            lo = hi = -1

        feats: List[jnp.ndarray] = []
        snap_lo = None
        new_cache = None
        block_cls = JointBlock
        if cfg.remat:
            block_cls = nn.remat(JointBlock, static_argnums=())
        for i in range(cfg.num_layers):
            if i == lo:
                if cache_mode == "capture":
                    snap_lo = (
                        stream_x.astype(jnp.float32),
                        text_x.astype(jnp.float32),
                    )
                else:  # apply
                    d_stream, d_text = cache
                    stream_x = (
                        stream_x.astype(jnp.float32) + d_stream
                    ).astype(stream_x.dtype)
                    text_x = (
                        text_x.astype(jnp.float32) + d_text
                    ).astype(text_x.dtype)
            if i == hi and cache_mode == "capture":
                new_cache = (
                    stream_x.astype(jnp.float32) - snap_lo[0],
                    text_x.astype(jnp.float32) - snap_lo[1],
                )
            if cache_mode == "apply" and lo <= i < hi:
                continue
            stream_x, text_x = block_cls(
                cfg,
                use_dual_attention=i in cfg.dual_attention_layers,
                context_pre_only=i == cfg.num_layers - 1,
                name=f"blocks_{i}",
            )(stream_x, text_x, temb, text_mask)
            if extract_features and i in cfg.feat_extract_layers:
                feats.append(_extract_slice(cfg, stream_x))
        if cache_mode == "capture" and hi == cfg.num_layers:
            new_cache = (
                stream_x.astype(jnp.float32) - snap_lo[0],
                text_x.astype(jnp.float32) - snap_lo[1],
            )

        hq = stream_x[:, 0]
        hq = AdaLayerNormContinuous(
            cfg.inner_dim, dtype=cfg.dtype, param_dtype=cfg.param_dtype,
            name="norm_out",
        )(hq, temb)
        hq = nn.Dense(
            cfg.patch_size * cfg.patch_size * cfg.out_channels,
            dtype=cfg.dtype,
            param_dtype=cfg.param_dtype,
            name="proj_out",
        )(hq)
        out = unpatchify(hq, h, w, cfg.patch_size)

        feat_arr = jnp.stack(feats) if feats else None
        if cache_mode == "capture":
            return out, feat_arr, new_cache
        return out, feat_arr


def fold_control_projections(params: Dict, cfg: MMDiTConfig) -> Dict:
    """Inference-only algebraic fold: the composed control projection
    W_s(W_base(x) ) = x @ (K_base @ K_s) + (b_base @ K_s + b_s) becomes one
    matmul. Use with a config where folded_control=True. Exact math — saves
    one (N, D, D) matmul per stream per projection per attention instance
    (~10% of forward FLOPs at SD3.5-medium geometry)."""
    import flax

    params = flax.core.unfreeze(jax.tree.map(lambda x: x, params))
    for i in range(cfg.num_layers):
        blk = params["params"][f"blocks_{i}"]
        for attn_name in ("attn", "attn2"):
            attn = blk.get(attn_name)
            if attn is None:
                continue
            for s in cfg.streams[1:]:
                for p in ("q", "k", "v"):
                    base = attn[f"to_{p}"]
                    ctrl = attn[f"to_{p}_{s}"]
                    ctrl["bias"] = base["bias"] @ ctrl["kernel"] + ctrl["bias"]
                    ctrl["kernel"] = base["kernel"] @ ctrl["kernel"]
    return params


def init_out_proj_surgery(params: Dict, cfg: MMDiTConfig) -> Dict:
    """Copy each block's base to_out weights into the per-stream out
    projections, matching the reference's init (attention.py:429-431:
    to_out_control starts as a copy of to_out)."""
    import flax

    params = flax.core.unfreeze(params)
    for i in range(cfg.num_layers):
        blk = params["params"][f"blocks_{i}"]
        for attn_name in ("attn", "attn2"):
            if attn_name not in blk:
                continue
            attn = blk[attn_name]
            for s in cfg.streams[1:]:
                key = f"to_out_{s}"
                if key in attn:
                    attn[key]["kernel"] = attn["to_out"]["kernel"].copy()
                    attn[key]["bias"] = attn["to_out"]["bias"].copy()
    return params


def init_mmdit(rng, cfg: MMDiTConfig, batch: int = 1, text_len: int = 154):
    """Initialize MMDiT params with the reference's out-projection surgery."""
    model = MMDiT(cfg)
    size = cfg.sample_size if cfg.sample_size <= 64 else 64
    lat = jnp.zeros((batch, size, size, cfg.in_channels), cfg.dtype)
    txt = jnp.zeros((batch, text_len, cfg.joint_attention_dim), cfg.dtype)
    pool = jnp.zeros((batch, cfg.pooled_projection_dim), cfg.dtype)
    t = jnp.zeros((batch,), jnp.float32)
    params = model.init(rng, lat, lat, txt, pool, t)
    return model, init_out_proj_surgery(params, cfg)
