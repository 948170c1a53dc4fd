"""TESTR text-spotting transformer (deformable-DETR with a text branch).

TPU rebuild of testr/adet/modeling/testr/models.py +
adet/layers/deformable_transformer.py: a FeatFusionBlock pyramid over
extracted MMDiT features, a 6-layer deformable encoder, two-stage top-K
proposal selection, and a 6-layer composite decoder with factorized
location/text branches, all running in fp32 (the reference keeps TESTR out of
autocast; initialize.py:626-633).

TPU adaptations:
  * feature levels have static spatial shapes, so the deformable sampling is
    a fixed XLA gather program (ops/deform_attn.py) — no CUDA im2col;
  * the DiT4SR path never pads images (fixed 512x512,
    transformer_detector.py:87-106), so valid-ratio plumbing collapses to 1
    and padding masks are dropped — documented divergence;
  * the top-K proposal gather and iterative heads are plain jnp ops inside
    one jitted forward.
"""

from __future__ import annotations

import math
from typing import Any, List, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from dit4sr_tpu.config import TESTRConfig
from dit4sr_tpu.ops.deform_attn import ms_deform_attn


# ---------------------------------------------------------------------------
# positional encodings (adet/layers/pos_encoding.py)
# ---------------------------------------------------------------------------


def sine_pos_1d(length: int, channels: int, scale: float = 2 * math.pi) -> np.ndarray:
    """Normalized 1D sine embedding for text-query positions
    (PositionalEncoding1D, pos_encoding.py:5-43)."""
    pos = np.arange(1, length + 1, dtype=np.float64)
    pos = pos / (pos[-1] + 1e-6) * scale
    dim_t = np.arange(0, channels, 2, dtype=np.float64)
    inv_freq = 1.0 / (10000 ** (dim_t / channels))
    ang = np.einsum("i,j->ij", pos, inv_freq)
    return np.concatenate([np.sin(ang), np.cos(ang)], axis=-1).astype(np.float32)


def sine_pos_2d(h: int, w: int, num_pos_feats: int = 128) -> np.ndarray:
    """(h, w, 2*num_pos_feats) normalized 2D sine embedding
    (PositionalEncoding2D, pos_encoding.py:46-83)."""
    scale = 2 * math.pi
    y = (np.arange(1, h + 1, dtype=np.float64) - 0.5) / (h + 1e-6) * scale
    x = (np.arange(1, w + 1, dtype=np.float64) - 0.5) / (w + 1e-6) * scale
    dim_t = np.arange(num_pos_feats, dtype=np.float64)
    dim_t = 10000 ** (2 * (dim_t // 2) / num_pos_feats)
    pos_x = x[None, :, None] / dim_t            # (1, w, F)
    pos_y = y[:, None, None] / dim_t            # (h, 1, F)
    pos_x = np.broadcast_to(pos_x, (h, w, num_pos_feats))
    pos_y = np.broadcast_to(pos_y, (h, w, num_pos_feats))

    def interleave(p):
        s = np.sin(p[..., 0::2])
        c = np.cos(p[..., 1::2])
        return np.stack([s, c], axis=-1).reshape(h, w, -1)

    return np.concatenate([interleave(pos_y), interleave(pos_x)], axis=-1).astype(
        np.float32
    )


def proposal_pos_embed(proposals: jnp.ndarray) -> jnp.ndarray:
    """Sine embed of top-K proposal logits -> (B, K, 256)
    (deformable_transformer.py:66-79)."""
    num_pos_feats, temperature = 64, 10000
    scale = 2 * math.pi
    dim_t = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = temperature ** (2 * jnp.floor(dim_t / 2) / num_pos_feats)
    pos = jax.nn.sigmoid(proposals) * scale
    pos = pos[..., None] / dim_t                    # (B, K, 4, 64)
    pos = jnp.stack(
        [jnp.sin(pos[..., 0::2]), jnp.cos(pos[..., 1::2])], axis=-1
    ).reshape(*pos.shape[:-2], 4, -1)
    return pos.reshape(*pos.shape[:-2], -1)         # (B, K, 256)


def inverse_sigmoid(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    x = jnp.clip(x, 0.0, 1.0)
    return jnp.log(jnp.clip(x, eps, None) / jnp.clip(1 - x, eps, None))


# ---------------------------------------------------------------------------
# building blocks
# ---------------------------------------------------------------------------


class MLP(nn.Module):
    """relu MLP head (models.py:12-25)."""

    hidden_dim: int
    out_dim: int
    num_layers: int

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers - 1):
            x = nn.relu(nn.Dense(self.hidden_dim, name=f"layers_{i}")(x))
        return nn.Dense(self.out_dim, name=f"layers_{self.num_layers - 1}")(x)


class GroupNorm32(nn.Module):
    groups: int = 32

    @nn.compact
    def __call__(self, x):
        return nn.GroupNorm(num_groups=self.groups, epsilon=1e-5)(x)


class FeatFusionBlock(nn.Module):
    """Fuses 6 stacked DiT feature maps into one d_model level
    (models.py:28-44). NHWC. mid = 4*d_model reproduces the reference's 1024
    at d_model=256."""

    d_model: int

    @nn.compact
    def __call__(self, x):  # (B, H, W, C_in)
        mid = 4 * self.d_model
        gn = lambda c: 32 if c % 32 == 0 else math.gcd(c, 32)  # noqa: E731
        h = nn.Conv(mid, (1, 1), name="proj_0")(x)
        h = nn.GroupNorm(num_groups=gn(mid), epsilon=1e-5, name="proj_1")(h)
        h = nn.gelu(h, approximate=False)  # torch nn.GELU default (erf)
        h = nn.Conv(self.d_model, (1, 1), name="proj_3")(h)
        h = nn.gelu(h, approximate=False)  # torch nn.GELU default (erf)
        h = nn.Conv(self.d_model, (3, 3), padding=1, name="proj_5")(h)
        h = nn.GroupNorm(num_groups=gn(self.d_model), epsilon=1e-5, name="proj_6")(h)
        h = nn.gelu(h, approximate=False)  # torch nn.GELU default (erf)
        short = nn.Conv(self.d_model, (1, 1), name="shortcut")(x)
        return h + short


class MSDeformAttn(nn.Module):
    """Deformable attention module (adet/layers/ms_deform_attn.py:68-153)
    over static-shape levels."""

    cfg: TESTRConfig
    n_points: int
    spatial_shapes: Tuple[Tuple[int, int], ...]

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,        # (B, Q, d)
        reference_points: jnp.ndarray,  # (B, Q, L, 2) or (B, Q, L, 4), in [0,1]
        value_src: jnp.ndarray,    # (B, S, d) flattened levels
    ):
        cfg = self.cfg
        d, M, L, P = cfg.d_model, cfg.nheads, len(self.spatial_shapes), self.n_points
        B, Q, _ = query.shape
        S = value_src.shape[1]

        value = nn.Dense(d, name="value_proj")(value_src).reshape(B, S, M, d // M)

        # directional bias init for sampling offsets (ms_deform_attn.py:101-110)
        def offset_bias_init(key, shape, dtype=jnp.float32):
            thetas = np.arange(M, dtype=np.float64) * (2.0 * math.pi / M)
            grid = np.stack([np.cos(thetas), np.sin(thetas)], -1)
            grid = grid / np.abs(grid).max(-1, keepdims=True)
            grid = np.tile(grid[:, None, None, :], (1, L, P, 1))
            for i in range(P):
                grid[:, :, i, :] *= i + 1
            return jnp.asarray(grid.reshape(-1), dtype)

        offsets = nn.Dense(
            M * L * P * 2,
            kernel_init=nn.initializers.zeros_init(),
            bias_init=offset_bias_init,
            name="sampling_offsets",
        )(query).reshape(B, Q, M, L, P, 2)
        weights = nn.Dense(
            M * L * P,
            kernel_init=nn.initializers.zeros_init(),
            bias_init=nn.initializers.zeros_init(),
            name="attention_weights",
        )(query).reshape(B, Q, M, L * P)
        weights = jax.nn.softmax(weights, axis=-1).reshape(B, Q, M, L, P)

        if reference_points.shape[-1] == 2:
            normalizer = jnp.asarray(
                [[w, h] for h, w in self.spatial_shapes], jnp.float32
            )  # (L, 2) in (x, y) order
            loc = (
                reference_points[:, :, None, :, None, :]
                + offsets / normalizer[None, None, None, :, None, :]
            )
        else:
            loc = (
                reference_points[:, :, None, :, None, :2]
                + offsets / P * reference_points[:, :, None, :, None, 2:] * 0.5
            )

        out = ms_deform_attn(
            value, self.spatial_shapes, loc, weights, impl=cfg.deform_impl
        )
        return nn.Dense(d, name="output_proj")(out)


class MHA(nn.Module):
    """Plain multi-head self-attention with separate qkv inputs (the decoder's
    intra/inter attentions; torch nn.MultiheadAttention equivalent, including
    its attention-probability dropout)."""

    cfg: TESTRConfig

    @nn.compact
    def __call__(self, q, k, v, deterministic: bool = True):
        cfg = self.cfg
        d, M = cfg.d_model, cfg.nheads
        dh = d // M

        def heads(x, name):
            return nn.Dense(d, name=name)(x).reshape(*x.shape[:-1], M, dh)

        qh = heads(q, "q_proj")
        kh = heads(k, "k_proj")
        vh = heads(v, "v_proj")
        logits = jnp.einsum("...qhd,...khd->...hqk", qh, kh) / math.sqrt(dh)
        probs = jax.nn.softmax(logits, axis=-1)
        probs = nn.Dropout(self.cfg.dropout)(probs, deterministic=deterministic)
        out = jnp.einsum("...hqk,...khd->...qhd", probs, vh)
        return nn.Dense(d, name="out_proj")(out.reshape(*q.shape[:-1], d))


class FFN(nn.Module):
    """relu FFN with the reference's dropout placement: after the activation
    and on the output before the residual (deformable_transformer.py:207-208,
    forward_ffn)."""

    cfg: TESTRConfig

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        drop = lambda h: nn.Dropout(self.cfg.dropout)(  # noqa: E731
            h, deterministic=deterministic
        )
        h = drop(nn.relu(nn.Dense(self.cfg.dim_feedforward, name="linear1")(x)))
        h = drop(nn.Dense(self.cfg.d_model, name="linear2")(h))
        return nn.LayerNorm(epsilon=1e-5, name="norm")(x + h)


class EncoderLayer(nn.Module):
    """Deformable self-attention encoder layer
    (deformable_transformer.py:183-222), dropout on the attention output
    before the residual (dropout1, :214-216).

    Remat granularity: only the FFN is rematerialized — recomputing the
    deformable gather in the backward pass costs ~0.8 s/step at the
    16k-proposal geometry, while its saved residuals are only ~60 MB/layer.
    The FFN hidden (S x 1024) is the memory-heavy, cheap-to-recompute part."""

    cfg: TESTRConfig
    spatial_shapes: Tuple[Tuple[int, int], ...]

    @nn.compact
    def __call__(self, src, pos, reference_points, deterministic: bool = True):
        attn = MSDeformAttn(
            self.cfg, self.cfg.enc_n_points, self.spatial_shapes, name="self_attn"
        )(src + pos, reference_points, src)
        attn = nn.Dropout(self.cfg.dropout)(attn, deterministic=deterministic)
        src = nn.LayerNorm(epsilon=1e-5, name="norm1")(src + attn)
        ffn_cls = (
            nn.remat(FFN, static_argnums=(2,))
            if self.cfg.remat and self.cfg.encoder_remat == "ffn"
            else FFN
        )
        return ffn_cls(self.cfg, name="ffn")(src, deterministic)


class CompositeDecoderLayer(nn.Module):
    """Location branch (intra-point, inter-object, deformable cross) +
    factorized text branch (deformable_transformer.py:355-518)."""

    cfg: TESTRConfig
    spatial_shapes: Tuple[Tuple[int, int], ...]

    @nn.compact
    def __call__(self, tgt, query_pos, tgt_text, text_pos, reference_points, src,
                 deterministic: bool = True):
        cfg = self.cfg
        B, K, Np, d = tgt.shape
        Nw = tgt_text.shape[2]
        # dropout on every attention output before its residual, matching the
        # reference's dropout_{intra,inter,cross}[_text] (:355-430)
        drop = lambda h: nn.Dropout(cfg.dropout)(  # noqa: E731
            h, deterministic=deterministic
        )

        # location: intra-object self-attn over points
        q = k = tgt + query_pos
        t2 = MHA(cfg, name="attn_intra")(q, k, tgt, deterministic)
        tgt = nn.LayerNorm(epsilon=1e-5, name="norm_intra")(tgt + drop(t2))

        # inter-object self-attn (swap object/point axes)
        ti = jnp.swapaxes(tgt, 1, 2)
        t2 = MHA(cfg, name="attn_inter")(ti, ti, ti, deterministic)
        ti = nn.LayerNorm(epsilon=1e-5, name="norm_inter")(ti + drop(t2))
        tgt = jnp.swapaxes(ti, 1, 2)

        # deformable cross-attn: queries = all K*Np points
        ref = jnp.repeat(reference_points[:, :, None], Np, axis=2).reshape(
            B, K * Np, *reference_points.shape[2:]
        )
        t2 = MSDeformAttn(cfg, cfg.dec_n_points, self.spatial_shapes, name="attn_cross")(
            (tgt + query_pos).reshape(B, K * Np, d), ref, src
        ).reshape(B, K, Np, d)
        tgt = nn.LayerNorm(epsilon=1e-5, name="norm_cross")(tgt + drop(t2))

        # text: intra-word self-attn
        qt = kt = tgt_text + text_pos
        t2 = MHA(cfg, name="attn_intra_text")(qt, kt, tgt_text, deterministic)
        txt = nn.LayerNorm(epsilon=1e-5, name="norm_intra_text")(tgt_text + drop(t2))

        # text: inter-object self-attn
        ti = jnp.swapaxes(txt, 1, 2)
        t2 = MHA(cfg, name="attn_inter_text")(ti, ti, ti, deterministic)
        ti = nn.LayerNorm(epsilon=1e-5, name="norm_inter_text")(ti + drop(t2))
        txt = jnp.swapaxes(ti, 1, 2)

        # text: deformable cross-attn
        reft = jnp.repeat(reference_points[:, :, None], Nw, axis=2).reshape(
            B, K * Nw, *reference_points.shape[2:]
        )
        t2 = MSDeformAttn(
            cfg, cfg.dec_n_points, self.spatial_shapes, name="attn_cross_text"
        )((txt + text_pos).reshape(B, K * Nw, d), reft, src).reshape(B, K, Nw, d)
        txt = nn.LayerNorm(epsilon=1e-5, name="norm_cross_text")(txt + drop(t2))

        tgt = FFN(cfg, name="ffn")(tgt, deterministic)
        txt = FFN(cfg, name="ffn_text")(txt, deterministic)
        return tgt, txt


# ---------------------------------------------------------------------------
# full model
# ---------------------------------------------------------------------------


class TESTROutput(NamedTuple):
    # per decoder layer (Ldec leading axis)
    ctrl_logits: jnp.ndarray    # (Ldec, B, K, Np, 1)
    ctrl_points: jnp.ndarray    # (Ldec, B, K, Np, 2) in [0,1]
    text_logits: jnp.ndarray    # (Ldec, B, K, Nw, voc+1)
    enc_logits: jnp.ndarray     # (B, S, 1)
    enc_boxes: jnp.ndarray      # (B, S, 4) cxcywh, sigmoided
    enc_boxes_unact: jnp.ndarray  # (B, S, 4) pre-sigmoid (for losses)


class TESTR(nn.Module):
    """End-to-end text spotter over extracted MMDiT features."""

    cfg: TESTRConfig
    feat_hw: Tuple[int, int] = (64, 64)   # unpatchified DiT feature size

    @nn.compact
    def __call__(
        self, feats: jnp.ndarray, deterministic: bool = True
    ) -> TESTROutput:
        """feats: (num_layers_extracted, B, H, W, C) stacked NHWC DiT features
        (already unpatchified; C = dit_dim//4 per stream x num streams).
        `deterministic=False` enables dropout (rate cfg.dropout, reference
        deformable_transformer.py:186-208) — needs an rngs={'dropout': ...}."""
        cfg = self.cfg
        nlev = cfg.num_feature_levels
        Lf, B, H, W, C = feats.shape
        shapes = tuple((H, W) for _ in range(nlev))
        per_level = Lf // nlev

        # 4 pyramid levels: concat 6 consecutive layers channel-wise
        # (models.py:242-253)
        srcs = []
        for l in range(nlev):
            group = feats[l * per_level : (l + 1) * per_level]
            x = jnp.concatenate([group[i] for i in range(per_level)], axis=-1)
            srcs.append(FeatFusionBlock(cfg.d_model, name=f"feat_proj_{l}")(x))

        pos2d = jnp.asarray(sine_pos_2d(H, W, cfg.d_model // 2))
        level_embed = self.param(
            "level_embed", nn.initializers.normal(1.0), (nlev, cfg.d_model)
        )

        src_flat = jnp.concatenate(
            [s.reshape(B, H * W, cfg.d_model) for s in srcs], axis=1
        )
        pos_flat = jnp.concatenate(
            [
                (pos2d.reshape(1, H * W, cfg.d_model) + level_embed[l]).repeat(B, 0)
                for l in range(nlev)
            ],
            axis=1,
        )

        # encoder reference points: per-level pixel centers broadcast to all
        # levels (valid ratios are 1 — no padding in the DiT4SR path)
        refs = []
        for h, w in shapes:
            ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
            xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
            gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
            refs.append(jnp.stack([gx.reshape(-1), gy.reshape(-1)], -1))
        ref_points = jnp.concatenate(refs, axis=0)           # (S, 2)
        ref_points = jnp.broadcast_to(
            ref_points[None, :, None, :], (B, ref_points.shape[0], nlev, 2)
        )

        # encoder remat granularity: see TESTRConfig.encoder_remat
        enc_cls = (
            nn.remat(EncoderLayer, static_argnums=(4,))
            if cfg.remat and cfg.encoder_remat == "layer"
            else EncoderLayer
        )
        memory = src_flat
        for i in range(cfg.num_encoder_layers):
            memory = enc_cls(cfg, shapes, name=f"encoder_{i}")(
                memory, pos_flat, ref_points, deterministic
            )

        # two-stage proposals (deformable_transformer.py:81-112,151-168)
        proposals = []
        for lvl, (h, w) in enumerate(shapes):
            ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
            xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
            gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
            grid = jnp.stack([gx.reshape(-1), gy.reshape(-1)], -1)
            wh = jnp.full_like(grid, 0.05 * (2.0 ** lvl))
            proposals.append(jnp.concatenate([grid, wh], -1))
        proposals = jnp.concatenate(proposals, axis=0)       # (S, 4)
        valid = jnp.all((proposals > 0.01) & (proposals < 0.99), axis=-1)
        proposals = jnp.log(proposals / (1 - proposals))
        proposals = jnp.where(valid[:, None], proposals, jnp.inf)
        proposals = jnp.broadcast_to(proposals[None], (B, *proposals.shape))

        out_memory = jnp.where(valid[None, :, None], memory, 0.0)
        out_memory = nn.LayerNorm(epsilon=1e-5, name="enc_output_norm")(
            nn.Dense(cfg.d_model, name="enc_output")(out_memory)
        )

        bbox_class = nn.Dense(
            cfg.num_classes,
            bias_init=nn.initializers.constant(-math.log((1 - 0.01) / 0.01)),
            name="bbox_class",
        )
        bbox_coord = MLP(cfg.d_model, 4, 3, name="bbox_coord")
        enc_logits = bbox_class(out_memory)                  # (B, S, 1)
        enc_boxes_unact = bbox_coord(out_memory) + proposals

        K = cfg.num_queries
        # mask invalid cells out of the top-K (their logits aren't comparable)
        topk_scores = jnp.where(valid[None], enc_logits[..., 0], -jnp.inf)
        _, topk_idx = jax.lax.top_k(topk_scores, K)          # (B, K)
        topk_coords = jnp.take_along_axis(
            enc_boxes_unact, topk_idx[..., None], axis=1
        )                                                    # (B, K, 4)
        topk_coords = jax.lax.stop_gradient(topk_coords)
        reference_points = jax.nn.sigmoid(topk_coords)       # (B, K, 4)

        query_pos = nn.LayerNorm(epsilon=1e-5, name="pos_trans_norm")(
            nn.Dense(cfg.d_model, name="pos_trans")(proposal_pos_embed(topk_coords))
        )                                                    # (B, K, d)

        ctrl_embed = self.param(
            "ctrl_point_embed", nn.initializers.normal(1.0),
            (cfg.num_ctrl_points, cfg.d_model),
        )
        text_embed = self.param(
            "text_embed", nn.initializers.normal(1.0),
            (cfg.max_text_len, cfg.d_model),
        )
        text_pos = jnp.asarray(sine_pos_1d(cfg.max_text_len, cfg.d_model))

        tgt = jnp.broadcast_to(
            ctrl_embed[None, None], (B, K, cfg.num_ctrl_points, cfg.d_model)
        )
        tgt_text = jnp.broadcast_to(
            text_embed[None, None], (B, K, cfg.max_text_len, cfg.d_model)
        )
        qpos = jnp.repeat(query_pos[:, :, None], cfg.num_ctrl_points, axis=2)
        tpos = jnp.broadcast_to(
            text_pos[None, None], (B, K, cfg.max_text_len, cfg.d_model)
        )

        # heads are shared across decoder layers (models.py:205-209)
        ctrl_class = nn.Dense(
            cfg.num_classes,
            bias_init=nn.initializers.constant(-math.log((1 - 0.01) / 0.01)),
            name="ctrl_point_class",
        )
        ctrl_coord = MLP(cfg.d_model, 2, 3, name="ctrl_point_coord")
        text_class = nn.Dense(cfg.voc_size + 1, name="text_class")

        ref_broadcast = jnp.repeat(
            reference_points[:, :, None], nlev, axis=2
        )  # (B, K, L, 4); valid ratios = 1

        dec_cls = (
            nn.remat(CompositeDecoderLayer, static_argnums=(7,)) if cfg.remat
            else CompositeDecoderLayer
        )
        logits_layers, coords_layers, text_layers = [], [], []
        for i in range(cfg.num_decoder_layers):
            tgt, tgt_text = dec_cls(
                cfg, shapes, name=f"decoder_{i}"
            )(tgt, qpos, tgt_text, tpos, ref_broadcast, memory, deterministic)
            ref_inv = inverse_sigmoid(reference_points)       # (B, K, 4)
            coord = ctrl_coord(tgt) + ref_inv[:, :, None, :2]
            logits_layers.append(ctrl_class(tgt))
            coords_layers.append(jax.nn.sigmoid(coord))
            text_layers.append(text_class(tgt_text))

        return TESTROutput(
            ctrl_logits=jnp.stack(logits_layers),
            ctrl_points=jnp.stack(coords_layers),
            text_logits=jnp.stack(text_layers),
            enc_logits=enc_logits,
            enc_boxes=jax.nn.sigmoid(enc_boxes_unact),
            enc_boxes_unact=enc_boxes_unact,
        )


def fuse_dit_features(
    feats: jnp.ndarray, patch_size: int, num_streams_extracted: int
) -> jnp.ndarray:
    """(Lext, B, S*N_tokens, D) MMDiT feature slices -> (Lext, B, H, W, C) NHWC
    maps, matching the reference unpatchify
    'b (N H W) (pH pW d) -> b (N d) (H pH) (W pW)' (train_dit4sr.py:289-294)
    but channel-last."""
    from einops import rearrange

    return rearrange(
        feats,
        "l b (n h w) (p q d) -> l b (h p) (w q) (n d)",
        n=num_streams_extracted,
        p=patch_size,
        q=patch_size,
        h=int(math.sqrt(feats.shape[2] // num_streams_extracted)),
    )
