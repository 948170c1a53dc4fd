"""TESTR numeric parity vs an independent torch oracle.

The oracle implements the reference's architecture
(testr/adet/layers/deformable_transformer.py + modeling/testr/models.py)
with torch built-ins — F.multi_head_attention_forward for the intra/inter
attentions (the reference uses nn.MultiheadAttention), F.grid_sample for the
deformable sampling core (the reference's pytorch path,
ms_deform_attn.py:39-60), F.layer_norm / F.group_norm / F.conv2d — loaded
with weights copied from the flax tree. It checks the full forward: feature
fusion, encoder, two-stage proposals, top-K selection, composite decoder,
and all prediction heads.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as TF  # noqa: E402

from dit4sr_tpu.config import TESTRConfig  # noqa: E402
from dit4sr_tpu.models.testr.model import TESTR  # noqa: E402

pytestmark = pytest.mark.slow

B, HW, C_IN, LF = 2, 8, 12, 4


def _cfg():
    return TESTRConfig(
        d_model=32,
        nheads=4,
        num_encoder_layers=2,
        num_decoder_layers=2,
        dim_feedforward=64,
        dropout=0.0,
        num_feature_levels=2,
        enc_n_points=2,
        dec_n_points=2,
        num_queries=12,
        num_ctrl_points=4,
        max_text_len=6,
        voc_size=10,
        num_dit_layers=LF,
        dit_dim=C_IN * 2,
        remat=False,
        deform_impl="xla",
    )


def t(x):
    return torch.from_numpy(np.asarray(x, np.float32))


def lin(p, x):
    return x @ t(p["kernel"]) + t(p["bias"])


def ln(p, x, eps=1e-5):
    return TF.layer_norm(x, (x.shape[-1],), t(p["scale"]), t(p["bias"]), eps)


def gn(p, x, groups, eps=1e-5):
    # x NCHW
    return TF.group_norm(x, groups, t(p["scale"]), t(p["bias"]), eps)


def conv(p, x, padding=0):
    # flax kernel (kh, kw, cin, cout) -> torch (cout, cin, kh, kw); x NCHW
    w = t(p["kernel"]).permute(3, 2, 0, 1)
    return TF.conv2d(x, w, t(p["bias"]), padding=padding)


def mha(p, q, k, v, nheads):
    """torch MHA (the reference's nn.MultiheadAttention) with our separate
    q/k/v projection weights packed into in_proj."""
    d = q.shape[-1]
    lead = q.shape[:-2]
    qf = q.reshape(-1, *q.shape[-2:]).transpose(0, 1)  # (L, N, E)
    kf = k.reshape(-1, *k.shape[-2:]).transpose(0, 1)
    vf = v.reshape(-1, *v.shape[-2:]).transpose(0, 1)
    in_w = torch.cat(
        [t(p[n]["kernel"]).T for n in ("q_proj", "k_proj", "v_proj")], dim=0
    )
    in_b = torch.cat([t(p[n]["bias"]) for n in ("q_proj", "k_proj", "v_proj")])
    out, _ = TF.multi_head_attention_forward(
        qf, kf, vf, d, nheads, in_w, in_b, None, None, False, 0.0,
        t(p["out_proj"]["kernel"]).T, t(p["out_proj"]["bias"]),
        need_weights=False,
    )
    return out.transpose(0, 1).reshape(*lead, *q.shape[-2:])


def msda_core(value, shapes, loc, attw):
    """The reference's pytorch sampling core (ms_deform_attn.py:39-60):
    per-level grid_sample, zero padding, align_corners=False."""
    Bv, S, M, Dh = value.shape
    _, Q, _, L, P, _ = loc.shape
    start = 0
    out = torch.zeros(Bv, Q, M, Dh)
    for lvl, (H, W) in enumerate(shapes):
        v = value[:, start : start + H * W]                    # (B, HW, M, Dh)
        v = v.permute(0, 2, 3, 1).reshape(Bv * M, Dh, H, W)
        grid = 2.0 * loc[:, :, :, lvl] - 1.0                   # (B, Q, M, P, 2)
        grid = grid.permute(0, 2, 1, 3, 4).reshape(Bv * M, Q, P, 2)
        samp = TF.grid_sample(
            v, grid, mode="bilinear", padding_mode="zeros", align_corners=False
        )                                                      # (B*M, Dh, Q, P)
        w = attw[:, :, :, lvl].permute(0, 2, 1, 3).reshape(Bv * M, 1, Q, P)
        out += (samp * w).sum(-1).reshape(Bv, M, Dh, Q).permute(0, 3, 1, 2)
        start += H * W
    return out.reshape(Bv, Q, M * Dh)


def msda(p, cfg, n_points, shapes, query, ref, value_src):
    M, L, P = cfg.nheads, len(shapes), n_points
    d = cfg.d_model
    Bq, Q, _ = query.shape
    S = value_src.shape[1]
    value = lin(p["value_proj"], value_src).reshape(Bq, S, M, d // M)
    off = lin(p["sampling_offsets"], query).reshape(Bq, Q, M, L, P, 2)
    attw = lin(p["attention_weights"], query).reshape(Bq, Q, M, L * P)
    attw = torch.softmax(attw, dim=-1).reshape(Bq, Q, M, L, P)
    if ref.shape[-1] == 2:
        normalizer = torch.tensor(
            [[w, h] for h, w in shapes], dtype=torch.float32
        )
        loc = ref[:, :, None, :, None, :] + off / normalizer[None, None, None, :, None, :]
    else:
        loc = (
            ref[:, :, None, :, None, :2]
            + off / P * ref[:, :, None, :, None, 2:] * 0.5
        )
    return lin(p["output_proj"], msda_core(value, shapes, loc, attw))


def ffn(p, x):
    h = torch.relu(lin(p["linear1"], x))
    h = lin(p["linear2"], h)
    return ln(p["norm"], x + h)


def fusion(p, x, d_model):
    # x (B, H, W, Cin) -> NCHW
    x = x.permute(0, 3, 1, 2)
    mid = 4 * d_model
    h = conv(p["proj_0"], x)
    h = gn(p["proj_1"], h, 32 if mid % 32 == 0 else math.gcd(mid, 32))
    h = TF.gelu(h)
    h = conv(p["proj_3"], h)
    h = TF.gelu(h)
    h = conv(p["proj_5"], h, padding=1)
    h = gn(p["proj_6"], h, 32 if d_model % 32 == 0 else math.gcd(d_model, 32))
    h = TF.gelu(h)
    out = h + conv(p["shortcut"], x)
    return out.permute(0, 2, 3, 1)


def sine_2d(h, w, num_pos_feats):
    scale = 2 * math.pi
    y = (torch.arange(1, h + 1, dtype=torch.float64) - 0.5) / (h + 1e-6) * scale
    x = (torch.arange(1, w + 1, dtype=torch.float64) - 0.5) / (w + 1e-6) * scale
    dim_t = torch.arange(num_pos_feats, dtype=torch.float64)
    dim_t = 10000 ** (2 * torch.div(dim_t, 2, rounding_mode="floor") / num_pos_feats)
    px = x[None, :, None] / dim_t
    py = y[:, None, None] / dim_t
    px = px.expand(h, w, num_pos_feats)
    py = py.expand(h, w, num_pos_feats)

    def inter(p):
        return torch.stack([p[..., 0::2].sin(), p[..., 1::2].cos()], -1).reshape(h, w, -1)

    return torch.cat([inter(py), inter(px)], -1).float()


def sine_1d(length, channels):
    scale = 2 * math.pi
    pos = torch.arange(1, length + 1, dtype=torch.float64)
    pos = pos / (pos[-1] + 1e-6) * scale
    inv = 1.0 / (10000 ** (torch.arange(0, channels, 2, dtype=torch.float64) / channels))
    ang = pos[:, None] * inv[None]
    return torch.cat([ang.sin(), ang.cos()], -1).float()


def pos_embed_from_logits(coords):
    num_pos_feats, temperature = 64, 10000
    scale = 2 * math.pi
    dim_t = torch.arange(num_pos_feats, dtype=torch.float32)
    dim_t = temperature ** (2 * torch.div(dim_t, 2, rounding_mode="floor") / num_pos_feats)
    pos = coords.sigmoid() * scale
    pos = pos[..., None] / dim_t
    pos = torch.stack([pos[..., 0::2].sin(), pos[..., 1::2].cos()], -1)
    return pos.reshape(*coords.shape[:-1], -1)


def mlp(p, x, n_layers):
    for i in range(n_layers - 1):
        x = torch.relu(lin(p[f"layers_{i}"], x))
    return lin(p[f"layers_{n_layers - 1}"], x)


def oracle_forward(params, cfg, feats_np):
    p = params["params"]
    nlev = cfg.num_feature_levels
    Lf, Bv, H, W, C = feats_np.shape
    shapes = [(H, W) for _ in range(nlev)]
    per = Lf // nlev
    feats = t(feats_np)

    srcs = [
        fusion(
            p[f"feat_proj_{l}"],
            torch.cat([feats[l * per + i] for i in range(per)], -1),
            cfg.d_model,
        )
        for l in range(nlev)
    ]

    pos2d = sine_2d(H, W, cfg.d_model // 2)
    lvl_emb = t(p["level_embed"])
    src_flat = torch.cat([s.reshape(Bv, H * W, cfg.d_model) for s in srcs], 1)
    pos_flat = torch.cat(
        [
            (pos2d.reshape(1, H * W, cfg.d_model) + lvl_emb[l]).expand(Bv, -1, -1)
            for l in range(nlev)
        ],
        1,
    )

    refs = []
    for h, w in shapes:
        ys = (torch.arange(h, dtype=torch.float32) + 0.5) / h
        xs = (torch.arange(w, dtype=torch.float32) + 0.5) / w
        gy, gx = torch.meshgrid(ys, xs, indexing="ij")
        refs.append(torch.stack([gx.reshape(-1), gy.reshape(-1)], -1))
    ref_points = torch.cat(refs, 0)[None, :, None, :].expand(Bv, -1, nlev, -1)

    memory = src_flat
    for i in range(cfg.num_encoder_layers):
        ep = p[f"encoder_{i}"]
        attn = msda(
            ep["self_attn"], cfg, cfg.enc_n_points, shapes,
            memory + pos_flat, ref_points, memory,
        )
        memory = ln(ep["norm1"], memory + attn)
        memory = ffn(ep["ffn"], memory)

    props = []
    for lvl, (h, w) in enumerate(shapes):
        ys = (torch.arange(h, dtype=torch.float32) + 0.5) / h
        xs = (torch.arange(w, dtype=torch.float32) + 0.5) / w
        gy, gx = torch.meshgrid(ys, xs, indexing="ij")
        grid = torch.stack([gx.reshape(-1), gy.reshape(-1)], -1)
        wh = torch.full_like(grid, 0.05 * 2.0 ** lvl)
        props.append(torch.cat([grid, wh], -1))
    props = torch.cat(props, 0)
    valid = ((props > 0.01) & (props < 0.99)).all(-1)
    props = torch.log(props / (1 - props))
    props = torch.where(valid[:, None], props, torch.tensor(float("inf")))
    props = props[None].expand(Bv, -1, -1)

    out_mem = torch.where(valid[None, :, None], memory, torch.tensor(0.0))
    out_mem = ln(p["enc_output_norm"], lin(p["enc_output"], out_mem))

    enc_logits = lin(p["bbox_class"], out_mem)
    enc_boxes_unact = mlp(p["bbox_coord"], out_mem, 3) + props

    K = cfg.num_queries
    scores = torch.where(valid[None], enc_logits[..., 0], torch.tensor(float("-inf")))
    topk_idx = scores.topk(K, dim=1).indices
    topk_coords = torch.gather(
        enc_boxes_unact, 1, topk_idx[..., None].expand(-1, -1, 4)
    ).detach()
    reference_points = topk_coords.sigmoid()

    query_pos = ln(
        p["pos_trans_norm"], lin(p["pos_trans"], pos_embed_from_logits(topk_coords))
    )

    Np, Nw = cfg.num_ctrl_points, cfg.max_text_len
    tgt = t(p["ctrl_point_embed"])[None, None].expand(Bv, K, Np, cfg.d_model)
    txt = t(p["text_embed"])[None, None].expand(Bv, K, Nw, cfg.d_model)
    qpos = query_pos[:, :, None].expand(-1, -1, Np, -1)
    tpos = sine_1d(Nw, cfg.d_model)[None, None].expand(Bv, K, Nw, cfg.d_model)

    ref_b = reference_points[:, :, None].expand(-1, -1, nlev, -1)

    ctrl_logits, ctrl_points, text_logits = [], [], []
    for i in range(cfg.num_decoder_layers):
        dp = p[f"decoder_{i}"]
        q = tgt + qpos
        t2 = mha(dp["attn_intra"], q, q, tgt, cfg.nheads)
        tgt = ln(dp["norm_intra"], tgt + t2)

        ti = tgt.transpose(1, 2)
        t2 = mha(dp["attn_inter"], ti, ti, ti, cfg.nheads)
        tgt = ln(dp["norm_inter"], ti + t2).transpose(1, 2)

        ref = ref_b[:, :, None].expand(-1, -1, Np, -1, -1).reshape(Bv, K * Np, nlev, 4)
        t2 = msda(
            dp["attn_cross"], cfg, cfg.dec_n_points, shapes,
            (tgt + qpos).reshape(Bv, K * Np, cfg.d_model), ref, memory,
        ).reshape(Bv, K, Np, cfg.d_model)
        tgt = ln(dp["norm_cross"], tgt + t2)

        qt = txt + tpos
        t2 = mha(dp["attn_intra_text"], qt, qt, txt, cfg.nheads)
        txt = ln(dp["norm_intra_text"], txt + t2)

        ti = txt.transpose(1, 2)
        t2 = mha(dp["attn_inter_text"], ti, ti, ti, cfg.nheads)
        txt = ln(dp["norm_inter_text"], ti + t2).transpose(1, 2)

        reft = ref_b[:, :, None].expand(-1, -1, Nw, -1, -1).reshape(Bv, K * Nw, nlev, 4)
        t2 = msda(
            dp["attn_cross_text"], cfg, cfg.dec_n_points, shapes,
            (txt + tpos).reshape(Bv, K * Nw, cfg.d_model), reft, memory,
        ).reshape(Bv, K, Nw, cfg.d_model)
        txt = ln(dp["norm_cross_text"], txt + t2)

        tgt = ffn(dp["ffn"], tgt)
        txt = ffn(dp["ffn_text"], txt)

        ref_inv = torch.log(
            reference_points.clamp(1e-5, 1 - 1e-5)
            / (1 - reference_points.clamp(1e-5, 1 - 1e-5))
        )
        coord = mlp(p["ctrl_point_coord"], tgt, 3) + ref_inv[:, :, None, :2]
        ctrl_logits.append(lin(p["ctrl_point_class"], tgt))
        ctrl_points.append(coord.sigmoid())
        text_logits.append(lin(p["text_class"], txt))

    return {
        "ctrl_logits": torch.stack(ctrl_logits),
        "ctrl_points": torch.stack(ctrl_points),
        "text_logits": torch.stack(text_logits),
        "enc_logits": enc_logits,
        "enc_boxes_unact": enc_boxes_unact,
        "topk_idx": topk_idx,
    }


def test_testr_forward_matches_torch_oracle():
    cfg = _cfg()
    rng = np.random.default_rng(0)
    feats = rng.normal(size=(LF, B, HW, HW, C_IN)).astype(np.float32) * 0.5

    model = TESTR(cfg, feat_hw=(HW, HW))
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(feats))
    out = model.apply(params, jnp.asarray(feats))

    with torch.no_grad():
        ref = oracle_forward(
            jax.tree.map(np.asarray, params), cfg, feats
        )

    # the valid-masked encoder cells have -inf/masked logits in neither
    # comparison; compare everything directly
    np.testing.assert_allclose(
        np.asarray(out.enc_logits), ref["enc_logits"].numpy(), atol=2e-4,
        err_msg="enc_logits",
    )
    # enc_boxes_unact is inf on invalid proposals in both; compare finite
    a, b = np.asarray(out.enc_boxes_unact), ref["enc_boxes_unact"].numpy()
    mask = np.isfinite(b)
    assert (np.isfinite(a) == mask).all()
    np.testing.assert_allclose(a[mask], b[mask], atol=2e-4, err_msg="enc_boxes")
    np.testing.assert_allclose(
        np.asarray(out.ctrl_logits), ref["ctrl_logits"].numpy(), atol=1e-3,
        err_msg="ctrl_logits",
    )
    np.testing.assert_allclose(
        np.asarray(out.ctrl_points), ref["ctrl_points"].numpy(), atol=1e-3,
        err_msg="ctrl_points",
    )
    np.testing.assert_allclose(
        np.asarray(out.text_logits), ref["text_logits"].numpy(), atol=1e-3,
        err_msg="text_logits",
    )
