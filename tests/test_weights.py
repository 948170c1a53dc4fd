"""Weight-conversion tests: build a synthetic torch-layout state dict with the
exact diffusers key names/shapes for a tiny geometry, convert, and check the
tree matches the flax init (the contract torch load_state_dict would check);
plus functional checks of the layout converters."""

import jax
import jax.numpy as jnp
import numpy as np

from dit4sr_tpu.config import mmdit_tiny, vae_tiny
from dit4sr_tpu.models.mmdit import MMDiT, init_mmdit
from dit4sr_tpu.models.vae import AutoencoderKL
from dit4sr_tpu.utils import weights as W


def _rng_dict():
    rng = np.random.default_rng(0)
    return lambda *shape: rng.normal(size=shape).astype(np.float32)


def _synthetic_mmdit_sd(cfg):
    """diffusers SD3Transformer2DModel key layout for our tiny config,
    WITHOUT control branches (vanilla SD3.5 checkpoint shape)."""
    g = _rng_dict()
    D = cfg.inner_dim
    sd = {
        "pos_embed.proj.weight": g(D, cfg.in_channels, 2, 2),
        "pos_embed.proj.bias": g(D),
        "time_text_embed.timestep_embedder.linear_1.weight": g(D, 256),
        "time_text_embed.timestep_embedder.linear_1.bias": g(D),
        "time_text_embed.timestep_embedder.linear_2.weight": g(D, D),
        "time_text_embed.timestep_embedder.linear_2.bias": g(D),
        "time_text_embed.text_embedder.linear_1.weight": g(D, cfg.pooled_projection_dim),
        "time_text_embed.text_embedder.linear_1.bias": g(D),
        "time_text_embed.text_embedder.linear_2.weight": g(D, D),
        "time_text_embed.text_embedder.linear_2.bias": g(D),
        "context_embedder.weight": g(cfg.caption_projection_dim, cfg.joint_attention_dim),
        "context_embedder.bias": g(cfg.caption_projection_dim),
        "norm_out.linear.weight": g(2 * D, D),
        "norm_out.linear.bias": g(2 * D),
        "proj_out.weight": g(4 * cfg.out_channels, D),
        "proj_out.bias": g(4 * cfg.out_channels),
    }
    hd = cfg.attention_head_dim
    for i in range(cfg.num_layers):
        tp = f"transformer_blocks.{i}"
        last = i == cfg.num_layers - 1
        dual = i in cfg.dual_attention_layers
        sd[f"{tp}.norm1.linear.weight"] = g((9 if dual else 6) * D, D)
        sd[f"{tp}.norm1.linear.bias"] = g((9 if dual else 6) * D)
        nc = 2 if last else 6
        sd[f"{tp}.norm1_context.linear.weight"] = g(nc * D, D)
        sd[f"{tp}.norm1_context.linear.bias"] = g(nc * D)
        attns = ["attn", "attn2"] if dual else ["attn"]
        for a in attns:
            for n in ("to_q", "to_k", "to_v"):
                sd[f"{tp}.{a}.{n}.weight"] = g(D, D)
                sd[f"{tp}.{a}.{n}.bias"] = g(D)
            sd[f"{tp}.{a}.to_out.0.weight"] = g(D, D)
            sd[f"{tp}.{a}.to_out.0.bias"] = g(D)
            sd[f"{tp}.{a}.norm_q.weight"] = g(hd)
            sd[f"{tp}.{a}.norm_k.weight"] = g(hd)
        sd[f"{tp}.attn.add_q_proj.weight"] = g(D, D)
        sd[f"{tp}.attn.add_q_proj.bias"] = g(D)
        sd[f"{tp}.attn.add_k_proj.weight"] = g(D, D)
        sd[f"{tp}.attn.add_k_proj.bias"] = g(D)
        sd[f"{tp}.attn.add_v_proj.weight"] = g(D, D)
        sd[f"{tp}.attn.add_v_proj.bias"] = g(D)
        sd[f"{tp}.attn.norm_added_q.weight"] = g(hd)
        sd[f"{tp}.attn.norm_added_k.weight"] = g(hd)
        if not last:
            sd[f"{tp}.attn.to_add_out.weight"] = g(D, D)
            sd[f"{tp}.attn.to_add_out.bias"] = g(D)
        sd[f"{tp}.ff.net.0.proj.weight"] = g(4 * D, D)
        sd[f"{tp}.ff.net.0.proj.bias"] = g(4 * D)
        sd[f"{tp}.ff.net.2.weight"] = g(D, 4 * D)
        sd[f"{tp}.ff.net.2.bias"] = g(D)
        if not last:
            sd[f"{tp}.ff_context.net.0.proj.weight"] = g(4 * D, D)
            sd[f"{tp}.ff_context.net.0.proj.bias"] = g(4 * D)
            sd[f"{tp}.ff_context.net.2.weight"] = g(D, 4 * D)
            sd[f"{tp}.ff_context.net.2.bias"] = g(D)
    return sd


def test_convert_mmdit_matches_init_tree():
    cfg = mmdit_tiny()
    sd = _synthetic_mmdit_sd(cfg)
    converted = W.convert_mmdit(sd, cfg)
    _, ref_params = init_mmdit(jax.random.PRNGKey(0), cfg, text_len=8)
    missing, unexpected = W.check_tree_matches(
        ref_params["params"], converted["params"]
    )
    assert missing == [], f"missing: {missing[:10]}"
    assert unexpected == [], f"unexpected: {unexpected[:10]}"

    # control branches: q/k/v zero, out copied from base
    attn = converted["params"]["blocks_0"]["attn"]
    assert np.abs(attn["to_q_control"]["kernel"]).max() == 0
    np.testing.assert_array_equal(
        attn["to_out_control"]["kernel"], attn["to_out"]["kernel"]
    )

    # converted params actually run
    model = MMDiT(cfg)
    lat = jnp.zeros((1, 16, 16, cfg.in_channels), cfg.dtype)
    txt = jnp.zeros((1, 8, cfg.joint_attention_dim), cfg.dtype)
    pool = jnp.zeros((1, cfg.pooled_projection_dim), cfg.dtype)
    conv_params = jax.tree.map(jnp.asarray, converted)
    out, _ = model.apply(conv_params, lat, lat, txt, pool, jnp.zeros((1,)))
    assert np.isfinite(np.asarray(out)).all()


def test_patch_linear_equals_conv():
    """Patchify-linear with converted weights == torch strided conv."""
    rng = np.random.default_rng(0)
    C, D, p = 3, 8, 2
    w = rng.normal(size=(D, C, p, p)).astype(np.float32)
    b = rng.normal(size=(D,)).astype(np.float32)
    x = rng.normal(size=(1, 4, 4, C)).astype(np.float32)

    # direct conv computation (stride=p), NHWC
    out_conv = np.zeros((1, 2, 2, D), np.float32)
    for i in range(2):
        for j in range(2):
            patch = x[0, i * p : (i + 1) * p, j * p : (j + 1) * p, :]  # (p,p,C)
            for d in range(D):
                out_conv[0, i, j, d] = (
                    np.sum(w[d].transpose(1, 2, 0) * patch) + b[d]
                )

    from dit4sr_tpu.models.embeddings import patchify

    kp = W.patch_linear(w, b)
    tokens = np.asarray(patchify(jnp.asarray(x), p))  # (1, 4, p*p*C)
    out_lin = tokens @ kp["kernel"] + kp["bias"]
    np.testing.assert_allclose(
        out_lin.reshape(1, 2, 2, D), out_conv, rtol=1e-5, atol=1e-5
    )


def _synthetic_vae_sd(cfg):
    g = _rng_dict()
    ch = cfg.block_out_channels

    def resnet(prefix, cin, cout, sd):
        sd[f"{prefix}.norm1.weight"] = g(cin)
        sd[f"{prefix}.norm1.bias"] = g(cin)
        sd[f"{prefix}.conv1.weight"] = g(cout, cin, 3, 3)
        sd[f"{prefix}.conv1.bias"] = g(cout)
        sd[f"{prefix}.norm2.weight"] = g(cout)
        sd[f"{prefix}.norm2.bias"] = g(cout)
        sd[f"{prefix}.conv2.weight"] = g(cout, cout, 3, 3)
        sd[f"{prefix}.conv2.bias"] = g(cout)
        if cin != cout:
            sd[f"{prefix}.conv_shortcut.weight"] = g(cout, cin, 1, 1)
            sd[f"{prefix}.conv_shortcut.bias"] = g(cout)

    def attn(prefix, c, sd):
        sd[f"{prefix}.group_norm.weight"] = g(c)
        sd[f"{prefix}.group_norm.bias"] = g(c)
        for n in ("to_q", "to_k", "to_v"):
            sd[f"{prefix}.{n}.weight"] = g(c, c)
            sd[f"{prefix}.{n}.bias"] = g(c)
        sd[f"{prefix}.to_out.0.weight"] = g(c, c)
        sd[f"{prefix}.to_out.0.bias"] = g(c)

    sd = {}
    # encoder
    sd["encoder.conv_in.weight"] = g(ch[0], cfg.in_channels, 3, 3)
    sd["encoder.conv_in.bias"] = g(ch[0])
    cin = ch[0]
    for i, c in enumerate(ch):
        for j in range(cfg.layers_per_block):
            resnet(f"encoder.down_blocks.{i}.resnets.{j}", cin if j == 0 else c, c, sd)
        cin = c
        if i < len(ch) - 1:
            sd[f"encoder.down_blocks.{i}.downsamplers.0.conv.weight"] = g(c, c, 3, 3)
            sd[f"encoder.down_blocks.{i}.downsamplers.0.conv.bias"] = g(c)
    resnet("encoder.mid_block.resnets.0", ch[-1], ch[-1], sd)
    attn("encoder.mid_block.attentions.0", ch[-1], sd)
    resnet("encoder.mid_block.resnets.1", ch[-1], ch[-1], sd)
    sd["encoder.conv_norm_out.weight"] = g(ch[-1])
    sd["encoder.conv_norm_out.bias"] = g(ch[-1])
    sd["encoder.conv_out.weight"] = g(2 * cfg.latent_channels, ch[-1], 3, 3)
    sd["encoder.conv_out.bias"] = g(2 * cfg.latent_channels)
    # decoder
    rch = tuple(reversed(ch))
    sd["decoder.conv_in.weight"] = g(rch[0], cfg.latent_channels, 3, 3)
    sd["decoder.conv_in.bias"] = g(rch[0])
    resnet("decoder.mid_block.resnets.0", rch[0], rch[0], sd)
    attn("decoder.mid_block.attentions.0", rch[0], sd)
    resnet("decoder.mid_block.resnets.1", rch[0], rch[0], sd)
    cin = rch[0]
    for i, c in enumerate(rch):
        for j in range(cfg.layers_per_block + 1):
            resnet(f"decoder.up_blocks.{i}.resnets.{j}", cin if j == 0 else c, c, sd)
        cin = c
        if i < len(rch) - 1:
            sd[f"decoder.up_blocks.{i}.upsamplers.0.conv.weight"] = g(c, c, 3, 3)
            sd[f"decoder.up_blocks.{i}.upsamplers.0.conv.bias"] = g(c)
    sd["decoder.conv_norm_out.weight"] = g(rch[-1])
    sd["decoder.conv_norm_out.bias"] = g(rch[-1])
    sd["decoder.conv_out.weight"] = g(cfg.out_channels, rch[-1], 3, 3)
    sd["decoder.conv_out.bias"] = g(cfg.out_channels)
    return sd


def test_convert_vae_matches_init_tree():
    cfg = vae_tiny()
    sd = _synthetic_vae_sd(cfg)
    converted = W.convert_vae(sd, cfg)
    vae = AutoencoderKL(cfg)
    ref = vae.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3), cfg.dtype))
    missing, unexpected = W.check_tree_matches(ref["params"], converted["params"])
    assert missing == [], f"missing: {missing[:10]}"
    assert unexpected == [], f"unexpected: {unexpected[:10]}"

    conv_params = jax.tree.map(jnp.asarray, converted)
    x = jnp.zeros((1, 32, 32, 3), cfg.dtype)
    mean, logvar = vae.apply(conv_params, x, method=AutoencoderKL.encode)
    assert np.isfinite(np.asarray(mean)).all()


def test_safetensors_roundtrip(tmp_path):
    """Write a tiny safetensors file by hand and read it back."""
    import json as js
    import struct

    arrs = {
        "a": np.arange(6, dtype=np.float32).reshape(2, 3),
        "b": np.ones((4,), np.float16),
    }
    header = {}
    offset = 0
    buf = b""
    for k, v in arrs.items():
        raw = v.tobytes()
        header[k] = {
            "dtype": {"float32": "F32", "float16": "F16"}[str(v.dtype)],
            "shape": list(v.shape),
            "data_offsets": [offset, offset + len(raw)],
        }
        offset += len(raw)
        buf += raw
    hjson = js.dumps(header).encode()
    path = tmp_path / "t.safetensors"
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(hjson)))
        f.write(hjson)
        f.write(buf)

    loaded = W.load_safetensors(str(path))
    np.testing.assert_array_equal(loaded["a"], arrs["a"])
    np.testing.assert_array_equal(loaded["b"], arrs["b"])


def _synthetic_testr_sd(cfg):
    """TransformerDetector key layout for the tiny config."""
    g = _rng_dict()
    d, dff = cfg.d_model, cfg.dim_feedforward
    L, P = cfg.num_feature_levels, 4  # enc/dec points share n_points=4 default
    M = cfg.nheads
    sd = {
        "testr.transformer.level_embed": g(L, d),
        "testr.transformer.enc_output.weight": g(d, d),
        "testr.transformer.enc_output.bias": g(d),
        "testr.transformer.enc_output_norm.weight": g(d),
        "testr.transformer.enc_output_norm.bias": g(d),
        "testr.transformer.pos_trans.weight": g(d, 256),
        "testr.transformer.pos_trans.bias": g(d),
        "testr.transformer.pos_trans_norm.weight": g(d),
        "testr.transformer.pos_trans_norm.bias": g(d),
        "testr.ctrl_point_embed.weight": g(cfg.num_ctrl_points, d),
        "testr.text_embed.weight": g(cfg.max_text_len, d),
        "testr.ctrl_point_class.0.weight": g(cfg.num_classes, d),
        "testr.ctrl_point_class.0.bias": g(cfg.num_classes),
        "testr.bbox_class.weight": g(cfg.num_classes, d),
        "testr.bbox_class.bias": g(cfg.num_classes),
        "testr.text_class.weight": g(cfg.voc_size + 1, d),
        "testr.text_class.bias": g(cfg.voc_size + 1),
    }
    for prefix, dims in (
        ("testr.ctrl_point_coord.0", (d, d, 2)),
        ("testr.bbox_coord", (d, d, 4)),
    ):
        cin = d
        for j, dout in enumerate(dims):
            sd[f"{prefix}.layers.{j}.weight"] = g(dout, cin)
            sd[f"{prefix}.layers.{j}.bias"] = g(dout)
            cin = dout

    in_ch = cfg.dit_dim * (cfg.num_dit_layers // cfg.num_feature_levels)
    mid = 4 * d
    for l in range(L):
        fp = f"testr.diff_feat_proj.{l}"
        sd[f"{fp}.proj.0.weight"] = g(mid, in_ch, 1, 1)
        sd[f"{fp}.proj.0.bias"] = g(mid)
        sd[f"{fp}.proj.1.weight"] = g(mid)
        sd[f"{fp}.proj.1.bias"] = g(mid)
        sd[f"{fp}.proj.3.weight"] = g(d, mid, 1, 1)
        sd[f"{fp}.proj.3.bias"] = g(d)
        sd[f"{fp}.proj.5.weight"] = g(d, d, 3, 3)
        sd[f"{fp}.proj.5.bias"] = g(d)
        sd[f"{fp}.proj.6.weight"] = g(d)
        sd[f"{fp}.proj.6.bias"] = g(d)
        sd[f"{fp}.shortcut.weight"] = g(d, in_ch, 1, 1)
        sd[f"{fp}.shortcut.bias"] = g(d)

    def msd(prefix, n_points):
        sd[f"{prefix}.sampling_offsets.weight"] = g(M * L * n_points * 2, d)
        sd[f"{prefix}.sampling_offsets.bias"] = g(M * L * n_points * 2)
        sd[f"{prefix}.attention_weights.weight"] = g(M * L * n_points, d)
        sd[f"{prefix}.attention_weights.bias"] = g(M * L * n_points)
        sd[f"{prefix}.value_proj.weight"] = g(d, d)
        sd[f"{prefix}.value_proj.bias"] = g(d)
        sd[f"{prefix}.output_proj.weight"] = g(d, d)
        sd[f"{prefix}.output_proj.bias"] = g(d)

    def mha(prefix):
        sd[f"{prefix}.in_proj_weight"] = g(3 * d, d)
        sd[f"{prefix}.in_proj_bias"] = g(3 * d)
        sd[f"{prefix}.out_proj.weight"] = g(d, d)
        sd[f"{prefix}.out_proj.bias"] = g(d)

    def ln(prefix):
        sd[f"{prefix}.weight"] = g(d)
        sd[f"{prefix}.bias"] = g(d)

    def ffn(prefix, norm_name):
        sd[f"{prefix}.linear1.weight"] = g(dff, d)
        sd[f"{prefix}.linear1.bias"] = g(dff)
        sd[f"{prefix}.linear2.weight"] = g(d, dff)
        sd[f"{prefix}.linear2.bias"] = g(d)
        ln(f"{prefix}.{norm_name}")

    for i in range(cfg.num_encoder_layers):
        ep = f"testr.transformer.encoder.layers.{i}"
        msd(f"{ep}.self_attn", cfg.enc_n_points)
        ln(f"{ep}.norm1")
        ffn(ep, "norm2")
    for i in range(cfg.num_decoder_layers):
        dp = f"testr.transformer.decoder.layers.{i}"
        for a in ("attn_intra", "attn_inter", "attn_intra_text", "attn_inter_text"):
            mha(f"{dp}.{a}")
        for a in ("attn_cross", "attn_cross_text"):
            msd(f"{dp}.{a}", cfg.dec_n_points)
        for nname in ("norm_intra", "norm_inter", "norm_cross",
                      "norm_intra_text", "norm_inter_text", "norm_cross_text"):
            ln(f"{dp}.{nname}")
        ffn(dp, "norm3")
        sd[f"{dp}.linear1_text.weight"] = g(dff, d)
        sd[f"{dp}.linear1_text.bias"] = g(dff)
        sd[f"{dp}.linear2_text.weight"] = g(d, dff)
        sd[f"{dp}.linear2_text.bias"] = g(d)
        ln(f"{dp}.norm3_text")
    return sd


def test_convert_testr_matches_init_tree():
    import jax

    from dit4sr_tpu.config import testr_tiny as make_cfg
    from dit4sr_tpu.models.testr.detector import TextSpotter

    cfg = make_cfg(num_feature_levels=4, num_dit_layers=4)
    sd = _synthetic_testr_sd(cfg)
    converted = W.convert_testr(sd, cfg)

    spotter = TextSpotter(cfg, feat_hw=(8, 8))
    feats = jnp.zeros((4, 1, 8, 8, cfg.dit_dim), jnp.float32)
    ref = spotter.init(jax.random.PRNGKey(0), feats)
    missing, unexpected = W.check_tree_matches(ref["params"], converted["params"])
    assert missing == [], f"missing: {missing[:8]}"
    assert unexpected == [], f"unexpected: {unexpected[:8]}"

    out = spotter.model.apply(jax.tree.map(jnp.asarray, converted), feats)
    assert np.isfinite(np.asarray(out.ctrl_points)).all()


def test_ocr_branch_init_surgery():
    """lq_branch init copies control weights into the ocr branch
    (transformer_sd3_ocrbranch_ocr2hq2ocr.py:438-524 equivalent)."""
    from dit4sr_tpu.config import mmdit_tiny

    cfg = mmdit_tiny(
        streams=("hq", "control", "ocr"),
        ffn_couplings=(("control", "hq"), ("ocr", "hq"), ("hq", "ocr")),
    )
    sd = _synthetic_mmdit_sd(cfg)
    g = _rng_dict()
    D = cfg.inner_dim
    # give the control branch real (non-zero) weights in the checkpoint
    for i in range(cfg.num_layers):
        tp = f"transformer_blocks.{i}"
        for a in (["attn", "attn2"] if i in cfg.dual_attention_layers else ["attn"]):
            for p in ("q", "k", "v", "out"):
                sd[f"{tp}.{a}.to_{p}_control.weight"] = g(D, D)
                sd[f"{tp}.{a}.to_{p}_control.bias"] = g(D)

    converted = W.convert_mmdit(sd, cfg, ocr_branch_init="lq_branch")
    attn = converted["params"]["blocks_0"]["attn"]
    np.testing.assert_array_equal(
        attn["to_q_ocr"]["kernel"], attn["to_q_control"]["kernel"]
    )
    np.testing.assert_array_equal(
        attn["to_out_ocr"]["bias"], attn["to_out_control"]["bias"]
    )

    # hq_branch init: ocr q/k/v stay zero (identity composition), out = base
    converted2 = W.convert_mmdit(sd, cfg, ocr_branch_init="hq_branch")
    attn2 = converted2["params"]["blocks_0"]["attn"]
    assert np.abs(attn2["to_q_ocr"]["kernel"]).max() == 0
    np.testing.assert_array_equal(
        attn2["to_out_ocr"]["kernel"], attn2["to_out"]["kernel"]
    )

    # tree must match the 3-stream model init
    from dit4sr_tpu.models.mmdit import init_mmdit

    _, ref = init_mmdit(jax.random.PRNGKey(0), cfg, text_len=8)
    missing, unexpected = W.check_tree_matches(ref["params"], converted["params"])
    assert missing == [] and unexpected == [], (missing[:5], unexpected[:5])
