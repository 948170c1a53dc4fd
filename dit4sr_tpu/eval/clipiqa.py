"""CLIPIQA (no-reference IQA via CLIP antonym prompts) in flax/JAX.

Used by the reference through pyiqa (test/test.py:162-169, "clipiqa").
Per Wang et al. 2022 ("Exploring CLIP for Assessing the Look and Feel of
Images") and pyiqa's port:

  * CLIP ResNet-50 visual encoder (the "ModifiedResNet": 3-conv stem,
    avg-pool antialiased strides, attention pooling head) applied to the
    image at native resolution (attention-pool positional embeddings are
    bilinearly resized to the feature grid);
  * two text prompts ("Good photo.", "Bad photo.") encoded once by the CLIP
    text transformer; score = softmax(logit_scale * cos_sim)[good].

Weights: `convert_clipiqa_torch(sd, token_ids=...)` maps an OpenAI CLIP RN50
state dict into one .npz. The two prompts' features are computed at
conversion time (the flax text encoder below) from their BPE token ids and
stored, so the runtime metric needs no tokenizer. Inputs NHWC in [0, 1];
returns (B,) scores in [0, 1], higher = better quality.
"""

from __future__ import annotations

from typing import Callable, Dict, Mapping, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)

# RN50 geometry
_BLOCKS = (3, 4, 6, 3)
_WIDTHS = (64, 128, 256, 512)  # bottleneck planes; out = 4x
_STEM_W = 32
_EMBED = 2048          # attnpool input channels
_OUT_DIM = 1024        # CLIP RN50 joint-embedding dim
_HEADS = 32


def _conv(x, w, stride=1, pad=0):
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _bn(x, p, name):
    g, b = p[f"{name}_g"], p[f"{name}_b"]
    m, v = p[f"{name}_m"], p[f"{name}_v"]
    return (x - m) * (g / jnp.sqrt(v + 1e-5)) + b


def _avgpool(x, k):
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, k, k, 1), (1, k, k, 1), "VALID"
    ) / float(k * k)


def _bottleneck(p, prefix, x, stride):
    out = jax.nn.relu(_bn(_conv(x, p[f"{prefix}_conv1_w"]), p, f"{prefix}_bn1"))
    out = jax.nn.relu(_bn(_conv(out, p[f"{prefix}_conv2_w"], pad=1), p, f"{prefix}_bn2"))
    if stride > 1:
        out = _avgpool(out, stride)
    out = _bn(_conv(out, p[f"{prefix}_conv3_w"]), p, f"{prefix}_bn3")
    if f"{prefix}_down_conv_w" in p:
        idn = x if stride == 1 else _avgpool(x, stride)
        idn = _bn(_conv(idn, p[f"{prefix}_down_conv_w"]), p, f"{prefix}_down_bn")
    else:
        idn = x
    return jax.nn.relu(out + idn)


def visual_forward(p: Dict, x: jnp.ndarray) -> jnp.ndarray:
    """CLIP ModifiedResNet-50. x: NHWC in [0, 1] (H, W multiples of 32).
    Returns (B, 1024) image features (unnormalized)."""
    h = (x.astype(jnp.float32) - _MEAN) / _STD
    h = jax.nn.relu(_bn(_conv(h, p["stem_conv1_w"], stride=2, pad=1), p, "stem_bn1"))
    h = jax.nn.relu(_bn(_conv(h, p["stem_conv2_w"], pad=1), p, "stem_bn2"))
    h = jax.nn.relu(_bn(_conv(h, p["stem_conv3_w"], pad=1), p, "stem_bn3"))
    h = _avgpool(h, 2)
    for li, n in enumerate(_BLOCKS):
        for bi in range(n):
            stride = 2 if (li > 0 and bi == 0) else 1
            h = _bottleneck(p, f"layer{li + 1}_block{bi}", h, stride)
    return _attnpool(p, h)


def _attnpool(p: Dict, h: jnp.ndarray) -> jnp.ndarray:
    """CLIP AttentionPool2d with positional embedding resized to the grid."""
    B, H, W, C = h.shape
    tokens = h.reshape(B, H * W, C)
    cls = tokens.mean(axis=1, keepdims=True)
    x = jnp.concatenate([cls, tokens], axis=1)  # (B, 1+HW, C)

    pos = p["attnpool_pos"]  # (1 + S*S, C)
    s = int(round(float(np.sqrt(pos.shape[0] - 1))))
    grid = pos[1:].reshape(s, s, C)
    if (H, W) != (s, s):
        grid = jax.image.resize(grid, (H, W, C), method="bilinear")
    pos = jnp.concatenate([pos[:1], grid.reshape(H * W, C)], axis=0)
    x = x + pos[None]

    q = x[:, :1] @ p["attnpool_q_w"].T + p["attnpool_q_b"]
    k = x @ p["attnpool_k_w"].T + p["attnpool_k_b"]
    v = x @ p["attnpool_v_w"].T + p["attnpool_v_b"]
    hd = C // _HEADS
    q = q.reshape(B, 1, _HEADS, hd).transpose(0, 2, 1, 3)
    k = k.reshape(B, -1, _HEADS, hd).transpose(0, 2, 1, 3)
    v = v.reshape(B, -1, _HEADS, hd).transpose(0, 2, 1, 3)
    attn = jax.nn.softmax((q @ k.transpose(0, 1, 3, 2)) / np.sqrt(hd), axis=-1)
    out = (attn @ v).transpose(0, 2, 1, 3).reshape(B, 1, C)
    out = out @ p["attnpool_c_w"].T + p["attnpool_c_b"]
    return out[:, 0]


# --------------------------------------------------------------------------
# Text transformer (used at conversion time to embed the two prompts)
# --------------------------------------------------------------------------

def _quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def _ln(x, g, b):
    m = x.mean(-1, keepdims=True)
    v = ((x - m) ** 2).mean(-1, keepdims=True)
    return (x - m) / jnp.sqrt(v + 1e-5) * g + b


def text_forward(p: Dict, token_ids: jnp.ndarray) -> jnp.ndarray:
    """CLIP text transformer (width 512, 12 layers, 8 heads for RN50).
    token_ids: (N, 77) int32. Returns (N, out_dim) text features."""
    x = p["tok_emb"][token_ids] + p["pos_emb"]  # (N, 77, 512)
    N, T, C = x.shape
    heads = 8
    hd = C // heads
    mask = jnp.triu(jnp.full((T, T), -jnp.inf, jnp.float32), k=1)
    n_layers = len([k for k in p if k.endswith("_ln1_g") and k.startswith("txt")])
    for i in range(n_layers):
        pre = f"txt{i}"
        h = _ln(x, p[f"{pre}_ln1_g"], p[f"{pre}_ln1_b"])
        qkv = h @ p[f"{pre}_attn_in_w"].T + p[f"{pre}_attn_in_b"]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(N, T, heads, hd).transpose(0, 2, 1, 3)
        k = k.reshape(N, T, heads, hd).transpose(0, 2, 1, 3)
        v = v.reshape(N, T, heads, hd).transpose(0, 2, 1, 3)
        a = jax.nn.softmax((q @ k.transpose(0, 1, 3, 2)) / np.sqrt(hd) + mask, -1)
        o = (a @ v).transpose(0, 2, 1, 3).reshape(N, T, C)
        x = x + (o @ p[f"{pre}_attn_out_w"].T + p[f"{pre}_attn_out_b"])
        h = _ln(x, p[f"{pre}_ln2_g"], p[f"{pre}_ln2_b"])
        h = _quick_gelu(h @ p[f"{pre}_fc_w"].T + p[f"{pre}_fc_b"])
        x = x + (h @ p[f"{pre}_proj_w"].T + p[f"{pre}_proj_b"])
    x = _ln(x, p["txt_lnf_g"], p["txt_lnf_b"])
    eot = jnp.argmax(token_ids, axis=-1)
    feats = x[jnp.arange(N), eot]
    return feats @ p["text_projection"]


def clipiqa_score(p: Dict, x: jnp.ndarray) -> jnp.ndarray:
    """x: NHWC in [0, 1]. Returns (B,) quality in [0, 1] (higher = better)."""
    img = visual_forward(p, x)
    img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
    txt = p["text_features"]
    txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
    logits = jnp.exp(p["logit_scale"]) * img @ txt.T  # (B, 2)
    return jax.nn.softmax(logits, axis=-1)[:, 0]


# --------------------------------------------------------------------------
# Converters
# --------------------------------------------------------------------------

def _t(sd, k):
    return np.asarray(sd[k], np.float32)


def _conv_hwio(sd, k):
    return np.ascontiguousarray(_t(sd, k).transpose(2, 3, 1, 0))


def convert_clip_rn50_visual(sd: Mapping[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """OpenAI CLIP RN50 state dict (visual.* keys) -> flat visual params."""
    out: Dict[str, np.ndarray] = {}
    for i in (1, 2, 3):
        out[f"stem_conv{i}_w"] = _conv_hwio(sd, f"visual.conv{i}.weight")
        for ours, theirs in (("g", "weight"), ("b", "bias"),
                             ("m", "running_mean"), ("v", "running_var")):
            out[f"stem_bn{i}_{ours}"] = _t(sd, f"visual.bn{i}.{theirs}")
    for li, n in enumerate(_BLOCKS):
        for bi in range(n):
            tp = f"visual.layer{li + 1}.{bi}"
            op = f"layer{li + 1}_block{bi}"
            for ci in (1, 2, 3):
                out[f"{op}_conv{ci}_w"] = _conv_hwio(sd, f"{tp}.conv{ci}.weight")
                for ours, theirs in (("g", "weight"), ("b", "bias"),
                                     ("m", "running_mean"), ("v", "running_var")):
                    out[f"{op}_bn{ci}_{ours}"] = _t(sd, f"{tp}.bn{ci}.{theirs}")
            if f"{tp}.downsample.0.weight" in sd:
                out[f"{op}_down_conv_w"] = _conv_hwio(sd, f"{tp}.downsample.0.weight")
                for ours, theirs in (("g", "weight"), ("b", "bias"),
                                     ("m", "running_mean"), ("v", "running_var")):
                    out[f"{op}_down_bn_{ours}"] = _t(sd, f"{tp}.downsample.1.{theirs}")
    out["attnpool_pos"] = _t(sd, "visual.attnpool.positional_embedding")
    for ours, theirs in (("q", "q_proj"), ("k", "k_proj"), ("v", "v_proj"),
                         ("c", "c_proj")):
        out[f"attnpool_{ours}_w"] = _t(sd, f"visual.attnpool.{theirs}.weight")
        out[f"attnpool_{ours}_b"] = _t(sd, f"visual.attnpool.{theirs}.bias")
    out["logit_scale"] = _t(sd, "logit_scale").reshape(())
    return out


def convert_clip_text(sd: Mapping[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """OpenAI CLIP state dict -> flat text-transformer params."""
    out: Dict[str, np.ndarray] = {
        "tok_emb": _t(sd, "token_embedding.weight"),
        "pos_emb": _t(sd, "positional_embedding"),
        "txt_lnf_g": _t(sd, "ln_final.weight"),
        "txt_lnf_b": _t(sd, "ln_final.bias"),
        "text_projection": _t(sd, "text_projection"),
    }
    i = 0
    while f"transformer.resblocks.{i}.ln_1.weight" in sd:
        tp = f"transformer.resblocks.{i}"
        out[f"txt{i}_ln1_g"] = _t(sd, f"{tp}.ln_1.weight")
        out[f"txt{i}_ln1_b"] = _t(sd, f"{tp}.ln_1.bias")
        out[f"txt{i}_attn_in_w"] = _t(sd, f"{tp}.attn.in_proj_weight")
        out[f"txt{i}_attn_in_b"] = _t(sd, f"{tp}.attn.in_proj_bias")
        out[f"txt{i}_attn_out_w"] = _t(sd, f"{tp}.attn.out_proj.weight")
        out[f"txt{i}_attn_out_b"] = _t(sd, f"{tp}.attn.out_proj.bias")
        out[f"txt{i}_ln2_g"] = _t(sd, f"{tp}.ln_2.weight")
        out[f"txt{i}_ln2_b"] = _t(sd, f"{tp}.ln_2.bias")
        out[f"txt{i}_fc_w"] = _t(sd, f"{tp}.mlp.c_fc.weight")
        out[f"txt{i}_fc_b"] = _t(sd, f"{tp}.mlp.c_fc.bias")
        out[f"txt{i}_proj_w"] = _t(sd, f"{tp}.mlp.c_proj.weight")
        out[f"txt{i}_proj_b"] = _t(sd, f"{tp}.mlp.c_proj.bias")
        i += 1
    return out


def convert_clipiqa_torch(
    sd: Mapping[str, np.ndarray],
    token_ids: Optional[Sequence[Sequence[int]]] = None,
    text_features: Optional[np.ndarray] = None,
) -> Dict[str, np.ndarray]:
    """CLIP RN50 state dict -> runtime CLIPIQA params.

    Pass either `token_ids` for the two prompts [good, bad] (77-long BPE id
    rows; features computed here with the flax text encoder) or precomputed
    `text_features` (2, out_dim)."""
    out = convert_clip_rn50_visual(sd)
    if text_features is None:
        assert token_ids is not None, "need token_ids or text_features"
        tp = convert_clip_text(sd)
        ids = jnp.asarray(np.asarray(token_ids, np.int32))
        text_features = np.asarray(
            text_forward({k: jnp.asarray(v) for k, v in tp.items()}, ids)
        )
    out["text_features"] = np.asarray(text_features, np.float32)
    assert out["text_features"].shape[0] == 2
    return out


def random_clipiqa_params(
    rng: np.random.Generator, blocks=_BLOCKS, widths=_WIDTHS, spacial=7,
) -> Dict[str, np.ndarray]:
    """Random-weight params with the right shapes (tests only)."""
    def n(*s):
        return rng.normal(0, 0.04, s).astype(np.float32)

    out: Dict[str, np.ndarray] = {}
    stem = [(3, _STEM_W), (_STEM_W, _STEM_W), (_STEM_W, 2 * _STEM_W)]
    for i, (ci, co) in enumerate(stem, start=1):
        out[f"stem_conv{i}_w"] = n(3, 3, ci, co)
        out[f"stem_bn{i}_g"] = np.ones((co,), np.float32)
        out[f"stem_bn{i}_b"] = np.zeros((co,), np.float32)
        out[f"stem_bn{i}_m"] = n(co)
        out[f"stem_bn{i}_v"] = np.abs(n(co)) + 1.0
    cin = 2 * _STEM_W
    for li, (nb, planes) in enumerate(zip(blocks, widths)):
        for bi in range(nb):
            op = f"layer{li + 1}_block{bi}"
            cmid, cout = planes, planes * 4
            out[f"{op}_conv1_w"] = n(1, 1, cin, cmid)
            out[f"{op}_conv2_w"] = n(3, 3, cmid, cmid)
            out[f"{op}_conv3_w"] = n(1, 1, cmid, cout)
            for ci, c in (("1", cmid), ("2", cmid), ("3", cout)):
                out[f"{op}_bn{ci}_g"] = np.ones((c,), np.float32)
                out[f"{op}_bn{ci}_b"] = np.zeros((c,), np.float32)
                out[f"{op}_bn{ci}_m"] = n(c)
                out[f"{op}_bn{ci}_v"] = np.abs(n(c)) + 1.0
            if bi == 0 and (li > 0 or cin != cout):
                out[f"{op}_down_conv_w"] = n(1, 1, cin, cout)
                out[f"{op}_down_bn_g"] = np.ones((cout,), np.float32)
                out[f"{op}_down_bn_b"] = np.zeros((cout,), np.float32)
                out[f"{op}_down_bn_m"] = n(cout)
                out[f"{op}_down_bn_v"] = np.abs(n(cout)) + 1.0
            cin = cout
    embed = cin
    out["attnpool_pos"] = n(spacial * spacial + 1, embed)
    for k in ("q", "k", "v"):
        out[f"attnpool_{k}_w"] = n(embed, embed)
        out[f"attnpool_{k}_b"] = n(embed)
    out["attnpool_c_w"] = n(_OUT_DIM, embed)
    out["attnpool_c_b"] = n(_OUT_DIM)
    out["logit_scale"] = np.float32(np.log(100.0))
    out["text_features"] = n(2, _OUT_DIM)
    return out


def make_clipiqa(npz_path: str) -> Callable:
    params = {k: jnp.asarray(v) for k, v in np.load(npz_path).items()}

    def scorer(x):
        # fp32 precision: match the fp32 torch reference (TPU default is bf16)
        with jax.default_matmul_precision("float32"):
            return clipiqa_score(params, x)

    return jax.jit(scorer)
