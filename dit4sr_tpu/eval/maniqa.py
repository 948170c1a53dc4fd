"""MANIQA (Multi-dimension Attention Network for NR-IQA) in flax/JAX.

Used by the reference through pyiqa (test/test.py:162-169, "maniqa").
Per Yang et al. 2022 (CVPRW NTIRE winner) and the official IIGROUP/MANIQA
implementation:

  * ViT-B/8 backbone at 224x224 (timm `vit_base_patch8_224` layout);
    features from transformer blocks 6-9 (0-indexed), cls token dropped,
    concatenated channel-wise -> (B, 784, 3072);
  * 2 TABlocks (transposed attention across the channel axis; note the
    official block reshapes (attn@v) through a transpose — replicated
    faithfully) -> 1x1 conv to 768 -> 2-block window-attention (Swin-style,
    window 4, alternating cyclic shift) stage -> 2 TABlocks -> 1x1 conv to
    384 -> second 2-block window stage;
  * dual branch per patch token: score MLP (relu out) and weight MLP
    (sigmoid out); final score = sum(score*weight)/sum(weight).

Weights: `convert_maniqa_torch` maps the official checkpoint (timm ViT keys
under `vit.`, TABlock/conv/swin/fc heads at the top level) into one .npz.
`make_maniqa(path)` resizes inputs bicubically to 224 and returns (B,)
scores (higher = better). Inputs NHWC in [0, 1], normalized by 0.5/0.5.

Fidelity note: the FULL score path (ViT backbone, TABlocks, both swin
stages, dual-branch head) and the converter are validated against a
functional torch oracle in the official checkpoint layout
(tests/test_iqa_metrics.py::test_maniqa_full_matches_torch_oracle);
real released weights don't ship in this environment.
"""

from __future__ import annotations

from typing import Callable, Dict, Mapping

import jax
import jax.numpy as jnp
import numpy as np

_EMBED = 768
_HEADS = 12
_DEPTH = 12
_GRID = 28          # 224 / 8
_FEAT_BLOCKS = (6, 7, 8, 9)
_WINDOW = 4
_SWIN_HEADS = 4
_SCALE = 0.8        # attention scale used by MANIQA's swin stages


def _ln(x, g, b, eps=1e-6):
    m = x.mean(-1, keepdims=True)
    v = ((x - m) ** 2).mean(-1, keepdims=True)
    return (x - m) / jnp.sqrt(v + eps) * g + b


def vit_features(p: Dict, x: jnp.ndarray) -> jnp.ndarray:
    """ViT-B/8 forward; returns cat of block-(6..9) outputs minus cls:
    (B, 784, 3072). x: NHWC 224x224 in [0, 1]."""
    h = (x.astype(jnp.float32) - 0.5) / 0.5
    h = jax.lax.conv_general_dilated(
        h, p["vit_patch_w"], (8, 8), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + p["vit_patch_b"]
    B = h.shape[0]
    h = h.reshape(B, -1, _EMBED)
    cls = jnp.broadcast_to(p["vit_cls"], (B, 1, _EMBED))
    h = jnp.concatenate([cls, h], axis=1) + p["vit_pos"]
    T = h.shape[1]
    hd = _EMBED // _HEADS
    feats = []
    for i in range(_DEPTH):
        pre = f"vit{i}"
        y = _ln(h, p[f"{pre}_ln1_g"], p[f"{pre}_ln1_b"])
        qkv = y @ p[f"{pre}_qkv_w"].T + p[f"{pre}_qkv_b"]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, T, _HEADS, hd).transpose(0, 2, 1, 3)
        k = k.reshape(B, T, _HEADS, hd).transpose(0, 2, 1, 3)
        v = v.reshape(B, T, _HEADS, hd).transpose(0, 2, 1, 3)
        a = jax.nn.softmax((q @ k.transpose(0, 1, 3, 2)) / np.sqrt(hd), -1)
        o = (a @ v).transpose(0, 2, 1, 3).reshape(B, T, _EMBED)
        h = h + (o @ p[f"{pre}_proj_w"].T + p[f"{pre}_proj_b"])
        y = _ln(h, p[f"{pre}_ln2_g"], p[f"{pre}_ln2_b"])
        y = jax.nn.gelu(y @ p[f"{pre}_fc1_w"].T + p[f"{pre}_fc1_b"], approximate=False)
        h = h + (y @ p[f"{pre}_fc2_w"].T + p[f"{pre}_fc2_b"])
        if i in _FEAT_BLOCKS:
            feats.append(h[:, 1:])
    return jnp.concatenate(feats, axis=-1)


def _tablock(p: Dict, pre: str, x: jnp.ndarray) -> jnp.ndarray:
    """Transposed attention over channels. x: (B, C, N); Linear acts on N.
    Replicates the official `(attn@v).transpose(1,2).reshape(B,C,N)`."""
    B, C, N = x.shape
    q = x @ p[f"{pre}_q_w"].T + p[f"{pre}_q_b"]
    k = x @ p[f"{pre}_k_w"].T + p[f"{pre}_k_b"]
    v = x @ p[f"{pre}_v_w"].T + p[f"{pre}_v_b"]
    attn = jax.nn.softmax((q @ k.transpose(0, 2, 1)) * (N ** -0.5), -1)
    out = attn @ v  # (B, C, N)
    out = out.transpose(0, 2, 1).reshape(B, C, N)
    return out + x


def _window_block(p: Dict, pre: str, x: jnp.ndarray, shift: int) -> jnp.ndarray:
    """Swin-style block over (B, H, W, C) with window 4; cyclic shift on odd
    blocks (periodic, no border mask — matches the MANIQA stage geometry
    where H == W == multiple of window)."""
    B, H, W, C = x.shape
    w = _WINDOW
    heads = _SWIN_HEADS
    hd = C // heads
    res = x
    # eps 1e-5: MANIQA's swin stages use nn.LayerNorm defaults (the ViT
    # backbone uses timm's explicit 1e-6)
    y = _ln(x, p[f"{pre}_ln1_g"], p[f"{pre}_ln1_b"], eps=1e-5)
    if shift:
        y = jnp.roll(y, (-shift, -shift), axis=(1, 2))
    y = y.reshape(B, H // w, w, W // w, w, C).transpose(0, 1, 3, 2, 4, 5)
    y = y.reshape(-1, w * w, C)
    qkv = y @ p[f"{pre}_qkv_w"].T + p[f"{pre}_qkv_b"]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    nw = y.shape[0]
    q = q.reshape(nw, w * w, heads, hd).transpose(0, 2, 1, 3)
    k = k.reshape(nw, w * w, heads, hd).transpose(0, 2, 1, 3)
    v = v.reshape(nw, w * w, heads, hd).transpose(0, 2, 1, 3)
    attn = q @ k.transpose(0, 1, 3, 2) * _SCALE
    attn = attn + _rel_bias(p[f"{pre}_relpos"], w)[None]
    attn = jax.nn.softmax(attn, -1)
    o = (attn @ v).transpose(0, 2, 1, 3).reshape(nw, w * w, C)
    o = o @ p[f"{pre}_proj_w"].T + p[f"{pre}_proj_b"]
    o = o.reshape(B, H // w, W // w, w, w, C).transpose(0, 1, 3, 2, 4, 5)
    o = o.reshape(B, H, W, C)
    if shift:
        o = jnp.roll(o, (shift, shift), axis=(1, 2))
    x = res + o
    y = _ln(x, p[f"{pre}_ln2_g"], p[f"{pre}_ln2_b"], eps=1e-5)
    y = jax.nn.gelu(y @ p[f"{pre}_fc1_w"].T + p[f"{pre}_fc1_b"], approximate=False)
    return x + (y @ p[f"{pre}_fc2_w"].T + p[f"{pre}_fc2_b"])


def _rel_bias(table: jnp.ndarray, w: int) -> jnp.ndarray:
    """Relative position bias (heads, w*w, w*w) from a ((2w-1)^2, heads)
    table, standard Swin indexing."""
    coords = np.stack(np.meshgrid(np.arange(w), np.arange(w), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0) + (w - 1)
    idx = rel[..., 0] * (2 * w - 1) + rel[..., 1]
    return table[jnp.asarray(idx.reshape(-1))].reshape(w * w, w * w, -1).transpose(2, 0, 1)


def maniqa_score(p: Dict, x: jnp.ndarray) -> jnp.ndarray:
    """x: NHWC 224x224 in [0, 1]. Returns (B,) quality scores."""
    B = x.shape[0]
    g = _GRID
    h = vit_features(p, x)                      # (B, 784, 3072)
    h = h.transpose(0, 2, 1)                    # (B, C, N)
    for t in range(2):
        h = _tablock(p, f"tab1_{t}", h)
    h = h.transpose(0, 2, 1).reshape(B, g, g, -1)
    h = h @ p["conv1_w"] + p["conv1_b"]         # 1x1 conv: (B,g,g,768)
    for bi in range(2):
        h = _window_block(p, f"swin1_{bi}", h, shift=(_WINDOW // 2) * (bi % 2))
    h = h.reshape(B, g * g, -1).transpose(0, 2, 1)
    for t in range(2):
        h = _tablock(p, f"tab2_{t}", h)
    h = h.transpose(0, 2, 1).reshape(B, g, g, -1)
    h = h @ p["conv2_w"] + p["conv2_b"]         # (B,g,g,384)
    for bi in range(2):
        h = _window_block(p, f"swin2_{bi}", h, shift=(_WINDOW // 2) * (bi % 2))
    h = h.reshape(B, g * g, -1)                 # (B, N, 384)
    s = jax.nn.relu(h @ p["score_fc1_w"].T + p["score_fc1_b"])
    s = jax.nn.relu(s @ p["score_fc2_w"].T + p["score_fc2_b"])  # (B, N, 1)
    w = jax.nn.relu(h @ p["weight_fc1_w"].T + p["weight_fc1_b"])
    w = jax.nn.sigmoid(w @ p["weight_fc2_w"].T + p["weight_fc2_b"])
    return (s * w).sum(axis=(1, 2)) / jnp.clip(w.sum(axis=(1, 2)), 1e-8)


# --------------------------------------------------------------------------
# Converters / test params
# --------------------------------------------------------------------------

def _t(sd, k):
    return np.asarray(sd[k], np.float32)


def convert_maniqa_torch(sd: Mapping[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Official MANIQA checkpoint -> our params.

    Expected keys: `vit.*` (timm ViT-B/8), `tablock{1,2}.{i}.c_{q,k,v}.*`,
    `conv{1,2}.*`, `swintransformer{1,2}.layers.{i}.*` (ln/qkv/proj/mlp +
    relative_position_bias_table), `fc_score.*` / `fc_weight.*`
    (Sequential 0=Linear, 3=Linear)."""
    out: Dict[str, np.ndarray] = {
        "vit_patch_w": np.ascontiguousarray(
            _t(sd, "vit.patch_embed.proj.weight").transpose(2, 3, 1, 0)),
        "vit_patch_b": _t(sd, "vit.patch_embed.proj.bias"),
        "vit_cls": _t(sd, "vit.cls_token").reshape(1, _EMBED),
        "vit_pos": _t(sd, "vit.pos_embed").reshape(1, -1, _EMBED),
    }
    for i in range(_DEPTH):
        tp, op = f"vit.blocks.{i}", f"vit{i}"
        for ours, theirs in (
            ("ln1_g", "norm1.weight"), ("ln1_b", "norm1.bias"),
            ("qkv_w", "attn.qkv.weight"), ("qkv_b", "attn.qkv.bias"),
            ("proj_w", "attn.proj.weight"), ("proj_b", "attn.proj.bias"),
            ("ln2_g", "norm2.weight"), ("ln2_b", "norm2.bias"),
            ("fc1_w", "mlp.fc1.weight"), ("fc1_b", "mlp.fc1.bias"),
            ("fc2_w", "mlp.fc2.weight"), ("fc2_b", "mlp.fc2.bias"),
        ):
            out[f"{op}_{ours}"] = _t(sd, f"{tp}.{theirs}")
    for stage in (1, 2):
        for i in range(2):
            op = f"tab{stage}_{i}"
            tp = f"tablock{stage}.{i}"
            for ch in "qkv":
                out[f"{op}_{ch}_w"] = _t(sd, f"{tp}.c_{ch}.weight")
                out[f"{op}_{ch}_b"] = _t(sd, f"{tp}.c_{ch}.bias")
        # 1x1 convs stored OIHW -> (Cin, Cout) matmul form
        w = _t(sd, f"conv{stage}.weight")
        out[f"conv{stage}_w"] = np.ascontiguousarray(w[:, :, 0, 0].T)
        out[f"conv{stage}_b"] = _t(sd, f"conv{stage}.bias")
        for bi in range(2):
            op = f"swin{stage}_{bi}"
            tp = f"swintransformer{stage}.layers.{bi}"
            for ours, theirs in (
                ("ln1_g", "norm1.weight"), ("ln1_b", "norm1.bias"),
                ("qkv_w", "attn.qkv.weight"), ("qkv_b", "attn.qkv.bias"),
                ("proj_w", "attn.proj.weight"), ("proj_b", "attn.proj.bias"),
                ("ln2_g", "norm2.weight"), ("ln2_b", "norm2.bias"),
                ("fc1_w", "mlp.fc1.weight"), ("fc1_b", "mlp.fc1.bias"),
                ("fc2_w", "mlp.fc2.weight"), ("fc2_b", "mlp.fc2.bias"),
            ):
                out[f"{op}_{ours}"] = _t(sd, f"{tp}.{theirs}")
            out[f"{op}_relpos"] = _t(sd, f"{tp}.attn.relative_position_bias_table")
    for branch, ours in (("fc_score", "score"), ("fc_weight", "weight")):
        out[f"{ours}_fc1_w"] = _t(sd, f"{branch}.0.weight")
        out[f"{ours}_fc1_b"] = _t(sd, f"{branch}.0.bias")
        out[f"{ours}_fc2_w"] = _t(sd, f"{branch}.3.weight")
        out[f"{ours}_fc2_b"] = _t(sd, f"{branch}.3.bias")
    return out


def random_maniqa_params(rng: np.random.Generator,
                         depth: int = _DEPTH) -> Dict[str, np.ndarray]:
    """Random-weight params with the right shapes (tests only)."""
    def n(*s):
        return rng.normal(0, 0.02, s).astype(np.float32)

    g2 = _GRID * _GRID
    out: Dict[str, np.ndarray] = {
        "vit_patch_w": n(8, 8, 3, _EMBED),
        "vit_patch_b": n(_EMBED),
        "vit_cls": n(1, _EMBED),
        "vit_pos": n(1, g2 + 1, _EMBED),
    }
    for i in range(depth):
        op = f"vit{i}"
        out[f"{op}_ln1_g"] = np.ones((_EMBED,), np.float32)
        out[f"{op}_ln1_b"] = np.zeros((_EMBED,), np.float32)
        out[f"{op}_qkv_w"] = n(3 * _EMBED, _EMBED)
        out[f"{op}_qkv_b"] = n(3 * _EMBED)
        out[f"{op}_proj_w"] = n(_EMBED, _EMBED)
        out[f"{op}_proj_b"] = n(_EMBED)
        out[f"{op}_ln2_g"] = np.ones((_EMBED,), np.float32)
        out[f"{op}_ln2_b"] = np.zeros((_EMBED,), np.float32)
        out[f"{op}_fc1_w"] = n(4 * _EMBED, _EMBED)
        out[f"{op}_fc1_b"] = n(4 * _EMBED)
        out[f"{op}_fc2_w"] = n(_EMBED, 4 * _EMBED)
        out[f"{op}_fc2_b"] = n(_EMBED)
    dims = {1: (4 * _EMBED, _EMBED), 2: (_EMBED, _EMBED // 2)}
    for stage, (cin, cout) in dims.items():
        for i in range(2):
            op = f"tab{stage}_{i}"
            for ch in "qkv":
                out[f"{op}_{ch}_w"] = n(g2, g2)
                out[f"{op}_{ch}_b"] = n(g2)
        out[f"conv{stage}_w"] = n(cin, cout)
        out[f"conv{stage}_b"] = n(cout)
        for bi in range(2):
            op = f"swin{stage}_{bi}"
            out[f"{op}_ln1_g"] = np.ones((cout,), np.float32)
            out[f"{op}_ln1_b"] = np.zeros((cout,), np.float32)
            out[f"{op}_qkv_w"] = n(3 * cout, cout)
            out[f"{op}_qkv_b"] = n(3 * cout)
            out[f"{op}_proj_w"] = n(cout, cout)
            out[f"{op}_proj_b"] = n(cout)
            out[f"{op}_ln2_g"] = np.ones((cout,), np.float32)
            out[f"{op}_ln2_b"] = np.zeros((cout,), np.float32)
            out[f"{op}_fc1_w"] = n(_EMBED, cout)
            out[f"{op}_fc1_b"] = n(_EMBED)
            out[f"{op}_fc2_w"] = n(cout, _EMBED)
            out[f"{op}_fc2_b"] = n(cout)
            out[f"{op}_relpos"] = n((2 * _WINDOW - 1) ** 2, _SWIN_HEADS)
    half = _EMBED // 2
    out["score_fc1_w"] = n(half, half)
    out["score_fc1_b"] = n(half)
    out["score_fc2_w"] = n(1, half)
    out["score_fc2_b"] = n(1)
    out["weight_fc1_w"] = n(half, half)
    out["weight_fc1_b"] = n(half)
    out["weight_fc2_w"] = n(1, half)
    out["weight_fc2_b"] = n(1)
    return out


def make_maniqa(npz_path: str) -> Callable:
    params = {k: jnp.asarray(v) for k, v in np.load(npz_path).items()}

    def _score(x):
        # fp32 precision: match the fp32 torch reference (TPU default is bf16)
        with jax.default_matmul_precision("float32"):
            return maniqa_score(params, x)

    scorer = jax.jit(_score)

    def metric(x: jnp.ndarray) -> jnp.ndarray:
        if x.shape[1] != 224 or x.shape[2] != 224:
            x = jax.image.resize(x, (x.shape[0], 224, 224, x.shape[3]), "bicubic")
            x = jnp.clip(x, 0.0, 1.0)
        return scorer(x)

    return metric
