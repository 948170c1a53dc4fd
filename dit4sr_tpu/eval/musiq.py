"""MUSIQ (Multi-Scale Image Quality transformer) in flax/JAX.

Used by the reference through pyiqa (test/test.py:162-169, "musiq").
Per Ke et al. ICCV 2021 and the official google-research/musiq model:

  * 3-scale input: native resolution plus two aspect-ratio-preserving
    resizes with longer side 224 and 384;
  * each scale is cut into 32x32 patches; every patch runs through a
    BiT-style convolutional encoder (weight-standardized 7x7/2 conv +
    GroupNorm + ReLU + 3x3/2 maxpool, then one pre-activation bottleneck
    block) and is linearly projected to D=384;
  * hash-based 2D spatial embedding (each patch's normalized (row, col)
    hashed onto a GxG=10x10 learned grid) + learned per-scale embedding;
  * CLS token + 14-layer pre-LN transformer (D=384, 6 heads, MLP 1152)
    with input masking for padded patch slots; head = LN + linear -> 1.

Static shapes: each scale's patch count is padded/truncated to a fixed
budget so the whole metric jits once (patch masks carry validity through
the transformer softmax).

Weights: `convert_musiq_torch` maps a torch port's state dict into one
.npz; the arch + converter are validated end-to-end against a functional
torch oracle (tests/test_iqa_metrics.py::test_musiq_matches_torch_oracle;
real released weights don't ship in this environment). Inputs NHWC in
[0, 1]; returns (B,) MOS-scale scores (higher = better).
"""

from __future__ import annotations

from typing import Callable, Dict, List, Mapping, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_P = 32            # patch size
_D = 384           # transformer width
_LAYERS = 14
_HEADS = 6
_MLP = 1152
_G = 10            # spatial hash grid
_ROOT_CH = 64      # conv root channels
_BOT_CH = 64       # bottleneck planes (out = _BOT_CH * 4 = 256)
_ENC_OUT = _BOT_CH * 4 * 4 * 4  # 4x4 spatial map x 256ch flattened
_SCALES = (None, 384, 224)      # native + ARP longer-side resizes


def _ws_conv(x, w, stride, pad):
    """Weight-standardized conv (BiT): normalize w over (kh, kw, cin)."""
    m = w.mean(axis=(0, 1, 2), keepdims=True)
    v = w.var(axis=(0, 1, 2), keepdims=True)
    w = (w - m) / jnp.sqrt(v + 1e-10)
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _gn(x, g, b, groups=32):
    n, h, w, c = x.shape
    xg = x.reshape(n, h, w, groups, c // groups)
    m = xg.mean(axis=(1, 2, 4), keepdims=True)
    v = xg.var(axis=(1, 2, 4), keepdims=True)
    xg = (xg - m) / jnp.sqrt(v + 1e-5)
    return xg.reshape(n, h, w, c) * g + b


def patch_encoder(p: Dict, patches: jnp.ndarray) -> jnp.ndarray:
    """patches: (N, 32, 32, 3) in [-1, 1]. Returns (N, D) embeddings."""
    h = _ws_conv(patches, p["root_conv_w"], 2, 3)            # (N,16,16,64)
    h = jax.nn.relu(_gn(h, p["root_gn_g"], p["root_gn_b"]))
    h = jax.lax.reduce_window(                                # 3x3/2 maxpool
        h, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)),
    )                                                         # (N,8,8,64)
    # pre-activation bottleneck: gn-relu-conv1x1 / 3x3 s2 / 1x1, proj shortcut
    y = jax.nn.relu(_gn(h, p["b1_gn1_g"], p["b1_gn1_b"]))
    sc = _ws_conv(y, p["b1_proj_w"], 2, 0)                    # (N,4,4,256)
    y = _ws_conv(y, p["b1_conv1_w"], 1, 0)
    y = jax.nn.relu(_gn(y, p["b1_gn2_g"], p["b1_gn2_b"]))
    y = _ws_conv(y, p["b1_conv2_w"], 2, 1)
    y = jax.nn.relu(_gn(y, p["b1_gn3_g"], p["b1_gn3_b"]))
    y = _ws_conv(y, p["b1_conv3_w"], 1, 0)
    h = sc + y                                                # (N,4,4,256)
    flat = h.reshape(h.shape[0], -1)                          # (N, 4096)
    return flat @ p["embed_w"] + p["embed_b"]


def _extract_scale(
    img: np.ndarray, longer: int, budget: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Host-side: resize (ARP) + patchify one scale of one image.
    Returns (budget, 32, 32, 3) patches, (budget, 2) normalized coords,
    (budget,) mask."""
    h, w = img.shape[:2]
    if longer is not None:
        s = longer / max(h, w)
        nh, nw = max(_P, int(round(h * s))), max(_P, int(round(w * s)))
        xs = jax.image.resize(jnp.asarray(img), (nh, nw, 3), "bilinear")
        img = np.asarray(xs)
        h, w = nh, nw
    gh, gw = (h + _P - 1) // _P, (w + _P - 1) // _P
    pad_h, pad_w = gh * _P - h, gw * _P - w
    img = np.pad(img, ((0, pad_h), (0, pad_w), (0, 0)))
    patches = img.reshape(gh, _P, gw, _P, 3).transpose(0, 2, 1, 3, 4)
    patches = patches.reshape(gh * gw, _P, _P, 3)
    rows, cols = np.meshgrid(np.arange(gh), np.arange(gw), indexing="ij")
    coords = np.stack(
        [rows.reshape(-1) / max(gh - 1, 1), cols.reshape(-1) / max(gw - 1, 1)], -1
    ).astype(np.float32)
    n = min(len(patches), budget)
    out_p = np.zeros((budget, _P, _P, 3), np.float32)
    out_c = np.zeros((budget, 2), np.float32)
    out_m = np.zeros((budget,), np.float32)
    out_p[:n] = patches[:n]
    out_c[:n] = coords[:n]
    out_m[:n] = 1.0
    return out_p, out_c, out_m


def prepare_inputs(
    images: np.ndarray, budgets: Tuple[int, int, int] = (256, 144, 49)
) -> Dict[str, np.ndarray]:
    """Host-side preprocessing for a batch (B, H, W, 3) in [0, 1]:
    3 scales -> concatenated fixed-budget patch sets."""
    all_p, all_c, all_m, all_s = [], [], [], []
    for img in np.asarray(images, np.float32):
        ps, cs, ms, ss = [], [], [], []
        for si, (longer, budget) in enumerate(zip(_SCALES, budgets)):
            p, c, m = _extract_scale(img, longer, budget)
            ps.append(p)
            cs.append(c)
            ms.append(m)
            ss.append(np.full((budget,), si, np.int32))
        all_p.append(np.concatenate(ps))
        all_c.append(np.concatenate(cs))
        all_m.append(np.concatenate(ms))
        all_s.append(np.concatenate(ss))
    return {
        "patches": np.stack(all_p),   # (B, T, 32, 32, 3)
        "coords": np.stack(all_c),    # (B, T, 2)
        "mask": np.stack(all_m),      # (B, T)
        "scale_idx": np.stack(all_s), # (B, T)
    }


def musiq_score(p: Dict, inputs: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """inputs from `prepare_inputs` (already on device). Returns (B,)."""
    patches = inputs["patches"] * 2.0 - 1.0
    B, T = patches.shape[:2]
    emb = patch_encoder(p, patches.reshape(B * T, _P, _P, 3)).reshape(B, T, _D)
    # hash-based spatial embedding: nearest grid cell per axis
    gi = jnp.clip(jnp.round(inputs["coords"][..., 0] * (_G - 1)), 0, _G - 1)
    gj = jnp.clip(jnp.round(inputs["coords"][..., 1] * (_G - 1)), 0, _G - 1)
    hse = p["spatial_emb"][(gi * _G + gj).astype(jnp.int32)]   # (B, T, D)
    sce = p["scale_emb"][inputs["scale_idx"]]                  # (B, T, D)
    x = emb + hse + sce
    cls = jnp.broadcast_to(p["cls"], (B, 1, _D))
    x = jnp.concatenate([cls, x], axis=1)
    mask = jnp.concatenate([jnp.ones((B, 1)), inputs["mask"]], axis=1)
    bias = (1.0 - mask)[:, None, None, :] * -1e9               # (B,1,1,T+1)
    hd = _D // _HEADS
    for i in range(_LAYERS):
        pre = f"enc{i}"
        y = _lnorm(x, p[f"{pre}_ln1_g"], p[f"{pre}_ln1_b"])
        qkv = y @ p[f"{pre}_qkv_w"].T + p[f"{pre}_qkv_b"]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, -1, _HEADS, hd).transpose(0, 2, 1, 3)
        k = k.reshape(B, -1, _HEADS, hd).transpose(0, 2, 1, 3)
        v = v.reshape(B, -1, _HEADS, hd).transpose(0, 2, 1, 3)
        a = jax.nn.softmax((q @ k.transpose(0, 1, 3, 2)) / np.sqrt(hd) + bias, -1)
        o = (a @ v).transpose(0, 2, 1, 3).reshape(B, -1, _D)
        x = x + (o @ p[f"{pre}_proj_w"].T + p[f"{pre}_proj_b"])
        y = _lnorm(x, p[f"{pre}_ln2_g"], p[f"{pre}_ln2_b"])
        y = jax.nn.gelu(y @ p[f"{pre}_fc1_w"].T + p[f"{pre}_fc1_b"], approximate=False)
        x = x + (y @ p[f"{pre}_fc2_w"].T + p[f"{pre}_fc2_b"])
    x = _lnorm(x, p["lnf_g"], p["lnf_b"])
    return (x[:, 0] @ p["head_w"].T + p["head_b"])[:, 0]


def _lnorm(x, g, b, eps=1e-6):
    m = x.mean(-1, keepdims=True)
    v = ((x - m) ** 2).mean(-1, keepdims=True)
    return (x - m) / jnp.sqrt(v + eps) * g + b


def convert_musiq_torch(
    sd: Mapping[str, np.ndarray], embed_order: str = "hwc"
) -> Dict[str, np.ndarray]:
    """Key map from a torch MUSIQ port (oracle-tested end to end in
    tests/test_iqa_metrics.py::test_musiq_matches_torch_oracle). Conv
    weights OIHW -> HWIO; linear (out,in) kept torch-style (we apply `.T`).
    Raises with the unmatched key list if the layout differs.

    embed_order: input-feature ordering of the patch-embedding Linear.
    "hwc" (default) = the official TF/JAX flatten order (h, w, c); "chw" =
    a port that flattens the NCHW conv output directly — the weight's
    input axis is permuted to our (h, w, c) flatten."""
    ours = random_musiq_params(np.random.default_rng(0))
    name_map = {
        "root_conv_w": "conv_root.weight",
        "root_gn_g": "gn_root.weight", "root_gn_b": "gn_root.bias",
        "b1_gn1_g": "block1.preact_gn.weight", "b1_gn1_b": "block1.preact_gn.bias",
        "b1_proj_w": "block1.proj_conv.weight",
        "b1_conv1_w": "block1.conv1.weight",
        "b1_gn2_g": "block1.gn1.weight", "b1_gn2_b": "block1.gn1.bias",
        "b1_conv2_w": "block1.conv2.weight",
        "b1_gn3_g": "block1.gn2.weight", "b1_gn3_b": "block1.gn2.bias",
        "b1_conv3_w": "block1.conv3.weight",
        "embed_w": "embedding.weight", "embed_b": "embedding.bias",
        "cls": "cls_token", "spatial_emb": "spatial_embedding",
        "scale_emb": "scale_embedding",
        "lnf_g": "encoder_norm.weight", "lnf_b": "encoder_norm.bias",
        "head_w": "head.weight", "head_b": "head.bias",
    }
    for i in range(_LAYERS):
        tp = f"transformer.layers.{i}"
        name_map.update({
            f"enc{i}_ln1_g": f"{tp}.norm1.weight", f"enc{i}_ln1_b": f"{tp}.norm1.bias",
            f"enc{i}_qkv_w": f"{tp}.attn.qkv.weight", f"enc{i}_qkv_b": f"{tp}.attn.qkv.bias",
            f"enc{i}_proj_w": f"{tp}.attn.proj.weight", f"enc{i}_proj_b": f"{tp}.attn.proj.bias",
            f"enc{i}_ln2_g": f"{tp}.norm2.weight", f"enc{i}_ln2_b": f"{tp}.norm2.bias",
            f"enc{i}_fc1_w": f"{tp}.mlp.fc1.weight", f"enc{i}_fc1_b": f"{tp}.mlp.fc1.bias",
            f"enc{i}_fc2_w": f"{tp}.mlp.fc2.weight", f"enc{i}_fc2_b": f"{tp}.mlp.fc2.bias",
        })
    missing = [v for v in name_map.values() if v not in sd]
    if missing:
        raise KeyError(f"MUSIQ converter: {len(missing)} keys unmatched, e.g. {missing[:5]}")
    out: Dict[str, np.ndarray] = {}
    for ok, tk in name_map.items():
        w = np.asarray(sd[tk], np.float32)
        if ok.endswith("conv_w") or ok in ("root_conv_w", "b1_proj_w") or \
           (ok.startswith("b1_conv")):
            w = np.ascontiguousarray(w.transpose(2, 3, 1, 0))
        if ok == "embed_w":
            if embed_order == "chw":
                c4 = _BOT_CH * 4
                w = w.reshape(_D, c4, 4, 4).transpose(0, 2, 3, 1).reshape(_D, _ENC_OUT)
            w = np.ascontiguousarray(w.T)  # torch Linear (out,in) -> (in,out)
        if ok == "cls":
            w = w.reshape(1, _D)
        expected = ours[ok].shape
        assert w.shape == expected, f"{ok}: got {w.shape}, want {expected}"
        out[ok] = w
    return out


def random_musiq_params(rng: np.random.Generator) -> Dict[str, np.ndarray]:
    """Random-weight params with the right shapes (tests only)."""
    def n(*s):
        return rng.normal(0, 0.02, s).astype(np.float32)

    c, b4 = _ROOT_CH, _BOT_CH * 4
    out: Dict[str, np.ndarray] = {
        "root_conv_w": n(7, 7, 3, c),
        "root_gn_g": np.ones((c,), np.float32), "root_gn_b": np.zeros((c,), np.float32),
        "b1_gn1_g": np.ones((c,), np.float32), "b1_gn1_b": np.zeros((c,), np.float32),
        "b1_proj_w": n(1, 1, c, b4),
        "b1_conv1_w": n(1, 1, c, _BOT_CH),
        "b1_gn2_g": np.ones((_BOT_CH,), np.float32), "b1_gn2_b": np.zeros((_BOT_CH,), np.float32),
        "b1_conv2_w": n(3, 3, _BOT_CH, _BOT_CH),
        "b1_gn3_g": np.ones((_BOT_CH,), np.float32), "b1_gn3_b": np.zeros((_BOT_CH,), np.float32),
        "b1_conv3_w": n(1, 1, _BOT_CH, b4),
        "embed_w": n(_ENC_OUT, _D), "embed_b": n(_D),
        "cls": n(1, _D),
        "spatial_emb": n(_G * _G, _D),
        "scale_emb": n(len(_SCALES), _D),
        "lnf_g": np.ones((_D,), np.float32), "lnf_b": np.zeros((_D,), np.float32),
        "head_w": n(1, _D), "head_b": n(1),
    }
    for i in range(_LAYERS):
        op = f"enc{i}"
        out[f"{op}_ln1_g"] = np.ones((_D,), np.float32)
        out[f"{op}_ln1_b"] = np.zeros((_D,), np.float32)
        out[f"{op}_qkv_w"] = n(3 * _D, _D)
        out[f"{op}_qkv_b"] = n(3 * _D)
        out[f"{op}_proj_w"] = n(_D, _D)
        out[f"{op}_proj_b"] = n(_D)
        out[f"{op}_ln2_g"] = np.ones((_D,), np.float32)
        out[f"{op}_ln2_b"] = np.zeros((_D,), np.float32)
        out[f"{op}_fc1_w"] = n(_MLP, _D)
        out[f"{op}_fc1_b"] = n(_MLP)
        out[f"{op}_fc2_w"] = n(_D, _MLP)
        out[f"{op}_fc2_b"] = n(_D)
    return out


def make_musiq(npz_path: str) -> Callable:
    params = {k: jnp.asarray(v) for k, v in np.load(npz_path).items()}

    def _score(inp):
        # fp32 precision: match the fp32 torch reference (TPU default is bf16)
        with jax.default_matmul_precision("float32"):
            return musiq_score(params, inp)

    scorer = jax.jit(_score)

    def metric(x) -> np.ndarray:
        inp = prepare_inputs(np.asarray(x))
        return np.asarray(scorer({k: jnp.asarray(v) for k, v in inp.items()}))

    return metric
