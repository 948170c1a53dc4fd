"""torch/diffusers checkpoint -> dit4sr_tpu parameter conversion.

The reference loads SD3.5-medium safetensors non-strictly and dumps
missing/unexpected keys (model_dit4sr/transformer_sd3.py:412-458); this module
does the equivalent for the JAX trees, including:

  * layout conversion (torch Linear (out,in) -> flax kernel (in,out);
    torch Conv OIHW -> flax HWIO; patch-embed conv -> patchify Linear)
  * zero-init of control-branch params missing from a vanilla SD3.5 ckpt,
    with out-projections copied from the base out projection
  * `ocr_branch_init` weight surgery: seed the ocr branch from the hq or
    control branch (transformer_sd3_ocrbranch_ocr2hq2ocr.py:438-524)

Works from any mapping of {torch_key: np.ndarray}; `load_safetensors` reads
the file format without needing the torch runtime.
"""

from __future__ import annotations

import json
import struct
from typing import Dict, Iterable, Mapping, Optional, Tuple

import numpy as np
from flax import traverse_util

from dit4sr_tpu.config import MMDiTConfig, VAEConfig

# ---------------------------------------------------------------------------
# safetensors reader (zero-dependency)
# ---------------------------------------------------------------------------

_ST_DTYPES = {
    "F64": np.float64,
    "F32": np.float32,
    "F16": np.float16,
    "BF16": None,  # handled specially
    "I64": np.int64,
    "I32": np.int32,
    "I16": np.int16,
    "I8": np.int8,
    "U8": np.uint8,
    "BOOL": np.bool_,
}


def load_safetensors(path: str) -> Dict[str, np.ndarray]:
    """Minimal safetensors loader (header json + raw little-endian buffers)."""
    out: Dict[str, np.ndarray] = {}
    with open(path, "rb") as f:
        header_len = struct.unpack("<Q", f.read(8))[0]
        header = json.loads(f.read(header_len))
        base = 8 + header_len
        for name, meta in header.items():
            if name == "__metadata__":
                continue
            start, end = meta["data_offsets"]
            f.seek(base + start)
            raw = f.read(end - start)
            dt = meta["dtype"]
            if dt == "BF16":
                u16 = np.frombuffer(raw, dtype=np.uint16)
                u32 = u16.astype(np.uint32) << 16
                arr = u32.view(np.float32)
            else:
                arr = np.frombuffer(raw, dtype=_ST_DTYPES[dt])
            out[name] = arr.reshape(meta["shape"]).copy()
    return out


# ---------------------------------------------------------------------------
# layout converters
# ---------------------------------------------------------------------------


def linear(w: np.ndarray, b: Optional[np.ndarray] = None) -> dict:
    p = {"kernel": np.ascontiguousarray(w.T)}
    if b is not None:
        p["bias"] = b
    return p


def conv(w: np.ndarray, b: Optional[np.ndarray] = None) -> dict:
    """torch OIHW -> flax HWIO."""
    p = {"kernel": np.ascontiguousarray(w.transpose(2, 3, 1, 0))}
    if b is not None:
        p["bias"] = b
    return p


def patch_linear(w: np.ndarray, b: np.ndarray) -> dict:
    """Patch-embed conv (D, C, p, p) -> Dense kernel over (p*p*C, D) matching
    the framework's (p q c) patchify order."""
    d, c, p_, q_ = w.shape
    k = w.transpose(2, 3, 1, 0).reshape(p_ * q_ * c, d)
    return {"kernel": np.ascontiguousarray(k), "bias": b}


def norm(w: np.ndarray, b: Optional[np.ndarray] = None) -> dict:
    p = {"scale": w}
    if b is not None:
        p["bias"] = b
    return p


# ---------------------------------------------------------------------------
# MMDiT conversion
# ---------------------------------------------------------------------------


def _attn_params(
    sd: Mapping[str, np.ndarray], prefix: str, cfg: MMDiTConfig, has_text: bool
) -> dict:
    g = lambda k: sd.get(f"{prefix}.{k}")  # noqa: E731
    out: dict = {}
    for name in ("to_q", "to_k", "to_v"):
        out[name] = linear(g(f"{name}.weight"), g(f"{name}.bias"))
    out["to_out"] = linear(g("to_out.0.weight"), g("to_out.0.bias"))
    if cfg.qk_norm == "rms_norm":
        out["norm_q"] = norm(g("norm_q.weight"))
        out["norm_k"] = norm(g("norm_k.weight"))
    if has_text:
        for src, dst in (
            ("add_q_proj", "add_q_proj"),
            ("add_k_proj", "add_k_proj"),
            ("add_v_proj", "add_v_proj"),
        ):
            out[dst] = linear(g(f"{src}.weight"), g(f"{src}.bias"))
        if cfg.qk_norm == "rms_norm":
            out["norm_added_q"] = norm(g("norm_added_q.weight"))
            out["norm_added_k"] = norm(g("norm_added_k.weight"))
        if g("to_add_out.weight") is not None:
            out["to_add_out"] = linear(g("to_add_out.weight"), g("to_add_out.bias"))

    d = cfg.inner_dim
    for s in cfg.streams[1:]:
        suffix = s  # reference names: control / ocr
        for pn in ("q", "k", "v"):
            key = f"to_{pn}_{suffix}"
            w, b = g(f"{key}.weight"), g(f"{key}.bias")
            if w is None:  # vanilla SD3.5 ckpt: zero-init (attention.py:426-428)
                w, b = np.zeros((d, d), np.float32), np.zeros((d,), np.float32)
            out[key] = linear(w, b)
        key = f"to_out_{suffix}"
        w, b = g(f"{key}.weight"), g(f"{key}.bias")
        if w is None:  # copy base out projection (attention.py:429-431)
            out[key] = {
                "kernel": out["to_out"]["kernel"].copy(),
                "bias": out["to_out"]["bias"].copy(),
            }
        else:
            out[key] = linear(w, b)
    return out


def _ffn_params(sd, prefix: str, cfg: MMDiTConfig, couplings: bool) -> dict:
    g = lambda k: sd.get(f"{prefix}.{k}")  # noqa: E731
    out = {
        "proj_in": linear(g("net.0.proj.weight"), g("net.0.proj.bias")),
        "proj_out": linear(g("net.2.weight"), g("net.2.bias")),
    }
    if couplings:
        from dit4sr_tpu.models.mmdit import _COUPLING_NAMES

        hidden = 4 * cfg.inner_dim
        for pair in cfg.ffn_couplings:
            name = _COUPLING_NAMES.get(pair, f"{pair[0]}_to_{pair[1]}_conv")
            w, b = g(f"{name}.weight"), g(f"{name}.bias")
            if w is None:  # zero-init depthwise conv (attention.py:150)
                out[name] = {
                    "kernel": np.zeros((3, 3, 1, hidden), np.float32),
                    "bias": np.zeros((hidden,), np.float32),
                }
            else:
                # torch depthwise (C,1,3,3) -> HWIO (3,3,1,C)
                out[name] = {
                    "kernel": np.ascontiguousarray(w.transpose(2, 3, 1, 0)),
                    "bias": b,
                }
    return out


def convert_mmdit(
    sd: Mapping[str, np.ndarray],
    cfg: MMDiTConfig,
    ocr_branch_init: Optional[str] = None,
) -> dict:
    """diffusers SD3Transformer2DModel state dict -> MMDiT param tree.

    `ocr_branch_init` in {None, "hq_branch", "lq_branch"} seeds the ocr
    attention branch from base/control weights, matching the reference's
    key-rewrite surgery (transformer_sd3_ocrbranch_ocr2hq2ocr.py:438-524).
    """
    p: dict = {
        "pos_embed": {
            "proj": patch_linear(
                sd["pos_embed.proj.weight"], sd["pos_embed.proj.bias"]
            )
        },
        "time_text_embed": {
            "timestep_embedder": {
                "linear_1": linear(
                    sd["time_text_embed.timestep_embedder.linear_1.weight"],
                    sd["time_text_embed.timestep_embedder.linear_1.bias"],
                ),
                "linear_2": linear(
                    sd["time_text_embed.timestep_embedder.linear_2.weight"],
                    sd["time_text_embed.timestep_embedder.linear_2.bias"],
                ),
            },
            "text_embedder": {
                "linear_1": linear(
                    sd["time_text_embed.text_embedder.linear_1.weight"],
                    sd["time_text_embed.text_embedder.linear_1.bias"],
                ),
                "linear_2": linear(
                    sd["time_text_embed.text_embedder.linear_2.weight"],
                    sd["time_text_embed.text_embedder.linear_2.bias"],
                ),
            },
        },
        "context_embedder": linear(
            sd["context_embedder.weight"], sd["context_embedder.bias"]
        ),
        "norm_out": {
            "linear": linear(sd["norm_out.linear.weight"], sd["norm_out.linear.bias"])
        },
        "proj_out": linear(sd["proj_out.weight"], sd["proj_out.bias"]),
    }

    for i in range(cfg.num_layers):
        tp = f"transformer_blocks.{i}"
        last = i == cfg.num_layers - 1
        blk = {
            "norm1": {
                "linear": linear(
                    sd[f"{tp}.norm1.linear.weight"], sd[f"{tp}.norm1.linear.bias"]
                )
            },
            "norm1_context": {
                "linear": linear(
                    sd[f"{tp}.norm1_context.linear.weight"],
                    sd[f"{tp}.norm1_context.linear.bias"],
                )
            },
            "attn": _attn_params(sd, f"{tp}.attn", cfg, has_text=True),
            "ff": _ffn_params(sd, f"{tp}.ff", cfg, couplings=True),
        }
        if not last:
            blk["ff_context"] = _ffn_params(sd, f"{tp}.ff_context", cfg, couplings=False)
        if i in cfg.dual_attention_layers:
            blk["attn2"] = _attn_params(sd, f"{tp}.attn2", cfg, has_text=False)
        p[f"blocks_{i}"] = blk

    if ocr_branch_init and "ocr" in cfg.streams:
        src = "control" if ocr_branch_init == "lq_branch" else None
        for i in range(cfg.num_layers):
            for attn_name in ("attn", "attn2"):
                attn = p[f"blocks_{i}"].get(attn_name)
                if attn is None:
                    continue
                for pn in ("q", "k", "v", "out"):
                    if src is not None:
                        attn[f"to_{pn}_ocr"] = {
                            k: v.copy() for k, v in attn[f"to_{pn}_{src}"].items()
                        }
                    # hq_branch: q/k/v stay zero (identity composition) and
                    # out_ocr already copies to_out — nothing to do

    return {"params": p}


# ---------------------------------------------------------------------------
# VAE conversion
# ---------------------------------------------------------------------------


def _resnet(sd, prefix: str) -> dict:
    g = lambda k: sd.get(f"{prefix}.{k}")  # noqa: E731
    out = {
        "norm1": norm(g("norm1.weight"), g("norm1.bias")),
        "conv1": conv(g("conv1.weight"), g("conv1.bias")),
        "norm2": norm(g("norm2.weight"), g("norm2.bias")),
        "conv2": conv(g("conv2.weight"), g("conv2.bias")),
    }
    if g("conv_shortcut.weight") is not None:
        out["conv_shortcut"] = conv(g("conv_shortcut.weight"), g("conv_shortcut.bias"))
    return out


def _vae_attn(sd, prefix: str) -> dict:
    g = lambda k: sd[f"{prefix}.{k}"]  # noqa: E731
    return {
        "group_norm": norm(g("group_norm.weight"), g("group_norm.bias")),
        "to_q": linear(g("to_q.weight"), g("to_q.bias")),
        "to_k": linear(g("to_k.weight"), g("to_k.bias")),
        "to_v": linear(g("to_v.weight"), g("to_v.bias")),
        "to_out": linear(g("to_out.0.weight"), g("to_out.0.bias")),
    }


def _coder(sd, side: str, cfg: VAEConfig, is_encoder: bool) -> dict:
    g = lambda k: sd.get(f"{side}.{k}")  # noqa: E731
    out = {
        "conv_in": conv(g("conv_in.weight"), g("conv_in.bias")),
        "conv_norm_out": norm(g("conv_norm_out.weight"), g("conv_norm_out.bias")),
        "conv_out": conv(g("conv_out.weight"), g("conv_out.bias")),
        "mid_block": {
            "resnets_0": _resnet(sd, f"{side}.mid_block.resnets.0"),
            "attentions_0": _vae_attn(sd, f"{side}.mid_block.attentions.0"),
            "resnets_1": _resnet(sd, f"{side}.mid_block.resnets.1"),
        },
    }
    n_blocks = len(cfg.block_out_channels)
    n_res = cfg.layers_per_block if is_encoder else cfg.layers_per_block + 1
    kind = "down_blocks" if is_encoder else "up_blocks"
    for i in range(n_blocks):
        for j in range(n_res):
            out[f"{kind}_{i}_resnets_{j}"] = _resnet(sd, f"{side}.{kind}.{i}.resnets.{j}")
        if is_encoder and i < n_blocks - 1:
            out[f"down_blocks_{i}_downsample"] = conv(
                g(f"down_blocks.{i}.downsamplers.0.conv.weight"),
                g(f"down_blocks.{i}.downsamplers.0.conv.bias"),
            )
        if not is_encoder and i < n_blocks - 1:
            out[f"up_blocks_{i}_upsample"] = conv(
                g(f"up_blocks.{i}.upsamplers.0.conv.weight"),
                g(f"up_blocks.{i}.upsamplers.0.conv.bias"),
            )
    return out


def convert_vae(sd: Mapping[str, np.ndarray], cfg: VAEConfig) -> dict:
    return {
        "params": {
            "encoder": _coder(sd, "encoder", cfg, True),
            "decoder": _coder(sd, "decoder", cfg, False),
        }
    }


# ---------------------------------------------------------------------------
# verification helper
# ---------------------------------------------------------------------------


def check_tree_matches(params_ref, params_new) -> Tuple[list, list]:
    """Compare two param trees by flattened path+shape; returns
    (missing, unexpected) like torch load_state_dict(strict=False)."""
    ref = traverse_util.flatten_dict(params_ref, sep="/")
    new = traverse_util.flatten_dict(params_new, sep="/")
    missing = sorted(
        k for k in ref if k not in new or tuple(new[k].shape) != tuple(ref[k].shape)
    )
    unexpected = sorted(k for k in new if k not in ref)
    return missing, unexpected


# ---------------------------------------------------------------------------
# TESTR conversion (reference saves raw torch state dicts of
# TransformerDetector as ts_module*.pt; train_dit4sr.py:509-514)
# ---------------------------------------------------------------------------


def _mha(sd, prefix: str) -> dict:
    """torch nn.MultiheadAttention (packed in_proj) -> our MHA module."""
    w = np.asarray(sd[f"{prefix}.in_proj_weight"])
    b = np.asarray(sd[f"{prefix}.in_proj_bias"])
    d = w.shape[1]
    out = {}
    for i, name in enumerate(("q_proj", "k_proj", "v_proj")):
        out[name] = {
            "kernel": np.ascontiguousarray(w[i * d : (i + 1) * d].T),
            "bias": b[i * d : (i + 1) * d],
        }
    out["out_proj"] = linear(
        sd[f"{prefix}.out_proj.weight"], sd[f"{prefix}.out_proj.bias"]
    )
    return out


def _ms_deform(sd, prefix: str) -> dict:
    return {
        name: linear(sd[f"{prefix}.{name}.weight"], sd[f"{prefix}.{name}.bias"])
        for name in ("sampling_offsets", "attention_weights", "value_proj", "output_proj")
    }


def _ln(sd, prefix: str) -> dict:
    return {"scale": np.asarray(sd[f"{prefix}.weight"]), "bias": np.asarray(sd[f"{prefix}.bias"])}


def _gn(sd, prefix: str) -> dict:
    # flax GroupNorm parameter names inside our GroupNorm32/nn.GroupNorm
    return {"scale": np.asarray(sd[f"{prefix}.weight"]), "bias": np.asarray(sd[f"{prefix}.bias"])}


def _mlp(sd, prefix: str, n_layers: int) -> dict:
    return {
        f"layers_{j}": linear(
            sd[f"{prefix}.layers.{j}.weight"], sd[f"{prefix}.layers.{j}.bias"]
        )
        for j in range(n_layers)
    }


def _ffn(sd, prefix: str, norm_name: str) -> dict:
    return {
        "linear1": linear(sd[f"{prefix}.linear1.weight"], sd[f"{prefix}.linear1.bias"]),
        "linear2": linear(sd[f"{prefix}.linear2.weight"], sd[f"{prefix}.linear2.bias"]),
        "norm": _ln(sd, f"{prefix}.{norm_name}"),
    }


def convert_testr(sd: Mapping[str, np.ndarray], cfg) -> dict:
    """TransformerDetector state dict -> TESTR flax params.

    `cfg` is a TESTRConfig. Keys may carry the detector's "testr." prefix
    (transformer_detector.py wraps the model as `self.testr`).
    """
    if any(k.startswith("testr.") for k in sd):
        sd = {k[len("testr."):]: v for k, v in sd.items() if k.startswith("testr.")}

    p: dict = {
        "level_embed": np.asarray(sd["transformer.level_embed"]),
        "enc_output": linear(
            sd["transformer.enc_output.weight"], sd["transformer.enc_output.bias"]
        ),
        "enc_output_norm": _ln(sd, "transformer.enc_output_norm"),
        "pos_trans": linear(
            sd["transformer.pos_trans.weight"], sd["transformer.pos_trans.bias"]
        ),
        "pos_trans_norm": _ln(sd, "transformer.pos_trans_norm"),
        "ctrl_point_embed": np.asarray(sd["ctrl_point_embed.weight"]),
        "text_embed": np.asarray(sd["text_embed.weight"]),
        # heads are shared across decoder layers (models.py:205-209): index 0
        "ctrl_point_class": linear(
            sd["ctrl_point_class.0.weight"], sd["ctrl_point_class.0.bias"]
        ),
        "ctrl_point_coord": _mlp(sd, "ctrl_point_coord.0", 3),
        "bbox_class": linear(sd["bbox_class.weight"], sd["bbox_class.bias"]),
        "bbox_coord": _mlp(sd, "bbox_coord", 3),
        "text_class": linear(sd["text_class.weight"], sd["text_class.bias"]),
    }

    for l in range(cfg.num_feature_levels):
        fp = f"diff_feat_proj.{l}"
        p[f"feat_proj_{l}"] = {
            "proj_0": conv(sd[f"{fp}.proj.0.weight"], sd[f"{fp}.proj.0.bias"]),
            "proj_1": _gn(sd, f"{fp}.proj.1"),
            "proj_3": conv(sd[f"{fp}.proj.3.weight"], sd[f"{fp}.proj.3.bias"]),
            "proj_5": conv(sd[f"{fp}.proj.5.weight"], sd[f"{fp}.proj.5.bias"]),
            "proj_6": _gn(sd, f"{fp}.proj.6"),
            "shortcut": conv(sd[f"{fp}.shortcut.weight"], sd[f"{fp}.shortcut.bias"]),
        }

    for i in range(cfg.num_encoder_layers):
        ep = f"transformer.encoder.layers.{i}"
        p[f"encoder_{i}"] = {
            "self_attn": _ms_deform(sd, f"{ep}.self_attn"),
            "norm1": _ln(sd, f"{ep}.norm1"),
            "ffn": _ffn(sd, ep, "norm2"),
        }

    for i in range(cfg.num_decoder_layers):
        dp = f"transformer.decoder.layers.{i}"
        p[f"decoder_{i}"] = {
            "attn_intra": _mha(sd, f"{dp}.attn_intra"),
            "norm_intra": _ln(sd, f"{dp}.norm_intra"),
            "attn_inter": _mha(sd, f"{dp}.attn_inter"),
            "norm_inter": _ln(sd, f"{dp}.norm_inter"),
            "attn_cross": _ms_deform(sd, f"{dp}.attn_cross"),
            "norm_cross": _ln(sd, f"{dp}.norm_cross"),
            "attn_intra_text": _mha(sd, f"{dp}.attn_intra_text"),
            "norm_intra_text": _ln(sd, f"{dp}.norm_intra_text"),
            "attn_inter_text": _mha(sd, f"{dp}.attn_inter_text"),
            "norm_inter_text": _ln(sd, f"{dp}.norm_inter_text"),
            "attn_cross_text": _ms_deform(sd, f"{dp}.attn_cross_text"),
            "norm_cross_text": _ln(sd, f"{dp}.norm_cross_text"),
            "ffn": _ffn(sd, dp, "norm3"),
            "ffn_text": {
                "linear1": linear(
                    sd[f"{dp}.linear1_text.weight"], sd[f"{dp}.linear1_text.bias"]
                ),
                "linear2": linear(
                    sd[f"{dp}.linear2_text.weight"], sd[f"{dp}.linear2_text.bias"]
                ),
                "norm": _ln(sd, f"{dp}.norm3_text"),
            },
        }

    return {"params": p}
