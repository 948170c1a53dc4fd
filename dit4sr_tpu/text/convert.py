"""HF torch -> flax weight conversion for the text encoders."""

from __future__ import annotations

from typing import Mapping

import numpy as np

from dit4sr_tpu.text.encoders import CLIPConfig, T5Config


def _lin(sd, key):
    p = {"kernel": np.ascontiguousarray(np.asarray(sd[f"{key}.weight"]).T)}
    if f"{key}.bias" in sd:
        p["bias"] = np.asarray(sd[f"{key}.bias"])
    return p


def _ln(sd, key):
    return {"scale": np.asarray(sd[f"{key}.weight"]), "bias": np.asarray(sd[f"{key}.bias"])}


def convert_clip(sd: Mapping, cfg: CLIPConfig) -> dict:
    """CLIPTextModelWithProjection state dict -> CLIPTextEncoder params."""
    pre = "text_model."
    p = {
        "token_embedding": {
            "embedding": np.asarray(sd[f"{pre}embeddings.token_embedding.weight"])
        },
        "position_embedding": np.asarray(
            sd[f"{pre}embeddings.position_embedding.weight"]
        ),
        "final_layer_norm": _ln(sd, f"{pre}final_layer_norm"),
        "text_projection": {
            "kernel": np.ascontiguousarray(np.asarray(sd["text_projection.weight"]).T)
        },
    }
    for i in range(cfg.num_layers):
        lp = f"{pre}encoder.layers.{i}"
        p[f"layers_{i}"] = {
            "layer_norm1": _ln(sd, f"{lp}.layer_norm1"),
            "layer_norm2": _ln(sd, f"{lp}.layer_norm2"),
            "q_proj": _lin(sd, f"{lp}.self_attn.q_proj"),
            "k_proj": _lin(sd, f"{lp}.self_attn.k_proj"),
            "v_proj": _lin(sd, f"{lp}.self_attn.v_proj"),
            "out_proj": _lin(sd, f"{lp}.self_attn.out_proj"),
            "fc1": _lin(sd, f"{lp}.mlp.fc1"),
            "fc2": _lin(sd, f"{lp}.mlp.fc2"),
        }
    return {"params": p}


def convert_t5(sd: Mapping, cfg: T5Config) -> dict:
    """T5EncoderModel state dict -> T5Encoder params."""
    p = {
        "embed_tokens": {"embedding": np.asarray(sd["encoder.embed_tokens.weight"])},
        "relative_attention_bias": np.asarray(
            sd["encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight"]
        ),
        "final_layer_norm": {
            "weight": np.asarray(sd["encoder.final_layer_norm.weight"])
        },
    }
    for i in range(cfg.num_layers):
        bp = f"encoder.block.{i}"
        p[f"block_{i}"] = {
            "norm_attn": {"weight": np.asarray(sd[f"{bp}.layer.0.layer_norm.weight"])},
            "norm_ff": {"weight": np.asarray(sd[f"{bp}.layer.1.layer_norm.weight"])},
            "q": _lin(sd, f"{bp}.layer.0.SelfAttention.q"),
            "k": _lin(sd, f"{bp}.layer.0.SelfAttention.k"),
            "v": _lin(sd, f"{bp}.layer.0.SelfAttention.v"),
            "o": _lin(sd, f"{bp}.layer.0.SelfAttention.o"),
            "wi_0": _lin(sd, f"{bp}.layer.1.DenseReluDense.wi_0"),
            "wi_1": _lin(sd, f"{bp}.layer.1.DenseReluDense.wi_1"),
            "wo": _lin(sd, f"{bp}.layer.1.DenseReluDense.wo"),
        }
    return {"params": p}
