"""LoRA loading for the MMDiT.

The reference pipeline mixes in SD3LoraLoaderMixin and ships a
dreambooth-LoRA loader (pipelines/pipeline_dit4sr.py:147, utils/misc.py).
Here LoRA is a pure parameter transform: deltas scale * (A @ B) are folded
into the flax kernels, so inference runs at full speed with no extra ops.

Supported key layout: diffusers SD3 LoRA state dicts —
``transformer.transformer_blocks.{i}.<module>.lora_A.weight`` /
``lora_B.weight`` where <module> is any linear we map in
utils.weights (attn.to_q, attn.add_q_proj, ff.net.0.proj, ...).
"""

from __future__ import annotations

from typing import Mapping, Tuple

import numpy as np
from flax import traverse_util

# diffusers module name -> our flattened param path inside blocks_{i}
_MODULE_MAP = {
    "attn.to_q": "attn/to_q",
    "attn.to_k": "attn/to_k",
    "attn.to_v": "attn/to_v",
    "attn.to_out.0": "attn/to_out",
    "attn.add_q_proj": "attn/add_q_proj",
    "attn.add_k_proj": "attn/add_k_proj",
    "attn.add_v_proj": "attn/add_v_proj",
    "attn.to_add_out": "attn/to_add_out",
    "attn2.to_q": "attn2/to_q",
    "attn2.to_k": "attn2/to_k",
    "attn2.to_v": "attn2/to_v",
    "attn2.to_out.0": "attn2/to_out",
    "ff.net.0.proj": "ff/proj_in",
    "ff.net.2": "ff/proj_out",
    "ff_context.net.0.proj": "ff_context/proj_in",
    "ff_context.net.2": "ff_context/proj_out",
}


def collect_lora_deltas(
    lora_sd: Mapping[str, np.ndarray], scale: float = 1.0
) -> dict:
    """{our_param_path: delta_kernel} from a diffusers SD3 LoRA state dict.
    Delta for a torch linear y = W x is (B @ A); our kernel is W^T, so the
    flax delta is (B @ A)^T = A^T @ B^T."""
    deltas = {}
    for key in lora_sd:
        if not key.endswith(".lora_A.weight"):
            continue
        base = key[: -len(".lora_A.weight")]
        b_key = base + ".lora_B.weight"
        if b_key not in lora_sd:
            continue
        name = base
        for prefix in ("transformer.", "diffusion_model."):
            if name.startswith(prefix):
                name = name[len(prefix):]
        if not name.startswith("transformer_blocks."):
            continue
        _, idx, module = name.split(".", 2)
        path = _MODULE_MAP.get(module)
        if path is None:
            continue
        a = np.asarray(lora_sd[key], np.float32)      # (r, in)
        b = np.asarray(lora_sd[b_key], np.float32)    # (out, r)
        deltas[f"blocks_{idx}/{path}/kernel"] = scale * (a.T @ b.T)
    return deltas


def apply_lora(params: dict, lora_sd: Mapping[str, np.ndarray], scale: float = 1.0):
    """Fold LoRA deltas into a param tree; returns (new_params, n_applied)."""
    import jax.numpy as jnp

    deltas = collect_lora_deltas(lora_sd, scale)
    flat = traverse_util.flatten_dict(params, sep="/")
    applied = 0
    for path, delta in deltas.items():
        full = f"params/{path}"
        if full in flat and flat[full].shape == delta.shape:
            flat[full] = flat[full] + jnp.asarray(delta, flat[full].dtype)
            applied += 1
    return (
        traverse_util.unflatten_dict({tuple(k.split("/")): v for k, v in flat.items()}),
        applied,
    )
