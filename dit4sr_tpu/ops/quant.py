"""w8a8 int8 quantization for the MMDiT's hot Dense layers (serving mode).

The v5e MXU runs int8 x int8 -> int32 at ~2x the bf16 rate; measured at the
real MMDiT layer shapes (tools/int8_layer_probe.py, one v5e chip, including
the quant/dequant overhead): attention projections x1.16, the FFN pair
x1.28. Opt-in, approximate (the reference has no quantized path; its
inference runs fp16, test/test.py result dirs are tagged `all__fp16__...`):

  * weights: symmetric per-output-channel int8, converted offline from the
    trained fp32/bf16 params by `quantize_mmdit_params`;
  * activations: dynamic symmetric per-token int8 (absmax / 127), computed
    on the fly inside `QuantDense` — the VPU work fuses into the matmul's
    prologue/epilogue;
  * the accumulator stays int32 and is dequantized with
    `a_scale[token] * w_scale[channel]` before the bias add.

Only the big D x D / D x 4D matmuls quantize (attention q/k/v/out incl.
composed control projections, FFN in/out). AdaLN modulation, embedders,
norms, the depthwise coupling convs, and the attention itself stay bf16 —
they are a small fraction of the FLOPs and carry most of the numerical
sensitivity.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

# Param subtrees whose 2D `kernel`s are quantized, by owner-module name
# inside a JointBlock (models/mmdit.py). Everything else keeps bf16 compute.
QUANT_SCOPES = ("attn", "attn2", "ff", "ff_context")


def _i8_zeros(shape):
    return lambda rng: jnp.zeros(shape, jnp.int8)


class QuantDense(nn.Module):
    """Drop-in Dense replacement running the matmul on the int8 MXU path.

    Params (`kernel_i8`, `scale`, `bias`) are never trained — they come from
    `quantize_mmdit_params`; the initializers only exist so `model.init`
    builds a tree with the right structure. Accepts (and ignores)
    `param_dtype`/`kernel_init`/`bias_init` so call sites stay uniform with
    nn.Dense.
    """

    features: int
    dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    kernel_init: Any = None
    bias_init: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_dim = x.shape[-1]
        kernel = self.param("kernel_i8", _i8_zeros((in_dim, self.features)))
        scale = self.param(
            "scale", lambda rng: jnp.full((self.features,), 1e-8, jnp.float32)
        )
        bias = self.param(
            "bias", lambda rng: jnp.zeros((self.features,), jnp.float32)
        )

        xf = x.astype(jnp.float32)
        amax = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-6)
        a_scale = amax / 127.0
        x_i8 = jnp.round(xf / a_scale).astype(jnp.int8)
        acc = jax.lax.dot_general(
            x_i8.reshape(-1, in_dim),
            kernel,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).reshape(*x.shape[:-1], self.features)
        out = acc.astype(jnp.float32) * (a_scale * scale) + bias
        return out.astype(self.dtype)


def quantize_kernel(kernel: jnp.ndarray, eps: float = 1e-8):
    """Symmetric per-output-channel int8: kernel (in, out) -> (k_i8, scale)
    with kernel ≈ k_i8 * scale[None, :]."""
    kf = jnp.asarray(kernel, jnp.float32)
    amax = jnp.maximum(jnp.max(jnp.abs(kf), axis=0), eps)
    scale = amax / 127.0
    k_i8 = jnp.round(kf / scale).astype(jnp.int8)
    return k_i8, scale


def _quantize_tree(tree):
    """Replace every {kernel: 2D, bias} Dense subtree in `tree` (recursively)
    by {kernel_i8, scale, bias}. Non-Dense leaves/subtrees pass through."""
    if not isinstance(tree, dict):
        return tree
    if "kernel" in tree and getattr(tree["kernel"], "ndim", 0) == 2:
        k_i8, scale = quantize_kernel(tree["kernel"])
        out = {"kernel_i8": k_i8, "scale": scale}
        if "bias" in tree:
            out["bias"] = jnp.asarray(tree["bias"], jnp.float32)
        else:
            out["bias"] = jnp.zeros((k_i8.shape[1],), jnp.float32)
        return out
    return {k: _quantize_tree(v) for k, v in tree.items()}


def quantize_mmdit_params(params, cfg):
    """Convert a trained MMDiT param tree for `cfg.with_(w8a8=True)`.

    Quantizes the 2D Dense kernels under each block's QUANT_SCOPES modules;
    everything else (embedders, AdaLN, norms, coupling convs, norm_out,
    proj_out) is kept verbatim. Compose AFTER fold_control_projections when
    folding is on (fold multiplies fp32 kernels; quantization must see the
    folded product).
    """
    import flax

    params = flax.core.unfreeze(jax.tree.map(lambda x: x, params))
    p = dict(params["params"])
    for i in range(cfg.num_layers):
        name = f"blocks_{i}"
        blk = dict(p[name])
        for scope in QUANT_SCOPES:
            if scope in blk:
                blk[scope] = _quantize_tree(blk[scope])
        p[name] = blk
    out = dict(params)
    out["params"] = p
    return out
