"""LoRA adapters for the MMDiT (and any Dense-kernel pytree).

The reference inherits this surface from diffusers/PEFT: the pipeline is an
`SD3LoraLoaderMixin` (pipelines/pipeline_dit4sr.py:147) and the transformer
scales patched LoRA layers at every forward (`scale_lora_layers` /
`unscale_lora_layers`, model_dit4sr/transformer_sd3.py:311-400) — runtime
monkey-patching of nn.Linear modules.

The TPU-native design is functional instead: a LoRA is a *pytree mirroring
the param tree* with `{a: (in, r), b: (r, out)}` leaves at targeted 2D
kernels, and application is a **merge** (`kernel + scale * a @ b`) performed
once on host/device *before* jit. Inference therefore costs exactly zero —
no per-layer adapter matmuls, no dynamic scale threading through the jitted
forward (a traced scale would be a new constant per value anyway). Changing
the scale re-merges (a few ms for 2.6 GB of kernels) and re-uses the same
compiled executable because shapes/dtypes are unchanged.

For training, `make_lora_train_step` differentiates ONLY the LoRA tree: the
base params enter as a frozen argument (never closed over — CLAUDE.md HLO
constant rule), the merge happens inside the step so AD routes gradients
through `a`/`b`, and the optimizer state covers just the adapter (rank 16 on
SD3.5-medium ≈ 18 M params vs 2.1 B) — a memory-light finetune mode the
reference does not have (its recipes finetune full control branches).

Checkpoint compat: `convert_sd3_lora` reads diffusers/PEFT-format SD3 LoRA
safetensors (`transformer.transformer_blocks.{i}.attn.to_q.lora_A.weight`
(r, in) / `lora_B.weight` (out, r) / optional `.alpha`), so any published
SD3.5 transformer LoRA drops in. The PEFT `alpha / r` factor is folded into
`b` at conversion time; `merge_lora` then only applies the user-facing
`lora_scale` (pipeline_dit4sr.py:431-445 semantics).
"""

from __future__ import annotations

from typing import Callable, Mapping, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import traverse_util

# Kernel paths ('/'-joined, without the trailing '/kernel') that LoRA targets
# by default: every attention projection and FFN matmul in every block —
# matching what PEFT's target_modules resolves to for SD3 transformer LoRAs.
DEFAULT_TARGETS = (
    "/attn/", "/attn2/", "/ff/", "/ff_context/",
)


def _is_target(path: str, targets: Sequence[str]) -> bool:
    return any(t in path for t in targets)


def _flat_kernels(params, targets: Sequence[str]):
    """Yield (path_tuple, kernel) for every targeted 2D 'kernel' leaf."""
    flat = traverse_util.flatten_dict(params)
    for k, v in flat.items():
        if k[-1] == "kernel" and getattr(v, "ndim", 0) == 2:
            if _is_target("/" + "/".join(k[:-1]) + "/", targets):
                yield k, v


def init_lora_params(
    rng: jax.Array,
    params,
    rank: int,
    targets: Sequence[str] = DEFAULT_TARGETS,
    dtype=jnp.float32,
):
    """Fresh LoRA tree for `params`: a ~ N(0, 1/r) (PEFT's kaiming-ish down
    projection), b = 0 so the adapter starts as the identity."""
    out = {}
    for k, v in _flat_kernels(params, targets):
        rng, sub = jax.random.split(rng)
        d_in, d_out = v.shape
        out[k[:-1] + ("a",)] = (
            jax.random.normal(sub, (d_in, rank), dtype) / jnp.sqrt(rank)
        )
        out[k[:-1] + ("b",)] = jnp.zeros((rank, d_out), dtype)
    return traverse_util.unflatten_dict(out)


def merge_lora(params, lora, scale: float = 1.0):
    """params with `kernel += scale * a @ b` at every adapter site; all other
    leaves pass through untouched. Pure function of its inputs — safe inside
    jit (LoRA training) and cheap outside it (inference re-merge).

    A `{"params": ...}` variables wrapper on `params` but not on `lora`
    (checkpoint-converted LoRAs are bare) is handled transparently."""
    import flax

    params = flax.core.unfreeze(params)
    lora = flax.core.unfreeze(lora)
    if (
        isinstance(params, dict) and "params" in params
        and isinstance(lora, dict) and "params" not in lora
    ):
        return {**params, "params": merge_lora(params["params"], lora, scale)}
    flat_p = traverse_util.flatten_dict(params)
    flat_l = traverse_util.flatten_dict(lora)
    out = dict(flat_p)
    applied, skipped = 0, []
    for k in flat_l:
        if k[-1] != "a":
            continue
        site = k[:-1]
        kk = site + ("kernel",)
        a, b = flat_l[site + ("a",)], flat_l[site + ("b",)]
        kern = flat_p.get(kk)
        if kern is None or kern.shape != (a.shape[0], b.shape[1]):
            # checkpoint for a different geometry (e.g. an SD3.5-large LoRA
            # against the medium config): skip the site rather than crash;
            # refuse below only if NOTHING matched
            skipped.append("/".join(site))
            continue
        delta = (a.astype(jnp.float32) @ b.astype(jnp.float32)) * scale
        out[kk] = (kern.astype(jnp.float32) + delta).astype(kern.dtype)
        applied += 1
    if skipped:
        if not applied:
            raise ValueError(
                f"no LoRA site matched the model (first mismatch: "
                f"{skipped[0]}) — wrong base geometry?"
            )
        print(
            f"merge_lora: applied {applied} sites, skipped "
            f"{len(skipped)} absent/mismatched (e.g. {skipped[0]})"
        )
    return traverse_util.unflatten_dict(out)


def count_lora_params(lora) -> int:
    return sum(int(x.size) for x in jax.tree.leaves(lora))


# ---------------------------------------------------------------------------
# diffusers / PEFT SD3 LoRA checkpoint conversion
# ---------------------------------------------------------------------------

# torch module path under transformer_blocks.{i} -> our JointBlock subtree
_TORCH_TO_TREE = {
    "attn.to_q": ("attn", "to_q"),
    "attn.to_k": ("attn", "to_k"),
    "attn.to_v": ("attn", "to_v"),
    "attn.to_out.0": ("attn", "to_out"),
    "attn.add_q_proj": ("attn", "add_q_proj"),
    "attn.add_k_proj": ("attn", "add_k_proj"),
    "attn.add_v_proj": ("attn", "add_v_proj"),
    "attn.to_add_out": ("attn", "to_add_out"),
    "attn2.to_q": ("attn2", "to_q"),
    "attn2.to_k": ("attn2", "to_k"),
    "attn2.to_v": ("attn2", "to_v"),
    "attn2.to_out.0": ("attn2", "to_out"),
    "ff.net.0.proj": ("ff", "proj_in"),
    "ff.net.2": ("ff", "proj_out"),
    "ff_context.net.0.proj": ("ff_context", "proj_in"),
    "ff_context.net.2": ("ff_context", "proj_out"),
}


def convert_sd3_lora(sd: Mapping[str, np.ndarray]) -> dict:
    """diffusers/PEFT SD3 LoRA state dict -> LoRA pytree for merge_lora.

    Accepts both `transformer.transformer_blocks...` and bare
    `transformer_blocks...` key prefixes, `lora_A/lora_B` (PEFT) and
    `lora.down/lora.up` (legacy kohya-style) pair names, and per-module
    `alpha` scalars (folded into `b` as alpha / r). Torch layouts are
    transposed to ours: lora_A.weight (r, in) -> a (in, r); lora_B.weight
    (out, r) -> b (r, out). Non-transformer entries (text-encoder LoRA) are
    ignored — the triple text encoder is frozen in every reference recipe.
    """
    pairs = {}  # tree-site tuple -> {"a": ..., "b": ..., "alpha": float}
    for key, w in sd.items():
        k = key
        if k.startswith("transformer."):
            k = k[len("transformer."):]
        if not k.startswith("transformer_blocks."):
            continue
        rest = k[len("transformer_blocks."):]
        idx, rest = rest.split(".", 1)
        site = None
        for tname, tsite in _TORCH_TO_TREE.items():
            if rest.startswith(tname + "."):
                site = (f"blocks_{idx}",) + tsite
                tail = rest[len(tname) + 1:]
                break
        if site is None:
            continue
        entry = pairs.setdefault(site, {})
        if tail in ("lora_A.weight", "lora.down.weight"):
            entry["a"] = np.ascontiguousarray(np.asarray(w, np.float32).T)
        elif tail in ("lora_B.weight", "lora.up.weight"):
            entry["b"] = np.ascontiguousarray(np.asarray(w, np.float32).T)
        elif tail == "alpha":
            entry["alpha"] = float(np.asarray(w))
    flat = {}
    for site, entry in pairs.items():
        if "a" not in entry or "b" not in entry:
            raise ValueError(f"incomplete LoRA pair at {'/'.join(site)}")
        a, b = entry["a"], entry["b"]
        r = a.shape[1]
        if "alpha" in entry:
            b = b * (entry["alpha"] / r)
        flat[site + ("a",)] = jnp.asarray(a)
        flat[site + ("b",)] = jnp.asarray(b)
    if not flat:
        raise ValueError("no transformer LoRA entries found in state dict")
    return traverse_util.unflatten_dict(flat)


def load_sd3_lora(path: str) -> dict:
    """Read a LoRA .safetensors file and convert (utils/weights.py reader)."""
    from dit4sr_tpu.utils.weights import load_safetensors

    return convert_sd3_lora(load_safetensors(path))


# ---------------------------------------------------------------------------
# LoRA finetuning
# ---------------------------------------------------------------------------


def make_lora_train_step(
    mmdit,
    tx,
    train_cfg,
    sched_cfg=None,
    lora_scale: float = 1.0,
) -> Callable:
    """Jittable LoRA finetune step: (lora, opt_state, base_params, batch, rng)
    -> (lora, opt_state, metrics).

    Differentiates the flow-matching diffusion loss (train_step.py) w.r.t.
    the LoRA tree only; `base_params` is a frozen argument (pass it, don't
    close over it). Optimizer state covers just the adapter. Beyond the
    reference (whose recipes finetune full control branches); the loss and
    preconditioning are identical to stage1 (train_dit4sr.py:318-336).
    """
    from dit4sr_tpu.config import SchedulerConfig
    from dit4sr_tpu.train.train_step import flow_matching_loss

    if sched_cfg is None:
        sched_cfg = SchedulerConfig()

    def loss_fn(lora, base_params, batch, rng):
        merged = merge_lora(base_params, lora, lora_scale)
        diff_loss, _ = flow_matching_loss(
            mmdit, merged, batch, rng, train_cfg, sched_cfg,
            extract_features=False,
        )
        return diff_loss, {"diff_loss": diff_loss}

    def step(lora, opt_state, base_params, batch, rng):
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            lora, base_params, batch, rng
        )
        import optax

        metrics["grad_norm"] = optax.global_norm(grads)
        updates, opt_state = tx.update(grads, opt_state, lora)
        lora = optax.apply_updates(lora, updates)
        return lora, opt_state, metrics

    return step
