"""Optimizer construction: per-module LRs, trainability masks, grad clipping.

Mirrors the reference's optimizer semantics (initialize.py:460-590):
  * `finetune_layer_names` substring match on parameter paths decides
    trainability (load_model_params :460-558) — here an optax mask that
    zeroes updates for frozen params;
  * per-module learning rates (DiT lr vs TESTR lr, load_optim :563-590) via
    optax.multi_transform keyed on the top-level module;
  * global-norm clipping (train_dit4sr.py:398) and gradient accumulation
    (accelerate's `accumulate` context) via optax.MultiSteps.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import optax
from flax import traverse_util

from dit4sr_tpu.config import OptimConfig, TrainConfig


def trainable_mask(params, finetune_layer_names: Sequence[str]):
    """True where the flattened param path contains any finetune substring.
    Empty list = everything trainable (reference initialize.py:505-517)."""
    flat = traverse_util.flatten_dict(params, sep="/")
    if not finetune_layer_names:
        mask_flat = {k: True for k in flat}
    else:
        mask_flat = {
            k: any(s in k for s in finetune_layer_names) for k in flat
        }
    return traverse_util.unflatten_dict(
        {tuple(k.split("/")): v for k, v in mask_flat.items()}
    )


def count_trainable(params, mask) -> Tuple[int, int]:
    flat_p = traverse_util.flatten_dict(params)
    flat_m = traverse_util.flatten_dict(mask)
    train = sum(int(flat_p[k].size) for k in flat_p if flat_m[k])
    total = sum(int(v.size) for v in flat_p.values())
    return train, total


def make_optimizer(
    params,
    cfg: TrainConfig,
    lr_overrides: Optional[dict] = None,
):
    """AdamW with clipping, accumulation, trainability mask, per-module LR.

    `params` is the full train pytree, optionally with top-level keys like
    {"mmdit": ..., "testr": ...}; `lr_overrides` maps those keys to LRs
    (default: cfg.optim.lr for everything, cfg.optim.testr_lr for "testr").
    """
    oc = cfg.optim

    def schedule_for(lr):
        """The diffusers get_scheduler family (reference train_dit4sr.py:95)."""
        name = oc.lr_scheduler
        warmup = oc.lr_warmup_steps
        decay = max(cfg.num_train_steps - warmup, 1)
        if name in ("constant", "constant_with_warmup"):
            main = optax.constant_schedule(lr)
        elif name == "linear":
            main = optax.linear_schedule(lr, 0.0, decay)
        elif name == "cosine":
            main = optax.cosine_decay_schedule(lr, decay)
        elif name == "cosine_with_restarts":
            cycles = max(oc.lr_num_cycles, 1)
            per = max(decay // cycles, 1)
            main = optax.join_schedules(
                [optax.cosine_decay_schedule(lr, per) for _ in range(cycles)],
                [per * (i + 1) for i in range(cycles - 1)],
            )
        elif name == "polynomial":
            main = optax.polynomial_schedule(lr, oc.lr_end, oc.lr_power, decay)
        else:
            raise ValueError(f"unknown lr_scheduler {name!r}")
        if warmup > 0:
            return optax.join_schedules(
                [optax.linear_schedule(0.0, lr, warmup), main], [warmup]
            )
        return main

    def adamw(lr):
        if oc.optimizer == "adamw_bf16":
            # low-memory moments — the TPU answer to the reference's
            # bitsandbytes AdamW8bit option (initialize.py:575-580)
            import jax.numpy as jnp

            return optax.chain(
                optax.scale_by_adam(
                    b1=oc.betas[0], b2=oc.betas[1], eps=oc.eps,
                    mu_dtype=jnp.bfloat16,
                ),
                optax.add_decayed_weights(oc.weight_decay),
                optax.scale_by_learning_rate(schedule_for(lr)),
            )
        if oc.optimizer != "adamw":
            raise ValueError(f"unknown optimizer {oc.optimizer!r}")
        return optax.adamw(
            schedule_for(lr),
            b1=oc.betas[0],
            b2=oc.betas[1],
            eps=oc.eps,
            weight_decay=oc.weight_decay,
        )

    lrs = dict(lr_overrides or {})
    top_keys = list(params.keys()) if isinstance(params, dict) else []
    if top_keys and ("mmdit" in top_keys or "testr" in top_keys):
        labels = {k: jax.tree.map(lambda _: k, v) for k, v in params.items()}
        transforms = {
            k: adamw(lrs.get(k, oc.testr_lr if k == "testr" else oc.lr))
            for k in top_keys
        }
        base = optax.multi_transform(transforms, labels)
    else:
        base = adamw(oc.lr)

    mask = trainable_mask(params, cfg.finetune_layer_names)
    frozen = jax.tree.map(lambda m: not m, mask)
    # frozen-param grads are zeroed BEFORE the clip so the global norm covers
    # only trainable params — the reference clips params_to_clip only
    # (train_dit4sr.py:398 accelerator.clip_grad_norm_); clipping the full
    # tree would deflate trainable updates whenever frozen grads are large
    tx = optax.chain(
        optax.masked(optax.set_to_zero(), frozen),
        optax.clip_by_global_norm(oc.max_grad_norm),
        base,
        optax.masked(optax.set_to_zero(), frozen),  # keep frozen params exact
    )
    if cfg.gradient_accumulation_steps > 1:
        tx = optax.MultiSteps(tx, cfg.gradient_accumulation_steps)
    return tx, mask
