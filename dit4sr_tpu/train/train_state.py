"""Optimizer construction: per-module LRs, trainability masks, grad clipping.

Mirrors the reference's optimizer semantics (initialize.py:460-590):
  * `finetune_layer_names` substring match on parameter paths decides
    trainability (load_model_params :460-558) — params are PARTITIONED into
    (trainable, frozen) trees; grads, optimizer state, and the clip norm
    exist only for the trainable tree (the reference builds the optimizer
    from requires_grad params only);
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


def trainable_mask(
    params,
    finetune_layer_names: Sequence[str],
    testr_finetune_layer_names: Sequence[str] = (),
):
    """True where the flattened param path contains any finetune substring.
    Empty list = everything trainable (reference initialize.py:505-517).

    The DiT list applies to everything EXCEPT a top-level "testr" subtree,
    which gets its own list — the reference keeps separate finetune lists per
    module and trains the whole spotter when its list is empty
    (initialize.py:533-543); applying the DiT substrings to TESTR would
    silently freeze it in stage2/3."""

    def _match(k: str, names: Sequence[str]) -> bool:
        return True if not names else any(s in k for s in names)

    flat = traverse_util.flatten_dict(params, sep="/")
    mask_flat = {
        k: _match(
            k,
            testr_finetune_layer_names
            if k.split("/", 1)[0] == "testr"
            else finetune_layer_names,
        )
        for k in flat
    }
    return traverse_util.unflatten_dict(
        {tuple(k.split("/")): v for k, v in mask_flat.items()}
    )


def partition_params(params, mask) -> Tuple[Any, Any]:
    """Split params into (trainable, frozen) trees with None holes. The train
    step differentiates only the trainable tree, so XLA never builds the
    weight-gradient matmuls for frozen params; the optimizer state covers only
    the trainable tree (fp32 Adam moments for all 2.59B params would be
    ~21 GB — more than one chip's HBM)."""
    t = jax.tree.map(lambda p, m: p if m else None, params, mask)
    f = jax.tree.map(lambda p, m: None if m else p, params, mask)
    return t, f


def combine_params(t, f):
    """Inverse of partition_params."""
    return jax.tree.map(
        lambda a, b: b if a is None else a, t, f,
        is_leaf=lambda x: x is None,
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
        if oc.optimizer == "adamw_8bit":
            # block-wise int8 moments — bnb AdamW8bit parity
            # (initialize.py:575-580); see train/adam8bit.py
            from dit4sr_tpu.train.adam8bit import scale_by_adam_8bit

            return optax.chain(
                scale_by_adam_8bit(
                    b1=oc.betas[0], b2=oc.betas[1], eps=oc.eps,
                    block_size=oc.quant_block_size,
                ),
                optax.add_decayed_weights(oc.weight_decay),
                optax.scale_by_learning_rate(schedule_for(lr)),
            )
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
    mask = trainable_mask(
        params, cfg.finetune_layer_names,
        getattr(cfg, "testr_finetune_layer_names", ()),
    )
    trainable, _ = partition_params(params, mask)

    # tx operates on the TRAINABLE-partitioned tree only (None holes for
    # frozen params): optimizer state exists only for trainable params, the
    # clip norm covers only trainable grads — both matching the reference,
    # which builds the optimizer from requires_grad params and clips
    # params_to_clip (initialize.py:563-590, train_dit4sr.py:398)
    top_keys = list(trainable.keys()) if isinstance(trainable, dict) else []
    if top_keys and ("mmdit" in top_keys or "testr" in top_keys):
        labels = {k: jax.tree.map(lambda _, kk=k: kk, v) for k, v in trainable.items()}
        transforms = {
            k: adamw(lrs.get(k, oc.testr_lr if k == "testr" else oc.lr))
            for k in top_keys
        }
        base = optax.multi_transform(transforms, labels)
    else:
        base = adamw(oc.lr)

    tx = optax.chain(optax.clip_by_global_norm(oc.max_grad_norm), base)
    if cfg.gradient_accumulation_steps > 1:
        tx = optax.MultiSteps(tx, cfg.gradient_accumulation_steps)
    return tx, mask
