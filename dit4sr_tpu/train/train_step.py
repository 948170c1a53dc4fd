"""Jitted flow-matching train step (stage1/stage3 recipes).

One pure function covers the reference's training inner loop
(train/train_dit4sr.py:184-490): logit-normal sigma sampling, rectified-flow
interpolation z_t=(1-s)x+s*z, MMDiT forward, x-prediction preconditioning
(model_pred*(-s)+z_t), weighted MSE, optional OCR loss hook, optax update.

Data parallelism: the step is jitted with batch args sharded over the mesh's
("data","fsdp") axes and params replicated (or fsdp-sharded); XLA inserts the
gradient all-reduce over ICI — this replaces the reference's DDP+NCCL
(SURVEY.md §2.3).
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from dit4sr_tpu.config import SchedulerConfig, TrainConfig
from dit4sr_tpu.models.mmdit import MMDiT
from dit4sr_tpu.schedulers.flow_match import sample_logit_normal_sigmas


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray
    # EMA of the TRAINABLE partition (None when train_cfg.ema_decay == 0).
    # The reference has no EMA; standard diffusion-finetune practice added
    # here as an opt-in (diffusers EMAModel-style warmup ramp).
    ema: Any = None


def ema_params(state: TrainState, mask) -> Any:
    """Full param tree with the trainable partition replaced by its EMA
    (for eval/checkpoint-export). `mask` is the trainability pytree from
    make_optimizer. Returns state.params unchanged when EMA is off."""
    from dit4sr_tpu.train.train_state import combine_params, partition_params

    if state.ema is None:
        return state.params
    _, f_params = partition_params(state.params, mask)
    return combine_params(state.ema, f_params)


class Batch(NamedTuple):
    """Latent-space batch (VAE encode happens outside, without grad)."""

    hq_latent: jnp.ndarray       # (B, h, w, C) scaled model input
    lq_latent: jnp.ndarray       # (B, h, w, C) scaled control latent
    text_embeds: jnp.ndarray     # (B, T, 4096)
    pooled_embeds: jnp.ndarray   # (B, 2048)


def flow_matching_loss(
    mmdit: MMDiT,
    params,
    batch: Batch,
    rng: jax.Array,
    train_cfg: TrainConfig,
    sched_cfg: SchedulerConfig,
    extract_features: bool = False,
):
    """Returns (diff_loss, (sigmas, features)) — features feed the OCR head."""
    rng_t, rng_noise = jax.random.split(rng)
    b = batch.hq_latent.shape[0]
    sigmas, timesteps = sample_logit_normal_sigmas(
        rng_t, b, sched_cfg, train_cfg.logit_mean, train_cfg.logit_std
    )
    x = batch.hq_latent.astype(jnp.float32)
    noise = jax.random.normal(rng_noise, x.shape, jnp.float32)
    s = sigmas[:, None, None, None]
    zt = (1.0 - s) * x + s * noise  # train_dit4sr.py:260-261

    pred, feats = mmdit.apply(
        params,
        zt,
        batch.lq_latent,
        batch.text_embeds,
        batch.pooled_embeds,
        timesteps,
        extract_features=extract_features,
    )
    pred = pred.astype(jnp.float32)

    if train_cfg.precondition_outputs:
        pred = pred * (-s) + zt          # x-prediction (train_dit4sr.py:318-329)
        target = x
    else:
        target = noise - x

    # logit_normal scheme post-weights with 1 (diffusers
    # compute_loss_weighting_for_sd3 default branch)
    per_sample = jnp.mean((pred - target) ** 2, axis=(1, 2, 3))
    return jnp.mean(per_sample), (sigmas, feats)


def make_train_step(
    mmdit: MMDiT,
    tx: optax.GradientTransformation,
    train_cfg: TrainConfig,
    sched_cfg: SchedulerConfig = SchedulerConfig(),
    ocr_loss_fn: Optional[Callable] = None,
    mask=None,
) -> Callable:
    """Build the jittable (state, batch, rng[, ocr_targets]) -> (state, metrics)
    step. With `ocr_loss_fn` set, the per-stage loss mix follows
    train_dit4sr.py:373-381 (stage1 diff, stage2 ocr, stage3 joint).

    `mask` is the trainability pytree from make_optimizer: the step
    differentiates only the trainable partition (so frozen weight-grad
    matmuls never enter the graph) and `tx`/opt_state cover only that
    partition. mask=None trains everything."""

    from dit4sr_tpu.train.train_state import combine_params, partition_params

    need_feats = ocr_loss_fn is not None and train_cfg.stage in ("stage2", "stage3")

    def loss_fn(t_params, f_params, batch: Batch, rng, ocr_targets):
        params = (
            combine_params(t_params, f_params) if f_params is not None else t_params
        )
        rng, rng_drop = jax.random.split(rng)
        mmdit_params = params["mmdit"] if "mmdit" in params else params
        if isinstance(params, dict) and "mmdit_lora" in params:
            # LoRA finetune mode: merge the adapter inside the loss so AD
            # routes gradients into the (only-trainable) a/b factors
            from dit4sr_tpu.models.lora import merge_lora

            mmdit_params = merge_lora(
                mmdit_params, params["mmdit_lora"], train_cfg.lora_scale
            )
        diff_loss, (sigmas, feats) = flow_matching_loss(
            mmdit, mmdit_params, batch, rng, train_cfg, sched_cfg,
            extract_features=need_feats,
        )
        metrics = {"diff_loss": diff_loss}
        if need_feats:
            ocr_loss, ocr_metrics = ocr_loss_fn(
                params["testr"], feats, ocr_targets, rng=rng_drop
            )
            metrics["ocr_loss"] = ocr_loss
            metrics.update(ocr_metrics)
        else:
            ocr_loss = 0.0

        if train_cfg.stage == "stage1":
            total = diff_loss
        elif train_cfg.stage == "stage2":
            total = train_cfg.ocr_loss_weight * ocr_loss
        else:
            total = diff_loss + train_cfg.ocr_loss_weight * ocr_loss
        metrics["total_loss"] = total
        return total, metrics

    def train_step(state: TrainState, batch: Batch, rng: jax.Array, ocr_targets=None):
        rng = jax.random.fold_in(rng, state.step)
        if mask is not None:
            t_params, f_params = partition_params(state.params, mask)
        else:
            t_params, f_params = state.params, None
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            t_params, f_params, batch, rng, ocr_targets
        )
        # trainable-only norm, matching the reference's clip_grad_norm_ over
        # params_to_clip (train_dit4sr.py:398)
        gnorm = optax.global_norm(grads)
        metrics["grad_norm"] = gnorm
        if train_cfg.log_grad_norms:
            # per-module norms, grouped at two path levels — the jittable
            # equivalent of the reference's top-grads-by-name txt dumps
            # (train_dit4sr.py:407-479)
            from flax import traverse_util

            groups: dict = {}
            for path, g in traverse_util.flatten_dict(grads).items():
                if g is None:
                    continue
                parts = [str(p) for p in path if p != "params"]
                key = "/".join(parts[:2])
                groups.setdefault(key, []).append(jnp.sum(g.astype(jnp.float32) ** 2))
            for key, sq in groups.items():
                metrics[f"gn/{key}"] = jnp.sqrt(sum(sq))
        updates, opt_state = tx.update(grads, state.opt_state, t_params)
        new_t = optax.apply_updates(t_params, updates)
        # failure containment the reference lacks (SURVEY.md §5): a step with
        # non-finite gradients is skipped instead of corrupting the params
        finite = jnp.isfinite(gnorm)
        metrics["skipped_nonfinite"] = 1.0 - finite.astype(jnp.float32)
        new_t = jax.tree.map(
            lambda new, old: jnp.where(finite, new, old), new_t, t_params
        )
        opt_state = jax.tree.map(
            lambda new, old: jnp.where(finite, new, old)
            if hasattr(new, "shape") and new.shape == getattr(old, "shape", None)
            else new,
            opt_state,
            state.opt_state,
        )
        ema = state.ema
        if train_cfg.ema_decay > 0.0 and ema is not None:
            # diffusers EMAModel-style warmup: ramp toward the target decay
            # so early steps aren't anchored to the random/pretrained init
            t = state.step.astype(jnp.float32) + 1.0
            d = jnp.minimum(train_cfg.ema_decay, (1.0 + t) / (10.0 + t))
            ema = jax.tree.map(
                lambda e, p: e + (1.0 - d) * (p.astype(e.dtype) - e), ema, new_t
            )
        params = (
            combine_params(new_t, f_params) if mask is not None else new_t
        )
        return TrainState(params, opt_state, state.step + 1, ema), metrics

    return train_step
