"""TESTR SetCriterion: focal / L1 / GIoU / CE losses over Hungarian matches.

Masked static-shape version of testr/adet/modeling/testr/losses.py:43-242.
Normalization matches the reference: inside a pjit program over a sharded
batch, `jnp.sum` over the batch axis is global, so `num_inst` equals the
all-reduced count the reference computes explicitly (losses.py:200-207).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from dit4sr_tpu.config import TESTRConfig
from dit4sr_tpu.models.testr.matcher import (
    OCRTargets,
    box_cost,
    box_cxcywh_to_xyxy,
    ctrl_point_cost,
    generalized_box_iou,
    solve_assignment,
)
from dit4sr_tpu.models.testr.model import TESTROutput


def sigmoid_focal_loss(logits, targets, alpha: float, gamma: float):
    """Elementwise focal loss (losses.py:9-33)."""
    prob = jax.nn.sigmoid(logits)
    ce = optax_sigmoid_ce(logits, targets)
    p_t = prob * targets + (1 - prob) * (1 - targets)
    loss = ce * ((1 - p_t) ** gamma)
    alpha_t = alpha * targets + (1 - alpha) * (1 - targets)
    return alpha_t * loss


def optax_sigmoid_ce(logits, labels):
    """binary_cross_entropy_with_logits, numerically stable."""
    return jnp.clip(logits, 0, None) - logits * labels + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )


def _gather_queries(pred: jnp.ndarray, match: jnp.ndarray) -> jnp.ndarray:
    """pred (B, K, ...) gathered at match (B, I) -> (B, I, ...). match may be
    -1 for invalid slots (clamped; callers mask)."""
    idx = jnp.clip(match, 0, None)
    flat_idx = idx.reshape(*idx.shape, *(1,) * (pred.ndim - 2))
    flat_idx = jnp.broadcast_to(flat_idx, (*idx.shape, *pred.shape[2:]))
    return jnp.take_along_axis(pred, flat_idx, axis=1)


def _label_loss(
    logits: jnp.ndarray,       # (B, Q, 1) or (B, Q, Np, 1)
    match: jnp.ndarray,        # (B, I) matched query per target (-1 invalid)
    matched: jnp.ndarray,      # (B, I) float: valid AND actually matched
    num_inst: jnp.ndarray,
    alpha: float,
    gamma: float,
) -> jnp.ndarray:
    """Focal classification loss with the reference's normalization
    (losses.py:70-95): mean over non-batch dims, sum, *Q, /num_inst."""
    B, Q = logits.shape[:2]
    onehot_q = jax.nn.one_hot(jnp.clip(match, 0, None), Q) * matched[..., None]
    target_q = jnp.clip(onehot_q.sum(axis=1), 0.0, 1.0)  # (B, Q)
    target = jnp.broadcast_to(
        target_q.reshape(B, Q, *(1,) * (logits.ndim - 2)), logits.shape
    )
    loss = sigmoid_focal_loss(logits, target, alpha, gamma)
    per_b = loss.mean(axis=tuple(range(1, loss.ndim - 1))).sum(-1)  # (B,)
    return per_b.sum() * Q / num_inst


def criterion(
    cfg: TESTRConfig,
    out: TESTROutput,
    targets: OCRTargets,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Full weighted loss: dec losses per decoder layer (aux included) + enc
    losses, with the reference's weight dict (transformer_detector.py:50-66)."""
    a, g = cfg.focal_alpha, cfg.focal_gamma
    valid = targets.valid.astype(jnp.float32)
    num_inst = jnp.clip(valid.sum(), 1.0)

    losses: Dict[str, jnp.ndarray] = {}
    total = 0.0

    n_layers = out.ctrl_logits.shape[0]

    # ---- solve ALL matchings (per decoder layer + encoder) in ONE stacked
    # assignment call: sequential auction while_loops dominate the loss cost
    # on TPU (~10 s for 7 matchers); stacking them on the batch axis runs one
    # loop. Padded query rows get a huge cost so they are never selected.
    dec_costs = [
        jax.lax.stop_gradient(
            ctrl_point_cost(
                out.ctrl_logits[l], out.ctrl_points[l], targets,
                cfg.point_class_weight, cfg.point_coord_weight, a, g,
            )
        )
        for l in range(n_layers)
    ]
    enc_cost = jax.lax.stop_gradient(
        box_cost(
            out.enc_logits, out.enc_boxes, targets,
            cfg.box_class_weight, cfg.box_coord_weight, cfg.giou_weight, a, g,
        )
    )
    q_max = max(max(c.shape[1] for c in dec_costs), enc_cost.shape[1])

    def pad_q(c):
        return jnp.pad(
            c, ((0, 0), (0, q_max - c.shape[1]), (0, 0)), constant_values=1e9
        )

    all_costs = jnp.concatenate([pad_q(c) for c in dec_costs + [enc_cost]], axis=0)
    all_valid = jnp.tile(targets.valid, (n_layers + 1, 1))
    # matcher_topk also bounds q_max for the stack: without it every decoder
    # matching (Q=100) pays the encoder's 16k-proposal padding per round
    all_matches = solve_assignment(
        all_costs, all_valid, cfg.matcher_impl, topk=cfg.matcher_topk
    )
    B = targets.valid.shape[0]
    dec_matches = [all_matches[l * B : (l + 1) * B] for l in range(n_layers)]
    enc_match = all_matches[n_layers * B :]

    for l in range(n_layers):
        logits = out.ctrl_logits[l]
        points = out.ctrl_points[l]
        texts = out.text_logits[l]
        match = dec_matches[l]  # (B, I)
        # drop targets the auction left unmatched (match == -1 when
        # max_iters is hit) instead of clamping them onto query 0
        matched = ((match >= 0).astype(jnp.float32)) * valid

        loss_ce = _label_loss(logits, match, matched, num_inst, a, g)

        pred_pts = _gather_queries(points, match)      # (B, I, Np, 2)
        l1 = jnp.abs(pred_pts - targets.ctrl_points).sum(axis=(-1, -2))
        loss_pts = (l1 * matched).sum() / num_inst

        pred_txt = _gather_queries(texts, match)       # (B, I, Nw, V+1)
        logp = jax.nn.log_softmax(pred_txt, axis=-1)
        nll = -jnp.take_along_axis(logp, targets.texts[..., None], axis=-1)[..., 0]
        # reference F.cross_entropy averages over matched instances x words;
        # text_pad_weight rebalances pad vs real-character positions (1.0
        # reproduces the reference exactly: weights all-ones -> weighted
        # count == matched * max_text_len)
        txt_w = jnp.where(
            targets.texts == cfg.voc_size, cfg.text_pad_weight, 1.0
        ) * matched[..., None]
        n_words = jnp.clip(txt_w.sum(), 1.0)
        loss_txt = (nll * txt_w).sum() / n_words

        suffix = "" if l == n_layers - 1 else f"_{l}"
        losses[f"loss_ce{suffix}"] = loss_ce * cfg.point_class_weight
        losses[f"loss_ctrl_points{suffix}"] = loss_pts * cfg.point_coord_weight
        losses[f"loss_texts{suffix}"] = loss_txt * cfg.point_text_weight
        total = (
            total
            + losses[f"loss_ce{suffix}"]
            + losses[f"loss_ctrl_points{suffix}"]
            + losses[f"loss_texts{suffix}"]
        )

    # encoder (two-stage proposal) losses — enc_match from the stacked solve
    enc_matched = ((enc_match >= 0).astype(jnp.float32)) * valid
    loss_ce_enc = _label_loss(
        out.enc_logits, enc_match, enc_matched, num_inst, a, g
    )
    pred_boxes = _gather_queries(out.enc_boxes, enc_match)  # (B, I, 4)
    l1 = jnp.abs(pred_boxes - targets.boxes).sum(-1)
    loss_bbox = (l1 * enc_matched).sum() / num_inst

    giou = generalized_box_iou(
        box_cxcywh_to_xyxy(pred_boxes), box_cxcywh_to_xyxy(targets.boxes)
    )
    diag = jnp.diagonal(giou, axis1=-2, axis2=-1)            # (B, I)
    loss_giou = ((1.0 - diag) * enc_matched).sum() / num_inst

    losses["loss_ce_enc"] = loss_ce_enc * cfg.box_class_weight
    losses["loss_bbox_enc"] = loss_bbox * cfg.box_coord_weight
    losses["loss_giou_enc"] = loss_giou * cfg.giou_weight
    total = total + losses["loss_ce_enc"] + losses["loss_bbox_enc"] + losses["loss_giou_enc"]

    return total, losses
