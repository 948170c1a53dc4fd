"""Hungarian matching with static-shape padding.

TPU version of the reference's scipy-based matchers
(testr/adet/modeling/testr/matcher.py): cost matrices are computed on device
in one jitted program over padded targets; the sequential linear-sum
assignment runs on host through `jax.pure_callback` (SURVEY.md §7 "Hungarian
matching is sequential/host-bound; keep on CPU with jax.pure_callback").

A native C++ Jonker-Volgenant solver (dit4sr_tpu/native) is used when built;
scipy is the fallback oracle.

Static-shape contract: targets are padded to `max_instances` with a `valid`
mask; the matcher returns, per target slot, the matched query index (or -1).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class OCRTargets(NamedTuple):
    """Padded per-image supervision (reference builds ragged Python lists,
    train_dit4sr.py:341-353; XLA needs static shapes)."""

    labels: jnp.ndarray       # (B, I) int32, class id (0 = text)
    boxes: jnp.ndarray        # (B, I, 4) cxcywh in [0,1]
    ctrl_points: jnp.ndarray  # (B, I, Np, 2) in [0,1]
    texts: jnp.ndarray        # (B, I, Nw) int32 char ids, pad = voc_size
    valid: jnp.ndarray        # (B, I) bool


def _lsa_host(cost: np.ndarray, valid: np.ndarray) -> np.ndarray:
    """Batch linear-sum assignment on host. cost (B, Q, I); valid (B, I).
    Returns (B, I) int32: matched query per valid target slot, -1 elsewhere."""
    from dit4sr_tpu.native import linear_sum_assignment as lsa

    B, Q, I = cost.shape
    out = np.full((B, I), -1, np.int32)
    for b in range(B):
        n = int(valid[b].sum())
        if n == 0:
            continue
        c = cost[b][:, :n]
        c = np.nan_to_num(c, nan=1e9, posinf=1e9, neginf=-1e9)
        rows, cols = lsa(c)
        for r, cc in zip(rows, cols):
            out[b, cc] = r
    return out


def solve_assignment(
    cost: jnp.ndarray, valid: jnp.ndarray, method: str = "auto",
    topk: int = 0,
) -> jnp.ndarray:
    """Minimum-cost assignment of each valid target to a distinct query.

    cost (B, Q, I) fp32, valid (B, I) -> (B, I) matched query idx (-1 pad).

    method:
      * "host"    — exact Hungarian on host via pure_callback (C++/scipy)
      * "auction" — on-device epsilon-optimal auction algorithm (pure JAX);
        required on platforms without host-callback support (the axon TPU
        runtime rejects pure_callback)
      * "auto"    — host on CPU, auction elsewhere

    topk > 0 prefilters to the K queries with the lowest min-over-targets
    cost before solving and maps indices back — the auction's per-round work
    is O(B*I*Q), and the encoder matching has Q = 16k proposals for <= 32
    targets. With K >> I the restricted optimum coincides with the full one
    in practice (and the auction is eps-approximate anyway).
    """
    if method == "auto":
        method = "host" if jax.default_backend() == "cpu" else "auction"
    B, Q, I = cost.shape
    cand_idx = None
    if topk and topk < Q:
        per_q = jnp.where(valid[:, None, :], cost, jnp.inf).min(axis=-1)  # (B, Q)
        _, cand_idx = jax.lax.top_k(-per_q, topk)                          # (B, K)
        cost = jnp.take_along_axis(cost, cand_idx[:, :, None], axis=1)
    if method == "auction":
        match = auction_assignment(cost, valid)
    else:
        match = jax.pure_callback(
            _lsa_host,
            jax.ShapeDtypeStruct((B, I), jnp.int32),
            cost,
            valid,
            vmap_method="sequential",
        )
    if cand_idx is not None:
        orig = jnp.take_along_axis(cand_idx, jnp.clip(match, 0, None), axis=1)
        match = jnp.where(match >= 0, orig, -1).astype(jnp.int32)
    return match


def auction_assignment(
    cost: jnp.ndarray,
    valid: jnp.ndarray,
    eps: float = 1e-3,
    max_iters: int = 400,
) -> jnp.ndarray:
    """Bertsekas auction algorithm, fully on device.

    Jacobi bidding rounds under `lax.while_loop`; with bid increment
    (best - second_best + eps) the final assignment cost is within
    n_targets * eps of optimal — negligible against the O(1) focal/L1
    matching costs. Q >= I guarantees termination.
    """
    B, Q, I = cost.shape
    v = -cost.transpose(0, 2, 1).astype(jnp.float32)        # (B, I, Q) value
    valid_f = valid

    def cond(state):
        prices, owner, it = state
        tgt_q = _owner_to_tgt(owner, I)
        unassigned = (tgt_q < 0) & valid_f
        return jnp.logical_and(it < max_iters, jnp.any(unassigned))

    def body(state):
        prices, owner, it = state                            # (B,Q), (B,Q)int
        tgt_q = _owner_to_tgt(owner, I)                      # (B, I)
        unassigned = (tgt_q < 0) & valid_f                   # (B, I)

        net = v - prices[:, None, :]                         # (B, I, Q)
        best_q = jnp.argmax(net, axis=-1)                    # (B, I)
        best_v = jnp.max(net, axis=-1)
        # second-best value
        masked = jnp.where(
            jax.nn.one_hot(best_q, Q, dtype=bool), -jnp.inf, net
        )
        second_v = jnp.max(masked, axis=-1)
        second_v = jnp.where(jnp.isfinite(second_v), second_v, best_v - 1.0)
        incr = best_v - second_v + eps                       # (B, I)

        bid_price = jnp.take_along_axis(prices, best_q, axis=1) + incr
        bids = jnp.where(
            unassigned[:, :, None] & jax.nn.one_hot(best_q, Q, dtype=bool),
            bid_price[:, :, None],
            -jnp.inf,
        )                                                     # (B, I, Q)
        best_bid = jnp.max(bids, axis=1)                      # (B, Q)
        best_bidder = jnp.argmax(bids, axis=1)                # (B, Q)
        got_bid = jnp.isfinite(best_bid)

        prices = jnp.where(got_bid, best_bid, prices)
        owner = jnp.where(got_bid, best_bidder, owner)
        return prices, owner, it + 1

    prices0 = jnp.zeros((B, Q), jnp.float32)
    owner0 = jnp.full((B, Q), -1, jnp.int32)
    _, owner, _ = jax.lax.while_loop(cond, body, (prices0, owner0, jnp.int32(0)))
    tgt_q = _owner_to_tgt(owner, I)
    return jnp.where(valid_f, tgt_q, -1).astype(jnp.int32)


def _owner_to_tgt(owner: jnp.ndarray, I: int) -> jnp.ndarray:
    """owner (B, Q) target-index-or--1 -> per-target query idx (B, I), -1 if
    unassigned (ownership is injective)."""
    B, Q = owner.shape
    is_owner = owner[:, :, None] == jnp.arange(I)[None, None, :]  # (B, Q, I)
    any_owner = jnp.any(is_owner, axis=1)
    q_idx = jnp.argmax(is_owner, axis=1)
    return jnp.where(any_owner, q_idx, -1).astype(jnp.int32)


def _focal_cost(prob: jnp.ndarray, alpha: float, gamma: float):
    """pos/neg focal matching costs (matcher.py:61-66)."""
    neg = (1 - alpha) * (prob ** gamma) * (-jnp.log(1 - prob + 1e-8))
    pos = alpha * ((1 - prob) ** gamma) * (-jnp.log(prob + 1e-8))
    return pos, neg


def ctrl_point_cost(
    pred_logits: jnp.ndarray,   # (B, K, Np, 1)
    pred_points: jnp.ndarray,   # (B, K, Np, 2)
    targets: OCRTargets,
    class_weight: float,
    coord_weight: float,
    alpha: float = 0.25,
    gamma: float = 2.0,
) -> jnp.ndarray:               # (B, K, I)
    prob = jax.nn.sigmoid(pred_logits)
    pos, neg = _focal_cost(prob, alpha, gamma)
    cost_class = (pos - neg)[..., 0].mean(-1)                   # (B, K)
    pp = pred_points.reshape(*pred_points.shape[:2], -1)        # (B, K, Np*2)
    tp = targets.ctrl_points.reshape(*targets.ctrl_points.shape[:2], -1)
    cost_kpts = jnp.sum(jnp.abs(pp[:, :, None] - tp[:, None]), -1)  # (B, K, I)
    return class_weight * cost_class[..., None] + coord_weight * cost_kpts


def box_cxcywh_to_xyxy(b: jnp.ndarray) -> jnp.ndarray:
    cx, cy, w, h = jnp.split(b, 4, axis=-1)
    return jnp.concatenate([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)


def generalized_box_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise GIoU between (..., N, 4) and (..., M, 4) xyxy boxes."""
    area_a = (a[..., 2] - a[..., 0]) * (a[..., 3] - a[..., 1])
    area_b = (b[..., 2] - b[..., 0]) * (b[..., 3] - b[..., 1])
    lt = jnp.maximum(a[..., :, None, :2], b[..., None, :, :2])
    rb = jnp.minimum(a[..., :, None, 2:], b[..., None, :, 2:])
    wh = jnp.clip(rb - lt, 0.0, None)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a[..., :, None] + area_b[..., None, :] - inter
    iou = inter / jnp.clip(union, 1e-7, None)
    lt_e = jnp.minimum(a[..., :, None, :2], b[..., None, :, :2])
    rb_e = jnp.maximum(a[..., :, None, 2:], b[..., None, :, 2:])
    wh_e = jnp.clip(rb_e - lt_e, 0.0, None)
    area_e = wh_e[..., 0] * wh_e[..., 1]
    return iou - (area_e - union) / jnp.clip(area_e, 1e-7, None)


def box_cost(
    pred_logits: jnp.ndarray,   # (B, S, 1)
    pred_boxes: jnp.ndarray,    # (B, S, 4) cxcywh
    targets: OCRTargets,
    class_weight: float,
    coord_weight: float,
    giou_weight: float,
    alpha: float = 0.25,
    gamma: float = 2.0,
) -> jnp.ndarray:               # (B, S, I)
    prob = jax.nn.sigmoid(pred_logits)
    pos, neg = _focal_cost(prob, alpha, gamma)
    # single foreground class: tgt label is always class 0
    cost_class = (pos - neg)[..., 0][..., None]                 # (B, S, 1)
    cost_bbox = jnp.sum(
        jnp.abs(pred_boxes[:, :, None] - targets.boxes[:, None]), -1
    )
    cost_giou = -generalized_box_iou(
        box_cxcywh_to_xyxy(pred_boxes), box_cxcywh_to_xyxy(targets.boxes)
    )
    return coord_weight * cost_bbox + class_weight * cost_class + giou_weight * cost_giou
