"""TESTR structural/behavioral tests (tiny geometry)."""

import jax
import jax.numpy as jnp
import numpy as np

from dit4sr_tpu.config import testr_tiny as make_testr_tiny
from dit4sr_tpu.models.testr.detector import TextSpotter, pad_targets
from dit4sr_tpu.models.testr.matcher import (
    OCRTargets,
    box_cxcywh_to_xyxy,
    generalized_box_iou,
    solve_assignment,
)
from dit4sr_tpu.models.testr.model import TESTR, fuse_dit_features

HW = 8


def _feats(cfg, b=2, seed=0):
    rng = np.random.default_rng(seed)
    # Lext = num_dit_layers (2 in tiny), channels = dit_dim
    return jnp.asarray(
        rng.normal(size=(cfg.num_feature_levels, b, HW, HW, cfg.dit_dim)),
        jnp.float32,
    )


def _cfg():
    return make_testr_tiny(num_feature_levels=4, num_dit_layers=4)


def test_forward_shapes():
    cfg = _cfg()
    spotter = TextSpotter(cfg, feat_hw=(HW, HW))
    feats = _feats(cfg)
    params = spotter.init(jax.random.PRNGKey(0), feats)
    out = spotter.model.apply(params, feats)
    L, B, K = cfg.num_decoder_layers, 2, cfg.num_queries
    assert out.ctrl_logits.shape == (L, B, K, cfg.num_ctrl_points, 1)
    assert out.ctrl_points.shape == (L, B, K, cfg.num_ctrl_points, 2)
    assert out.text_logits.shape == (L, B, K, cfg.max_text_len, cfg.voc_size + 1)
    S = cfg.num_feature_levels * HW * HW
    assert out.enc_logits.shape == (B, S, 1)
    assert out.enc_boxes.shape == (B, S, 4)
    # coordinates in [0,1]
    assert float(out.ctrl_points.min()) >= 0.0
    assert float(out.ctrl_points.max()) <= 1.0


def _targets(cfg, b=2):
    rng = np.random.default_rng(1)
    raw = []
    for i in range(b):
        n = 2 + i
        raw.append(
            {
                "labels": np.zeros((n,), np.int32),
                "boxes": np.clip(rng.uniform(0.2, 0.8, (n, 4)), 0.05, 0.95).astype(np.float32),
                "ctrl_points": rng.uniform(0.1, 0.9, (n, cfg.num_ctrl_points, 2)).astype(np.float32),
                "texts": rng.integers(0, cfg.voc_size, (n, cfg.max_text_len)).astype(np.int32),
            }
        )
    return pad_targets(raw, cfg)


def test_loss_and_gradients():
    cfg = _cfg()
    spotter = TextSpotter(cfg, feat_hw=(HW, HW))
    feats = _feats(cfg)
    params = spotter.init(jax.random.PRNGKey(0), feats)
    targets = _targets(cfg)

    def loss_fn(p):
        total, _ = spotter.loss(p, feats, targets)
        return total

    total, losses = spotter.loss(params, feats, targets)
    assert np.isfinite(float(total))
    # all expected loss keys present (dec x layers + enc)
    for key in ("loss_ce", "loss_ctrl_points", "loss_texts",
                "loss_ce_enc", "loss_bbox_enc", "loss_giou_enc"):
        assert key in losses
    for l in range(cfg.num_decoder_layers - 1):
        assert f"loss_ce_{l}" in losses

    grads = jax.grad(loss_fn)(params)
    gmax = max(float(jnp.abs(g).max()) for g in jax.tree.leaves(grads))
    assert np.isfinite(gmax) and gmax > 0


def test_inference_shapes():
    cfg = _cfg()
    spotter = TextSpotter(cfg, feat_hw=(HW, HW))
    feats = _feats(cfg)
    params = spotter.init(jax.random.PRNGKey(0), feats)
    preds = spotter.predict(params, feats, image_size=(64, 64))
    B, K = 2, cfg.num_queries
    assert preds.scores.shape == (B, K)
    assert preds.polygons.shape == (B, K, cfg.num_ctrl_points, 2)
    assert preds.recs.shape == (B, K, cfg.max_text_len)
    assert float(preds.polygons.max()) <= 64.0


def test_solve_assignment_optimality():
    """The padded device->host matcher must give the optimal assignment."""
    rng = np.random.default_rng(0)
    B, Q, I = 2, 6, 4
    cost = rng.normal(size=(B, Q, I)).astype(np.float32)
    valid = np.ones((B, I), bool)
    valid[1, 2:] = False
    match = np.asarray(solve_assignment(jnp.asarray(cost), jnp.asarray(valid)))

    from scipy.optimize import linear_sum_assignment

    for b in range(B):
        n = valid[b].sum()
        r, c = linear_sum_assignment(cost[b][:, :n])
        expect = np.full((I,), -1, np.int64)
        expect[c] = r
        np.testing.assert_array_equal(match[b], expect)


def test_giou_identity():
    boxes = jnp.asarray([[0.5, 0.5, 0.2, 0.2], [0.3, 0.3, 0.1, 0.4]], jnp.float32)
    xyxy = box_cxcywh_to_xyxy(boxes)
    g = generalized_box_iou(xyxy, xyxy)
    np.testing.assert_allclose(np.asarray(jnp.diagonal(g)), 1.0, atol=1e-6)


def test_fuse_dit_features_layout():
    """fuse matches the reference einops unpatchify contract."""
    from einops import rearrange

    L, B, n, h, w, p, d = 2, 1, 2, 4, 4, 2, 3
    feats = jnp.arange(L * B * n * h * w * p * p * d, dtype=jnp.float32).reshape(
        L, B, n * h * w, p * p * d
    )
    out = fuse_dit_features(feats, patch_size=p, num_streams_extracted=n)
    # reference (NCHW): 'b (N H W) (pH pW d) -> b (N d) (H pH) (W pW)'
    ref = rearrange(
        np.asarray(feats),
        "l b (n H W) (p q d) -> l b (n d) (H p) (W q)",
        n=n, H=h, W=w, p=p, q=p,
    )
    np.testing.assert_array_equal(
        np.asarray(out), np.transpose(ref, (0, 1, 3, 4, 2))
    )


def test_auction_assignment_near_optimal():
    """On-device auction must be within n*eps of the exact Hungarian cost
    (needed on TPU runtimes without host callbacks)."""
    from scipy.optimize import linear_sum_assignment

    from dit4sr_tpu.models.testr.matcher import auction_assignment

    rng = np.random.default_rng(0)
    for trial in range(10):
        B, Q, I = 2, 30, 8
        cost = rng.normal(size=(B, Q, I)).astype(np.float32) * 3
        valid = np.ones((B, I), bool)
        valid[1, 5:] = False
        match = np.asarray(
            auction_assignment(jnp.asarray(cost), jnp.asarray(valid), eps=1e-3)
        )
        for b in range(B):
            n = int(valid[b].sum())
            # injective over valid targets
            qs = match[b, :n]
            assert (qs >= 0).all()
            assert len(set(qs.tolist())) == n
            got_cost = cost[b][qs, np.arange(n)].sum()
            r, c = linear_sum_assignment(cost[b][:, :n])
            opt = cost[b][r, c].sum()
            assert got_cost <= opt + n * 1e-3 + 1e-4, (trial, b, got_cost, opt)
            # padded slots stay -1
            assert (match[b, n:] == -1).all()


def test_dropout_active_in_training_mode():
    """TESTRConfig.dropout must actually be applied: train-mode forwards with
    different dropout rngs differ; eval mode is deterministic (round-1 VERDICT
    missing #5 — the field was dead)."""
    cfg = _cfg().with_(dropout=0.3)
    spotter = TextSpotter(cfg, feat_hw=(HW, HW))
    feats = _feats(cfg)
    params = spotter.init(jax.random.PRNGKey(0), feats)

    out_eval1 = spotter.model.apply(params, feats)
    out_eval2 = spotter.model.apply(params, feats)
    np.testing.assert_array_equal(
        np.asarray(out_eval1.ctrl_logits), np.asarray(out_eval2.ctrl_logits)
    )

    out_tr1 = spotter.model.apply(
        params, feats, deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(1)},
    )
    out_tr2 = spotter.model.apply(
        params, feats, deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(2)},
    )
    d_tr = float(
        np.abs(np.asarray(out_tr1.ctrl_logits) - np.asarray(out_tr2.ctrl_logits)).max()
    )
    assert d_tr > 0, "dropout had no effect in training mode"
    d_te = float(
        np.abs(np.asarray(out_tr1.ctrl_logits) - np.asarray(out_eval1.ctrl_logits)).max()
    )
    assert d_te > 0, "train mode equals eval mode despite dropout"


def test_unmatched_valid_targets_are_dropped_from_loss():
    """A valid target with match == -1 (auction non-convergence) must not
    supervise query 0 (round-1 ADVICE)."""
    import jax.numpy as jnp

    from dit4sr_tpu.models.testr import losses as L

    cfg = _cfg()
    spotter = TextSpotter(cfg, feat_hw=(HW, HW))
    feats = _feats(cfg)
    params = spotter.init(jax.random.PRNGKey(0), feats)
    out = spotter.model.apply(params, feats)

    targets = _targets(cfg)

    # monkeypatch the solver to leave every target unmatched
    orig = L.solve_assignment
    try:
        L.solve_assignment = lambda cost, valid, method="auto", topk=0: jnp.full(
            valid.shape, -1, jnp.int32
        )
        total, parts = L.criterion(cfg, out, targets)
    finally:
        L.solve_assignment = orig
    # all point/text/box terms must vanish (nothing matched); the focal CE
    # terms reduce to pure negative-class loss, which is finite
    assert float(parts["loss_ctrl_points"]) == 0.0
    assert float(parts["loss_texts"]) == 0.0
    assert float(parts["loss_bbox_enc"]) == 0.0
    assert float(parts["loss_giou_enc"]) == 0.0
    assert np.isfinite(float(total))


def test_solve_assignment_topk_prefilter_matches_full_solve():
    """topk prefilter must reproduce the full solve when K >> I (and map
    candidate indices back to original query ids)."""
    rng = np.random.default_rng(0)
    B, Q, I = 3, 500, 8
    for trial in range(5):
        cost = rng.normal(size=(B, Q, I)).astype(np.float32) * 2
        valid = np.ones((B, I), bool)
        valid[1, 5:] = False
        full = np.asarray(
            solve_assignment(jnp.asarray(cost), jnp.asarray(valid), "host")
        )
        filt = np.asarray(
            solve_assignment(jnp.asarray(cost), jnp.asarray(valid), "host", topk=64)
        )
        # assignments may differ on cost ties; compare total matched cost
        for b in range(B):
            n = int(valid[b].sum())
            cf = cost[b][full[b, :n], np.arange(n)].sum()
            ck = cost[b][filt[b, :n], np.arange(n)].sum()
            assert (filt[b, :n] >= 0).all()
            assert len(set(filt[b, :n].tolist())) == n
            np.testing.assert_allclose(ck, cf, atol=1e-5), (trial, b)
            assert (filt[b, n:] == -1).all()


def test_text_pad_weight_reweights_only_pad_positions():
    """text_pad_weight=1.0 is reference parity; !=1 must change the loss
    ONLY when pad positions (target == voc_size) exist."""
    cfg = _cfg()
    spotter = TextSpotter(cfg, feat_hw=(HW, HW))
    feats = _feats(cfg)
    params = spotter.init(jax.random.PRNGKey(0), feats)

    # all-real-character targets: weight applies to nothing -> exact parity
    full = _targets(cfg)
    t_full_1, _ = spotter.loss(params, feats, full)
    spotter_w = TextSpotter(cfg.with_(text_pad_weight=0.25), feat_hw=(HW, HW))
    t_full_w, _ = spotter_w.loss(params, feats, full)
    assert float(t_full_1) == float(t_full_w)

    # padded tails: down-weighting pads must change loss_texts
    texts = np.asarray(full.texts).copy()
    texts[..., cfg.max_text_len // 2:] = cfg.voc_size
    padded = OCRTargets(full.labels, full.boxes, full.ctrl_points,
                        jnp.asarray(texts), full.valid)
    _, l1 = spotter.loss(params, feats, padded)
    _, lw = spotter_w.loss(params, feats, padded)
    assert float(l1["loss_texts"]) != float(lw["loss_texts"])
    assert np.isfinite(float(lw["loss_texts"]))
