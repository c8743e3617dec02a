"""DETR-family detector over the LAUD backbone (VERDICT r1 #6)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from laudnet_tpu.detection.detr import (
    DETRDetector,
    cxcywh_to_xyxy,
    detr_detect,
    detr_loss,
    generalized_iou,
    hungarian_match,
)


def tiny_detr(**kw):
    d = dict(num_classes=3, num_queries=8, dim=32, enc_layers=1,
             dec_layers=1, backbone_layers=(1, 1, 1, 1),
             dyn_mode=("channel",) * 4, sparsity_target=0.5)
    d.update(kw)
    return DETRDetector(**d)


def gt(b=1, m=2, size=64):
    boxes = jnp.asarray([[[4.0, 4.0, 24.0, 24.0], [32.0, 32.0, 56.0, 60.0]]]
                        * b)
    labels = jnp.asarray([[0, 2]] * b, jnp.int32)
    valid = jnp.ones((b, m), jnp.float32)
    return boxes, labels, valid


def test_hungarian_match_exact():
    # cost favors q2->gt0, q0->gt1; greedy would also find it, but add a
    # case where greedy fails: classic anti-greedy matrix
    cost = jnp.asarray([[[1.0, 2.0], [4.0, 8.0]]])  # q0,q1 x gt0,gt1
    # greedy picks (q0,gt0)=1 then (q1,gt1)=8 -> 9; optimal: (q0,gt1)=2 +
    # (q1,gt0)=4 -> 6
    m = np.asarray(hungarian_match(cost))
    assert m.shape == (1, 2)
    assert m[0, 1] == 0 and m[0, 0] == 1


def test_generalized_iou_cases():
    a = jnp.asarray([0.0, 0.0, 2.0, 2.0])
    assert float(generalized_iou(a, a)) == pytest.approx(1.0)
    b = jnp.asarray([2.0, 2.0, 4.0, 4.0])
    assert float(generalized_iou(a, b)) == pytest.approx(-0.5)


def test_detr_forward_contract():
    """The backbone contract generalizes to set prediction: outputs carry
    cls/boxes per query AND the LAUD additional stats."""
    model = tiny_detr()
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 3))
    v = model.init({"params": jax.random.PRNGKey(1)}, x, training=False)
    out = model.apply(v, x, training=False)
    assert out["cls_logits"].shape == (2, 8, 4)
    assert out["boxes_cxcywh"].shape == (2, 8, 4)
    assert float(out["boxes_cxcywh"].min()) >= 0
    assert float(out["boxes_cxcywh"].max()) <= 1
    assert "flops" in out["additional"] and "dense_flops" in out["additional"]
    assert out["model_configs"]["dyn_mode"] == ("channel",) * 4


def test_detr_loss_and_grads_jit():
    model = tiny_detr()
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 64, 3))
    boxes, labels, valid = gt()
    v = model.init({"params": jax.random.PRNGKey(1)}, x, training=False)

    @jax.jit
    def loss_of(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": v.get("batch_stats", {})},
            x, training=True, rngs={"gumbel": jax.random.PRNGKey(2)},
            mutable=["batch_stats"],
        )
        total, metrics = detr_loss(out, boxes, labels, valid, num_classes=3,
                                   image_size=64.0)
        return total, metrics

    (total, metrics), g = jax.value_and_grad(loss_of, has_aux=True)(
        v["params"]
    )
    assert np.isfinite(float(total))
    for k in ("loss_cls", "loss_l1", "loss_giou", "loss_sparse",
              "flops_rate"):
        assert np.isfinite(float(metrics[k])), k

    def gnorm(tree):
        return float(sum(jnp.abs(l).sum()
                         for l in jax.tree_util.tree_leaves(tree)))

    assert gnorm(g["backbone"]["layer1_0"]["conv1"]) > 0
    assert gnorm(g["backbone"]["layer1_0"]["masker_channel"]) > 0
    assert gnorm(g["cls_head"]) > 0
    assert gnorm(g["box_head"]) > 0


def test_detr_mask2former_variant():
    model = tiny_detr(with_masks=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 64, 3))
    boxes, labels, valid = gt()
    masks = jnp.zeros((1, 2, 64, 64)).at[:, 0, 4:24, 4:24].set(1.0) \
        .at[:, 1, 32:60, 32:56].set(1.0)
    v = model.init({"params": jax.random.PRNGKey(1)}, x, training=False)
    out, _ = model.apply(v, x, training=True,
                         rngs={"gumbel": jax.random.PRNGKey(2)},
                         mutable=["batch_stats"])
    assert out["mask_logits"].shape[:2] == (1, 8)
    total, metrics = detr_loss(out, boxes, labels, valid, num_classes=3,
                               image_size=64.0, gt_masks=masks)
    assert np.isfinite(float(total))
    assert float(metrics["loss_mask"]) > 0


def test_detr_detect_shapes():
    model = tiny_detr()
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 3))
    v = model.init({"params": jax.random.PRNGKey(1)}, x, training=False)
    out = model.apply(v, x, training=False)
    det = detr_detect(out, 64.0)
    assert det["boxes"].shape == (2, 8, 4)
    assert det["scores"].shape == (2, 8)


def test_cxcywh_roundtrip():
    xyxy = jnp.asarray([[2.0, 4.0, 10.0, 12.0]])
    cxcywh = jnp.asarray([[6.0, 8.0, 8.0, 8.0]])
    np.testing.assert_allclose(np.asarray(cxcywh_to_xyxy(cxcywh)),
                               np.asarray(xyxy), atol=1e-6)


def test_deformable_attention_module():
    """MSDeformAttention: zero-init weights -> uniform softmax over
    sampling points; output is a projection of sampled values (finite,
    correct shape), and gradients flow to the offset head."""
    from laudnet_tpu.detection.detr import MSDeformAttention

    attn = MSDeformAttention(dim=32, heads=4, points=2)
    b, n = 2, 20
    q = jax.random.normal(jax.random.PRNGKey(0), (b, n, 32))
    levels = [jax.random.normal(jax.random.PRNGKey(1), (b, 8, 8, 32)),
              jax.random.normal(jax.random.PRNGKey(2), (b, 4, 4, 32))]
    refs = jax.random.uniform(jax.random.PRNGKey(3), (b, n, 2))
    v = attn.init(jax.random.PRNGKey(4), q, levels, refs)
    out = attn.apply(v, q, levels, refs)
    assert out.shape == (b, n, 32)
    assert np.isfinite(np.asarray(out)).all()

    def loss(params):
        return (attn.apply(params, q, levels, refs) ** 2).sum()

    g = jax.grad(loss)(v)
    off_g = g["params"]["sampling_offsets"]["kernel"]
    assert float(jnp.abs(off_g).sum()) > 0  # offsets receive gradient


def test_bilinear_sample_matches_manual():
    from laudnet_tpu.detection.detr import bilinear_sample_level

    v = jnp.arange(12, dtype=jnp.float32).reshape(1, 3, 4, 1)
    # pixel centers: loc (x=0.5/4 -> px 1.5? no: x*w-0.5) — sample exactly
    # at pixel (1, 2): normalized x = (2 + 0.5)/4, y = (1 + 0.5)/3
    locs = jnp.asarray([[[2.5 / 4, 1.5 / 3]]])
    out = bilinear_sample_level(v, locs)
    np.testing.assert_allclose(np.asarray(out)[0, 0, 0], 6.0, atol=1e-5)
    # midpoint between pixels (1,2) and (1,3): average
    locs2 = jnp.asarray([[[3.0 / 4, 1.5 / 3]]])
    out2 = bilinear_sample_level(v, locs2)
    np.testing.assert_allclose(np.asarray(out2)[0, 0, 0], 6.5, atol=1e-5)


def test_deformable_encoder_realistic_tokens():
    """The deformable encoder compiles and runs at a realistic finest
    level (64x64 + 32x32 + 16x16 = 5376 tokens — VERDICT r2 item 5's done
    criterion; O(L^2) full attention at this size would be a 29M-entry
    score matrix per head)."""
    from laudnet_tpu.detection.detr import DeformableEncoderLayer

    b, dim = 1, 32
    shapes = [(64, 64), (32, 32), (16, 16)]
    levels = [jax.random.normal(jax.random.PRNGKey(i), (b, h, w, dim))
              for i, (h, w) in enumerate(shapes)]
    x = jnp.concatenate([f.reshape(b, -1, dim) for f in levels], axis=1)
    refs = jax.random.uniform(jax.random.PRNGKey(9), (b, x.shape[1], 2))
    layer = DeformableEncoderLayer(dim=dim, heads=4, points=2, mlp_dim=64)
    v = layer.init(jax.random.PRNGKey(0), x, levels, refs)
    out = jax.jit(lambda v, x: layer.apply(v, x, levels, refs))(v, x)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()


def test_masked_cross_attention_restricts():
    """The mask2former variant's decoder cross-attention only sees
    foreground tokens: with masked_cross_attention on vs off the decoder
    outputs differ (same params), and both are finite."""
    m_on = tiny_detr(with_masks=True, masked_cross_attention=True)
    m_off = tiny_detr(with_masks=True, masked_cross_attention=False)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 64, 3))
    v = m_on.init({"params": jax.random.PRNGKey(1)}, x, training=False)
    o_on = m_on.apply(v, x, training=False)
    o_off = m_off.apply(v, x, training=False)
    assert np.isfinite(np.asarray(o_on["mask_logits"])).all()
    d = float(jnp.abs(o_on["cls_logits"] - o_off["cls_logits"]).max())
    assert d > 1e-6  # masking changes what the decoder sees


def test_ddq_distinct_queries():
    """DDQ query initialization: dense encoder proposals, class-agnostic
    NMS keeps distinct ones, selected features become queries, and the
    auxiliary encoder set loss trains the proposal head."""
    m = tiny_detr(query_init="ddq")
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 64, 3))
    v = m.init({"params": jax.random.PRNGKey(1)}, x, training=False)
    out = m.apply(v, x, training=False)
    assert out["enc_cls_logits"].shape == (1, 8, 4)  # Q=8, K+1
    assert out["enc_boxes_cxcywh"].shape == (1, 8, 4)
    bx = np.asarray(out["enc_boxes_cxcywh"])
    assert ((bx >= 0) & (bx <= 1)).all()
    # no learned query embedding in the ddq variant
    assert "query_embed" not in v["params"]
    assert "enc_cls" in v["params"] and "query_proj" in v["params"]

    boxes, labels, valid = gt()
    total, metrics = detr_loss(
        out, boxes, labels, valid, num_classes=3, image_size=64.0)
    assert "loss_enc_aux" in metrics
    assert np.isfinite(float(total))

    # gradients reach the encoder proposal head through the aux loss
    def loss_fn(params):
        o = m.apply(
            {"params": params,
             "batch_stats": v.get("batch_stats", {})},
            x, training=True, rngs={"gumbel": jax.random.PRNGKey(2)})
        t, _ = detr_loss(o, boxes, labels, valid, num_classes=3,
                         image_size=64.0)
        return t

    g = jax.grad(loss_fn)(v["params"])
    gn = float(sum(jnp.abs(l).sum() for l in
                   jax.tree_util.tree_leaves(g["enc_cls"])))
    assert gn > 0


def _greedy_nms_ref(boxes, scores, thresh):
    """Sequential greedy NMS, the torchvision/mmcv semantics (oracle)."""
    order = np.argsort(-scores)
    keep = np.zeros(len(scores), bool)
    for i in order:
        x1 = np.maximum(boxes[i, 0], boxes[keep, 0])
        y1 = np.maximum(boxes[i, 1], boxes[keep, 1])
        x2 = np.minimum(boxes[i, 2], boxes[keep, 2])
        y2 = np.minimum(boxes[i, 3], boxes[keep, 3])
        inter = np.maximum(x2 - x1, 0) * np.maximum(y2 - y1, 0)
        area = lambda b: np.maximum(b[..., 2] - b[..., 0], 0) * np.maximum(
            b[..., 3] - b[..., 1], 0)
        iou = inter / np.maximum(area(boxes[i]) + area(boxes[keep]) - inter,
                                 1e-9)
        if not (iou > thresh).any():
            keep[i] = True
    return keep


def test_nms_keep_mask_matches_greedy_oracle():
    """nms_keep_mask is the EXACT sequential greedy NMS (torch batched_nms
    semantics) as a static-shape keep mask — the TPU reduction of DDQ's
    selection (`ddq_detr_layers.py:65-68`): suppression chains must match
    (A kills B; C, which B would have killed, survives)."""
    from laudnet_tpu.detection.detr import nms_keep_mask

    rng = np.random.default_rng(0)
    for trial in range(8):
        n = 32
        cx = rng.uniform(0.2, 0.8, n)
        cy = rng.uniform(0.2, 0.8, n)
        w = rng.uniform(0.05, 0.5, n)
        h = rng.uniform(0.05, 0.5, n)
        boxes = np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2],
                         -1).astype(np.float32)
        scores = rng.uniform(0.1, 1.0, n).astype(np.float32)
        want = _greedy_nms_ref(boxes, scores, 0.5)
        got = np.asarray(nms_keep_mask(jnp.asarray(boxes),
                                       jnp.asarray(scores), 0.5))
        np.testing.assert_array_equal(got, want, err_msg=f"trial {trial}")
    # a deliberate chain: A(0.9) kills B(0.8); C(0.7) overlaps B but not A
    boxes = np.asarray([[0.0, 0.0, 1.0, 1.0],
                        [0.5, 0.0, 1.5, 1.0],
                        [1.1, 0.0, 2.1, 1.0]], np.float32)
    scores = np.asarray([0.9, 0.8, 0.7], np.float32)
    got = np.asarray(nms_keep_mask(jnp.asarray(boxes),
                                   jnp.asarray(scores), 0.3))
    np.testing.assert_array_equal(got, [True, False, True])


def test_nms_keep_mask_eligible_restricts_pool():
    """The ``eligible`` mask is the static-shape analog of the reference's
    ori_index pool restriction (`ddq_detr_layers.py:64-71`): ineligible
    boxes neither suppress nor get kept — the sweep over the eligible
    subset matches the oracle run on that subset alone."""
    from laudnet_tpu.detection.detr import nms_keep_mask

    rng = np.random.default_rng(7)
    for trial in range(8):
        n = 32
        cx = rng.uniform(0.2, 0.8, n)
        cy = rng.uniform(0.2, 0.8, n)
        w = rng.uniform(0.05, 0.5, n)
        h = rng.uniform(0.05, 0.5, n)
        boxes = np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2],
                         -1).astype(np.float32)
        scores = rng.uniform(0.1, 1.0, n).astype(np.float32)
        eligible = rng.uniform(size=n) < 0.6
        sub = np.flatnonzero(eligible)
        want = np.zeros(n, bool)
        want[sub] = _greedy_nms_ref(boxes[sub], scores[sub], 0.5)
        got = np.asarray(nms_keep_mask(jnp.asarray(boxes),
                                       jnp.asarray(scores), 0.5,
                                       jnp.asarray(eligible)))
        np.testing.assert_array_equal(got, want, err_msg=f"trial {trial}")


def test_ddq_distinct_query_selection_per_layer():
    """The DDQ decoder applies per-layer distinct-query selection: the
    distinct keep masks are emitted per intermediate layer, duplicates
    genuinely get suppressed, and every intermediate layer is supervised
    (loss_dec_aux)."""
    m = tiny_detr(query_init="ddq", dec_layers=3, ddq_nms_iou=0.8)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 3))
    v = m.init({"params": jax.random.PRNGKey(1)}, x, training=False)
    out = m.apply(v, x, training=False)
    assert out["distinct_keep"].shape == (2, 2, 8)  # (L-1, B, Q)
    keep = np.asarray(out["distinct_keep"])
    assert keep.any(axis=-1).all()  # at least one distinct query per image
    # the distinct set shrinks monotonically: a query suppressed at layer
    # k never re-enters at k+1 (the reference restricts each layer's NMS
    # pool to ori_index — ddq_detr_layers.py:64-71)
    assert not (keep[1] & ~keep[0]).any()
    assert len(out["aux_outputs"]) == 2
    assert out["aux_outputs"][0]["cls_logits"].shape == (2, 8, 4)

    boxes, labels, valid = gt(b=2)
    total, metrics = detr_loss(out, boxes, labels, valid, num_classes=3,
                               image_size=64.0)
    assert "loss_dec_aux" in metrics
    assert np.isfinite(float(total))

    # per-layer refinement heads receive gradients through the aux loss
    def loss_fn(params):
        o = m.apply({"params": params,
                     "batch_stats": v.get("batch_stats", {})},
                    x, training=True, rngs={"gumbel": jax.random.PRNGKey(2)})
        t, _ = detr_loss(o, boxes, labels, valid, num_classes=3,
                         image_size=64.0)
        return t

    g = jax.grad(loss_fn)(v["params"])
    gn = float(sum(jnp.abs(l).sum() for l in
                   jax.tree_util.tree_leaves(g["cls_head_l0"])))
    assert gn > 0


def test_ddq_denoising_groups():
    """dn_groups > 0: noised GT queries train with known-assignment
    supervision; the matchable block's outputs are unaffected in eval
    (dn only exists in training forwards)."""
    m = tiny_detr(query_init="ddq", dec_layers=2, dn_groups=2)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 64, 3))
    boxes, labels, valid = gt()
    dn_gt = {"boxes_xyxy": boxes, "labels": labels, "valid": valid}
    # dn params only exist on the dn (training) path — init through it
    v = m.init({"params": jax.random.PRNGKey(1),
                "gumbel": jax.random.PRNGKey(4),
                "dn": jax.random.PRNGKey(5)},
               x, training=True, dn_gt=dn_gt)
    out = m.apply(v, x, training=True, dn_gt=dn_gt,
                  rngs={"gumbel": jax.random.PRNGKey(2),
                        "dn": jax.random.PRNGKey(3)})
    assert out["dn_cls_logits"].shape == (1, 4, 4)  # 2 groups x 2 gt
    assert out["dn_boxes_cxcywh"].shape == (1, 4, 4)
    assert out["cls_logits"].shape == (1, 8, 4)  # matchable slice intact
    total, metrics = detr_loss(out, boxes, labels, valid, num_classes=3,
                               image_size=64.0)
    assert "loss_dn" in metrics
    assert np.isfinite(float(total))

    def loss_fn(params):
        o = m.apply({"params": params,
                     "batch_stats": v.get("batch_stats", {})},
                    x, training=True, dn_gt=dn_gt,
                    rngs={"gumbel": jax.random.PRNGKey(2),
                          "dn": jax.random.PRNGKey(3)})
        t, _ = detr_loss(o, boxes, labels, valid, num_classes=3,
                         image_size=64.0)
        return t

    g = jax.grad(loss_fn)(v["params"])
    gn = float(sum(jnp.abs(l).sum() for l in
                   jax.tree_util.tree_leaves(g["dn_label_embed"])))
    assert gn > 0


def test_ddq_trains_end_to_end():
    """train_detector drives the full DDQ decoder (distinct queries + dn
    groups) for two steps with finite losses — the ddq_detr_* config
    mechanism (r4 VERDICT #2 done-criterion)."""
    from laudnet_tpu.detection.runner import DetTrainConfig, train_detector

    m = tiny_detr(query_init="ddq", dec_layers=2, dn_groups=2)
    cfg = DetTrainConfig(num_classes=3, epochs=1, steps_per_epoch=2,
                         warmup_steps=1, lambda_sparse=0.1)
    _, _, hist = train_detector(m, cfg, kind="detr", image_size=64,
                                batch_size=2, log=lambda *a: None)
    assert np.isfinite(hist[-1]["loss"])
    assert "loss_dn" in hist[-1] and "loss_dec_aux" in hist[-1]


def test_detr_rect_per_axis_normalization():
    """Rectangular inputs normalize x by W and y by H (r4 fix — a single
    scalar scale left right-half x-targets > 1.0, unreachable for the
    sigmoid-bounded box head, and detect could never place a box past
    x = H on a W > H image)."""
    # detect: cxcywh (0.5, 0.5, 1, 1) covers the full (h=32, w=64) image
    out = {
        "cls_logits": jnp.zeros((1, 1, 4)),
        "boxes_cxcywh": jnp.asarray([[[0.5, 0.5, 1.0, 1.0]]]),
    }
    det = detr_detect(out, (32.0, 64.0), score_threshold=0.0)
    np.testing.assert_allclose(np.asarray(det["boxes"][0, 0]),
                               [0.0, 0.0, 64.0, 32.0], atol=1e-5)

    # loss: a full-image GT box on the same (32, 64) image is exactly a
    # (0.5, 0.5, 1, 1) prediction -> zero matched L1 and gIoU terms
    o = {
        "cls_logits": jnp.zeros((1, 2, 4)),
        "boxes_cxcywh": jnp.asarray(
            [[[0.5, 0.5, 1.0, 1.0], [0.1, 0.1, 0.05, 0.05]]]),
        "additional": {"flops": jnp.asarray(0.5),
                       "dense_flops": jnp.asarray(1.0)},
    }
    boxes = jnp.asarray([[[0.0, 0.0, 64.0, 32.0]]])
    labels = jnp.zeros((1, 1), jnp.int32)
    valid = jnp.ones((1, 1), jnp.float32)
    _, metrics = detr_loss(o, boxes, labels, valid, num_classes=3,
                           image_size=(32.0, 64.0))
    assert float(metrics["loss_l1"]) < 1e-6, float(metrics["loss_l1"])
    assert float(metrics["loss_giou"]) < 1e-5


def test_detr_trains_on_rectangular_images():
    """train_detector(kind='detr') with image_size=(ih, iw): the default
    synthetic data generates (ih, iw) batches (r4 fix — it was square
    ih x ih, mismatching the (ih, iw) init sample) and the set loss
    normalizes per-axis, so the step runs and stays finite."""
    from laudnet_tpu.detection.runner import DetTrainConfig, train_detector

    m = tiny_detr()
    cfg = DetTrainConfig(num_classes=3, epochs=1, steps_per_epoch=2,
                         warmup_steps=1, lambda_sparse=0.1)
    _, _, hist = train_detector(m, cfg, kind="detr", image_size=(32, 64),
                                batch_size=2, log=lambda *a: None)
    assert np.isfinite(hist[-1]["loss"])


# --- Mask2Former point-sampled mask loss (VERDICT r4 #3) ---------------------

def test_point_sample_matches_torch_grid_sample():
    """point_sample is mmcv's contract: grid_sample(align_corners=False)
    on [0,1] coords. Parity with torch on interior points (the border
    half-pixel band differs by design: clamp vs zero-pad)."""
    import torch
    import torch.nn.functional as F

    from laudnet_tpu.detection.detr import point_sample

    rng = np.random.default_rng(0)
    logits = rng.standard_normal((2, 3, 8, 10)).astype(np.float32)
    # interior coords: stay >= half a pixel away from every border
    coords = rng.uniform(0.1, 0.9, (2, 3, 17, 2)).astype(np.float32)

    ours = np.asarray(point_sample(jnp.asarray(logits), jnp.asarray(coords)))

    t = torch.from_numpy(logits).reshape(6, 1, 8, 10)
    g = torch.from_numpy(coords * 2 - 1).reshape(6, 17, 1, 2)
    ref = F.grid_sample(t, g, align_corners=False).reshape(2, 3, 17).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_uncertain_point_coords_prefers_boundary():
    """Importance sampling concentrates points where |logit| is small
    (the mask boundary), the mechanism of mask2former_head's
    get_uncertain_point_coords_with_randomness."""
    from laudnet_tpu.detection.detr import point_sample, uncertain_point_coords

    # a mask whose logit is -8 left / +8 right with a sharp boundary at
    # x=0.5: uncertainty (-|logit|) peaks in the transition column
    xs = jnp.linspace(-8.0, 8.0, 32)
    mlog = jnp.broadcast_to(xs[None, None, None, :], (1, 1, 32, 32))
    coords = uncertain_point_coords(
        jax.random.PRNGKey(0), mlog, 128, oversample_ratio=4.0,
        importance_ratio=0.75)
    assert coords.shape == (1, 1, 128, 2)
    # the 96 importance points must sit near the x=0.5 boundary
    imp_x = np.asarray(coords[0, 0, :96, 0])
    assert np.abs(imp_x - 0.5).mean() < 0.1
    # sampled |logit| at importance points is far below the mask average
    imp_logit = np.asarray(point_sample(mlog, coords[:, :, :96]))
    assert np.abs(imp_logit).mean() < 2.0


def test_point_sampled_loss_approximates_dense():
    """With uniform sampling (importance_ratio=0) the point-sampled BCE
    and dice are Monte-Carlo estimates of the dense full-grid loss
    (VERDICT r4 #3 done-criterion)."""
    from laudnet_tpu.detection.detr import _point_mask_losses

    h = w = 32
    # smooth synthetic logit fields (iid noise would bias the estimate:
    # bilinear interpolation between random grid points shrinks |logit|)
    yy, xx = np.meshgrid(np.linspace(0, 1, h), np.linspace(0, 1, w),
                         indexing="ij")
    f0 = 3.0 * np.sin(4 * xx) * np.cos(3 * yy)
    f1 = 4.0 * (xx + yy - 1.0)
    mlog = jnp.asarray(np.stack([f0, f1])[None].astype(np.float32))
    gm = jnp.zeros((1, 2, h, w)).at[:, 0, 4:20, 4:20].set(1.0) \
        .at[:, 1, 10:30, 16:28].set(1.0)
    valid = jnp.ones((1, 2))

    lb, ld = _point_mask_losses(
        mlog, gm, valid, jax.random.PRNGKey(0), num_points=8000,
        oversample_ratio=1.0, importance_ratio=0.0)

    # dense reference on the same grid (GT already at prediction res)
    t = gm
    bce = -(t * jax.nn.log_sigmoid(mlog)
            + (1 - t) * jax.nn.log_sigmoid(-mlog)).mean((2, 3))
    p = jax.nn.sigmoid(mlog)
    dice = 1 - (2 * (p * t).sum((2, 3)) + 1) / (
        p.sum((2, 3)) + t.sum((2, 3)) + 1)
    assert float(lb) == pytest.approx(float(bce.mean()), rel=0.05)
    assert float(ld) == pytest.approx(float(dice.mean()), rel=0.05)


def test_mask_aux_point_loss_end_to_end():
    """The mask2former path emits one aux (cls, mask) prediction per
    decoder layer from the SHARED heads, and the point-sampled loss
    trains them: finite total, loss_mask_aux > 0, gradient reaches
    mask_embed through the aux branch alone."""
    model = tiny_detr(with_masks=True, dec_layers=2)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 64, 3))
    boxes, labels, valid = gt()
    masks = jnp.zeros((1, 2, 64, 64)).at[:, 0, 4:24, 4:24].set(1.0) \
        .at[:, 1, 32:60, 32:56].set(1.0)
    v = model.init({"params": jax.random.PRNGKey(1)}, x, training=False)
    out, _ = model.apply(v, x, training=True,
                         rngs={"gumbel": jax.random.PRNGKey(2)},
                         mutable=["batch_stats"])
    assert len(out["mask_aux_outputs"]) == 2
    for a in out["mask_aux_outputs"]:
        assert a["cls_logits"].shape == (1, 8, 4)
        assert a["mask_logits"].shape[:2] == (1, 8)

    total, metrics = detr_loss(
        out, boxes, labels, valid, num_classes=3, image_size=64.0,
        gt_masks=masks, mask_points=256, mask_rng=jax.random.PRNGKey(3))
    assert np.isfinite(float(total))
    assert float(metrics["loss_mask_aux"]) > 0
    assert float(metrics["loss_mask"]) > 0

    def aux_only(params):
        o, _ = model.apply({"params": params,
                            "batch_stats": v.get("batch_stats", {})},
                           x, training=True,
                           rngs={"gumbel": jax.random.PRNGKey(2)},
                           mutable=["batch_stats"])
        _, mm = detr_loss(o, boxes, labels, valid, num_classes=3,
                          image_size=64.0, gt_masks=masks, mask_points=128,
                          mask_rng=jax.random.PRNGKey(3))
        return mm["loss_mask_aux"]

    g = jax.grad(aux_only)(v["params"])
    gn = float(jnp.sqrt(sum(jnp.sum(x_ ** 2) for x_ in
                            jax.tree.leaves(g["mask_embed"]))))
    assert gn > 0
