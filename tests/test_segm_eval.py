"""Segmentation mAP evaluation (the Mask-RCNN / Mask2Former segm metric)."""

import jax
import numpy as np

from laudnet_tpu.detection import DETRDetector, FasterRCNN, evaluate_detector
from laudnet_tpu.detection.runner import (
    mask_iou,
    mean_average_precision,
    paste_mask,
    synthetic_coco_batches,
)


def test_paste_mask_fills_box():
    prob = np.ones((14, 14), np.float32)
    m = paste_mask(prob, np.array([10, 20, 30, 50]), 64, 64)
    assert m.dtype == bool and m.shape == (64, 64)
    assert m[20:50, 10:30].all()
    assert m.sum() == 30 * 20
    # degenerate box -> empty
    assert paste_mask(prob, np.array([5, 5, 5, 5]), 64, 64).sum() == 0


def test_mask_iou():
    a = np.zeros((8, 8), bool)
    b = np.zeros((8, 8), bool)
    a[:4] = True
    b[2:6] = True
    assert mask_iou(a, b) == (2 * 8) / (6 * 8)
    assert mask_iou(a, np.zeros((8, 8), bool)) == 0.0


def test_segm_map_hand_case():
    canvas = np.zeros((32, 32), bool)
    gt_m = canvas.copy()
    gt_m[4:12, 4:12] = True
    good = gt_m.copy()
    bad = canvas.copy()
    bad[20:28, 20:28] = True
    gts = [dict(boxes=np.array([[4, 4, 12, 12]]), labels=np.array([0]),
                masks=np.array([gt_m]))]
    dets = [dict(boxes=np.array([[4, 4, 12, 12], [20, 20, 28, 28]]),
                 scores=np.array([0.9, 0.8]), classes=np.array([0, 0]),
                 masks=[good, bad])]
    r = mean_average_precision(dets, gts, num_classes=1, use_masks=True)
    assert r["mAP"] == 1.0  # the correct-mask hit ranks first


def test_mask_rcnn_eval_reports_segm_map():
    model = FasterRCNN(num_classes=3, backbone_layers=(1, 1, 1, 1),
                       dyn_mode=("channel",) * 4, num_proposals=16,
                       with_masks=True)
    x = jax.numpy.zeros((2, 64, 64, 3))
    v = model.init({"params": jax.random.PRNGKey(0)}, x, training=False)
    res = evaluate_detector(
        model, v["params"], v.get("batch_stats", {}),
        synthetic_coco_batches(2, 64, 3, steps=1, with_masks=True),
        num_classes=3, kind="faster_rcnn",
    )
    assert "segm_mAP" in res
    assert 0.0 <= res["segm_mAP"] <= 1.0


def test_detr_masks_eval_reports_segm_map():
    model = DETRDetector(num_classes=3, num_queries=8, dim=32, enc_layers=1,
                         dec_layers=1, backbone_layers=(1, 1, 1, 1),
                         dyn_mode=("channel",) * 4, out_indices=(0, 1),
                         with_masks=True)
    x = jax.numpy.zeros((2, 64, 64, 3))
    v = model.init({"params": jax.random.PRNGKey(0)}, x, training=False)
    res = evaluate_detector(
        model, v["params"], v.get("batch_stats", {}),
        synthetic_coco_batches(2, 64, 3, steps=1, with_masks=True),
        num_classes=3, kind="detr",
    )
    assert "segm_mAP" in res
    assert 0.0 <= res["segm_mAP"] <= 1.0


def test_map_coco_matching_overlapping_gts():
    """COCO matching: a duplicate detection whose best GT is taken must
    fall through to another unmatched GT above threshold (the greedy
    best-only rule would count it FP)."""
    gts = [dict(boxes=np.array([[0, 0, 10, 10], [2, 0, 12, 10]]),
                labels=np.array([0, 0]))]
    dets = [dict(boxes=np.array([[0, 0, 10, 10], [1, 0, 11, 10]]),
                 scores=np.array([0.9, 0.8]), classes=np.array([0, 0]))]
    r = mean_average_precision(dets, gts, num_classes=1, iou_threshold=0.5)
    assert r["mAP"] == 1.0  # det2 matches GT B (IoU ~0.69) instead of FP


def test_evaluate_get_info_helper():
    import jax.numpy as jnp
    import pytest

    from laudnet_tpu.detection import LAUDDetBackbone, evaluate_get_info

    bb = LAUDDetBackbone(layers=(1, 1, 1, 1), dyn_mode=("channel",) * 4)
    x = jnp.zeros((2, 64, 64, 3))
    v = bb.init({"params": jax.random.PRNGKey(0)}, x, training=False)

    def apply_fn(b):
        feats, additional, cfgs = bb.apply(v, b, training=False)
        return {"additional": additional}

    info = evaluate_get_info(apply_fn, [np.zeros((2, 64, 64, 3), np.float32)])
    assert info["n_images"] == 2
    assert 0 < info["mean_flops_rate"] <= 1.0 + 1e-6
    assert info["mean_channel_sparsity"].shape[0] == 4
    with pytest.raises(ValueError):
        evaluate_get_info(apply_fn, [])


def test_backbone_nonsquare_dynamic_and_counts_static():
    import jax.numpy as jnp

    from laudnet_tpu.detection import LAUDDetBackbone

    # rectangular dynamic inputs are supported since r3 (per-dimension
    # masker grids + nearest mask interpolation, `resnet_sd.py:713`);
    # the full behavior suite lives in tests/test_rect_detection.py
    bb = LAUDDetBackbone(layers=(1, 1, 1, 1), dyn_mode=("spatial",) * 4)
    x = jnp.zeros((1, 64, 96, 3))
    v = bb.init({"params": jax.random.PRNGKey(0)}, x, training=False)
    feats, _, _ = bb.apply(v, x, training=False)
    assert feats[0].shape[1:3] == (16, 24)

    # all-static backbones account real dense FLOPs (rate 1.0, not 0/0)
    st = LAUDDetBackbone(layers=(1, 1, 1, 1), dyn_mode=("static",) * 4)
    v = st.init({"params": jax.random.PRNGKey(0)},
                jnp.zeros((1, 64, 96, 3)), training=False)
    _, additional, _ = st.apply(v, jnp.zeros((1, 64, 96, 3)),
                                training=False)
    assert float(additional["flops"]) > 0
    assert float(additional["flops"]) == float(additional["dense_flops"])
