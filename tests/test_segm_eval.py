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
