"""Two-stage detection training: losses, runner, mAP (VERDICT r1 #5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from laudnet_tpu.detection import (
    DetTrainConfig,
    FasterRCNN,
    faster_rcnn_loss,
    make_detection_sgd,
    make_detector_train_step,
    mean_average_precision,
    synthetic_coco_batches,
    train_detector,
)


def tiny_rcnn(**kw):
    d = dict(num_classes=3, backbone_layers=(1, 1, 1, 1),
             dyn_mode=("channel",) * 4, num_proposals=16,
             sparsity_target=0.5)
    d.update(kw)
    return FasterRCNN(**d)


def gt_batch(b=2, m=3, size=64, seed=0):
    rng = np.random.default_rng(seed)
    boxes = np.zeros((b, m, 4), np.float32)
    for i in range(b):
        for j in range(m):
            x0, y0 = rng.integers(0, size // 2, 2)
            boxes[i, j] = (x0, y0, x0 + size // 3, y0 + size // 3)
    labels = rng.integers(0, 3, (b, m)).astype(np.int32)
    valid = np.ones((b, m), np.float32)
    return jnp.asarray(boxes), jnp.asarray(labels), jnp.asarray(valid)


def test_map_evaluator_hand_case():
    gts = [dict(boxes=np.array([[0, 0, 10, 10], [20, 20, 30, 30]]),
                labels=np.array([0, 1]))]
    # one perfect class-0 hit, one class-1 miss (wrong location)
    dets = [dict(boxes=np.array([[0, 0, 10, 10], [40, 40, 50, 50]]),
                 scores=np.array([0.9, 0.8]),
                 classes=np.array([0, 1]))]
    r = mean_average_precision(dets, gts, num_classes=2)
    assert r["ap_per_class"][0] == pytest.approx(1.0)
    assert r["ap_per_class"][1] == pytest.approx(0.0)
    assert r["mAP"] == pytest.approx(0.5)

    # padded zero-score detections are ignored
    dets2 = [dict(boxes=np.zeros((5, 4)), scores=np.zeros(5),
                  classes=np.zeros(5, int))]
    r2 = mean_average_precision(dets2, gts, num_classes=2)
    assert r2["mAP"] == 0.0


def test_faster_rcnn_jitted_train_step():
    """One jitted Faster-RCNN train step: finite losses, params move,
    gradients reach backbone convs, maskers, and both heads."""
    model = tiny_rcnn()
    cfg = DetTrainConfig(num_classes=3, steps_per_epoch=2, epochs=1,
                         warmup_steps=1, base_lr=0.01, lr_mult=0.2)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 3))
    boxes, labels, valid = gt_batch()

    v = model.init({"params": jax.random.PRNGKey(1)}, x, training=False)
    params, bs = v["params"], v.get("batch_stats", {})
    opt = make_detection_sgd(params, lr_mult=0.2)
    state = (jnp.zeros((), jnp.int32), params, bs, opt.init(params))
    step = jax.jit(make_detector_train_step(model, opt, cfg, "faster_rcnn"))

    # gradient flow check
    def loss_of(p):
        out = model.apply({"params": p, "batch_stats": bs}, x, training=True,
                          gt_boxes=boxes, gt_valid=valid,
                          rngs={"gumbel": jax.random.PRNGKey(2)},
                          mutable=["batch_stats"])[0]
        total, _ = faster_rcnn_loss(out, boxes, labels, valid, num_classes=3)
        return total

    g = jax.grad(loss_of)(params)

    def gnorm(tree):
        return float(sum(jnp.abs(l).sum() for l in jax.tree_util.tree_leaves(tree)))

    assert gnorm(g["backbone"]["layer1_0"]["conv1"]) > 0
    assert gnorm(g["backbone"]["layer1_0"]["masker_channel"]) > 0
    assert gnorm(g["rpn_head"]) > 0
    assert gnorm(g["box_head"]) > 0

    new_state, metrics = step(state, x, boxes, labels, valid)
    m = jax.device_get(metrics)
    for k in ("loss", "loss_rpn_cls", "loss_rpn_box", "loss_cls", "loss_box",
              "loss_sparse", "flops_rate"):
        assert np.isfinite(float(m[k])), k
    moved = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), params, new_state[1]
    )
    assert max(jax.tree_util.tree_leaves(moved)) > 0


def test_mask_rcnn_mask_loss():
    model = tiny_rcnn(with_masks=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 64, 3))
    boxes, labels, valid = gt_batch(b=1)
    masks = jnp.zeros((1, 3, 64, 64)).at[:, :, 8:24, 8:24].set(1.0)
    v = model.init({"params": jax.random.PRNGKey(1)}, x, training=False)
    out = model.apply(v, x, training=True, gt_boxes=boxes, gt_valid=valid,
                      rngs={"gumbel": jax.random.PRNGKey(2)},
                      mutable=["batch_stats"])[0]
    assert "mask_logits" in out
    total, metrics = faster_rcnn_loss(out, boxes, labels, valid,
                                      num_classes=3, gt_masks=masks)
    assert np.isfinite(float(total))
    assert np.isfinite(float(metrics["loss_mask"]))
    assert float(metrics["loss_mask"]) > 0


def test_gt_injection_guarantees_roi_positives():
    """With GT boxes injected into the proposal set, the RoI assignment has
    at least one positive per image from step one."""
    from laudnet_tpu.detection.two_stage_train import roi_assign

    model = tiny_rcnn()
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 64, 3))
    boxes, labels, valid = gt_batch(b=1)
    v = model.init({"params": jax.random.PRNGKey(1)}, x, training=False)
    out = model.apply(v, x, training=True, gt_boxes=boxes, gt_valid=valid,
                      rngs={"gumbel": jax.random.PRNGKey(2)},
                      mutable=["batch_stats"])[0]
    _, lab, _, pos, _ = roi_assign(
        out["proposals"][0], out["proposal_valid"][0],
        boxes[0], labels[0], valid[0], num_classes=3,
    )
    assert float(pos.sum()) >= 3  # the three injected GT boxes


def test_detection_sgd_param_groups():
    model = tiny_rcnn()
    x = jnp.zeros((1, 64, 64, 3))
    v = model.init({"params": jax.random.PRNGKey(1)}, x, training=False)
    from laudnet_tpu.detection.runner import detection_param_labels

    labels = detection_param_labels(v["params"])
    assert labels["backbone"]["layer1_0"]["conv1"]["kernel"] == "backbone"
    assert (labels["backbone"]["layer1_0"]["masker_channel"]["fc1"]["kernel"]
            == "masker")
    assert labels["rpn_head"]["conv"]["kernel"] == "head"
    assert labels["box_head"]["fc1"]["kernel"] == "head"


@pytest.mark.slow
def test_synthetic_coco_convergence_smoke():
    """Tiny-synthetic-COCO convergence: 40 steps of Faster-RCNN on
    learnable rectangles must cut the loss substantially."""
    model = tiny_rcnn()
    # base_lr 0.005: the 1x schedule has no decay inside a 1-epoch smoke
    # (decay epochs truncate to 0 and are disabled), so the full LR
    # applies from warmup end — 0.02 diverges on this tiny model
    cfg = DetTrainConfig(num_classes=3, base_lr=0.005, lr_mult=0.5, epochs=1,
                         steps_per_epoch=40, warmup_steps=10,
                         lambda_sparse=0.1)
    _, _, history = train_detector(
        model, cfg, kind="faster_rcnn", image_size=64, batch_size=2,
        log=lambda *a: None,
    )
    first, last = history[0]["loss"], history[-1]["loss"]
    assert np.isfinite(last)
    assert last < first * 0.7, (first, last)


def test_evaluate_detector_pipeline():
    """End-to-end eval: detect() -> mAP + FLOPs accounting over batches."""
    from laudnet_tpu.detection.runner import evaluate_detector

    model = tiny_rcnn()
    x = jnp.zeros((1, 64, 64, 3))
    v = model.init({"params": jax.random.PRNGKey(1)}, x, training=False)

    batches = list(synthetic_coco_batches(1, 64, 3, steps=2, seed=5))
    res = evaluate_detector(model, v["params"], v.get("batch_stats", {}),
                            batches, num_classes=3)
    assert 0.0 <= res["mAP"] <= 1.0
    assert res["n_images"] == 2
    assert res["mean_flops"] > 0
    assert 0 < res["mean_flops_rate"] <= 1.0 + 1e-6


def test_detector_checkpoint_resume(tmp_path):
    """Orbax save + auto-resume in the detection runner (EpochBasedRunner
    resume analog): a second train_detector call picks up at the saved step
    and ends with the same history tail as an uninterrupted run."""
    model = tiny_rcnn()
    cfg = DetTrainConfig(num_classes=3, base_lr=0.01, lr_mult=0.5, epochs=2,
                         steps_per_epoch=3, warmup_steps=2)
    logs = []
    # run epochs 1-2 with checkpointing
    p1, _, h1 = train_detector(model, cfg, kind="faster_rcnn", image_size=64,
                               batch_size=1, checkpoint_dir=str(tmp_path),
                               log=logs.append)
    # resume: nothing left to do, state restored at final step
    logs2 = []
    p2, _, h2 = train_detector(model, cfg, kind="faster_rcnn", image_size=64,
                               batch_size=1, checkpoint_dir=str(tmp_path),
                               log=logs2.append)
    assert any("auto-resumed" in l for l in logs2)
    import jax
    import numpy as np

    same = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), p1, p2)
    assert max(jax.tree_util.tree_leaves(same)) == 0.0  # no extra steps ran


def test_map_coco_thresholds_hand_case():
    """COCO-standard mAP@[.5:.95] on a hand-computable fixture
    (`mmdet/datasets/coco.py:419` semantics, VERDICT r2 item 3).

    One GT box 10x10; one detection shifted 2px right: overlap 8x10 = 80,
    union 120 -> IoU = 2/3 ~ 0.667. It counts as TP at thresholds
    0.50/0.55/0.60/0.65 (4 of 10) and FP above, so the averaged AP is 0.4
    while AP@0.5 is 1.0.
    """
    gts = [dict(boxes=np.array([[0.0, 0, 10, 10]]), labels=np.array([0]))]
    dets = [dict(boxes=np.array([[2.0, 0, 12, 10]]),
                 scores=np.array([0.9]), classes=np.array([0]))]
    r = mean_average_precision(dets, gts, num_classes=1,
                               iou_thresholds="coco")
    assert r["mAP50"] == pytest.approx(1.0)
    assert r["mAP"] == pytest.approx(0.4)

    # a perfect detection scores 1.0 across the whole threshold range
    perfect = [dict(boxes=np.array([[0.0, 0, 10, 10]]),
                    scores=np.array([0.9]), classes=np.array([0]))]
    rp = mean_average_precision(perfect, gts, num_classes=1,
                                iou_thresholds="coco")
    assert rp["mAP"] == pytest.approx(1.0)

    # explicit threshold list: same machinery
    r2 = mean_average_precision(dets, gts, num_classes=1,
                                iou_thresholds=[0.5, 0.7])
    assert r2["mAP"] == pytest.approx(0.5)  # TP at 0.5, FP at 0.7


def test_forced_assignment_ignores_padded_gt():
    """Padded-invalid GT rows all argmax to anchor 0; they must not steal
    a valid GT's forced assignment there (code-review r3 finding)."""
    from laudnet_tpu.detection.train import (
        assign_targets, box_iou, make_anchors,
    )

    anchors = make_anchors([(4, 4)], [8])
    # GT centered exactly on anchor 0's cell, plus 3 padded slots
    gt_boxes = jnp.asarray([[0.0, 0.0, 9.0, 9.0]] + [[0.0] * 4] * 3)
    gt_labels = jnp.asarray([2, 0, 0, 0], jnp.int32)
    gt_valid = jnp.asarray([1.0, 0.0, 0.0, 0.0])
    cls_t, box_t, pos, ok = assign_targets(
        anchors, gt_boxes, gt_labels, gt_valid, num_classes=3)
    # the valid GT's best anchor is positive and carries class 2
    iou_best = int(jnp.argmax(
        jnp.asarray(box_iou(anchors, gt_boxes[:1]))[:, 0]))
    assert float(pos[iou_best]) == 1.0
    assert float(cls_t[iou_best, 2]) == 1.0  # not overwritten by padding


def test_detection_amp_train_step():
    """amp=True (bf16 towers, f32 masters + f32 predictors): one jitted
    train step gives finite losses, f32 params, and f32 logits (the final
    predictors take no compute dtype, so decode/loss math is unchanged)."""
    from laudnet_tpu.detection.runner import build_detector

    model, kind = build_detector(dict(
        type="FasterRCNN", num_classes=3, backbone_layers=(1, 1, 1, 1),
        dyn_mode=("channel",) * 4, num_proposals=16, sparsity_target=0.5,
        amp=True,
    ))
    assert kind == "faster_rcnn" and model.dtype == jnp.bfloat16
    cfg = DetTrainConfig(num_classes=3, steps_per_epoch=2, epochs=1,
                         warmup_steps=1, base_lr=0.01, lr_mult=0.2)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 3))
    boxes, labels, valid = gt_batch()

    v = model.init({"params": jax.random.PRNGKey(1)}, x, training=False)
    params, bs = v["params"], v.get("batch_stats", {})
    assert all(p.dtype == jnp.float32
               for p in jax.tree_util.tree_leaves(params))
    out = model.apply({"params": params, "batch_stats": bs}, x,
                      training=False)
    assert out["cls_logits"].dtype == jnp.float32

    opt = make_detection_sgd(params, lr_mult=0.2)
    state = (jnp.zeros((), jnp.int32), params, bs, opt.init(params))
    step = jax.jit(make_detector_train_step(model, opt, cfg, kind))
    state, metrics = step(state, x, boxes, labels, valid)
    assert all(np.isfinite(float(v)) for v in metrics.values())
    assert all(p.dtype == jnp.float32
               for p in jax.tree_util.tree_leaves(state[1]))


def test_detection_amp_rejects_detr():
    from laudnet_tpu.detection.runner import build_detector

    with pytest.raises(ValueError, match="DETR"):
        build_detector(dict(type="DETRDetector", num_classes=3, amp=True))
