"""Two-stage (Faster/Mask-RCNN) training losses on the LAUD backbone.

Completes the reference's COCO finetuning path
(`mmdetection-2.21.0/mmdet/models/detectors/two_stage.py:130-161`): RPN
objectness+box loss, RoI classification+box loss, optional mask loss, plus
the LAUD ``loss_sparse`` injection — all static-shape and jittable.

TPU-native redesign notes (deliberate divergences from mmdet, documented):

* mmdet randomly subsamples 256 anchors / 512 proposals per image; random
  gather with dynamic positive counts doesn't jit. Here every anchor and
  proposal contributes through 0/1 weight masks normalized by the positive
  count — the standard TPU detection formulation (same expectation, no
  sampling variance).
* GT boxes are injected into the proposal set by the model
  (`two_stage.py::FasterRCNN`), mirroring mmdet's add_gt_as_proposals.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from laudnet_tpu.detection.losses import loss_sparse, smooth_l1
from laudnet_tpu.detection.train import box_iou, encode_boxes


def rpn_assign(anchors, gt_boxes, gt_valid, pos_iou=0.7, neg_iou=0.3):
    """Class-agnostic RPN assignment: pos at IoU>=0.7 OR best anchor per GT,
    neg below 0.3, ignore in between (mmdet RPN defaults)."""
    iou = box_iou(anchors, gt_boxes)  # (A, M)
    iou = jnp.where(gt_valid[None, :] > 0, iou, -1.0)
    best_gt = jnp.argmax(iou, axis=1)
    best_iou = jnp.max(iou, axis=1)

    pos = best_iou >= pos_iou
    # best anchor for every valid GT is positive (low-quality matches);
    # scatter with .max so a padded GT (argmax lands on anchor 0) can never
    # clobber a valid GT's forced True via duplicate-index scatter
    best_anchor_per_gt = jnp.argmax(iou, axis=0)  # (M,)
    forced = jnp.zeros(anchors.shape[0], bool).at[best_anchor_per_gt].max(
        gt_valid > 0
    )
    pos = pos | forced
    neg = (best_iou < neg_iou) & ~pos
    return best_gt, pos, neg


def rpn_loss(obj_logits, box_deltas, anchors, gt_boxes, gt_valid):
    """Per-batch RPN loss: BCE objectness over pos+neg anchors, smooth-L1
    box regression over positives."""

    def per_image(obj_i, reg_i, boxes, valid):
        best_gt, pos, neg = rpn_assign(anchors, boxes, valid)
        posf = pos.astype(jnp.float32)
        ok = (pos | neg).astype(jnp.float32)
        n_pos = jnp.maximum(posf.sum(), 1.0)
        n_ok = jnp.maximum(ok.sum(), 1.0)
        bce = -(
            posf * jax.nn.log_sigmoid(obj_i)
            + (1.0 - posf) * jax.nn.log_sigmoid(-obj_i)
        )
        cls_loss = (bce * ok).sum() / n_ok
        targets = encode_boxes(anchors, boxes[best_gt])
        box_loss = (smooth_l1(reg_i, targets).sum(-1) * posf).sum() / n_pos
        return cls_loss, box_loss

    cls, box = jax.vmap(per_image)(obj_logits, box_deltas, gt_boxes, gt_valid)
    return cls.mean(), box.mean()


def roi_assign(proposals, prop_valid, gt_boxes, gt_labels, gt_valid,
               num_classes, pos_iou=0.5):
    """Assign each proposal to a GT (pos at IoU>=0.5) or background
    (label = num_classes). Returns (labels, box_targets, pos, ok)."""
    iou = box_iou(proposals, gt_boxes)
    iou = jnp.where(gt_valid[None, :] > 0, iou, -1.0)
    best_gt = jnp.argmax(iou, axis=1)
    best_iou = jnp.max(iou, axis=1)
    pos = (best_iou >= pos_iou) & (prop_valid > 0)
    labels = jnp.where(pos, gt_labels[best_gt], num_classes)  # bg = K
    box_targets = encode_boxes(proposals, gt_boxes[best_gt])
    return best_gt, labels, box_targets, pos.astype(jnp.float32), \
        (prop_valid > 0).astype(jnp.float32)


def crop_gt_mask(gt_mask, box, out_size: int):
    """Bilinear-crop a full-image binary GT mask (H, W) to the ``box``
    region at out_size x out_size — the mask head's training target
    (mmdet crops GT masks to positive proposals the same way)."""
    h, w = gt_mask.shape
    bw = jnp.maximum(box[2] - box[0], 1e-6)
    bh = jnp.maximum(box[3] - box[1], 1e-6)
    ys = box[1] + (jnp.arange(out_size) + 0.5) / out_size * bh
    xs = box[0] + (jnp.arange(out_size) + 0.5) / out_size * bw
    y0 = jnp.clip(jnp.floor(ys - 0.5), 0, h - 1)
    x0 = jnp.clip(jnp.floor(xs - 0.5), 0, w - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    wy = jnp.clip(ys - 0.5 - y0, 0, 1)
    wx = jnp.clip(xs - 0.5 - x0, 0, 1)
    g = gt_mask.astype(jnp.float32)
    y0i, y1i = y0.astype(jnp.int32), y1.astype(jnp.int32)
    x0i, x1i = x0.astype(jnp.int32), x1.astype(jnp.int32)
    v00 = g[y0i[:, None], x0i[None, :]]
    v01 = g[y0i[:, None], x1i[None, :]]
    v10 = g[y1i[:, None], x0i[None, :]]
    v11 = g[y1i[:, None], x1i[None, :]]
    wy_, wx_ = wy[:, None], wx[None, :]
    return ((1 - wy_) * (1 - wx_) * v00 + (1 - wy_) * wx_ * v01
            + wy_ * (1 - wx_) * v10 + wy_ * wx_ * v11)


def faster_rcnn_loss(outputs: Dict, gt_boxes, gt_labels, gt_valid, *,
                     num_classes: int, gt_masks=None,
                     sparsity_target: float = 0.5,
                     lambda_sparse: float = 1.0):
    """Full Faster-RCNN (+ mask) training loss for a batch of padded GT.

    ``outputs`` is ``FasterRCNN.__call__``'s dict (training mode, GT boxes
    injected). ``gt_masks`` (B, M, H, W) 0/1 enables the Mask-RCNN term.
    Returns (total, metrics incl. ``flops_rate`` like the reference logs,
    `two_stage.py:158`).
    """
    rpn_cls, rpn_box = rpn_loss(outputs["rpn_obj"], outputs["rpn_reg"],
                                outputs["anchors"], gt_boxes, gt_valid)

    def per_image(props, pvalid, cls_logits, deltas, boxes, labels, valid):
        best_gt, lab, box_t, pos, ok = roi_assign(
            props, pvalid, boxes, labels, valid, num_classes
        )
        n_pos = jnp.maximum(pos.sum(), 1.0)
        n_ok = jnp.maximum(ok.sum(), 1.0)
        logp = jax.nn.log_softmax(cls_logits, axis=-1)
        ce = -jnp.take_along_axis(logp, lab[:, None], axis=-1)[:, 0]
        cls_loss = (ce * ok).sum() / n_ok
        box_loss = (smooth_l1(deltas, box_t).sum(-1) * pos).sum() / n_pos
        return cls_loss, box_loss, best_gt, pos

    roi_cls, roi_box, best_gt, pos = jax.vmap(per_image)(
        outputs["proposals"], outputs["proposal_valid"],
        outputs["cls_logits"], outputs["box_deltas"],
        gt_boxes, gt_labels, gt_valid,
    )
    roi_cls, roi_box = roi_cls.mean(), roi_box.mean()

    metrics = {
        "loss_rpn_cls": rpn_cls,
        "loss_rpn_box": rpn_box,
        "loss_cls": roi_cls,
        "loss_box": roi_box,
    }
    total = rpn_cls + rpn_box + roi_cls + roi_box

    if gt_masks is not None and "mask_logits" in outputs:
        out_size = outputs["mask_logits"].shape[2]

        def mask_per_image(mask_logits, props, boxes_gt_masks, best, labels,
                           posw):
            def one(logits, box, gi, w):
                target = crop_gt_mask(boxes_gt_masks[gi], box, out_size)
                cls_i = labels[gi]
                lg = logits[:, :, cls_i]
                bce = -(
                    target * jax.nn.log_sigmoid(lg)
                    + (1 - target) * jax.nn.log_sigmoid(-lg)
                )
                return bce.mean() * w

            losses = jax.vmap(one)(mask_logits, props, best, posw)
            return losses.sum() / jnp.maximum(posw.sum(), 1.0)

        mloss = jax.vmap(mask_per_image)(
            outputs["mask_logits"], outputs["proposals"], gt_masks,
            best_gt, gt_labels, pos,
        ).mean()
        metrics["loss_mask"] = mloss
        total = total + mloss

    l_sparse, rate = loss_sparse(outputs["additional"], sparsity_target)
    metrics["loss_sparse"] = l_sparse
    metrics["flops_rate"] = rate
    return total + lambda_sparse * l_sparse, metrics
