"""RetinaNet training: anchor matching, focal + box losses, loss_sparse.

Completes the reference's detection finetuning capability
(`mmdetection-2.21.0` configs + patched detectors): the total loss is
``focal + box + loss_sparse`` where ``loss_sparse`` is the LAUD injection
(`two_stage.py:157-159`). Anchor assignment is the standard max-IoU rule
(positive >= 0.5, negative < 0.4, ignore in between) with fixed-size padded
ground truth so everything jits.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from laudnet_tpu.detection.losses import focal_loss, loss_sparse, smooth_l1
from laudnet_tpu.detection.retinanet import make_anchors


def box_iou(a, b):
    """(N, 4) x (M, 4) -> (N, M) IoU."""
    area_a = jnp.maximum(a[:, 2] - a[:, 0], 0) * jnp.maximum(
        a[:, 3] - a[:, 1], 0
    )
    area_b = jnp.maximum(b[:, 2] - b[:, 0], 0) * jnp.maximum(
        b[:, 3] - b[:, 1], 0
    )
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.maximum(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    return inter / jnp.maximum(area_a[:, None] + area_b[None, :] - inter, 1e-9)


def encode_boxes(anchors, boxes):
    """Inverse of decode_boxes: gt boxes -> (dx, dy, dw, dh) targets.

    Widths/heights are clamped away from zero: the "anchors" may be RPN
    proposals, and degenerate (zero-area) padded proposals would otherwise
    produce inf/nan targets that poison the loss even when masked
    (0 * nan = nan)."""
    aw = jnp.maximum(anchors[:, 2] - anchors[:, 0], 1e-6)
    ah = jnp.maximum(anchors[:, 3] - anchors[:, 1], 1e-6)
    ax = anchors[:, 0] + aw / 2
    ay = anchors[:, 1] + ah / 2
    gw = jnp.maximum(boxes[:, 2] - boxes[:, 0], 1e-6)
    gh = jnp.maximum(boxes[:, 3] - boxes[:, 1], 1e-6)
    gx = boxes[:, 0] + gw / 2
    gy = boxes[:, 1] + gh / 2
    return jnp.stack(
        [(gx - ax) / aw, (gy - ay) / ah, jnp.log(gw / aw), jnp.log(gh / ah)],
        axis=-1,
    )


def assign_targets(anchors, gt_boxes, gt_labels, gt_valid, num_classes,
                   pos_iou=0.5, neg_iou=0.4):
    """Max-IoU assignment with padded GT. Returns (cls_onehot, box_targets,
    pos_mask, valid_mask) per anchor. Includes mmdet MaxIoUAssigner's
    low-quality match: every valid GT's best anchor is forced positive, so
    small/extreme-aspect boxes below ``pos_iou`` still train."""
    iou = box_iou(anchors, gt_boxes)  # (A, M)
    iou = jnp.where(gt_valid[None, :] > 0, iou, -1.0)
    best_gt = jnp.argmax(iou, axis=1)
    best_iou = jnp.max(iou, axis=1)

    pos = best_iou >= pos_iou
    best_anchor_per_gt = jnp.argmax(iou, axis=0)  # (M,)
    forced = jnp.zeros(anchors.shape[0], bool).at[best_anchor_per_gt].max(
        gt_valid > 0
    )
    pos = pos | forced
    neg = (best_iou < neg_iou) & ~pos
    valid = pos | neg  # ignore band contributes nothing

    # mmdet MaxIoUAssigner semantics: a forced anchor is assigned to the GT
    # that forced it (not its own argmax GT), so every valid GT gets a
    # dedicated positive even when another GT overlaps its best anchor
    # more. On collisions (two GTs forcing the same anchor) one wins, like
    # mmdet's sequential overwrite. Padded-invalid GT rows all argmax to
    # anchor 0 — route them to an out-of-range index and drop, or they
    # could nondeterministically overwrite a valid GT's assignment there.
    m_idx = jnp.arange(gt_boxes.shape[0])
    safe_anchor = jnp.where(gt_valid > 0, best_anchor_per_gt,
                            anchors.shape[0])
    best_gt = best_gt.at[safe_anchor].set(m_idx, mode="drop")

    labels = gt_labels[best_gt]
    cls_onehot = jax.nn.one_hot(labels, num_classes) * pos[:, None]
    box_targets = encode_boxes(anchors, gt_boxes[best_gt])
    return cls_onehot, box_targets, pos.astype(jnp.float32), valid.astype(
        jnp.float32
    )


def retinanet_loss(outputs: Dict, gt_boxes, gt_labels, gt_valid, *,
                   num_classes: int, sparsity_target: float = 0.5,
                   lambda_sparse: float = 1.0, box_weight: float = 1.0):
    """Full RetinaNet training loss for a batch with padded ground truth.

    ``gt_boxes``: (B, M, 4); ``gt_labels``: (B, M); ``gt_valid``: (B, M)
    0/1. Returns (total_loss, metrics dict) — metrics include ``flops_rate``
    exactly like the reference logs it (`two_stage.py:158`).
    """
    strides = [8, 16, 32, 64, 128]
    anchors = make_anchors(outputs["level_shapes"], strides)

    def per_image(cls_logits, box_deltas, boxes, labels, valid):
        cls_t, box_t, pos, ok = assign_targets(
            anchors, boxes, labels, valid, num_classes
        )
        n_pos = jnp.maximum(pos.sum(), 1.0)
        fl = focal_loss(cls_logits, cls_t) * ok[:, None]
        cls_loss = fl.sum() / n_pos
        bl = smooth_l1(box_deltas, box_t).sum(-1) * pos
        box_loss = bl.sum() / n_pos
        return cls_loss, box_loss

    cls_loss, box_loss = jax.vmap(per_image)(
        outputs["cls_logits"], outputs["box_deltas"],
        gt_boxes, gt_labels, gt_valid,
    )
    cls_loss = cls_loss.mean()
    box_loss = box_loss.mean()
    l_sparse, rate = loss_sparse(outputs["additional"], sparsity_target)
    total = cls_loss + box_weight * box_loss + lambda_sparse * l_sparse
    return total, {
        "loss_cls": cls_loss,
        "loss_box": box_loss,
        "loss_sparse": l_sparse,
        "flops_rate": rate,
    }
