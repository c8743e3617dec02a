"""Two-stage detectors on a LAUD backbone: Faster-RCNN / Mask-RCNN inference.

Static-shape TPU re-design of the reference's mmdet two-stage path
(`mmdetection-2.21.0/mmdet/models/detectors/two_stage.py:66-195`): the RPN
proposes a fixed number of boxes (global top-k + NMS with padding), RoIAlign
samples fixed 7x7 (14x14 for masks) grids with FPN level assignment done by
weighted selection across levels (compute-all-select-one — branch-free under
jit), and the box/mask heads run on the padded proposal set. ``loss_sparse``
uses the backbone's ``additional`` stats exactly like the reference's
patched detectors.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from laudnet_tpu.detection.backbone import LAUDDetBackbone
from laudnet_tpu.detection.fpn import FPN
from laudnet_tpu.detection.retinanet import decode_boxes, make_anchors, nms


def clip_boxes_to_image(boxes, img_h: int, img_w: int):
    """Clip xyxy boxes per-axis: x coords to [0, W], y coords to [0, H]."""
    return jnp.stack(
        [
            jnp.clip(boxes[..., 0], 0, img_w),
            jnp.clip(boxes[..., 1], 0, img_h),
            jnp.clip(boxes[..., 2], 0, img_w),
            jnp.clip(boxes[..., 3], 0, img_h),
        ],
        axis=-1,
    )


def roi_align(features: Sequence[jnp.ndarray], boxes: jnp.ndarray,
              strides: Sequence[int], out_size: int = 7):
    """RoIAlign over an FPN pyramid (single image).

    ``features``: list of (H_l, W_l, C); ``boxes``: (N, 4) xyxy in image
    coords. Each box samples an ``out_size`` x ``out_size`` grid (one sample
    per bin, bilinear) from every level, then selects its FPN level by the
    standard assignment rule — branch-free and fully static.
    Returns (N, out_size, out_size, C).
    """
    n = boxes.shape[0]
    w = jnp.maximum(boxes[:, 2] - boxes[:, 0], 1e-6)
    h = jnp.maximum(boxes[:, 3] - boxes[:, 1], 1e-6)
    target_level = jnp.clip(
        jnp.floor(4 + jnp.log2(jnp.sqrt(w * h) / 224.0 + 1e-9)),
        2, 2 + len(features) - 1,
    ).astype(jnp.int32)  # FPN paper convention: P2..P5(+)

    # bin-center sampling grid in image coordinates
    ys = boxes[:, 1, None] + (jnp.arange(out_size) + 0.5) / out_size * h[:, None]
    xs = boxes[:, 0, None] + (jnp.arange(out_size) + 0.5) / out_size * w[:, None]

    def sample_level(feat, stride):
        fh, fw, c = feat.shape
        y = ys / stride - 0.5  # (N, S)
        x = xs / stride - 0.5
        y0 = jnp.clip(jnp.floor(y), 0, fh - 1)
        x0 = jnp.clip(jnp.floor(x), 0, fw - 1)
        y1 = jnp.clip(y0 + 1, 0, fh - 1)
        x1 = jnp.clip(x0 + 1, 0, fw - 1)
        wy = jnp.clip(y - y0, 0, 1)
        wx = jnp.clip(x - x0, 0, 1)
        y0i, y1i = y0.astype(jnp.int32), y1.astype(jnp.int32)
        x0i, x1i = x0.astype(jnp.int32), x1.astype(jnp.int32)

        def gather(yi, xi):
            # (N, S, S, C) via advanced indexing
            return feat[yi[:, :, None], xi[:, None, :], :]

        v00 = gather(y0i, x0i)
        v01 = gather(y0i, x1i)
        v10 = gather(y1i, x0i)
        v11 = gather(y1i, x1i)
        wy_ = wy[:, :, None, None]
        wx_ = wx[:, None, :, None]
        return ((1 - wy_) * (1 - wx_) * v00 + (1 - wy_) * wx_ * v01
                + wy_ * (1 - wx_) * v10 + wy_ * wx_ * v11)

    out = jnp.zeros((n, out_size, out_size, features[0].shape[-1]),
                    features[0].dtype)
    for i, (feat, stride) in enumerate(zip(features, strides)):
        sampled = sample_level(feat, stride)
        sel = (target_level == i + 2)[:, None, None, None]
        out = jnp.where(sel, sampled, out)
    return out


class RPNHead(nn.Module):
    num_anchors: int = 3
    channels: int = 256
    param_dtype: Any = jnp.float32
    dtype: Any = None  # AMP compute dtype (tower only; obj/reg exit f32)

    @nn.compact
    def __call__(self, pyramid):
        conv = nn.Conv(self.channels, (3, 3), padding=1, name="conv",
                       dtype=self.dtype, param_dtype=self.param_dtype)
        obj = nn.Conv(self.num_anchors, (1, 1), name="obj",
                      param_dtype=self.param_dtype)
        reg = nn.Conv(self.num_anchors * 4, (1, 1), name="reg",
                      param_dtype=self.param_dtype)
        objs, regs = [], []
        for f in pyramid:
            h = nn.relu(conv(f))
            n, hh, ww, _ = f.shape
            objs.append(obj(h).reshape(n, hh * ww * self.num_anchors))
            regs.append(reg(h).reshape(n, hh * ww * self.num_anchors, 4))
        return jnp.concatenate(objs, 1), jnp.concatenate(regs, 1)


class BoxHead(nn.Module):
    num_classes: int = 80
    hidden: int = 1024
    param_dtype: Any = jnp.float32
    dtype: Any = None  # AMP compute dtype (fc tower; cls/reg exit f32)

    @nn.compact
    def __call__(self, rois):  # (N, 7, 7, C)
        x = rois.reshape(rois.shape[0], -1)
        x = nn.relu(nn.Dense(self.hidden, name="fc1", dtype=self.dtype,
                             param_dtype=self.param_dtype)(x))
        x = nn.relu(nn.Dense(self.hidden, name="fc2", dtype=self.dtype,
                             param_dtype=self.param_dtype)(x))
        cls = nn.Dense(self.num_classes + 1, name="cls",
                       param_dtype=self.param_dtype)(x)
        reg = nn.Dense(4, name="reg", param_dtype=self.param_dtype)(x)
        return cls, reg


class MaskHead(nn.Module):
    num_classes: int = 80
    channels: int = 256
    param_dtype: Any = jnp.float32
    dtype: Any = None  # AMP compute dtype (convs; pred exits f32)

    @nn.compact
    def __call__(self, rois):  # (N, 14, 14, C)
        x = rois
        for i in range(4):
            x = nn.relu(nn.Conv(self.channels, (3, 3), padding=1,
                                name=f"conv_{i}", dtype=self.dtype,
                                param_dtype=self.param_dtype)(x))
        x = nn.ConvTranspose(self.channels, (2, 2), strides=(2, 2),
                             name="deconv", dtype=self.dtype,
                             param_dtype=self.param_dtype)(x)
        x = nn.relu(x)
        return nn.Conv(self.num_classes, (1, 1), name="pred",
                       param_dtype=self.param_dtype)(x)  # (N, 28, 28, K)


class FasterRCNN(nn.Module):
    """Faster-RCNN (``with_masks=True`` -> Mask-RCNN) on a LAUD backbone."""

    num_classes: int = 80
    backbone_layers: Sequence[int] = (3, 4, 23, 3)
    dyn_mode: Sequence[str] = ("channel",) * 4
    sparsity_target: float = 0.5
    temperature: float = 0.1
    num_proposals: int = 256
    with_masks: bool = False
    param_dtype: Any = jnp.float32
    # AMP compute dtype: backbone/FPN/head towers in bf16, gating heads
    # and every final predictor (obj/reg/cls/mask logits) exit f32, so
    # proposal decode, matching and losses run f32 unchanged.
    dtype: Any = None

    @nn.compact
    def __call__(self, images, *, training: bool = False, gt_boxes=None,
                 gt_valid=None):
        """``gt_boxes``/``gt_valid`` (training only): padded ground truth
        appended into the proposal set (overwriting the lowest-scored
        slots), the standard two-stage trick that guarantees the RoI head
        sees positives from step one (mmdet's sampler adds GT the same
        way)."""
        feats, additional, model_configs = LAUDDetBackbone(
            layers=self.backbone_layers,
            out_indices=(0, 1, 2, 3),
            dyn_mode=self.dyn_mode,
            temperature=self.temperature,
            sparsity_target=self.sparsity_target,
            name="backbone", dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(images, training=training)
        pyramid = FPN(num_extra_levels=1, name="neck", dtype=self.dtype,
                      param_dtype=self.param_dtype)(feats)  # P2..P6
        strides = [4, 8, 16, 32, 64]

        obj, reg = RPNHead(name="rpn_head", dtype=self.dtype,
                           param_dtype=self.param_dtype)(pyramid)
        level_shapes = [(p.shape[1], p.shape[2]) for p in pyramid]
        anchors = make_anchors(level_shapes, strides,
                               scales=(8.0,), ratios=(0.5, 1.0, 2.0),
                               base_size_factor=1.0)

        img_h, img_w = images.shape[1], images.shape[2]

        def propose(obj_i, reg_i):
            scores = jax.nn.sigmoid(obj_i)
            top_s, top_i = jax.lax.top_k(scores, min(1000, scores.shape[0]))
            boxes = decode_boxes(anchors[top_i], reg_i[top_i])
            boxes = clip_boxes_to_image(boxes, img_h, img_w)
            keep, alive = nms(boxes, top_s, 0.7, self.num_proposals)
            return boxes[keep], alive

        proposals, valid = jax.vmap(propose)(obj, reg)  # (B, P, 4)
        # The RoI branch must not backprop through proposal coordinates
        # (mmdet detaches RPN proposals the same way).
        proposals = jax.lax.stop_gradient(proposals)
        if training and gt_boxes is not None and gt_boxes.shape[1] > 0:
            # (m == 0 would make proposals[:, :-m] == [:, :0] and silently
            # discard every proposal)
            m = gt_boxes.shape[1]
            gv = (gt_valid if gt_valid is not None
                  else jnp.ones(gt_boxes.shape[:2], proposals.dtype))
            proposals = jnp.concatenate(
                [proposals[:, : -m], gt_boxes.astype(proposals.dtype)], axis=1
            )
            valid = jnp.concatenate(
                [valid[:, : -m], gv.astype(valid.dtype)], axis=1
            )

        def extract(feats_i, boxes_i):
            return roi_align([f for f in feats_i], boxes_i, strides[:4], 7)

        rois = jax.vmap(extract)(
            [p for p in pyramid[:4]], proposals
        )  # (B, P, 7, 7, C)
        b, p_ = rois.shape[:2]
        cls, reg2 = BoxHead(num_classes=self.num_classes, name="box_head",
                            dtype=self.dtype,
                            param_dtype=self.param_dtype)(
            rois.reshape(b * p_, 7, 7, rois.shape[-1])
        )
        cls = cls.reshape(b, p_, -1)
        reg2 = reg2.reshape(b, p_, 4)

        out = {
            "proposals": proposals,
            "proposal_valid": valid,
            "cls_logits": cls,
            "box_deltas": reg2,
            "additional": additional,
            "model_configs": model_configs,
            "image_hw": (img_h, img_w),
            # raw RPN outputs + anchors for the RPN training loss
            "rpn_obj": obj,
            "rpn_reg": reg,
            "anchors": anchors,
        }
        if self.with_masks:
            # Training pools mask RoIs on the (GT-augmented) proposals the
            # mask loss is matched against; inference pools on the
            # delta-REFINED boxes — Mask-RCNN's simple_test re-pools the
            # mask head on final boxes, so the pasted mask's geometry
            # matches the reported detection box exactly.
            mask_boxes = proposals
            if not training:
                mask_boxes = jax.vmap(
                    lambda bx, dx: clip_boxes_to_image(
                        decode_boxes(bx, dx), img_h, img_w)
                )(proposals, reg2)
            mask_rois = jax.vmap(
                lambda f, bx: roi_align([x for x in f], bx, strides[:4], 14)
            )([p for p in pyramid[:4]], mask_boxes)
            masks = MaskHead(num_classes=self.num_classes, name="mask_head",
                             dtype=self.dtype,
                             param_dtype=self.param_dtype)(
                mask_rois.reshape(b * p_, 14, 14, mask_rois.shape[-1])
            )
            out["mask_logits"] = masks.reshape(
                b, p_, masks.shape[1], masks.shape[2], self.num_classes
            )
        return out

    @staticmethod
    def detect(outputs, score_threshold=0.05, max_detections=100):
        """Final per-image classification of proposals (softmax over K+1,
        background dropped), box refinement, score threshold."""
        probs = jax.nn.softmax(outputs["cls_logits"], axis=-1)[..., :-1]
        best_c = jnp.argmax(probs, axis=-1)
        best_s = jnp.max(probs, axis=-1) * outputs["proposal_valid"]

        img_h, img_w = outputs["image_hw"]
        max_detections = min(max_detections, outputs["proposals"].shape[1])

        def per_image(boxes, deltas, scores, classes):
            refined = clip_boxes_to_image(
                decode_boxes(boxes, deltas), img_h, img_w
            )
            # second-stage NMS on the REFINED boxes: box refinement
            # collapses near-duplicate proposals onto the same object, and
            # without suppression every duplicate would count as a false
            # positive downstream
            keep, alive = nms(refined, scores, 0.5, max_detections)
            kept_s = scores[keep] * alive
            return {
                "boxes": refined[keep],
                "scores": jnp.where(kept_s > score_threshold, kept_s, 0.0),
                "classes": classes[keep],
                # proposal index of each detection — lets callers gather
                # the matching mask_logits for segm evaluation
                "indices": keep,
            }

        return jax.vmap(per_image)(
            outputs["proposals"], outputs["box_deltas"], best_s, best_c
        )
