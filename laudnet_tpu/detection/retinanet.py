"""RetinaNet on a LAUD backbone: head, anchors, decode, NMS (static shapes).

The reference runs its LAUD backbones inside vendored mmdetection
(`configs/retinanet/scale_backbone_lr/...`); here the detector is native:
a shared 4-conv class/box tower over FPN P3-P7, A=9 anchors per location,
focal-loss-compatible logits, and fixed-capacity top-k + class-wise NMS
decoding so the whole inference path jits with static shapes.

The detector returns the backbone's ``additional`` stats so
``loss_sparse = (flops / dense_flops - target)^2`` can be injected into the
training loss exactly like the reference patches do
(`single_stage.py:84-93`).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from laudnet_tpu.detection.backbone import LAUDDetBackbone
from laudnet_tpu.detection.fpn import FPN


def make_anchors(level_shapes: Sequence[Tuple[int, int]],
                 strides: Sequence[int],
                 scales=(2**0, 2 ** (1 / 3), 2 ** (2 / 3)),
                 ratios=(0.5, 1.0, 2.0),
                 base_size_factor: float = 4.0):
    """Anchor centers/sizes per FPN level -> (sum HW*A, 4) [x1, y1, x2, y2]."""
    all_anchors = []
    for (h, w), stride in zip(level_shapes, strides):
        base = stride * base_size_factor
        ws, hs = [], []
        for r in ratios:
            for s in scales:
                ws.append(base * s * (1.0 / r) ** 0.5)
                hs.append(base * s * r**0.5)
        ws = jnp.asarray(ws)
        hs = jnp.asarray(hs)
        cx = (jnp.arange(w) + 0.5) * stride
        cy = (jnp.arange(h) + 0.5) * stride
        cx, cy = jnp.meshgrid(cx, cy)
        cx = cx.reshape(-1, 1)
        cy = cy.reshape(-1, 1)
        boxes = jnp.stack(
            [cx - ws / 2, cy - hs / 2, cx + ws / 2, cy + hs / 2], axis=-1
        )  # (HW, A, 4)
        all_anchors.append(boxes.reshape(-1, 4))
    return jnp.concatenate(all_anchors, axis=0)


def decode_boxes(anchors, deltas):
    """Standard (dx, dy, dw, dh) decoding."""
    aw = anchors[:, 2] - anchors[:, 0]
    ah = anchors[:, 3] - anchors[:, 1]
    ax = anchors[:, 0] + aw / 2
    ay = anchors[:, 1] + ah / 2
    dx, dy, dw, dh = (deltas[..., i] for i in range(4))
    cx = ax + dx * aw
    cy = ay + dy * ah
    w = aw * jnp.exp(jnp.clip(dw, -10, 4))
    h = ah * jnp.exp(jnp.clip(dh, -10, 4))
    return jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)


def nms(boxes, scores, iou_threshold: float = 0.5, max_out: int = 100):
    """Static-shape greedy NMS via fori_loop. Returns (keep_idx, keep_valid)."""
    n = boxes.shape[0]
    order = jnp.argsort(-scores)
    boxes = boxes[order]
    scores = scores[order]
    area = jnp.maximum(boxes[:, 2] - boxes[:, 0], 0) * jnp.maximum(
        boxes[:, 3] - boxes[:, 1], 0
    )

    def iou_with(i):
        x1 = jnp.maximum(boxes[i, 0], boxes[:, 0])
        y1 = jnp.maximum(boxes[i, 1], boxes[:, 1])
        x2 = jnp.minimum(boxes[i, 2], boxes[:, 2])
        y2 = jnp.minimum(boxes[i, 3], boxes[:, 3])
        inter = jnp.maximum(x2 - x1, 0) * jnp.maximum(y2 - y1, 0)
        return inter / jnp.maximum(area[i] + area - inter, 1e-9)

    def body(i, alive):
        keep_i = alive[i]
        suppress = (iou_with(i) > iou_threshold) & keep_i
        suppress = suppress.at[i].set(False)
        return alive & ~suppress

    alive = scores > 0
    alive = jax.lax.fori_loop(0, n, body, alive)
    kept_scores = jnp.where(alive, scores, -jnp.inf)
    top = jnp.argsort(-kept_scores)[:max_out]
    return order[top], alive[top]


class RetinaNetHead(nn.Module):
    num_classes: int = 80
    num_anchors: int = 9
    num_convs: int = 4
    channels: int = 256
    param_dtype: Any = jnp.float32
    dtype: Any = None  # AMP compute dtype

    @nn.compact
    def __call__(self, features):
        import math

        cls_outs, box_outs = [], []
        cls_tower = [
            nn.Conv(self.channels, (3, 3), padding=1, name=f"cls_conv_{i}",
                    dtype=self.dtype, param_dtype=self.param_dtype)
            for i in range(self.num_convs)
        ]
        box_tower = [
            nn.Conv(self.channels, (3, 3), padding=1, name=f"box_conv_{i}",
                    dtype=self.dtype, param_dtype=self.param_dtype)
            for i in range(self.num_convs)
        ]
        # focal-loss prior: start with ~1% positive probability.
        # The final predictors take no compute dtype: under AMP their
        # bf16 inputs promote against f32 params, so logits/deltas leave
        # the head in f32 and the decode/loss math downstream stays f32.
        cls_pred = nn.Conv(
            self.num_anchors * self.num_classes, (3, 3), padding=1,
            name="cls_pred",
            bias_init=nn.initializers.constant(-math.log((1 - 0.01) / 0.01)),
            param_dtype=self.param_dtype,
        )
        box_pred = nn.Conv(self.num_anchors * 4, (3, 3), padding=1,
                           name="box_pred", param_dtype=self.param_dtype)
        for f in features:
            c = f
            for conv in cls_tower:
                c = nn.relu(conv(c))
            b = f
            for conv in box_tower:
                b = nn.relu(conv(b))
            n, h, w, _ = f.shape
            cls_outs.append(
                cls_pred(c).reshape(n, h * w * self.num_anchors,
                                    self.num_classes)
            )
            box_outs.append(box_pred(b).reshape(n, h * w * self.num_anchors, 4))
        return (jnp.concatenate(cls_outs, axis=1),
                jnp.concatenate(box_outs, axis=1))


class RetinaNet(nn.Module):
    """LAUD-backboned RetinaNet. ``__call__`` returns raw predictions plus
    the backbone's sparsity stats; :meth:`detect` adds decode + NMS."""

    num_classes: int = 80
    backbone_layers: Sequence[int] = (3, 4, 23, 3)
    dyn_mode: Sequence[str] = ("channel",) * 4
    sparsity_target: float = 0.5
    temperature: float = 0.1
    param_dtype: Any = jnp.float32
    dtype: Any = None  # AMP compute dtype (backbone/FPN/head towers)

    @nn.compact
    def __call__(self, images, *, training: bool = False):
        feats, additional, model_configs = LAUDDetBackbone(
            layers=self.backbone_layers,
            out_indices=(1, 2, 3),  # C3-C5 for RetinaNet
            dyn_mode=self.dyn_mode,
            temperature=self.temperature,
            sparsity_target=self.sparsity_target,
            name="backbone",
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(images, training=training)
        pyramid = FPN(name="neck", dtype=self.dtype,
                      param_dtype=self.param_dtype)(feats)
        cls_logits, box_deltas = RetinaNetHead(
            num_classes=self.num_classes, name="bbox_head",
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(pyramid)
        level_shapes = [(p.shape[1], p.shape[2]) for p in pyramid]
        return {
            "cls_logits": cls_logits,
            "box_deltas": box_deltas,
            "level_shapes": level_shapes,
            "additional": additional,
            "model_configs": model_configs,
        }

    @staticmethod
    def detect(outputs, image_size, score_threshold=0.05, iou_threshold=0.5,
               max_detections=100, pre_nms_topk=1000):
        """Decode + per-image NMS (class-agnostic-scored, static shapes).
        Returns dict of (B, max_detections) boxes/scores/classes/valid."""
        strides = [8, 16, 32, 64, 128]
        anchors = make_anchors(outputs["level_shapes"], strides)
        probs = jax.nn.sigmoid(outputs["cls_logits"])  # (B, N, C)
        pre_nms_topk = min(pre_nms_topk, probs.shape[1])
        img_h, img_w = ((image_size, image_size)
                        if isinstance(image_size, (int, float))
                        else tuple(image_size))

        def per_image(p, deltas):
            best_c = jnp.argmax(p, axis=-1)
            best_s = jnp.max(p, axis=-1)
            top_s, top_i = jax.lax.top_k(best_s, pre_nms_topk)
            boxes = decode_boxes(anchors[top_i], deltas[top_i])
            boxes = jnp.stack(
                [jnp.clip(boxes[:, 0], 0, img_w),
                 jnp.clip(boxes[:, 1], 0, img_h),
                 jnp.clip(boxes[:, 2], 0, img_w),
                 jnp.clip(boxes[:, 3], 0, img_h)], axis=-1,
            )
            valid_s = jnp.where(top_s > score_threshold, top_s, 0.0)
            keep, alive = nms(boxes, valid_s, iou_threshold, max_detections)
            return {
                "boxes": boxes[keep],
                "scores": valid_s[keep] * alive,
                "classes": best_c[top_i][keep],
                "valid": alive,
            }

        return jax.vmap(per_image)(probs, outputs["box_deltas"])
