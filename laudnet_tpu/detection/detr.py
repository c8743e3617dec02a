"""DETR-family detector on a LAUD backbone (DDQ-DETR / Mask2Former shape).

Reference analog: `mmdetection-3.3.0/mmdet/models/detectors/base_detr.py`
whose patched ``loss()`` injects the LAUD ``loss_sparse`` term
(`base_detr.py:123-132`) and whose ``extract_feat`` returns the
``(features, additional, model_configs)`` triple (`base_detr.py:275-278`);
the Mask2Former variant does the same in `detectors/maskformer.py:64-70`.
This module proves that backbone contract generalizes beyond dense heads:
a multi-scale deformable-free transformer encoder/decoder consumes the LAUD
features, set-prediction losses ride next to ``loss_sparse``.

TPU-native design: fixed query count, fixed token counts per level (static
shapes), bipartite matching via the exact Hungarian algorithm executed
through ``jax.pure_callback`` (cost matrices are tiny: Q x M), everything
else jitted. Query-mask prediction (``with_masks``) follows Mask2Former's
per-query mask-embedding dot pixel-features formulation.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from laudnet_tpu.detection.backbone import LAUDDetBackbone
from laudnet_tpu.detection.losses import loss_sparse


class TransformerLayer(nn.Module):
    dim: int = 256
    heads: int = 8
    mlp_dim: int = 1024
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, q, kv=None):
        """Self-attention when kv is None, else cross-attention."""
        y = nn.LayerNorm(param_dtype=self.param_dtype, name="norm1")(q)
        kv_in = y if kv is None else kv
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, param_dtype=self.param_dtype, name="attn"
        )(y, kv_in)
        q = q + y
        y = nn.LayerNorm(param_dtype=self.param_dtype, name="norm2")(q)
        y = nn.Dense(self.mlp_dim, param_dtype=self.param_dtype,
                     name="fc1")(y)
        y = nn.gelu(y)
        y = nn.Dense(self.dim, param_dtype=self.param_dtype, name="fc2")(y)
        return q + y


class DETRDetector(nn.Module):
    """Encoder/decoder set-prediction detector over LAUD features.

    Boxes are predicted as sigmoid (cx, cy, w, h) in [0,1] image-normalized
    coordinates (DETR convention). ``with_masks`` adds Mask2Former-style
    per-query masks (query embedding . pixel features on the finest level).
    """

    num_classes: int = 80
    num_queries: int = 100
    dim: int = 256
    enc_layers: int = 3
    dec_layers: int = 3
    backbone_layers: Sequence[int] = (3, 4, 23, 3)
    dyn_mode: Sequence[str] = ("channel",) * 4
    out_indices: Sequence[int] = (1, 2, 3)  # DDQ config: `ddq-...py:17-36`
    sparsity_target: float = 0.5
    temperature: float = 0.1
    with_masks: bool = False
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images, *, training: bool = False):
        feats, additional, model_configs = LAUDDetBackbone(
            layers=self.backbone_layers,
            out_indices=tuple(self.out_indices),
            dyn_mode=self.dyn_mode,
            temperature=self.temperature,
            sparsity_target=self.sparsity_target,
            name="backbone", param_dtype=self.param_dtype,
        )(images, training=training)

        b = images.shape[0]
        tokens = []
        level_embed = self.param(
            "level_embed", jax.nn.initializers.normal(0.02),
            (len(feats), self.dim), self.param_dtype,
        )
        pixel_feat = None
        for i, f in enumerate(feats):
            t = nn.Conv(self.dim, (1, 1), name=f"input_proj_{i}",
                        param_dtype=self.param_dtype)(f)
            if i == 0:
                pixel_feat = t  # finest level for mask prediction
            hh, ww = t.shape[1], t.shape[2]
            pos = self.param(
                f"pos_embed_{i}", jax.nn.initializers.normal(0.02),
                (1, hh, ww, self.dim), self.param_dtype,
            )
            tokens.append((t + pos).reshape(b, hh * ww, self.dim)
                          + level_embed[i])
        x = jnp.concatenate(tokens, axis=1)  # (B, sum_l H_l*W_l, D)

        for i in range(self.enc_layers):
            x = TransformerLayer(dim=self.dim, name=f"enc_{i}",
                                 param_dtype=self.param_dtype)(x)

        queries = self.param(
            "query_embed", jax.nn.initializers.normal(0.02),
            (1, self.num_queries, self.dim), self.param_dtype,
        )
        q = jnp.broadcast_to(queries, (b, self.num_queries, self.dim))
        for i in range(self.dec_layers):
            q = TransformerLayer(dim=self.dim, name=f"dec_self_{i}",
                                 param_dtype=self.param_dtype)(q)
            q = TransformerLayer(dim=self.dim, name=f"dec_cross_{i}",
                                 param_dtype=self.param_dtype)(q, x)
        q = nn.LayerNorm(name="dec_norm", param_dtype=self.param_dtype)(q)

        cls_logits = nn.Dense(self.num_classes + 1, name="cls_head",
                              param_dtype=self.param_dtype)(q)
        h = nn.relu(nn.Dense(self.dim, name="box_fc1",
                             param_dtype=self.param_dtype)(q))
        h = nn.relu(nn.Dense(self.dim, name="box_fc2",
                             param_dtype=self.param_dtype)(h))
        boxes = jax.nn.sigmoid(
            nn.Dense(4, name="box_head", param_dtype=self.param_dtype)(h)
        )  # (B, Q, 4) normalized cxcywh

        out = {
            "cls_logits": cls_logits,
            "boxes_cxcywh": boxes,
            "additional": additional,
            "model_configs": model_configs,
        }
        if self.with_masks:
            # Mask2Former-style: per-query mask embedding . pixel features
            membed = nn.Dense(self.dim, name="mask_embed",
                              param_dtype=self.param_dtype)(q)  # (B,Q,D)
            out["mask_logits"] = jnp.einsum(
                "bqd,bhwd->bqhw", membed, pixel_feat
            )
        return out


# --- set-prediction loss ------------------------------------------------------

def cxcywh_to_xyxy(b):
    cx, cy, w, h = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)


def generalized_iou(a_xyxy, b_xyxy):
    """(..., 4) pairwise-free gIoU of aligned boxes."""
    ax0, ay0, ax1, ay1 = (a_xyxy[..., i] for i in range(4))
    bx0, by0, bx1, by1 = (b_xyxy[..., i] for i in range(4))
    area_a = jnp.maximum(ax1 - ax0, 0) * jnp.maximum(ay1 - ay0, 0)
    area_b = jnp.maximum(bx1 - bx0, 0) * jnp.maximum(by1 - by0, 0)
    ix0, iy0 = jnp.maximum(ax0, bx0), jnp.maximum(ay0, by0)
    ix1, iy1 = jnp.minimum(ax1, bx1), jnp.minimum(ay1, by1)
    inter = jnp.maximum(ix1 - ix0, 0) * jnp.maximum(iy1 - iy0, 0)
    union = jnp.maximum(area_a + area_b - inter, 1e-9)
    iou = inter / union
    ex0, ey0 = jnp.minimum(ax0, bx0), jnp.minimum(ay0, by0)
    ex1, ey1 = jnp.maximum(ax1, bx1), jnp.maximum(ay1, by1)
    enclose = jnp.maximum(ex1 - ex0, 0) * jnp.maximum(ey1 - ey0, 0)
    return iou - (enclose - union) / jnp.maximum(enclose, 1e-9)


def hungarian_match(cost):
    """Exact bipartite matching via scipy through pure_callback.

    ``cost``: (B, Q, M). Returns (B, M) int32: the query assigned to each
    GT slot (garbage for invalid slots — mask downstream). Requires
    M <= Q: with more GT slots than queries, linear_sum_assignment leaves
    some columns unmatched and they would all alias query 0, producing
    duplicate scatter indices downstream."""
    if cost.shape[2] > cost.shape[1]:
        raise ValueError(
            f"hungarian_match needs num_queries >= max GT slots; got "
            f"Q={cost.shape[1]} < M={cost.shape[2]} — raise num_queries or "
            f"shrink the GT padding"
        )

    def host_match(c):
        from scipy.optimize import linear_sum_assignment

        out = np.zeros(c.shape[:1] + c.shape[2:3], np.int32)
        for b in range(c.shape[0]):
            rows, cols = linear_sum_assignment(c[b])
            # rows: query idx, cols: gt idx
            out[b][cols] = rows
        return out

    shape = jax.ShapeDtypeStruct((cost.shape[0], cost.shape[2]), jnp.int32)
    return jax.pure_callback(host_match, shape, cost, vmap_method="sequential")


def detr_loss(outputs, gt_boxes_xyxy, gt_labels, gt_valid, *,
              num_classes: int, image_size: float, gt_masks=None,
              sparsity_target: float = 0.5, lambda_sparse: float = 1.0,
              cls_weight: float = 1.0, l1_weight: float = 5.0,
              giou_weight: float = 2.0, no_object_weight: float = 0.1):
    """DETR set-prediction loss + the LAUD loss_sparse injection
    (`base_detr.py:123-132`). GT boxes arrive xyxy in pixels; normalized
    internally. Returns (total, metrics)."""
    cls_logits = outputs["cls_logits"]  # (B, Q, K+1)
    pred_cxcywh = outputs["boxes_cxcywh"]
    b, qn, _ = cls_logits.shape
    m = gt_boxes_xyxy.shape[1]

    gt_norm = gt_boxes_xyxy / image_size
    gt_cxcywh = jnp.stack(
        [
            (gt_norm[..., 0] + gt_norm[..., 2]) / 2,
            (gt_norm[..., 1] + gt_norm[..., 3]) / 2,
            jnp.maximum(gt_norm[..., 2] - gt_norm[..., 0], 1e-6),
            jnp.maximum(gt_norm[..., 3] - gt_norm[..., 1], 1e-6),
        ],
        -1,
    )

    # matching cost (B, Q, M): -p(class) + L1 + (1 - gIoU)
    logp = jax.nn.log_softmax(cls_logits, -1)
    cost_cls = -jnp.take_along_axis(
        jnp.broadcast_to(logp[:, :, None, :], (b, qn, m, logp.shape[-1])),
        jnp.broadcast_to(gt_labels[:, None, :, None], (b, qn, m, 1)),
        axis=-1,
    )[..., 0]
    l1 = jnp.abs(pred_cxcywh[:, :, None, :] - gt_cxcywh[:, None, :, :]).sum(-1)
    giou = generalized_iou(
        cxcywh_to_xyxy(pred_cxcywh)[:, :, None, :],
        cxcywh_to_xyxy(gt_cxcywh)[:, None, :, :],
    )
    cost = cls_weight * cost_cls + l1_weight * l1 + giou_weight * (1 - giou)
    cost = jnp.where(gt_valid[:, None, :] > 0, cost, 1e6)
    # matching is non-differentiable: cut the gradient BEFORE the callback
    # (pure_callback has no JVP rule)
    match = hungarian_match(jax.lax.stop_gradient(cost))  # (B, M)

    bidx = jnp.arange(b)[:, None]
    matched_logits = cls_logits[bidx, match]  # (B, M, K+1)
    matched_boxes = pred_cxcywh[bidx, match]

    # classification: matched queries -> gt label; all others -> no-object
    target_cls = jnp.full((b, qn), num_classes, jnp.int32)
    target_cls = target_cls.at[bidx, match].set(
        jnp.where(gt_valid > 0, gt_labels, num_classes)
    )
    weights = jnp.full((b, qn), no_object_weight)
    weights = weights.at[bidx, match].set(
        jnp.where(gt_valid > 0, 1.0, no_object_weight)
    )
    logp_all = jax.nn.log_softmax(cls_logits, -1)
    ce = -jnp.take_along_axis(logp_all, target_cls[..., None], -1)[..., 0]
    loss_cls = (ce * weights).sum() / jnp.maximum(weights.sum(), 1.0)

    n_pos = jnp.maximum(gt_valid.sum(), 1.0)
    loss_l1 = (
        jnp.abs(matched_boxes - gt_cxcywh).sum(-1) * gt_valid
    ).sum() / n_pos
    loss_giou = (
        (1 - generalized_iou(cxcywh_to_xyxy(matched_boxes),
                             cxcywh_to_xyxy(gt_cxcywh))) * gt_valid
    ).sum() / n_pos

    metrics = {"loss_cls": loss_cls, "loss_l1": loss_l1,
               "loss_giou": loss_giou}
    total = (cls_weight * loss_cls + l1_weight * loss_l1
             + giou_weight * loss_giou)

    if gt_masks is not None and "mask_logits" in outputs:
        mlog = outputs["mask_logits"]  # (B, Q, h, w)
        mh, mw = mlog.shape[2], mlog.shape[3]
        matched_mlog = mlog[bidx, match]  # (B, M, h, w)
        # downsample GT masks to the prediction grid (average pool)
        gm = gt_masks.reshape(
            b, m, mh, gt_masks.shape[2] // mh, mw, gt_masks.shape[3] // mw
        ).mean((3, 5))
        target = (gm > 0.5).astype(jnp.float32)
        bce = -(
            target * jax.nn.log_sigmoid(matched_mlog)
            + (1 - target) * jax.nn.log_sigmoid(-matched_mlog)
        ).mean((2, 3))
        p = jax.nn.sigmoid(matched_mlog)
        inter = (p * target).sum((2, 3))
        dice = 1 - (2 * inter + 1) / (p.sum((2, 3)) + target.sum((2, 3)) + 1)
        loss_mask = ((bce + dice) * gt_valid).sum() / n_pos
        metrics["loss_mask"] = loss_mask
        total = total + loss_mask

    l_sparse, rate = loss_sparse(outputs["additional"], sparsity_target)
    metrics["loss_sparse"] = l_sparse
    metrics["flops_rate"] = rate
    return total + lambda_sparse * l_sparse, metrics


def detr_detect(outputs, image_size: float, score_threshold: float = 0.05,
                max_detections: int = 100):
    """Per-image detections from DETR outputs (softmax, drop no-object)."""
    probs = jax.nn.softmax(outputs["cls_logits"], -1)[..., :-1]
    scores = probs.max(-1)
    classes = probs.argmax(-1)
    boxes = cxcywh_to_xyxy(outputs["boxes_cxcywh"]) * image_size
    k = min(max_detections, scores.shape[1])

    def per_image(s, c, bx):
        top_s, top_i = jax.lax.top_k(s, k)
        return {
            "boxes": bx[top_i],
            "scores": jnp.where(top_s > score_threshold, top_s, 0.0),
            "classes": c[top_i],
            # query index per detection, for gathering mask_logits
            "indices": top_i,
        }

    return jax.vmap(per_image)(scores, classes, boxes)
