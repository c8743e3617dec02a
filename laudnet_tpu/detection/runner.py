"""COCO-style detection training runner (reference analog:
`mmdetection-2.21.0/tools/train.py` + the patched
`mmcv_replace_file/epoch_based_runner.py:25-47`).

One jitted train step drives RetinaNet or Faster/Mask-RCNN on a LAUD
backbone with the reference's knobs: backbone ``lr_mult`` (the
scale_backbone_lr configs use 0.2-0.5), **fixed** Gumbel temperature
(detectors never anneal, `lad_mmdet_resnet.py:679-682`), and the
``loss_sparse`` injection. Evaluation = mAP + the per-image FLOPs
accounting of `detection/eval_info.py` (`mmdet/apis/test.py:75-145`).
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from laudnet_tpu.detection.detr import detr_loss
from laudnet_tpu.detection.train import retinanet_loss
from laudnet_tpu.detection.two_stage_train import faster_rcnn_loss


def build_detector(model_cfg: dict):
    """Instantiate a detector from a ``configs/detection/*.py`` model dict
    (the mmdet registry analog: ``type`` selects the class, the rest are
    ctor kwargs). Returns ``(model, kind)`` where ``kind`` is the runner's
    loss/decode dispatch key."""
    from laudnet_tpu.detection.detr import DETRDetector
    from laudnet_tpu.detection.retinanet import RetinaNet
    from laudnet_tpu.detection.two_stage import FasterRCNN

    cfg = dict(model_cfg)
    name = cfg.pop("type")
    classes = {
        "RetinaNet": (RetinaNet, "retinanet"),
        "FasterRCNN": (FasterRCNN, "faster_rcnn"),
        "MaskRCNN": (FasterRCNN, "faster_rcnn"),
        "DETRDetector": (DETRDetector, "detr"),
        "Mask2Former": (DETRDetector, "detr"),
    }
    if name not in classes:
        raise ValueError(f"unknown detector type {name!r}")
    klass, kind = classes[name]
    if name in ("MaskRCNN", "Mask2Former"):
        cfg.setdefault("with_masks", True)
    for k in ("dyn_mode", "backbone_layers", "out_indices"):
        if k in cfg:
            cfg[k] = tuple(cfg[k])
    if cfg.pop("amp", False):
        # bf16 mixed precision (train/main.py --amp semantics): backbone/
        # FPN/head towers compute bf16 over f32 masters; gating heads and
        # final predictors (obj/reg/cls/mask logits) exit f32 so proposal
        # decode, matching and losses are unchanged. CNN detectors only —
        # the DETR family keeps f32 (its Hungarian cost matrix is
        # tie-sensitive).
        if kind == "detr":
            raise ValueError("amp=True is not supported for the DETR "
                             "family (f32 Hungarian matching); remove it "
                             "from the config")
        cfg["dtype"] = jnp.bfloat16
    return klass(**cfg), kind


# --- optimizer: backbone / masker / head LR groups -------------------------

def detection_param_labels(params):
    """'masker' for gating heads, 'backbone' for the rest of the backbone
    scope, 'head' for necks/heads — the scale_backbone_lr semantics
    (backbone convs get lr_mult; maskers and heads train at full LR)."""

    def label(path, _):
        keys = [str(k) for k in path]
        if any("masker" in k or "_policy" in k for k in keys):
            return "masker"
        if any("backbone" in k for k in keys):
            return "backbone"
        return "head"

    return jax.tree_util.tree_map_with_path(label, params)


def make_detection_sgd(params, *, lr_mult: float = 0.2, momentum: float = 0.9,
                       weight_decay: float = 1e-4, nesterov: bool = False):
    labels = detection_param_labels(params)

    def group(mult):
        return optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.trace(decay=momentum, nesterov=nesterov),
            optax.scale(mult),
        )

    grouped = optax.multi_transform(
        {"backbone": group(lr_mult), "masker": group(1.0),
         "head": group(1.0)},
        labels,
    )
    return optax.inject_hyperparams(
        lambda learning_rate: optax.chain(grouped, optax.scale(-learning_rate))
    )(learning_rate=0.0)


# --- train step -------------------------------------------------------------

@dataclass
class DetTrainConfig:
    num_classes: int = 80
    base_lr: float = 0.01
    lr_mult: float = 0.2
    epochs: int = 12
    steps_per_epoch: int = 100
    warmup_steps: int = 50
    sparsity_target: float = 0.5
    lambda_sparse: float = 1.0
    with_masks: bool = False
    # Mask2Former point-sampled mask loss (reference: 12544 points,
    # oversample 3.0, importance 0.75 — `mask2former_head.py:148-151`);
    # None = dense full-grid fallback, final layer only
    mask_points: int | None = None
    oversample_ratio: float = 3.0
    importance_ratio: float = 0.75


def lr_at(step, cfg: DetTrainConfig):
    """mmdet 1x-style schedule: linear warmup then step decay at epochs
    8 and 11 (of 12). Decay thresholds that truncate to 0 (short smoke
    runs, e.g. --epochs 1) are disabled rather than decaying from step 0."""
    warm = jnp.minimum(
        (step.astype(jnp.float32) + 1.0) / max(cfg.warmup_steps, 1), 1.0
    )
    epoch = step // cfg.steps_per_epoch
    e8 = int(cfg.epochs * 8 / 12) or cfg.epochs + 1
    e11 = int(cfg.epochs * 11 / 12) or cfg.epochs + 1
    decay = jnp.where(epoch >= e11, 0.01,
                      jnp.where(epoch >= e8, 0.1, 1.0))
    return cfg.base_lr * warm * decay


def make_detector_train_step(model, optimizer, cfg: DetTrainConfig,
                             kind: str = "faster_rcnn",
                             seed: int = 0) -> Callable:
    """Jitted step for ``kind`` in {'retinanet', 'faster_rcnn', 'detr'}
    (mask loss switches on automatically when the model emits mask_logits
    and the batch carries masks). ``seed`` keys the Gumbel stream: the
    per-step gate noise is ``fold_in(PRNGKey(seed), step)``."""
    gumbel_key = jax.random.PRNGKey(seed)

    def train_step(state, images, gt_boxes, gt_labels, gt_valid,
                   gt_masks=None):
        step, params, batch_stats, opt_state = state

        def loss_fn(p):
            variables = {"params": p, "batch_stats": batch_stats}
            if kind == "detr":
                rngs = {"gumbel": jax.random.fold_in(gumbel_key, step)}
                kw = {}
                if getattr(model, "dn_groups", 0) > 0:
                    # denoising groups: noised GT queries + a noise stream
                    kw["dn_gt"] = {"boxes_xyxy": gt_boxes,
                                   "labels": gt_labels,
                                   "valid": gt_valid}
                    rngs["dn"] = jax.random.fold_in(
                        jax.random.PRNGKey(seed + 1), step)
                out, mut = model.apply(
                    variables, images, training=True, rngs=rngs,
                    mutable=["batch_stats"], **kw,
                )
                total, metrics = detr_loss(
                    out, gt_boxes, gt_labels, gt_valid,
                    num_classes=cfg.num_classes,
                    image_size=(float(images.shape[1]),
                                float(images.shape[2])),
                    gt_masks=gt_masks,
                    sparsity_target=cfg.sparsity_target,
                    lambda_sparse=cfg.lambda_sparse,
                    mask_points=cfg.mask_points,
                    oversample_ratio=cfg.oversample_ratio,
                    importance_ratio=cfg.importance_ratio,
                    mask_rng=jax.random.fold_in(
                        jax.random.PRNGKey(seed + 2), step),
                )
            elif kind == "retinanet":
                out, mut = model.apply(
                    variables, images, training=True,
                    rngs={"gumbel": jax.random.fold_in(gumbel_key, step)},
                    mutable=["batch_stats"],
                )
                total, metrics = retinanet_loss(
                    out, gt_boxes, gt_labels, gt_valid,
                    num_classes=cfg.num_classes,
                    sparsity_target=cfg.sparsity_target,
                    lambda_sparse=cfg.lambda_sparse,
                )
            else:
                out, mut = model.apply(
                    variables, images, training=True,
                    gt_boxes=gt_boxes, gt_valid=gt_valid,
                    rngs={"gumbel": jax.random.fold_in(gumbel_key, step)},
                    mutable=["batch_stats"],
                )
                total, metrics = faster_rcnn_loss(
                    out, gt_boxes, gt_labels, gt_valid,
                    num_classes=cfg.num_classes, gt_masks=gt_masks,
                    sparsity_target=cfg.sparsity_target,
                    lambda_sparse=cfg.lambda_sparse,
                )
            return total, (metrics, mut["batch_stats"])

        (loss, (metrics, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        lr = lr_at(step, cfg)
        opt_state.hyperparams["learning_rate"] = lr
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics = dict(metrics, loss=loss, lr=lr)
        return (step + 1, params, new_bs, opt_state), metrics

    return train_step


# --- synthetic COCO (trainability smoke data) ------------------------------

def synthetic_coco_batches(batch_size: int, image_size, num_classes: int,
                           steps: int, max_gt: int = 4, seed: int = 0,
                           with_masks: bool = False):
    """Learnable synthetic detection data: each image contains 1..max_gt
    axis-aligned bright rectangles on noise; the rectangle's dominant color
    channel is its class (num_classes <= 3 recommended for smoke tests).
    ``image_size``: square pixel size or an ``(ih, iw)`` pair."""
    rng = np.random.default_rng(seed)
    ih, iw = ((image_size, image_size) if isinstance(image_size, int)
              else image_size)
    for _ in range(steps):
        imgs = rng.normal(0, 0.1, (batch_size, ih, iw, 3))
        boxes = np.zeros((batch_size, max_gt, 4), np.float32)
        labels = np.zeros((batch_size, max_gt), np.int32)
        valid = np.zeros((batch_size, max_gt), np.float32)
        masks = np.zeros((batch_size, max_gt, ih, iw), np.float32)
        for b in range(batch_size):
            n = rng.integers(1, max_gt + 1)
            for m in range(n):
                w = rng.integers(iw // 4, iw // 2)
                h = rng.integers(ih // 4, ih // 2)
                x0 = rng.integers(0, iw - w)
                y0 = rng.integers(0, ih - h)
                c = int(rng.integers(0, min(num_classes, 3)))
                imgs[b, y0:y0 + h, x0:x0 + w, c] += 2.0
                boxes[b, m] = (x0, y0, x0 + w, y0 + h)
                labels[b, m] = c
                valid[b, m] = 1.0
                masks[b, m, y0:y0 + h, x0:x0 + w] = 1.0
        out = (imgs.astype(np.float32), boxes, labels, valid)
        yield out + ((masks,) if with_masks else ())


# --- masks -------------------------------------------------------------------

def paste_mask(prob: np.ndarray, box: np.ndarray, img_h: int,
               img_w: int, threshold: float = 0.5) -> np.ndarray:
    """Paste a (m, m) mask probability map into its box on an (img_h,
    img_w) canvas — Mask-RCNN's paste step (bilinear resize to the box
    rect, threshold). Returns a bool mask."""
    out = np.zeros((img_h, img_w), bool)
    x0, y0, x1, y1 = [float(v) for v in box]
    x0i, y0i = max(int(np.floor(x0)), 0), max(int(np.floor(y0)), 0)
    x1i, y1i = min(int(np.ceil(x1)), img_w), min(int(np.ceil(y1)), img_h)
    w, h = x1i - x0i, y1i - y0i
    if w <= 0 or h <= 0:
        return out
    m = prob.shape[0]
    ys = (np.arange(h) + 0.5) * (m / h) - 0.5
    xs = (np.arange(w) + 0.5) * (m / w) - 0.5
    y_idx = np.clip(ys, 0, m - 1)
    x_idx = np.clip(xs, 0, m - 1)
    y0f = np.clip(np.floor(y_idx).astype(int), 0, m - 1)
    x0f = np.clip(np.floor(x_idx).astype(int), 0, m - 1)
    y1f = np.minimum(y0f + 1, m - 1)
    x1f = np.minimum(x0f + 1, m - 1)
    wy = (y_idx - y0f)[:, None]
    wx = (x_idx - x0f)[None, :]
    interp = (prob[np.ix_(y0f, x0f)] * (1 - wy) * (1 - wx)
              + prob[np.ix_(y1f, x0f)] * wy * (1 - wx)
              + prob[np.ix_(y0f, x1f)] * (1 - wy) * wx
              + prob[np.ix_(y1f, x1f)] * wy * wx)
    out[y0i:y1i, x0i:x1i] = interp >= threshold
    return out


def mask_iou(a: np.ndarray, b: np.ndarray) -> float:
    inter = np.logical_and(a, b).sum()
    union = np.logical_or(a, b).sum()
    return float(inter) / float(union) if union else 0.0


# --- mAP -------------------------------------------------------------------

def average_precision(recalls, precisions):
    """All-point interpolated AP (COCO-style area under PR curve)."""
    r = np.concatenate([[0.0], recalls, [1.0]])
    p = np.concatenate([[0.0], precisions, [0.0]])
    for i in range(len(p) - 2, -1, -1):
        p[i] = max(p[i], p[i + 1])
    idx = np.where(r[1:] != r[:-1])[0]
    return float(((r[idx + 1] - r[idx]) * p[idx + 1]).sum())


COCO_IOU_THRESHOLDS = tuple(np.round(np.arange(0.5, 1.0, 0.05), 2))


def _np_box_iou(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(N,4) x (M,4) xyxy IoU matrix in numpy (host-side eval path)."""
    if len(a) == 0 or len(b) == 0:
        return np.zeros((len(a), len(b)), np.float32)
    tl = np.maximum(a[:, None, :2], b[None, :, :2])
    br = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(br - tl, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    union = area_a[:, None] + area_b[None, :] - inter
    return (inter / np.maximum(union, 1e-9)).astype(np.float32)


def mean_average_precision(detections, ground_truths, num_classes: int,
                           iou_threshold: float = 0.5,
                           use_masks: bool = False,
                           iou_thresholds=None) -> dict:
    """mAP over a list of per-image detections and ground truths.

    ``detections``: list of dicts with 'boxes' (N,4), 'scores' (N,),
    'classes' (N,) and — for ``use_masks`` (segm mAP, the Mask-RCNN /
    Mask2Former metric) — 'masks' (N,H,W) bool; ``ground_truths``: dicts
    with 'boxes' (M,4), 'labels' (M,) [and 'masks' (M,H,W)]. Zero-score
    detections are ignored (the static-shape pads).

    ``iou_thresholds``: None -> single-threshold AP at ``iou_threshold``
    (the quick smoke-test metric); 'coco' or an explicit list -> the
    COCO-standard average over IoU 0.50:0.05:0.95 (COCOeval's headline,
    `mmdetection-2.21.0/mmdet/datasets/coco.py:419`), reported as 'mAP'
    with 'mAP50' alongside. Per-image IoU matrices are computed once and
    shared across thresholds. Returns {'mAP', 'ap_per_class'[, 'mAP50']}.
    """
    if iou_thresholds == "coco":
        thresholds = list(COCO_IOU_THRESHOLDS)
    elif iou_thresholds is not None:
        thresholds = [float(t) for t in iou_thresholds]
    else:
        thresholds = [iou_threshold]

    ap_per_class = {t: [] for t in thresholds}
    any_class = False
    for c in range(num_classes):
        scored = []  # (score, image_idx, det_idx)
        n_gt = 0
        # per-image IoU matrix (class-c dets x class-c gts), computed once
        ious_by_img = {}
        gt_idx_by_img = {}
        for i, (det, gt) in enumerate(zip(detections, ground_truths)):
            keep = (np.asarray(det["classes"]) == c) & (
                np.asarray(det["scores"]) > 0
            )
            det_idx = np.where(keep)[0]
            gt_idx = np.where(np.asarray(gt["labels"]) == c)[0]
            n_gt += len(gt_idx)
            if len(det_idx) == 0:
                continue
            for d_idx in det_idx:
                scored.append((float(np.asarray(det["scores"])[d_idx]),
                               i, int(d_idx)))
            gt_idx_by_img[i] = gt_idx
            if len(gt_idx) == 0:
                ious_by_img[i] = {}
                continue
            if use_masks:
                ious_by_img[i] = {
                    int(d): np.asarray([
                        mask_iou(np.asarray(det["masks"][d]),
                                 np.asarray(gt["masks"][g]) > 0.5)
                        for g in gt_idx
                    ])
                    for d in det_idx
                }
            else:
                mat = _np_box_iou(
                    np.asarray(det["boxes"], np.float32)[det_idx],
                    np.asarray(gt["boxes"], np.float32)[gt_idx],
                )
                ious_by_img[i] = {
                    int(d): mat[k] for k, d in enumerate(det_idx)
                }
        if n_gt == 0:
            continue
        any_class = True
        scored.sort(key=lambda t: -t[0])
        for thr in thresholds:
            matched = [set() for _ in ground_truths]
            tp = np.zeros(len(scored))
            fp = np.zeros(len(scored))
            for k, (s, i, d_idx) in enumerate(scored):
                gt_idx = gt_idx_by_img.get(i, ())
                if len(gt_idx) == 0:
                    fp[k] = 1
                    continue
                ious = ious_by_img[i][d_idx]
                # COCO-style matching: try GTs in IoU order, take the best
                # still-unmatched one above threshold (greedy best-only
                # would mark duplicates of a taken GT as FP even when
                # another GT overlaps above threshold)
                hit = False
                for j in np.argsort(-ious):
                    if ious[j] < thr:
                        break
                    if gt_idx[j] not in matched[i]:
                        tp[k] = 1
                        matched[i].add(gt_idx[j])
                        hit = True
                        break
                if not hit:
                    fp[k] = 1
            ctp, cfp = np.cumsum(tp), np.cumsum(fp)
            recalls = ctp / n_gt
            precisions = ctp / np.maximum(ctp + cfp, 1e-9)
            ap_per_class[thr].append(
                average_precision(recalls, precisions))

    if not any_class:
        return {"mAP": 0.0, "ap_per_class": np.asarray([]), "mAP50": 0.0}
    per_class = np.mean(
        [np.asarray(ap_per_class[t]) for t in thresholds], axis=0
    )
    res = {"mAP": float(per_class.mean()), "ap_per_class": per_class}
    t50 = [t for t in thresholds if abs(t - 0.5) < 1e-6]
    if t50:  # only label mAP50 when 0.5 is actually evaluated
        res["mAP50"] = float(np.mean(ap_per_class[t50[0]]))
    return res


# --- runner ------------------------------------------------------------------

def train_detector(model, cfg: DetTrainConfig, *, kind: str = "faster_rcnn",
                   image_size: int = 128, batch_size: int = 2,
                   seed: int = 0, data_fn: Optional[Callable] = None,
                   init_from: Optional[str] = None,
                   checkpoint_dir: Optional[str] = None,
                   log: Callable = print):
    """End-to-end detector finetuning on synthetic (or provided) data.

    ``data_fn(steps) -> iterator of (images, boxes, labels, valid[, masks])``
    defaults to :func:`synthetic_coco_batches`. ``init_from``: ImageNet LAUD
    ``.pth[.tar]`` loaded into the backbone scope (the reference's
    ``init_cfg=Pretrained`` + patched mmcv loader). ``checkpoint_dir``
    enables orbax save + auto-resume (the EpochBasedRunner resume analog).
    Returns (params, batch_stats, history).
    """
    ih, iw = ((image_size, image_size) if isinstance(image_size, int)
              else image_size)
    sample = jnp.zeros((batch_size, ih, iw, 3), jnp.float32)
    init_kw = {}
    init_rngs = {"params": jax.random.PRNGKey(seed)}
    if kind == "detr" and getattr(model, "dn_groups", 0) > 0:
        # dn params (label embedding) only exist on the dn path: init a
        # TRAINING forward with placeholder GT so they are created
        init_kw = {"training": True,
                   "dn_gt": {"boxes_xyxy": jnp.zeros((batch_size, 1, 4)),
                             "labels": jnp.zeros((batch_size, 1), jnp.int32),
                             "valid": jnp.zeros((batch_size, 1))}}
        init_rngs["dn"] = jax.random.PRNGKey(seed + 1)
        init_rngs["gumbel"] = jax.random.PRNGKey(seed + 2)
    variables = jax.jit(
        lambda: model.init(init_rngs, sample,
                           **(init_kw or {"training": False}))
    )()
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    if init_from:
        from laudnet_tpu.convert import (
            convert_detection_backbone_state_dict, load_pth_tar,
            merge_variables,
        )

        loaded = convert_detection_backbone_state_dict(
            load_pth_tar(init_from))
        params = merge_variables(params, loaded["params"])
        batch_stats = merge_variables(batch_stats, loaded["batch_stats"])
        log(f"initialized backbone from {init_from}")
    optimizer = make_detection_sgd(params, lr_mult=cfg.lr_mult)
    opt_state = optimizer.init(params)
    state = (jnp.zeros((), jnp.int32), params, batch_stats, opt_state)

    ckpt = None
    start_step = 0
    if checkpoint_dir:
        from laudnet_tpu.train.checkpoint import CheckpointManager

        ckpt = CheckpointManager(checkpoint_dir)
        if ckpt.latest_step() is not None:
            state, _ = ckpt.restore(jax.eval_shape(lambda s: s, state))
            start_step = int(state[0])
            log(f"auto-resumed detector from step {start_step}")

    step_fn = jax.jit(
        make_detector_train_step(model, optimizer, cfg, kind, seed=seed)
    )

    if data_fn is None:
        def data_fn(steps):
            return synthetic_coco_batches(
                batch_size, (ih, iw), cfg.num_classes, steps, seed=seed,
                with_masks=cfg.with_masks,
            )

    history = []
    t0 = time.time()
    total_steps = cfg.epochs * cfg.steps_per_epoch
    for i, batch in enumerate(data_fn(total_steps)):
        if i < start_step:
            continue  # resume: replay the data iterator to the right spot
        args = tuple(jnp.asarray(a) for a in batch)
        state, metrics = step_fn(state, *args)
        if i % 10 == 0 or i == total_steps - 1:
            m = {k: float(v) for k, v in jax.device_get(metrics).items()}
            history.append(m)
            log(f"step {i}/{total_steps} loss {m['loss']:.4f} "
                f"flops_rate {m.get('flops_rate', 1.0):.3f} "
                f"lr {m['lr']:.5f} ({time.time() - t0:.1f}s)")
        if ckpt is not None and (
            (i + 1) % cfg.steps_per_epoch == 0 or i == total_steps - 1
        ):
            ckpt.save(int(state[0]), jax.device_get(state))
    if ckpt is not None:
        ckpt.close()
    _, params, batch_stats, _ = state
    return params, batch_stats, history


def evaluate_detector(model, params, batch_stats, batches, *,
                      num_classes: int, kind: str = "faster_rcnn",
                      score_threshold: float = 0.05,
                      iou_threshold: float = 0.5,
                      iou_thresholds="coco") -> dict:
    """mAP + per-image FLOPs accounting over an eval iterable — the
    reference's ``single_gpu_test_get_info`` role (`mmdet/apis/test.py:
    75-145`) with the metric computed in-process.

    ``batches``: iterator of (images, boxes, labels, valid[, masks]); when
    masks are present and the model emits ``mask_logits``, segm mAP (mask
    IoU — the Mask-RCNN/Mask2Former metric) is computed alongside box mAP.
    The headline 'mAP' is COCO-standard (IoU averaged 0.50:0.05:0.95,
    `mmdet/datasets/coco.py:419`); pass ``iou_thresholds=None`` for the
    single-threshold smoke metric at ``iou_threshold``. When the backbone
    reports per-image FLOPs (``additional['flops_img']``), their
    mean/std/min/max spread is included — the interesting dynamic-network
    statistic that batch means hide. Returns {'mAP', 'mAP50',
    'ap_per_class', 'mean_flops', 'mean_flops_rate', 'flops_img_*', ...
    [, 'segm_mAP']}.
    """
    variables = {"params": params, "batch_stats": batch_stats}

    @jax.jit
    def fwd(x):
        out = model.apply(variables, x, training=False)
        # strip static (non-array) entries — jit can't return strings
        return {k: v for k, v in out.items()
                if k not in ("model_configs", "image_hw")}

    detections, gts = [], []
    n = 0
    flops = dense = 0.0
    flops_img_all = []
    for batch in batches:
        images, boxes, labels, valid = batch[:4]
        gt_masks = batch[4] if len(batch) > 4 else None
        out = dict(fwd(jnp.asarray(images)))
        out["image_hw"] = (images.shape[1], images.shape[2])
        if kind == "faster_rcnn":
            det = jax.device_get(type(model).detect(
                out, score_threshold=score_threshold))
        elif kind == "detr":
            from laudnet_tpu.detection.detr import detr_detect

            det = jax.device_get(detr_detect(
                out, (float(images.shape[1]), float(images.shape[2])),
                score_threshold=score_threshold))
        else:
            from laudnet_tpu.detection.retinanet import RetinaNet

            det = jax.device_get(RetinaNet.detect(
                out, (images.shape[1], images.shape[2]),
                score_threshold=score_threshold))
        add = jax.device_get(out["additional"])
        bsz = images.shape[0]
        img_h, img_w = images.shape[1], images.shape[2]
        n += bsz
        flops += float(add["flops"]) * bsz
        dense += float(add["dense_flops"]) * bsz
        if "flops_img" in add:
            flops_img_all.append(np.asarray(add["flops_img"], np.float64))
        mask_logits = (jax.device_get(out["mask_logits"])
                       if "mask_logits" in out and gt_masks is not None
                       else None)
        for i in range(bsz):
            d = {k: np.asarray(det[k][i])
                 for k in ("boxes", "scores", "classes")}
            if mask_logits is not None:
                idx = np.asarray(det["indices"][i])
                pasted = []
                for j in range(len(idx)):
                    if d["scores"][j] <= 0:
                        pasted.append(np.zeros((img_h, img_w), bool))
                        continue
                    ml = mask_logits[i, idx[j]]
                    if ml.ndim == 3:  # Mask-RCNN: (14, 14, K), class slice
                        prob = 1.0 / (1.0 + np.exp(-ml[..., d["classes"][j]]))
                        pasted.append(paste_mask(prob, d["boxes"][j],
                                                 img_h, img_w))
                    else:  # DETR/Mask2Former: (h, w) over the whole image
                        prob = 1.0 / (1.0 + np.exp(-ml))
                        pasted.append(paste_mask(
                            prob, np.array([0, 0, img_w, img_h]),
                            img_h, img_w))
                d["masks"] = pasted
            detections.append(d)
            keep = np.asarray(valid[i]) > 0
            g = dict(boxes=np.asarray(boxes[i])[keep],
                     labels=np.asarray(labels[i])[keep])
            if gt_masks is not None:
                g["masks"] = np.asarray(gt_masks[i])[keep]
            gts.append(g)
    res = mean_average_precision(detections, gts, num_classes,
                                 iou_threshold,
                                 iou_thresholds=iou_thresholds)
    if detections and "masks" in detections[0]:
        segm = mean_average_precision(detections, gts, num_classes,
                                      iou_threshold, use_masks=True,
                                      iou_thresholds=iou_thresholds)
        res = dict(res, segm_mAP=segm["mAP"],
                   segm_mAP50=segm.get("mAP50", segm["mAP"]),
                   segm_ap_per_class=segm["ap_per_class"])
    res.update(
        n_images=n,
        mean_flops=flops / max(n, 1),
        mean_dense_flops=dense / max(n, 1),
        mean_flops_rate=(flops / dense) if dense else 1.0,
    )
    if flops_img_all:
        fi = np.concatenate(flops_img_all)
        res.update(
            flops_img_mean=float(fi.mean()),
            flops_img_std=float(fi.std()),
            flops_img_min=float(fi.min()),
            flops_img_max=float(fi.max()),
        )
    return res
