from laudnet_tpu.detection.backbone import LAUDDetBackbone
from laudnet_tpu.detection.eval_info import evaluate_get_info
from laudnet_tpu.detection.fpn import FPN
from laudnet_tpu.detection.retinanet import RetinaNet, RetinaNetHead
from laudnet_tpu.detection.losses import loss_sparse
from laudnet_tpu.detection.two_stage import FasterRCNN, roi_align
from laudnet_tpu.detection.train import retinanet_loss, assign_targets, box_iou
from laudnet_tpu.detection.two_stage_train import (
    faster_rcnn_loss,
    rpn_loss,
    roi_assign,
)
from laudnet_tpu.detection.detr import (
    DETRDetector,
    detr_detect,
    detr_loss,
    hungarian_match,
)
from laudnet_tpu.detection.runner import (
    DetTrainConfig,
    build_detector,
    evaluate_detector,
    make_detection_sgd,
    make_detector_train_step,
    mean_average_precision,
    synthetic_coco_batches,
    train_detector,
)

__all__ = [
    "LAUDDetBackbone", "FPN", "RetinaNet", "RetinaNetHead", "loss_sparse",
    "FasterRCNN", "roi_align", "retinanet_loss", "assign_targets", "box_iou",
    "faster_rcnn_loss", "rpn_loss", "roi_assign", "DetTrainConfig",
    "make_detection_sgd", "make_detector_train_step",
    "mean_average_precision", "synthetic_coco_batches", "train_detector",
    "DETRDetector", "detr_loss", "detr_detect", "hungarian_match",
    "build_detector", "evaluate_detector", "evaluate_get_info",
]
