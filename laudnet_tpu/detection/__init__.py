from laudnet_tpu.detection.backbone import LAUDDetBackbone
from laudnet_tpu.detection.fpn import FPN
from laudnet_tpu.detection.retinanet import RetinaNet, RetinaNetHead
from laudnet_tpu.detection.losses import loss_sparse
from laudnet_tpu.detection.two_stage import FasterRCNN, roi_align
from laudnet_tpu.detection.train import retinanet_loss, assign_targets, box_iou

__all__ = ["LAUDDetBackbone", "FPN", "RetinaNet", "RetinaNetHead", "loss_sparse", "FasterRCNN", "roi_align", "retinanet_loss", "assign_targets", "box_iou"]
