from laudnet_tpu.utils.metrics import AverageMeter, topk_accuracy

__all__ = ["AverageMeter", "topk_accuracy"]
