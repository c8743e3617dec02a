from laudnet_tpu.data.transforms import (
    train_transform,
    eval_transform,
    IMAGENET_MEAN,
    IMAGENET_STD,
)
from laudnet_tpu.data.loader import ImageFolderDataset, DataLoader, synthetic_batches

__all__ = [
    "train_transform",
    "eval_transform",
    "IMAGENET_MEAN",
    "IMAGENET_STD",
    "ImageFolderDataset",
    "DataLoader",
    "synthetic_batches",
]
