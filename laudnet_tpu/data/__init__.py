from laudnet_tpu.data.transforms import (
    train_transform,
    eval_transform,
    IMAGENET_MEAN,
    IMAGENET_STD,
)
from laudnet_tpu.data.loader import ImageFolderDataset, DataLoader, synthetic_batches
from laudnet_tpu.data.native_loader import (
    NativeBatchTransform,
    NativeDataLoader,
    native_available,
)

__all__ = [
    "NativeBatchTransform",
    "NativeDataLoader",
    "native_available",
    "train_transform",
    "eval_transform",
    "IMAGENET_MEAN",
    "IMAGENET_STD",
    "ImageFolderDataset",
    "DataLoader",
    "synthetic_batches",
]
