# Mask2Former-shaped (query masks) + LAUD-ResNet101 channel-2222, target
# 0.5 — reference `mmdetection-3.3.0/configs/mask2former/
# mask2former_r101_channel_2222_0x5_8xb2-lsj-50e_coco.py` (loss_sparse
# injection in `detectors/maskformer.py:64-70`).
model = dict(
    type="DETRDetector",
    with_masks=True,
    num_classes=80,
    num_queries=100,
    backbone_layers=(3, 4, 23, 3),
    dyn_mode=("channel", "channel", "channel", "channel"),
    out_indices=(0, 1, 2, 3),
    sparsity_target=0.5,
    temperature=0.1,
)
train_cfg = dict(
    epochs=50,
    # Mask2Former point-sampled mask loss + per-layer aux supervision
    # (reference `mask2former_head.py:148-151`: 12544 points,
    # oversample 3.0, importance 0.75)
    mask_points=12544,
    oversample_ratio=3.0,
    importance_ratio=0.75,
    backbone_lr_mult=0.1,
    init_from="checkpoints/imagenet_pretrain/laud_r101_channel_2222_t0.5",
)
