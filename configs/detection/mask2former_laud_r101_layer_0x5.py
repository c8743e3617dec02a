# Mask2Former-shaped + LAUD-ResNet101 layer mode, target 0.5 — reference
# `configs/mask2former/mask2former_r101_layer_0x5_8xb2-lsj-50e_coco.py`.
model = dict(
    type="DETRDetector",
    with_masks=True,
    num_classes=80,
    num_queries=100,
    backbone_layers=(3, 4, 23, 3),
    dyn_mode=("layer", "layer", "layer", "layer"),
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
    init_from="checkpoints/imagenet_pretrain/laud_r101_layer_t0.5",
)
