# DDQ-DETR-shaped + LAUD-ResNet101 layer mode, target 0.5 — reference
# `configs/ddq/ddq-detr-4scale_r101_layer_0x5_8xb2-12e_coco.py`.
model = dict(
    type="DETRDetector",
    num_classes=80,
    num_queries=300,
    backbone_layers=(3, 4, 23, 3),
    dyn_mode=("layer", "layer", "layer", "layer"),
    out_indices=(1, 2, 3),
    sparsity_target=0.5,
    temperature=0.1,
    query_init="ddq",  # dense distinct queries (NMS-selected encoder proposals)
    distinct_queries=True,  # per-decoder-layer duplicate suppression
    dn_groups=2,            # denoising query groups (training)
)
train_cfg = dict(
    epochs=12,
    backbone_lr_mult=0.1,
    init_from="checkpoints/imagenet_pretrain/laud_r101_layer_t0.5",
)
