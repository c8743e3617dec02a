# DETR-family (DDQ-DETR-shaped) + LAUD-ResNet101 channel-2222, sparsity
# target 0.5 — the reference's `mmdetection-3.3.0/configs/ddq/
# ddq-detr-4scale_r101_channel_2222_0x5_8xb2-12e_coco.py:17-36`
# (out_indices (1,2,3), fixed temperature, loss_sparse injection in
# `detectors/base_detr.py:123-132`).
model = dict(
    type="DETRDetector",
    num_classes=80,
    num_queries=300,
    backbone_layers=(3, 4, 23, 3),
    dyn_mode=("channel", "channel", "channel", "channel"),
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
    init_from="checkpoints/imagenet_pretrain/laud_r101_channel_2222_t0.5",
)
