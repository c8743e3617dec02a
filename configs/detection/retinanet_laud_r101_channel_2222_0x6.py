# RetinaNet + LAUD-ResNet101 channel-2222, sparsity target 0.6, backbone
# lr_mult 0.2 — the reference's
# `configs/retinanet/scale_backbone_lr/retinanet_ladmmdet_r101_fpn_1x_coco_
#  r101_channel_2222_0x6_lrmult0x2.py` ported to this framework's config
# format.
model = dict(
    type="RetinaNet",
    num_classes=80,
    backbone_layers=(3, 4, 23, 3),
    dyn_mode=("channel", "channel", "channel", "channel"),
    sparsity_target=0.6,
    temperature=0.1,  # fixed (temperature_0; detectors never anneal)
)
train_cfg = dict(
    epochs=12,  # 1x schedule
    backbone_lr_mult=0.2,
    init_from="checkpoints/imagenet_pretrain/laud_r101_channel_2222_t0.5",
)
