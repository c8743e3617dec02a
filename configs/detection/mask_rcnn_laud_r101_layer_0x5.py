# Mask-RCNN + LAUD-ResNet101 layer mode, sparsity target 0.8(sic: the
# reference config names 0x5 but sets sparsity_target=0.8), backbone
# lr_mult 0.3 — the reference's `configs/mask_rcnn/scale_backbone_lr/
# mask_rcnn_ladmmdet_r101_fpn_1x_coco_r101_layer_0x5_lrmult0x3.py:1-44`.
model = dict(
    type="FasterRCNN",
    with_masks=True,
    num_classes=80,
    backbone_layers=(3, 4, 23, 3),
    dyn_mode=("layer", "layer", "layer", "layer"),
    sparsity_target=0.8,
    temperature=0.1,
)
train_cfg = dict(
    epochs=12,
    backbone_lr_mult=0.3,
    init_from="checkpoints/imagenet_pretrain/laud_r101_layer_t0.5",
)
