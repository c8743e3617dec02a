# RetinaNet over the LASNet-era SPATIAL dynamic backbone (reference
# `mmdetection-*/mmdet/models/backbones/resnet_sd.py` — ResNet_sd returns
# the same (outs, additional, model_configs) contract with
# dyn_mode='spatial'). Demonstrates the spatial paradigm under detection;
# the reference ships the backbone but no shipped config uses it, so this
# one follows the retinanet channel config's shape.
model = dict(
    type="RetinaNet",
    num_classes=80,
    backbone_layers=(3, 4, 23, 3),
    dyn_mode=("spatial", "spatial", "spatial", "spatial"),
    sparsity_target=0.5,
    temperature=0.1,
)
train_cfg = dict(
    epochs=12,
    backbone_lr_mult=0.2,
    init_from="checkpoints/imagenet_pretrain/laud_r101_spatial_t0.5",
)
