# RetinaNet + LAUD-ResNet101 layer skipping, sparsity target 0.5.
model = dict(
    type="RetinaNet",
    num_classes=80,
    backbone_layers=(3, 4, 23, 3),
    dyn_mode=("layer", "layer", "layer", "layer"),
    sparsity_target=0.5,
    temperature=0.1,
)
train_cfg = dict(epochs=12, backbone_lr_mult=0.3)
