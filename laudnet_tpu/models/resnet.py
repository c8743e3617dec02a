"""Static ResNet teachers (NHWC, flax.linen).

Counterpart of the reference's torchvision-style teachers
(`imagenet_classification/models/resnet.py:223-278`) used for knowledge
distillation and dense-FLOPs measurement. Module names mirror
:mod:`laudnet_tpu.models.laud_resnet` so one converter handles both.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from laudnet_tpu.models.laud_resnet import (
    EXPANSION,
    he_normal_fan_out,
    torch_linear_bias_init,
    torch_linear_kernel_init,
)
from laudnet_tpu.ops import masking


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    has_downsample: bool = False
    group_width: int = 1
    dilation: int = 1
    param_dtype: Any = jnp.float32
    dtype: Any = None  # AMP compute dtype (None = exact f32 promotion)

    @nn.compact
    def __call__(self, x, *, training: bool = False):
        width = self.planes * self.group_width
        out_planes = self.planes * EXPANSION
        bn = lambda name: nn.BatchNorm(
            use_running_average=not training,
            momentum=0.9,
            epsilon=1e-5,
            name=name,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )
        out = nn.Conv(
            width, (1, 1), use_bias=False, kernel_init=he_normal_fan_out(),
            name="conv1", dtype=self.dtype, param_dtype=self.param_dtype,
        )(x)
        out = nn.relu(bn("bn1")(out))
        out = nn.Conv(
            width, (3, 3), strides=self.stride, padding=self.dilation,
            kernel_dilation=self.dilation, feature_group_count=self.group_width,
            use_bias=False, kernel_init=he_normal_fan_out(), name="conv2",
            dtype=self.dtype, param_dtype=self.param_dtype,
        )(out)
        out = nn.relu(bn("bn2")(out))
        out = nn.Conv(
            out_planes, (1, 1), use_bias=False, kernel_init=he_normal_fan_out(),
            name="conv3", dtype=self.dtype, param_dtype=self.param_dtype,
        )(out)
        out = bn("bn3")(out)

        identity = x
        if self.has_downsample:
            identity = nn.Conv(
                out_planes, (1, 1), strides=self.stride, use_bias=False,
                kernel_init=he_normal_fan_out(), name="downsample_conv",
                dtype=self.dtype, param_dtype=self.param_dtype,
            )(x)
            identity = bn("downsample_bn")(identity)
        return nn.relu(out + identity)


class BasicBlock(nn.Module):
    """Two-conv residual block (ResNet-18/34)."""

    planes: int
    stride: int = 1
    has_downsample: bool = False
    param_dtype: Any = jnp.float32
    expansion: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x, *, training: bool = False):
        bn = lambda name: nn.BatchNorm(
            use_running_average=not training, momentum=0.9, epsilon=1e-5,
            name=name, dtype=self.dtype, param_dtype=self.param_dtype,
        )
        out = nn.Conv(self.planes, (3, 3), strides=self.stride, padding=1,
                      use_bias=False, kernel_init=he_normal_fan_out(),
                      name="conv1", dtype=self.dtype,
                      param_dtype=self.param_dtype)(x)
        out = nn.relu(bn("bn1")(out))
        out = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False,
                      kernel_init=he_normal_fan_out(), name="conv2",
                      dtype=self.dtype,
                      param_dtype=self.param_dtype)(out)
        out = bn("bn2")(out)
        identity = x
        if self.has_downsample:
            identity = nn.Conv(self.planes, (1, 1), strides=self.stride,
                               use_bias=False,
                               kernel_init=he_normal_fan_out(),
                               name="downsample_conv",
                               dtype=self.dtype,
                               param_dtype=self.param_dtype)(x)
            identity = bn("downsample_bn")(identity)
        return nn.relu(out + identity)


class ResNet(nn.Module):
    layers: Sequence[int]
    num_classes: int = 1000
    width_mult: float = 1.0
    group_width: int = 1
    block: str = "bottleneck"  # 'bottleneck' | 'basic'
    param_dtype: Any = jnp.float32
    dtype: Any = None  # AMP compute dtype (None = exact f32 promotion)

    @nn.compact
    def __call__(self, x, *, training: bool = False):
        stem_width = int(64 * self.width_mult)
        x = nn.Conv(
            stem_width, (7, 7), strides=2, padding=3, use_bias=False,
            kernel_init=he_normal_fan_out(), name="conv1",
            dtype=self.dtype, param_dtype=self.param_dtype,
        )(x)
        x = nn.BatchNorm(
            use_running_average=not training, momentum=0.9, epsilon=1e-5,
            name="bn1", dtype=self.dtype, param_dtype=self.param_dtype,
        )(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        inplanes = stem_width
        stage_planes = [int(p * self.width_mult) for p in (64, 128, 256, 512)]
        stage_strides = [1, 2, 2, 2]
        expansion = EXPANSION if self.block == "bottleneck" else 1
        for s in range(4):
            planes = stage_planes[s]
            for b in range(self.layers[s]):
                stride = stage_strides[s] if b == 0 else 1
                has_ds = b == 0 and (stride != 1 or inplanes != planes * expansion)
                if self.block == "bottleneck":
                    x = Bottleneck(
                        planes=planes, stride=stride, has_downsample=has_ds,
                        group_width=self.group_width,
                        name=f"layer{s + 1}_{b}",
                        dtype=self.dtype,
                        param_dtype=self.param_dtype,
                    )(x, training=training)
                else:
                    x = BasicBlock(
                        planes=planes, stride=stride, has_downsample=has_ds,
                        name=f"layer{s + 1}_{b}",
                        dtype=self.dtype,
                        param_dtype=self.param_dtype,
                    )(x, training=training)
                inplanes = planes * expansion

        x = masking.global_avg_pool(x)
        return nn.Dense(
            self.num_classes, name="fc",
            kernel_init=torch_linear_kernel_init(),
            bias_init=torch_linear_bias_init(x.shape[-1]),
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(x)


def resnet18(**kwargs) -> ResNet:
    return ResNet(layers=(2, 2, 2, 2), block="basic", **kwargs)


def resnet34(**kwargs) -> ResNet:
    return ResNet(layers=(3, 4, 6, 3), block="basic", **kwargs)


def resnet50(**kwargs) -> ResNet:
    return ResNet(layers=(3, 4, 6, 3), **kwargs)


def resnet101(**kwargs) -> ResNet:
    return ResNet(layers=(3, 4, 23, 3), **kwargs)


def resnet152(**kwargs) -> ResNet:
    return ResNet(layers=(3, 8, 36, 3), **kwargs)


def resnet_dense_flops(layers: Sequence[int], input_size: int = 224,
                       width_mult: float = 1.0, num_classes: int = 1000) -> float:
    """Dense multiply-add count matching the reference's in-graph bookkeeping
    (what `laud_resnet.py` accumulates with all sparsities at 1.0)."""
    stem_w = int(64 * width_mult)
    h = input_size // 2
    flops = 3 * stem_w * h * h * 49
    h = input_size // 4
    flops += stem_w * h * h * 9  # maxpool, as counted by the reference
    inplanes = stem_w
    sizes = [input_size // 4, input_size // 8, input_size // 16, input_size // 32]
    for s, planes in enumerate(int(p * width_mult) for p in (64, 128, 256, 512)):
        out = sizes[s]
        for b in range(layers[s]):
            width = planes
            stride = (2 if s > 0 else 1) if b == 0 else 1
            hw = out * out
            # conv1 is 1x1 stride-1: it runs at the block *input* resolution
            flops += inplanes * width * hw * stride * stride
            flops += width * width * 9 * hw  # conv2 (stride applied here)
            flops += width * planes * EXPANSION * hw  # conv3
            if b == 0 and (s > 0 or inplanes != planes * EXPANSION):
                flops += inplanes * planes * EXPANSION * hw
            inplanes = planes * EXPANSION
        # next stage halves resolution (handled by sizes[])
    flops += inplanes  # global avg pool, reference counts C
    flops += inplanes * num_classes
    return float(flops)
