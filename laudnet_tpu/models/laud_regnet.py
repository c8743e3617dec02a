"""LAUD-RegNet: dynamic RegNet X/Y with spatial/channel gating (+ static mode).

TPU-native rebuild of the reference dynamic RegNet
(`imagenet_classification/models/laud_regnet.py`). One implementation covers
both the dynamic models and the static teachers (`models/regnet.py`): pass
``dyn_mode='none'`` per stage for a plain block.

Architecture per block (`laud_regnet.py:74-217`): 1x1 conv-bn-relu ("a") ->
3x3 grouped conv-bn-relu ("b") -> optional SqueezeExcitation -> 1x1 conv-bn
("c"), residual with projection when shape changes. Channel masks gate a/b
outputs; the spatial mask gates c's output. The SE squeeze width is
``round(se_ratio * width_in)`` — relative to the block *input*, a RegNet
quirk the reference keeps (`laud_regnet.py:117-124`).

FLOPs accounting matches the reference exactly, including its quirk of
adding SE FLOPs to the running total but *not* to the per-block
sparse/dense ratio (`laud_regnet.py:190-195`).

Width/depth generation (`BlockParams.from_init_params`,
`laud_regnet.py:357-445`) uses the published RegNet recipe: log-space
quantized linear widths, stage splits, group-width compatibility.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from laudnet_tpu.models.laud_resnet import (
    LAUDOutput,
    he_normal_fan_out,
    torch_linear_bias_init,
)
from laudnet_tpu.models.maskers import (
    ChannelMaskerConvLinear,
    ChannelMaskerMLP,
    SpatialMasker,
)
from laudnet_tpu.ops import masking


def _make_divisible(v: float, divisor: int) -> int:
    min_value = divisor
    new_v = max(min_value, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


@flax.struct.dataclass
class RegNetParams:
    depths: Tuple[int, ...] = flax.struct.field(pytree_node=False)
    widths: Tuple[int, ...] = flax.struct.field(pytree_node=False)
    group_widths: Tuple[int, ...] = flax.struct.field(pytree_node=False)
    bottleneck_multipliers: Tuple[float, ...] = flax.struct.field(
        pytree_node=False
    )
    se_ratio: Optional[float] = flax.struct.field(pytree_node=False)


def regnet_params(depth: int, w_0: int, w_a: float, w_m: float,
                  group_width: int, bottleneck_multiplier: float = 1.0,
                  se_ratio: Optional[float] = None) -> RegNetParams:
    """Generate per-stage widths/depths from RegNet design-space params
    (the published recipe; reference `laud_regnet.py:372-445`)."""
    if w_a < 0 or w_0 <= 0 or w_m <= 1 or w_0 % 8 != 0:
        raise ValueError("Invalid RegNet settings")
    quant = 8
    widths_cont = np.arange(depth) * w_a + w_0
    capacity = np.round(np.log(widths_cont / w_0) / math.log(w_m))
    block_widths = (
        np.round(w_0 * np.power(w_m, capacity) / quant) * quant
    ).astype(int).tolist()

    split = [
        w != wp for w, wp in zip(block_widths + [0], [0] + block_widths)
    ]
    stage_widths = [w for w, t in zip(block_widths, split[:-1]) if t]
    boundaries = [d for d, t in enumerate(split) if t]
    stage_depths = np.diff(boundaries).astype(int).tolist()

    n = len(stage_widths)
    bms = [bottleneck_multiplier] * n
    gws = [group_width] * n

    # group-width compatibility: bottleneck widths divisible by group width
    w_bots = [int(w * b) for w, b in zip(stage_widths, bms)]
    gws = [min(g, wb) for g, wb in zip(gws, w_bots)]
    w_bots = [_make_divisible(wb, g) for wb, g in zip(w_bots, gws)]
    stage_widths = [int(wb / b) for wb, b in zip(w_bots, bms)]

    return RegNetParams(
        depths=tuple(stage_depths),
        widths=tuple(stage_widths),
        group_widths=tuple(gws),
        bottleneck_multipliers=tuple(bms),
        se_ratio=se_ratio,
    )


class SqueezeExcitation(nn.Module):
    """Torchvision-style SE: GAP -> 1x1 conv -> relu -> 1x1 conv -> sigmoid."""

    squeeze_channels: int
    param_dtype: Any = jnp.float32
    dtype: Any = None  # AMP compute dtype (None = exact f32 promotion)

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        s = masking.global_avg_pool(x)[:, None, None, :]
        # the reference's init loop applies kaiming_normal fan_out to EVERY
        # non-masker conv, SE included (`laud_regnet.py:562-566`); biases
        # keep torch's Conv2d default uniform
        s = nn.Conv(self.squeeze_channels, (1, 1), use_bias=True, name="fc1",
                    kernel_init=he_normal_fan_out(),
                    bias_init=torch_linear_bias_init(c),
                    dtype=self.dtype, param_dtype=self.param_dtype)(s)
        s = nn.relu(s)
        s = nn.Conv(c, (1, 1), use_bias=True, name="fc2",
                    kernel_init=he_normal_fan_out(),
                    bias_init=torch_linear_bias_init(self.squeeze_channels),
                    dtype=self.dtype, param_dtype=self.param_dtype)(s)
        return x * jax.nn.sigmoid(s)


class LAUDRegNetBlock(nn.Module):
    """Residual bottleneck block (ResBottleneckBlock + BottleneckTransform,
    reference `laud_regnet.py:74-295`), with ``dyn_mode='none'`` as the
    static-teacher path."""

    width_out: int
    stride: int = 1
    group_width: int = 16
    bottleneck_multiplier: float = 1.0
    se_ratio: Optional[float] = None
    spatial_mask_channel_group: int = 1
    channel_dyn_granularity: int = 1
    output_size: int = 56
    mask_spatial_granularity: int = 1
    dyn_mode: str = "both"
    channel_masker: str = "conv_linear"
    channel_masker_layers: int = 2
    reduction: int = 16
    param_dtype: Any = jnp.float32
    # AMP compute dtype; gating heads stay f32 (`models/maskers.py`) so
    # mask decisions match the f32 path in expectation. None = exact f32.
    dtype: Any = None

    @nn.compact
    def __call__(self, x, temperature, *, training: bool):
        assert self.dyn_mode in ("channel", "spatial", "both", "none")
        width_in = x.shape[-1]
        w_b = int(round(self.width_out * self.bottleneck_multiplier))
        groups = w_b // self.group_width
        mask_size = self.output_size // self.mask_spatial_granularity
        dyn = self.dyn_mode

        bn = lambda name: nn.BatchNorm(
            use_running_average=not training, momentum=0.9, epsilon=1e-5,
            name=name, dtype=self.dtype, param_dtype=self.param_dtype,
        )
        f32 = lambda v: jnp.asarray(v, jnp.float32)
        one = f32(1.0)

        conv1_fpp = width_in * w_b
        conv2_fpp = w_b * w_b * 9 // groups
        conv3_fpp = w_b * self.width_out
        width_se = int(round((self.se_ratio or 0) * width_in))
        se_fpp = w_b * width_se * 2 if self.se_ratio else 0

        # --- gating heads ---------------------------------------------
        channel_mask = None
        spatial_mask3 = None
        channel_s = one
        s1 = s2 = s3 = one
        channel_mask_flops = 0
        spatial_mask_flops = 0
        if dyn in ("channel", "both"):
            g = w_b // self.channel_dyn_granularity
            if self.channel_masker == "conv_linear":
                mk = ChannelMaskerConvLinear(
                    g, reduction=self.reduction, name="masker_channel",
                    param_dtype=self.param_dtype,
                )
            else:
                mk = ChannelMaskerMLP(
                    g, layers=self.channel_masker_layers,
                    reduction=self.reduction, name="masker_channel",
                    param_dtype=self.param_dtype,
                )
            channel_mask, channel_s, channel_mask_flops = mk(
                x, temperature, training=training
            )
        s3_img = jnp.ones((x.shape[0],), jnp.float32)
        if dyn in ("spatial", "both"):
            spatial_mask3, s3, spatial_mask_flops = SpatialMasker(
                self.spatial_mask_channel_group, mask_size,
                name="masker_spatial", param_dtype=self.param_dtype,
            )(x, temperature, training=training)
            s3_img = spatial_mask3.astype(jnp.float32).mean(axis=(1, 2, 3))
            spatial_mask3 = masking.upsample_mask_nearest(
                spatial_mask3, self.output_size
            )
            m2 = masking.expand_mask(spatial_mask3, stride=1, padding=0)
            s2 = m2.astype(jnp.float32).mean()
            m1 = masking.expand_mask(m2, stride=self.stride, padding=1)
            s1 = m1.astype(jnp.float32).mean()

        sparse_flops = f32(channel_mask_flops + spatial_mask_flops)
        dense_flops = f32(channel_mask_flops + spatial_mask_flops)
        in_hw = (self.output_size * self.stride) ** 2
        out_hw = self.output_size**2

        # --- transform -------------------------------------------------
        out = nn.Conv(w_b, (1, 1), use_bias=False,
                      kernel_init=he_normal_fan_out(), name="a_conv",
                      dtype=self.dtype, param_dtype=self.param_dtype)(x)
        if dyn in ("channel", "both"):
            out = masking.apply_channel_mask(out, channel_mask)
        out = nn.relu(bn("a_bn")(out))
        dense_flops += conv1_fpp * in_hw
        sparse_flops += conv1_fpp * in_hw * channel_s * s1

        out = nn.Conv(w_b, (3, 3), strides=self.stride, padding=1,
                      feature_group_count=groups, use_bias=False,
                      kernel_init=he_normal_fan_out(), name="b_conv",
                      dtype=self.dtype, param_dtype=self.param_dtype)(out)
        if dyn in ("channel", "both"):
            out = masking.apply_channel_mask(out, channel_mask)
        out = nn.relu(bn("b_bn")(out))
        dense_flops += conv2_fpp * out_hw
        sparse_flops += conv2_fpp * out_hw * channel_s**2 * s2

        se_flops = 0
        if self.se_ratio:
            out = SqueezeExcitation(width_se, name="se", dtype=self.dtype,
                                    param_dtype=self.param_dtype)(out)
            se_flops = se_fpp  # counted dense, outside flops_perc
            # (reference quirk, `laud_regnet.py:190-195`)

        out = nn.Conv(self.width_out, (1, 1), use_bias=False,
                      kernel_init=he_normal_fan_out(), name="c_conv",
                      dtype=self.dtype, param_dtype=self.param_dtype)(out)
        out = bn("c_bn")(out)
        if dyn in ("spatial", "both"):
            out = masking.apply_spatial_mask(out, spatial_mask3)
        dense_flops += conv3_fpp * out_hw
        sparse_flops += conv3_fpp * out_hw * channel_s * s3

        identity = x
        if self.stride != 1 or width_in != self.width_out:
            identity = nn.Conv(self.width_out, (1, 1), strides=self.stride,
                               use_bias=False,
                               kernel_init=he_normal_fan_out(),
                               name="proj_conv", dtype=self.dtype,
                               param_dtype=self.param_dtype)(x)
            identity = bn("proj_bn")(identity)
            ds = width_in * self.width_out * out_hw
            dense_flops += ds
            sparse_flops += ds

        out = nn.relu(out + identity)

        from laudnet_tpu.models.laud_resnet import BlockStats

        stats = BlockStats(
            spatial_s3=s3, spatial_s2=s2, spatial_s1=s1, channel_s=channel_s,
            flops_perc=sparse_flops / dense_flops,
            sparse_flops=sparse_flops + se_flops,
            s3_img=s3_img,
            dense_flops=dense_flops + se_flops,
        )
        return out, stats


class LAUDRegNet(nn.Module):
    """Full dynamic RegNet (reference `laud_regnet.py:478-637`)."""

    params_cfg: RegNetParams
    num_classes: int = 1000
    stem_width: int = 32
    input_size: int = 224
    spatial_mask_channel_group: Sequence[int] = (1, 1, 1, 1)
    mask_spatial_granularity: Sequence[int] = (1, 1, 1, 1)
    channel_dyn_granularity: Sequence[int] = (1, 1, 1, 1)
    dyn_mode: Sequence[str] = ("both",) * 4
    channel_masker: Sequence[str] = ("MLP",) * 4
    channel_masker_layers: Sequence[int] = (1, 1, 1, 1)
    reduction_ratio: Sequence[int] = (16, 16, 16, 16)
    param_dtype: Any = jnp.float32
    dtype: Any = None  # AMP compute dtype (see LAUDRegNetBlock.dtype)

    @nn.compact
    def __call__(self, x, temperature, *, training: bool = False):
        p = self.params_cfg
        c_in = x.shape[-1]
        x = nn.Conv(self.stem_width, (3, 3), strides=2, padding=1,
                    use_bias=False, kernel_init=he_normal_fan_out(),
                    name="stem_conv", dtype=self.dtype,
                    param_dtype=self.param_dtype)(x)
        x = nn.BatchNorm(use_running_average=not training, momentum=0.9,
                         epsilon=1e-5, name="stem_bn", dtype=self.dtype,
                         param_dtype=self.param_dtype)(x)
        x = nn.relu(x)
        flops = jnp.asarray(
            c_in * x.shape[-1] * x.shape[1] * x.shape[2] * 9, jnp.float32
        )

        per_stage = {"s3": [], "s2": [], "s1": [], "ch": [], "s3i": []}
        flops_perc_all = []
        for s in range(len(p.depths)):
            stats_s3, stats_s2, stats_s1, stats_ch = [], [], [], []
            stats_s3i = []
            out_size = self.input_size // (2 ** (s + 2))
            for b in range(p.depths[s]):
                x, st = LAUDRegNetBlock(
                    width_out=p.widths[s],
                    stride=2 if b == 0 else 1,
                    group_width=p.group_widths[s],
                    bottleneck_multiplier=p.bottleneck_multipliers[s],
                    se_ratio=p.se_ratio,
                    spatial_mask_channel_group=self.spatial_mask_channel_group[s],
                    channel_dyn_granularity=self.channel_dyn_granularity[s],
                    output_size=out_size,
                    mask_spatial_granularity=self.mask_spatial_granularity[s],
                    dyn_mode=self.dyn_mode[s],
                    channel_masker=self.channel_masker[s],
                    channel_masker_layers=self.channel_masker_layers[s],
                    reduction=self.reduction_ratio[s],
                    name=f"stage{s + 1}_{b}",
                    dtype=self.dtype,
                    param_dtype=self.param_dtype,
                )(x, temperature, training=training)
                stats_s3.append(st.spatial_s3)
                stats_s2.append(st.spatial_s2)
                stats_s1.append(st.spatial_s1)
                stats_ch.append(st.channel_s)
                stats_s3i.append(st.s3_img)
                flops_perc_all.append(st.flops_perc)
                flops += st.sparse_flops
            per_stage["s3"].append(jnp.stack(stats_s3))
            per_stage["s2"].append(jnp.stack(stats_s2))
            per_stage["s1"].append(jnp.stack(stats_s1))
            per_stage["ch"].append(jnp.stack(stats_ch))
            per_stage["s3i"].append(jnp.stack(stats_s3i))

        x = masking.global_avg_pool(x)
        flops += x.shape[-1]
        logits = nn.Dense(
            self.num_classes, name="fc",
            kernel_init=jax.nn.initializers.normal(0.01),
            bias_init=jax.nn.initializers.zeros,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(x)
        flops += x.shape[-1] * self.num_classes

        return LAUDOutput(
            logits=logits,
            spatial_s3=tuple(per_stage["s3"]),
            spatial_s2=tuple(per_stage["s2"]),
            spatial_s1=tuple(per_stage["s1"]),
            channel_s=tuple(per_stage["ch"]),
            flops_perc=jnp.stack(flops_perc_all),
            flops=flops,
            spatial_s3_img=tuple(per_stage["s3i"]),
        )


# --- constructors (published RegNet design-space params,
#     reference `laud_regnet.py:671-872`) ---------------------------------

_REGNET_CFGS = {
    "y_400mf": dict(depth=16, w_0=48, w_a=27.89, w_m=2.09, group_width=8,
                    se_ratio=0.25),
    "y_800mf": dict(depth=14, w_0=56, w_a=38.84, w_m=2.4, group_width=16,
                    se_ratio=0.25),
    "y_1_6gf": dict(depth=27, w_0=48, w_a=20.71, w_m=2.65, group_width=24,
                    se_ratio=0.25),
    "y_3_2gf": dict(depth=21, w_0=80, w_a=42.63, w_m=2.66, group_width=24,
                    se_ratio=0.25),
    "y_8gf": dict(depth=17, w_0=192, w_a=76.82, w_m=2.19, group_width=56,
                  se_ratio=0.25),
    "y_16gf": dict(depth=18, w_0=200, w_a=106.23, w_m=2.48, group_width=112,
                   se_ratio=0.25),
    "y_32gf": dict(depth=20, w_0=232, w_a=115.89, w_m=2.53, group_width=232,
                   se_ratio=0.25),
    "y_128gf": dict(depth=27, w_0=456, w_a=160.83, w_m=2.52, group_width=264,
                    se_ratio=0.25),
    "x_400mf": dict(depth=22, w_0=24, w_a=24.48, w_m=2.54, group_width=16),
    "x_800mf": dict(depth=16, w_0=56, w_a=35.73, w_m=2.28, group_width=16),
    "x_1_6gf": dict(depth=18, w_0=80, w_a=34.01, w_m=2.25, group_width=24),
    "x_3_2gf": dict(depth=25, w_0=88, w_a=26.31, w_m=2.25, group_width=48),
    "x_8gf": dict(depth=23, w_0=80, w_a=49.56, w_m=2.88, group_width=120),
    "x_16gf": dict(depth=22, w_0=216, w_a=55.59, w_m=2.1, group_width=128),
    "x_32gf": dict(depth=23, w_0=320, w_a=69.86, w_m=2.0, group_width=168),
}


def _make_ctor(key):
    def ctor(**kwargs) -> LAUDRegNet:
        return LAUDRegNet(params_cfg=regnet_params(**_REGNET_CFGS[key]),
                          **kwargs)

    ctor.__name__ = f"lad_regnet_{key}"
    ctor.__doc__ = (
        f"LAUD-RegNet-{key.upper()} (reference `laud_regnet.py:671-872`)."
    )
    return ctor


lad_regnet_y_400mf = _make_ctor("y_400mf")
lad_regnet_y_800mf = _make_ctor("y_800mf")
lad_regnet_y_1_6gf = _make_ctor("y_1_6gf")
lad_regnet_y_3_2gf = _make_ctor("y_3_2gf")
lad_regnet_y_8gf = _make_ctor("y_8gf")
lad_regnet_y_16gf = _make_ctor("y_16gf")
lad_regnet_y_32gf = _make_ctor("y_32gf")
lad_regnet_y_128gf = _make_ctor("y_128gf")
lad_regnet_x_400mf = _make_ctor("x_400mf")
lad_regnet_x_800mf = _make_ctor("x_800mf")
lad_regnet_x_1_6gf = _make_ctor("x_1_6gf")
lad_regnet_x_3_2gf = _make_ctor("x_3_2gf")
lad_regnet_x_8gf = _make_ctor("x_8gf")
lad_regnet_x_16gf = _make_ctor("x_16gf")
lad_regnet_x_32gf = _make_ctor("x_32gf")


def regnet_static(key: str, **kwargs) -> LAUDRegNet:
    """Static RegNet teacher (the reference's `models/regnet.py` role):
    same architecture with all gating disabled."""
    n_stages = 4
    return LAUDRegNet(
        params_cfg=regnet_params(**_REGNET_CFGS[key]),
        dyn_mode=("none",) * n_stages,
        **kwargs,
    )
