"""LAUD-ResNet: latency-aware unified dynamic ResNet (spatial/channel/layer).

TPU-native rebuild of the reference dynamic ResNet
(`imagenet_classification/models/laud_resnet.py`). Differences from the
reference are deliberate TPU idioms, not semantic changes:

* NHWC layout everywhere (TPU conv-native), HWIO kernels.
* The per-block threaded python state tuple becomes a :class:`BlockStats`
  pytree; the network stacks them into per-stage arrays.
* Masks stay dense 0/1 arrays in the training graph (already TPU-friendly —
  the reference trains the same way); the sparse inference fast path lives in
  :mod:`laudnet_tpu.ops.sparse` / Pallas kernels and is wired in separately.
* FLOPs bookkeeping follows the reference formulas verbatim
  (`laud_resnet.py:63-68,112-147`) so sparsity losses see identical values.

``dyn_mode`` per stage in {'channel', 'spatial', 'both', 'layer'}; layer mode
is a spatial masker with ``mask_size=1`` (`laud_resnet.py:72`).
"""

from __future__ import annotations

import math
from typing import Any, Sequence, Tuple

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp

from laudnet_tpu.models.maskers import (
    ChannelMaskerConvLinear,
    ChannelMaskerMLP,
    SpatialMasker,
    torch_default_bias_init as torch_linear_bias_init,
    torch_default_kernel_init as torch_linear_kernel_init,
)
from laudnet_tpu.ops import masking

EXPANSION = 4


def he_normal_fan_out():
    """torch ``kaiming_normal_(mode='fan_out', nonlinearity='relu')``."""
    return jax.nn.initializers.variance_scaling(2.0, "fan_out", "normal")


@flax.struct.dataclass
class BlockStats:
    """Per-block dynamic-execution statistics (all traced scalars)."""

    spatial_s3: jnp.ndarray  # conv3-output spatial density
    spatial_s2: jnp.ndarray  # conv2-input spatial density (dilated)
    spatial_s1: jnp.ndarray  # conv1-input spatial density (dilated + stride)
    channel_s: jnp.ndarray  # channel-group density
    flops_perc: jnp.ndarray  # sparse/dense FLOPs ratio for this block
    sparse_flops: jnp.ndarray  # absolute sparse FLOPs of this block
    s3_img: Any = None  # (B,) per-image conv3 spatial density
    # (B,) per-image sparse FLOPs — the same bookkeeping formulas evaluated
    # with per-image densities (reference accumulates genuinely per-image
    # FLOPs in eval-with-info, `mmdet/apis/test.py:75-145`)
    flops_img: Any = None
    # absolute dense FLOPs of this block (explicit accumulation for the
    # detection contract, reference `lad_mmdet_resnet.py:227,300-301` —
    # never derived as sparse/flops_perc, which underflows)
    dense_flops: Any = None


@flax.struct.dataclass
class LAUDOutput:
    """Network output contract, mirroring the reference's 7-tuple
    (`laud_resnet.py:363`) as a pytree."""

    logits: jnp.ndarray
    spatial_s3: Tuple[jnp.ndarray, ...]  # per-stage arrays, each (blocks,)
    spatial_s2: Tuple[jnp.ndarray, ...]
    spatial_s1: Tuple[jnp.ndarray, ...]
    channel_s: Tuple[jnp.ndarray, ...]
    flops_perc: jnp.ndarray  # (total_blocks,)
    flops: jnp.ndarray  # scalar, total sparse FLOPs (multiply-adds)
    # Per-image conv3 spatial densities, per stage, each (blocks, B). Batch
    # means hide per-image tails, so capacity calibration
    # (`infer/calibrate.py`) must quantile over THESE, not over spatial_s3.
    spatial_s3_img: Any = None


class LAUDBottleneck(nn.Module):
    """Dynamic bottleneck: 1x1 -> 3x3 -> 1x1 with gating heads.

    Reference `laud_resnet.py:24-165`. Channel masks gate conv1/conv2 outputs;
    the spatial mask gates the conv3 output (post-bn3); the dilated spatial
    masks only feed the FLOPs bookkeeping (they describe which input pixels a
    sparse executor would need).
    """

    planes: int
    stride: int = 1
    has_downsample: bool = False
    group_width: int = 1
    dilation: int = 1
    spatial_mask_channel_group: int = 1
    channel_dyn_granularity: int = 1
    # int (square, the ImageNet path) or (h, w) tuple (rectangular
    # detection features, reference `resnet_sd.py:713`)
    output_size: Any = 56
    mask_spatial_granularity: int = 1
    dyn_mode: str = "both"
    channel_masker: str = "conv_linear"
    channel_masker_layers: int = 2
    reduction: int = 16
    execution: str = "dense"  # 'dense' | 'sparse' (eval-time patch gather)
    patch_capacity: float = 1.0  # fraction of patch slots kept in sparse mode
    bn_eval: bool = False  # freeze BN (norm_eval) while keeping Gumbel sampling
    # 'dense' | 'int8' | 'int8_qat': W8A8 convs at EVAL
    # (`ops/quant.py::QuantConv`, checkpoint-compatible params). The
    # masker heads, BN, and mask algebra stay float, so the per-input
    # gating stays fully dynamic — only the conv arithmetic quantizes.
    # 'int8_qat' additionally fake-quantizes in TRAINING
    # (straight-through gradients): the train graph sees the serving
    # path's int8 numerics — including the gate flips quantization noise
    # causes at the masker inputs — so fine-tuning re-stabilizes the
    # gates before int8 deployment.
    conv_impl: str = "dense"
    param_dtype: Any = jnp.float32
    # AMP compute dtype (None = promote inputs/params, the exact f32
    # default). bf16 runs every conv/BN/dense in bfloat16 while params
    # (and BN stats) stay f32 master copies; the gating heads force f32
    # internally (`models/maskers.py`) so mask decisions are unchanged
    # in expectation. The reference cannot do this (it pins
    # use_amp=False, `train/main.py:138`); on TPU bf16 is native MXU.
    dtype: Any = None

    def _sparse_eligible(self, training: bool) -> bool:
        """Sparse gather/scatter path: eval-only, spatial mode, stride-1,
        single mask group, real patch grid (not layer mode)."""
        return (
            self.execution == "sparse"
            and not training
            and self.dyn_mode == "spatial"
            and self.stride == 1
            and self.spatial_mask_channel_group == 1
        )

    @nn.compact
    def __call__(self, x, temperature, *, training: bool):
        assert self.dyn_mode in ("channel", "spatial", "both", "layer")
        inplanes = x.shape[-1]
        width = self.planes * self.group_width
        Conv = nn.Conv
        if (self.conv_impl == "int8" and not training) or (
                self.conv_impl == "int8_qat"):
            import functools

            from laudnet_tpu.ops.quant import QuantConv

            # int8_qat: fake-quant float convs in training, real s8 at
            # eval (same contract as LAUDViT linear_impl='int8_qat')
            Conv = functools.partial(
                QuantConv, fake=self.conv_impl == "int8_qat" and training)
        out_planes = self.planes * EXPANSION
        channel_dyn_group = width // self.channel_dyn_granularity
        if isinstance(self.output_size, int):
            out_h = out_w = self.output_size
        else:
            out_h, out_w = self.output_size
        mask_size = (
            (max(out_h // self.mask_spatial_granularity, 1),
             max(out_w // self.mask_spatial_granularity, 1))
            if self.dyn_mode != "layer"
            else (1, 1)
        )

        conv1_fpp = inplanes * width
        conv2_fpp = width * width * 9 // self.group_width
        conv3_fpp = width * out_planes
        f32 = lambda v: jnp.asarray(v, jnp.float32)

        # --- gating heads -------------------------------------------------
        one = f32(1.0)
        channel_mask = None
        spatial_mask3 = None
        channel_s = one
        s1 = s2 = s3 = one
        channel_mask_flops = 0
        spatial_mask_flops = 0

        if self.dyn_mode in ("channel", "both"):
            if self.channel_masker == "conv_linear":
                masker_channel = ChannelMaskerConvLinear(
                    channel_dyn_group,
                    reduction=self.reduction,
                    bn_eval=self.bn_eval,
                    name="masker_channel",
                    param_dtype=self.param_dtype,
                )
            else:
                masker_channel = ChannelMaskerMLP(
                    channel_dyn_group,
                    layers=self.channel_masker_layers,
                    reduction=self.reduction,
                    name="masker_channel",
                    param_dtype=self.param_dtype,
                )
            channel_mask, channel_s, channel_mask_flops = masker_channel(
                x, temperature, training=training
            )
        if self.dyn_mode in ("spatial", "layer", "both"):
            spatial_mask3, s3, spatial_mask_flops = SpatialMasker(
                self.spatial_mask_channel_group,
                mask_size,
                name="masker_spatial",
                param_dtype=self.param_dtype,
            )(x, temperature, training=training)

        spatial_mask3_small = spatial_mask3  # pre-upsample (B, m, m, g) mask
        batch = x.shape[0]
        s3_img = jnp.ones((batch,), jnp.float32)
        s1_img = s2_img = jnp.ones((batch,), jnp.float32)
        ch_img = (channel_mask.astype(jnp.float32).mean(axis=-1)
                  if channel_mask is not None
                  else jnp.ones((batch,), jnp.float32))
        if self.dyn_mode != "channel":
            s3_img = spatial_mask3_small.astype(jnp.float32).mean(
                axis=(1, 2, 3)
            )
            # Upsample the coarse conv3-output mask to full resolution, then
            # dilate backwards through conv2 (1x1-equivalent: group OR) and
            # conv1 (3x3 RF + stride) — reference `laud_resnet.py:105-110`.
            spatial_mask3 = masking.upsample_mask_nearest(
                spatial_mask3, (out_h, out_w)
            )
            # The dilated input-side masks feed only the FLOPs bookkeeping,
            # never the compute — but the bookkeeping must stay EXACT (it
            # feeds losses and eval-info accounting), so the dilations are
            # always computed: two bool reduce_windows per block, negligible
            # next to the convs. (An approximate fast path existed in r1 and
            # silently misreported s1/s2 at granularity > 1 — removed.)
            spatial_mask2 = masking.expand_mask(
                spatial_mask3, stride=1, padding=0
            )
            s2_img = spatial_mask2.astype(jnp.float32).mean(axis=(1, 2, 3))
            s2 = s2_img.mean()
            spatial_mask1 = masking.expand_mask(
                spatial_mask2, stride=self.stride, padding=1
            )
            s1_img = spatial_mask1.astype(jnp.float32).mean(axis=(1, 2, 3))
            s1 = s1_img.mean()

        sparse_flops = f32(channel_mask_flops + spatial_mask_flops)
        dense_flops = f32(channel_mask_flops + spatial_mask_flops)

        bn = lambda name: nn.BatchNorm(
            use_running_average=(not training) or self.bn_eval,
            momentum=0.9,
            epsilon=1e-5,
            name=name,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )
        conv1 = Conv(
            width, (1, 1), use_bias=False, kernel_init=he_normal_fan_out(),
            name="conv1", dtype=self.dtype, param_dtype=self.param_dtype,
        )
        conv3 = Conv(
            out_planes, (1, 1), use_bias=False, kernel_init=he_normal_fan_out(),
            name="conv3", dtype=self.dtype, param_dtype=self.param_dtype,
        )

        # FLOPs bookkeeping (reference `laud_resnet.py:120-141`); spatial
        # sizes are static so this is identical for both execution paths.
        # conv1 runs at the block-input resolution (the stride sits on
        # conv2), so in_hw comes from the traced input shape — equal to
        # (output_size*stride)^2 on even ImageNet sizes and correct for the
        # ceil-divided rectangular detection sizes.
        in_hw = x.shape[1] * x.shape[2]
        out_hw = out_h * out_w
        dense_flops += conv1_fpp * in_hw + conv2_fpp * out_hw + conv3_fpp * out_hw
        sparse_flops += conv1_fpp * in_hw * channel_s * s1
        sparse_flops += conv2_fpp * out_hw * channel_s**2 * s2
        sparse_flops += conv3_fpp * out_hw * channel_s * s3
        # The same formulas with per-image densities (eval-with-info's
        # per-image accounting, `mmdet/apis/test.py:75-145`); batch-mean of
        # flops_img differs from sparse_flops only in the conv2 channel
        # term (E[c]^2 vs E[c^2]) — the per-image vector is the honest one.
        flops_img = (f32(channel_mask_flops + spatial_mask_flops)
                     + conv1_fpp * in_hw * ch_img * s1_img
                     + conv2_fpp * out_hw * ch_img**2 * s2_img
                     + conv3_fpp * out_hw * ch_img * s3_img)

        identity = x
        if self.has_downsample:
            identity = Conv(
                out_planes, (1, 1), strides=self.stride, use_bias=False,
                kernel_init=he_normal_fan_out(), name="downsample_conv",
                dtype=self.dtype, param_dtype=self.param_dtype,
            )(x)
            identity = bn("downsample_bn")(identity)
            dense_flops += inplanes * out_planes * out_hw
            sparse_flops += inplanes * out_planes * out_hw
            flops_img = flops_img + inplanes * out_planes * out_hw

        if self._sparse_eligible(training):
            # Sparse execution: the TPU realization of the reference's
            # *simulated* gather->conv->scatter pipeline
            # (`DyNetSimulator/eval_example.py:31-60`): conv1 stays dense,
            # conv2+conv3 run only on fixed-capacity gathered patches, and
            # the results scatter-add onto the identity.
            from laudnet_tpu.ops import sparse as sp

            patch = self.mask_spatial_granularity
            n_cells = mask_size[0] * mask_size[1]
            capacity = max(
                1, min(n_cells, math.ceil(self.patch_capacity * n_cells))
            )

            x1 = nn.relu(bn("bn1")(conv1(x)))

            cells = spatial_mask3_small[..., 0]  # (B, m, m) pre-upsample
            idx, valid = sp.select_patches(cells, capacity)
            g = sp.gather_patches(x1, idx, patch, halo=1)
            b_, k_, ph, pw, cg = g.shape
            gflat = g.reshape(b_ * k_, ph, pw, cg)
            gflat = Conv(
                width, (3, 3), padding="VALID",
                feature_group_count=self.group_width, use_bias=False,
                kernel_init=he_normal_fan_out(), name="conv2",
                dtype=self.dtype, param_dtype=self.param_dtype,
            )(gflat)
            gflat = nn.relu(bn("bn2")(gflat))
            gflat = conv3(gflat)
            gflat = bn("bn3")(gflat)
            patches = gflat.reshape(b_, k_, patch, patch, out_planes)
            out = sp.scatter_patches_add(identity, patches, idx, valid, patch)
        else:
            out = conv1(x)
            if self.dyn_mode in ("channel", "both"):
                out = masking.apply_channel_mask(out, channel_mask)
            out = nn.relu(bn("bn1")(out))

            out = Conv(
                width, (3, 3), strides=self.stride, padding=self.dilation,
                kernel_dilation=self.dilation,
                feature_group_count=self.group_width, use_bias=False,
                kernel_init=he_normal_fan_out(), name="conv2",
                dtype=self.dtype, param_dtype=self.param_dtype,
            )(out)
            if self.dyn_mode in ("channel", "both"):
                out = masking.apply_channel_mask(out, channel_mask)
            out = nn.relu(bn("bn2")(out))

            out = conv3(out)
            out = bn("bn3")(out)
            if self.dyn_mode in ("layer", "spatial", "both"):
                out = masking.apply_spatial_mask(out, spatial_mask3)
            out = out + identity

        out = nn.relu(out)

        stats = BlockStats(
            spatial_s3=s3,
            spatial_s2=s2,
            spatial_s1=s1,
            channel_s=channel_s,
            flops_perc=sparse_flops / dense_flops,
            sparse_flops=sparse_flops,
            s3_img=s3_img,
            dense_flops=dense_flops,
            flops_img=flops_img,
        )
        return out, stats


class LAUDResNet(nn.Module):
    """Full dynamic ResNet. Reference `laud_resnet.py:167-363`.

    Returns :class:`LAUDOutput`. Per-stage config tuples have length 4.
    """

    layers: Sequence[int]
    num_classes: int = 1000
    width_mult: float = 1.0
    input_size: int = 224
    group_width: int = 1
    spatial_mask_channel_group: Sequence[int] = (1, 1, 1, 1)
    mask_spatial_granularity: Sequence[int] = (1, 1, 1, 1)
    channel_dyn_granularity: Sequence[int] = (1, 1, 1, 1)
    dyn_mode: Sequence[str] = ("both",) * 4
    channel_masker: Sequence[str] = ("MLP",) * 4
    channel_masker_layers: Sequence[int] = (1, 1, 1, 1)
    reduction_ratio: Sequence[int] = (16, 16, 16, 16)
    execution: str = "dense"  # 'dense' | 'sparse' eval fast path
    patch_capacity: Sequence[float] = (1.0, 1.0, 1.0, 1.0)  # per stage
    # 'dense' | 'int8' | 'int8_qat': W8A8 convs at eval; masks stay
    # fully dynamic. 'int8_qat' fake-quantizes in training (QAT).
    conv_impl: str = "dense"
    param_dtype: Any = jnp.float32
    # AMP compute dtype (see LAUDBottleneck.dtype); None = exact f32.
    dtype: Any = None

    @nn.compact
    def __call__(self, x, temperature, *, training: bool = False):
        stem_width = int(64 * self.width_mult)
        c_in = x.shape[-1]
        StemConv = nn.Conv
        if (self.conv_impl == "int8" and not training) or (
                self.conv_impl == "int8_qat"):
            import functools

            from laudnet_tpu.ops.quant import QuantConv

            StemConv = functools.partial(
                QuantConv, fake=self.conv_impl == "int8_qat" and training)
        x = StemConv(
            stem_width,
            (7, 7),
            strides=2,
            padding=3,
            use_bias=False,
            kernel_init=he_normal_fan_out(),
            name="conv1",
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(x)
        x = nn.BatchNorm(
            use_running_average=not training,
            momentum=0.9,
            epsilon=1e-5,
            name="bn1",
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(x)
        x = nn.relu(x)
        flops = jnp.asarray(
            c_in * x.shape[-1] * x.shape[1] * x.shape[2] * 49, jnp.float32
        )
        x = nn.max_pool(
            x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1))
        )
        flops += x.shape[-1] * x.shape[1] * x.shape[2] * 9

        inplanes = stem_width
        stage_planes = [int(p * self.width_mult) for p in (64, 128, 256, 512)]
        stage_strides = [1, 2, 2, 2]
        stage_out_sizes = [
            self.input_size // 4,
            self.input_size // 8,
            self.input_size // 16,
            self.input_size // 32,
        ]

        per_stage = {"s3": [], "s2": [], "s1": [], "ch": [], "s3i": []}
        flops_perc_all = []

        for s in range(4):
            planes = stage_planes[s]
            stats_s3, stats_s2, stats_s1, stats_ch = [], [], [], []
            stats_s3i = []
            for b in range(self.layers[s]):
                stride = stage_strides[s] if b == 0 else 1
                has_ds = b == 0 and (
                    stride != 1 or inplanes != planes * EXPANSION
                )
                x, st = LAUDBottleneck(
                    planes=planes,
                    stride=stride,
                    has_downsample=has_ds,
                    group_width=self.group_width,
                    spatial_mask_channel_group=self.spatial_mask_channel_group[s],
                    channel_dyn_granularity=self.channel_dyn_granularity[s],
                    output_size=stage_out_sizes[s],
                    mask_spatial_granularity=self.mask_spatial_granularity[s],
                    dyn_mode=self.dyn_mode[s],
                    channel_masker=self.channel_masker[s],
                    channel_masker_layers=self.channel_masker_layers[s],
                    reduction=self.reduction_ratio[s],
                    execution=self.execution,
                    patch_capacity=self.patch_capacity[s],
                    conv_impl=self.conv_impl,
                    name=f"layer{s + 1}_{b}",
                    dtype=self.dtype,
                    param_dtype=self.param_dtype,
                )(x, temperature, training=training)
                inplanes = planes * EXPANSION
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
            self.num_classes,
            name="fc",
            kernel_init=torch_linear_kernel_init(),
            bias_init=torch_linear_bias_init(x.shape[-1]),
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


# torch nn.Linear default init: re-exported from maskers.py (single
# definition) as torch_linear_{kernel,bias}_init for resnet.py.


def uni_resnet50(**kwargs) -> LAUDResNet:
    """LAUD-ResNet-50 (reference `laud_resnet.py:413-423`)."""
    return LAUDResNet(layers=(3, 4, 6, 3), **kwargs)


def uni_resnet101(**kwargs) -> LAUDResNet:
    """LAUD-ResNet-101 (reference `laud_resnet.py:426-436`)."""
    return LAUDResNet(layers=(3, 4, 23, 3), **kwargs)
