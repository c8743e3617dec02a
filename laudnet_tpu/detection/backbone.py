"""LAUD-ResNet detection backbone (reference `lad_mmdet_resnet.py`).

Multi-scale feature extractor with the reference's detector contract
(`mmdetection-3.3.0/.../lad_mmdet_resnet.py:736-754`): forward returns
``(features, additional, model_configs)`` where ``features`` are the
requested stage outputs, ``additional`` carries sparsities and
sparse/dense FLOPs (feeding the detector's ``loss_sparse`` and the
eval-with-info accounting), and ``model_configs`` carries
``dyn_mode``/``sparsity_target``.

Detection-specific behaviors reproduced: **fixed Gumbel temperature**
(`lad_mmdet_resnet.py:679-682` — detectors never anneal), optional frozen
stages, and ``norm_eval`` (BN always uses running stats,
`lad_mmdet_resnet.py:753-762`). Mask sizes derive from the traced feature
resolution, so each input size compiles its own masks; rectangular inputs
(COCO's 800x1333 family) pool a per-dimension masker grid and
nearest-interpolate the mask onto the rectangular feature map, exactly the
reference's scheme (`resnet_sd.py:713`, `lad_mmdet_resnet.py:274`).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from laudnet_tpu.models.laud_resnet import EXPANSION, LAUDBottleneck, he_normal_fan_out


class LAUDDetBackbone(nn.Module):
    """LAUD-ResNet backbone for detectors. ``dyn_mode`` per stage in
    {'channel', 'layer', 'spatial', 'static'}: channel/layer are the modes
    the mmdet LAUD backbone supports (`lad_mmdet_resnet.py:161-176`);
    'spatial' covers the legacy LASNet spatial-only backbone
    (`mmdet/models/backbones/resnet_sd.py`) — mask sizes derive from the
    traced feature resolution, so each input size compiles its own masks."""

    layers: Sequence[int] = (3, 4, 23, 3)
    out_indices: Sequence[int] = (0, 1, 2, 3)
    frozen_stages: int = -1  # reference semantics: freeze stem + stages <= n
    norm_eval: bool = True
    temperature: float = 0.1  # fixed (configs use temperature_0=0.1)
    sparsity_target: float = 0.5
    dyn_mode: Sequence[str] = ("channel",) * 4
    mask_spatial_granularity: Sequence[int] = (4, 4, 2, 1)
    channel_dyn_granularity: Sequence[int] = (2, 2, 2, 2)
    channel_masker: Sequence[str] = ("MLP",) * 4
    channel_masker_layers: Sequence[int] = (2, 2, 2, 2)
    reduction_ratio: Sequence[int] = (16, 16, 16, 16)
    param_dtype: Any = jnp.float32
    # AMP compute dtype: bf16 body compute with f32 gating heads
    # (`models/maskers.py`); None = exact f32.
    dtype: Any = None

    @nn.compact
    def __call__(self, x, *, training: bool = False):
        # norm_eval freezes BN stats but keeps Gumbel sampling alive — the
        # reference's detection training mode (`lad_mmdet_resnet.py:753-762`)
        bn_training = training and not self.norm_eval
        x = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False,
                    kernel_init=he_normal_fan_out(), name="conv1",
                    dtype=self.dtype, param_dtype=self.param_dtype)(x)
        x = nn.BatchNorm(use_running_average=not bn_training, momentum=0.9,
                         epsilon=1e-5, name="bn1", dtype=self.dtype,
                         param_dtype=self.param_dtype)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        if self.frozen_stages >= 0:
            x = jax.lax.stop_gradient(x)

        # Rectangular inputs (COCO's 800x1333 family) are supported for all
        # modes: the masker grid is pooled per-dimension
        # (`resnet_sd.py:713`) and the mask nearest-interpolated onto the
        # rectangular feature map (`lad_mmdet_resnet.py:274`); FLOPs
        # bookkeeping uses the true rectangular areas.
        outs = []
        sparse_flops = jnp.float32(0.0)
        dense_flops = jnp.float32(0.0)
        flops_img = jnp.zeros((x.shape[0],), jnp.float32)
        channel_s, layer_s, flops_perc = [], [], []
        s3_img_all = []
        inplanes = 64
        for s in range(4):
            planes = 64 * (2**s)
            stage_training = training and s + 1 > self.frozen_stages
            mode = self.dyn_mode[s]
            for b in range(self.layers[s]):
                stride = (2 if s > 0 else 1) if b == 0 else 1
                has_ds = b == 0 and (stride != 1 or inplanes != planes * EXPANSION)
                out_size = (-(-x.shape[1] // stride),  # SAME-conv ceil div
                            -(-x.shape[2] // stride))
                name = f"layer{s + 1}_{b}"
                if mode == "static":
                    x, blk_flops = self._static_block(
                        x, planes, stride, has_ds, name,
                        stage_training and bn_training,
                    )
                    # static blocks still execute dense compute: account it
                    # (all-static backbones otherwise report flops_rate 0)
                    sparse_flops += blk_flops
                    dense_flops += blk_flops
                    flops_img = flops_img + blk_flops
                else:
                    x, st = LAUDBottleneck(
                        planes=planes, stride=stride, has_downsample=has_ds,
                        output_size=out_size,
                        mask_spatial_granularity=self.mask_spatial_granularity[s],
                        dyn_mode=mode,  # 'channel' | 'layer' | 'spatial'
                        channel_dyn_granularity=self.channel_dyn_granularity[s],
                        channel_masker=self.channel_masker[s],
                        channel_masker_layers=self.channel_masker_layers[s],
                        reduction=self.reduction_ratio[s],
                        bn_eval=self.norm_eval,
                        name=name,
                        dtype=self.dtype,
                        param_dtype=self.param_dtype,
                    )(x, self.temperature, training=stage_training)
                    channel_s.append(st.channel_s)
                    layer_s.append(st.spatial_s3)
                    flops_perc.append(st.flops_perc)
                    s3_img_all.append(st.s3_img)
                    sparse_flops += st.sparse_flops
                    dense_flops += st.dense_flops
                    flops_img = flops_img + st.flops_img
                inplanes = planes * EXPANSION
                if s + 1 <= self.frozen_stages:
                    x = jax.lax.stop_gradient(x)
            if s in self.out_indices:
                outs.append(x)

        additional = {
            "flops": sparse_flops,
            "dense_flops": dense_flops,
            "flops_perc": jnp.stack(flops_perc) if flops_perc else jnp.ones(1),
            "channel_sparsity": jnp.stack(channel_s) if channel_s else jnp.ones(1),
            "layer_sparsity": jnp.stack(layer_s) if layer_s else jnp.ones(1),
            # per-image accounting (`mmdet/apis/test.py:75-145`): (B,) sparse
            # FLOPs per image and (blocks, B) per-image spatial densities
            "flops_img": flops_img,
            "s3_img": (jnp.stack(s3_img_all) if s3_img_all
                       else jnp.ones((1, x.shape[0]))),
        }
        model_configs = {
            "dyn_mode": tuple(self.dyn_mode),
            "sparsity_target": self.sparsity_target,
        }
        return tuple(outs), additional, model_configs

    def _static_block(self, x, planes, stride, has_ds, name, training):
        """Plain bottleneck; returns (out, dense multiply-adds) with the
        same per-block formulas as LAUDBottleneck's bookkeeping
        (`laud_resnet.py:223-239`), rectangular-safe."""
        from laudnet_tpu.models.resnet import Bottleneck

        inplanes = x.shape[-1]
        in_hw = x.shape[1] * x.shape[2]
        out = Bottleneck(planes=planes, stride=stride, has_downsample=has_ds,
                         name=name, dtype=self.dtype,
                         param_dtype=self.param_dtype)(
            x, training=training
        )
        out_hw = out.shape[1] * out.shape[2]
        out_planes = planes * EXPANSION
        flops = (inplanes * planes * in_hw          # conv1 1x1
                 + planes * planes * 9 * out_hw     # conv2 3x3
                 + planes * out_planes * out_hw)    # conv3 1x1
        if has_ds:
            flops += inplanes * out_planes * out_hw
        return out, jnp.float32(flops)
