"""Gating heads ("maskers") for spatial / channel / layer skipping.

TPU-first flax.linen re-formulation of the reference maskers
(`imagenet_classification/models/utils.py:35-169`). All heads emit paired
(keep, skip) logits per decision unit and gate via
:func:`laudnet_tpu.ops.gating.binary_gate` — Gumbel-ST in training,
deterministic ``>=`` comparison at eval. Shapes are fully static; the PRNG for
Gumbel noise is threaded through linen's ``'gumbel'`` rng collection.

Bias initialisation replicates the reference exactly, *including* its
off-by-one quirk: ``bias[:G]`` is set to the open value, ``bias[G+1:]`` to the
close value, and element ``G`` keeps its default torch uniform init
(`models/utils.py:42-43,107-111`). Released checkpoints bake this layout in.

FLOPs accounting constants also mirror the reference formulas verbatim
(including its bias-term quirk ``out*in + in`` at `models/utils.py:41`).
"""

from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from laudnet_tpu.ops import gating, masking


def torch_default_kernel_init():
    """torch's Conv/Linear default weight init: kaiming_uniform(a=sqrt(5)),
    i.e. U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    return jax.nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def torch_default_bias_init(fan_in):
    """torch's default bias init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


def masker_bias_init(group, open_value, close_value, fan_in):
    """Reference masker bias layout: [:G]=open, [G]=torch default, [G+1:]=close.

    The untouched element ``G`` is the reference's off-by-one
    (`models/utils.py:107-111`) — replicated so converted checkpoints and
    from-scratch training dynamics both match.
    """
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        b = jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)
        b = b.at[:group].set(open_value)
        b = b.at[group + 1 :].set(close_value)
        return b

    return init


class SpatialMasker(nn.Module):
    """Spatial (or, with ``mask_size=1``, layer) gating head.

    Pool the block input to the ``mask_size`` grid (int for square, or an
    ``(mh, mw)`` tuple — the rectangular detection grid of ``ResNet_sd``'s
    masker, `resnet_sd.py:713`), project with a 1x1 conv to 2*G logits per
    location, gate. Reference `models/utils.py:35-65`.
    Returns ``(mask (B, mh, mw, G), sparsity scalar, flops int)``.
    """

    mask_channel_group: int = 1
    mask_size: Any = 7
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, temperature, *, training: bool):
        # Gating heads always run f32 regardless of the network's AMP
        # compute dtype: the decisions are hard compares of near-tied
        # logits, and the head is a negligible fraction of block FLOPs.
        # No-op on the default f32 path (parity-exact).
        x = x.astype(jnp.float32)
        g = self.mask_channel_group
        in_ch = x.shape[-1]
        ms = self.mask_size
        mh, mw = (ms, ms) if isinstance(ms, int) else ms
        m = (
            masking.adaptive_avg_pool(x, (mh, mw))
            if mh < x.shape[1] or mw < x.shape[2]
            else x
        )
        flops = in_ch * m.shape[1] * m.shape[2]

        logits = nn.Conv(
            2 * g,
            (1, 1),
            use_bias=True,
            name="conv",
            kernel_init=torch_default_kernel_init(),
            bias_init=masker_bias_init(g, 5.0, 0.0, in_ch),
            param_dtype=self.param_dtype,
        )(m)
        # conv_flops_pp quirk: out*in + in (reference `models/utils.py:41`).
        flops += (2 * g * in_ch + in_ch) * logits.shape[1] * logits.shape[2]

        b, mh, mw, _ = logits.shape
        pair = logits.reshape(b, mh, mw, 2, g)
        key = self.make_rng("gumbel") if training else None
        mask = gating.binary_gate(pair, temperature, training=training, key=key)
        return mask, mask.mean(), flops


class ChannelMaskerMLP(nn.Module):
    """Channel gating head: GAP -> 1- or 2-layer MLP -> 2*G logits.

    Hidden width ``max(G // reduction, 16)``. Reference `models/utils.py:92-131`.
    Returns ``(mask (B, G), sparsity, flops)``.
    """

    channel_dyn_group: int
    layers: int = 2
    reduction: int = 16
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, temperature, *, training: bool):
        assert self.layers in (1, 2)
        x = x.astype(jnp.float32)  # f32 gating under AMP (see SpatialMasker)
        g = self.channel_dyn_group
        b, h, w, c = x.shape
        flops = c * h * w
        pooled = masking.global_avg_pool(x)

        if self.layers == 2:
            width = max(g // self.reduction, 16)
            hidden = nn.Dense(
                width,
                name="fc1",
                kernel_init=torch_default_kernel_init(),
                bias_init=torch_default_bias_init(c),
                param_dtype=self.param_dtype,
            )(pooled)
            hidden = nn.relu(hidden)
            logits = nn.Dense(
                2 * g,
                name="fc2",
                kernel_init=torch_default_kernel_init(),
                bias_init=masker_bias_init(g, 2.0, -2.0, width),
                param_dtype=self.param_dtype,
            )(hidden)
            flops += c * width + width * 2 * g
        else:
            logits = nn.Dense(
                2 * g,
                name="fc",
                kernel_init=torch_default_kernel_init(),
                bias_init=masker_bias_init(g, 2.0, -2.0, c),
                param_dtype=self.param_dtype,
            )(pooled)
            flops += c * 2 * g

        pair = logits.reshape(b, 2, g)
        key = self.make_rng("gumbel") if training else None
        mask = gating.binary_gate(pair, temperature, training=training, key=key)
        return mask, mask.mean(), flops


class ChannelMaskerConvLinear(nn.Module):
    """Channel gating head: 1x1 conv -> BN -> ReLU -> GAP -> Linear.

    Reference `models/utils.py:133-169`. Returns ``(mask (B, G), sparsity,
    flops)``. FLOPs mirror the reference: the post-conv feature volume plus
    the two projection matmuls (`models/utils.py:148,153-157`).
    """

    channel_dyn_group: int
    reduction: int = 16
    bn_eval: bool = False  # freeze BN stats (detection norm_eval)
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, temperature, *, training: bool):
        x = x.astype(jnp.float32)  # f32 gating under AMP (see SpatialMasker)
        g = self.channel_dyn_group
        in_ch = x.shape[-1]
        red = in_ch // self.reduction

        m = nn.Conv(
            red,
            (1, 1),
            use_bias=False,
            name="conv",
            kernel_init=torch_default_kernel_init(),
            param_dtype=self.param_dtype,
        )(x)
        m = nn.BatchNorm(
            use_running_average=(not training) or self.bn_eval,
            momentum=0.9,
            epsilon=1e-5,
            name="bn",
            param_dtype=self.param_dtype,
        )(m)
        m = nn.relu(m)
        b, h, w, cm = m.shape
        flops = cm * h * w
        pooled = masking.global_avg_pool(m)

        logits = nn.Dense(
            2 * g,
            name="linear",
            kernel_init=torch_default_kernel_init(),
            bias_init=masker_bias_init(g, 2.0, -2.0, red),
            param_dtype=self.param_dtype,
        )(pooled)
        flops += in_ch * red + red * 2 * g

        pair = logits.reshape(b, 2, g)
        key = self.make_rng("gumbel") if training else None
        mask = gating.binary_gate(pair, temperature, training=training, key=key)
        return mask, mask.mean(), flops
