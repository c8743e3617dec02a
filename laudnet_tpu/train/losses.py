"""Training losses: sparsity criteria, label-smoothed CE, KD.

All seven sparsity-criterion variants of the reference
(`imagenet_classification/utils/sparsity_loss_unify.py`) as pure jittable
functions. The bound annealing is identical: over the first 33% of epochs the
upper/lower bounds close cosinely onto the target
(`sparsity_loss_unify.py:16-19`).

``epoch`` may be a traced scalar so one compiled train step serves all epochs.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp


def _bounds(epoch, num_epochs, target):
    """Cosine^2-annealed (upper, lower) bounds: pinned AT the target at
    epoch 0 (progress = 1) and relaxing to (1, 0) over the first 33% of
    training — i.e. early epochs clamp every block's density to the target,
    later epochs constrain only the network-level term
    (`sparsity_loss_unify.py:16-19`)."""
    p = jnp.clip(epoch / (0.33 * num_epochs), 0.0, 1.0)
    progress = jnp.cos(p * (math.pi / 2)) ** 2
    upper = 1.0 - progress * (1.0 - target)
    lower = progress * target
    return upper, lower


def _bound_penalty(values, upper, lower):
    """Mean squared hinge penalty outside [lower, upper]."""
    over = jnp.maximum(0.0, values - upper) ** 2
    under = jnp.maximum(0.0, lower - values) ** 2
    return jnp.mean(over + under)


def sparsity_bounds(epoch, flops_perc, flops, *, target, num_epochs, full_flops):
    """`SparsityCriterion_bounds` (`sparsity_loss_unify.py:6-29`) — the
    variant the trainer actually uses. ``flops_perc`` is the per-block
    sparse/dense ratio array; ``flops``/``full_flops`` any consistent unit."""
    upper, lower = _bounds(epoch, num_epochs, target)
    loss_blocks = _bound_penalty(flops_perc, upper, lower)
    loss_net = (flops / full_flops - target) ** 2
    return loss_blocks + loss_net


def sparsity_basic(epoch, channel_s, flops_perc, flops, *, target, num_epochs,
                   full_flops):
    """`SparsityCriterion` (`sparsity_loss_unify.py:31-69`): block bounds +
    channel density pulled to sqrt(target) + network term."""
    upper, lower = _bounds(epoch, num_epochs, target)
    loss_blocks = _bound_penalty(flops_perc, upper, lower)
    channel_target = math.sqrt(target)
    loss_channel = jnp.mean((channel_s - channel_target) ** 2)
    loss_net = (flops / full_flops - target) ** 2
    return loss_channel + loss_blocks + loss_net


def sparsity_channel_factor(epoch, channel_s_stages, flops_perc, flops, *,
                            target, num_epochs, full_flops, dyn_mode,
                            channel_loss_factor=1.0, channel_target=None):
    """`SparsityCriterion_channel_factor` (`sparsity_loss_unify.py:71-107`):
    per-stage channel penalty only where dyn_mode == 'both', scaled."""
    upper, lower = _bounds(epoch, num_epochs, target)
    loss_blocks = _bound_penalty(flops_perc, upper, lower)
    ct = math.sqrt(target) if channel_target is None else channel_target
    loss_channel = 0.0
    for i in range(4):
        if dyn_mode[i] == "both":
            loss_channel += jnp.mean((channel_s_stages[i] - ct) ** 2)
    loss_net = (flops / full_flops - target) ** 2
    return channel_loss_factor * loss_channel + loss_blocks + loss_net


def sparsity_cs(epoch, channel_s_stages, spatial_s_stages, flops_perc, flops, *,
                target, num_epochs, full_flops, dyn_mode, cs_loss_factor=1.0,
                channel_target=None):
    """`SparsityCriterion_cs` (`sparsity_loss_unify.py:109-149`)."""
    upper, lower = _bounds(epoch, num_epochs, target)
    loss_blocks = _bound_penalty(flops_perc, upper, lower)
    ct = math.sqrt(target) if channel_target is None else channel_target
    loss_cs = 0.0
    for i in range(4):
        if dyn_mode[i] == "both":
            loss_cs += jnp.mean((channel_s_stages[i] - ct) ** 2)
            loss_cs += jnp.mean((spatial_s_stages[i] - target) ** 2)
    loss_net = (flops / full_flops - target) ** 2
    return cs_loss_factor * loss_cs + loss_blocks + loss_net


def sparsity_cs_v2(epoch, channel_s_stages, spatial_s_stages, flops_perc,
                   flops, *, target, num_epochs, full_flops, dyn_mode,
                   cs_loss_factor=1.0, channel_target=None):
    """`SparsityCriterion_cs_v2` (`sparsity_loss_unify.py:151-195`): one global
    mean density per modality instead of per-stage penalties."""
    upper, lower = _bounds(epoch, num_epochs, target)
    loss_blocks = _bound_penalty(flops_perc, upper, lower)
    ct = math.sqrt(target) if channel_target is None else channel_target
    dens_c = [channel_s_stages[i] for i in range(4) if dyn_mode[i] in ("channel", "both")]
    dens_s = [spatial_s_stages[i] for i in range(4) if dyn_mode[i] in ("spatial", "both")]
    loss_cs = (jnp.mean(jnp.concatenate(dens_c)) - ct) ** 2 if dens_c else 0.0
    if dens_s:
        loss_cs += (jnp.mean(jnp.concatenate(dens_s)) - target) ** 2
    loss_net = (flops / full_flops - target) ** 2
    return cs_loss_factor * loss_cs + loss_blocks + loss_net


def sparsity_channel_bounds(epoch, channel_s, flops_perc, flops, *, target,
                            num_epochs, full_flops, channel_loss_factor=1.0,
                            channel_upper_start=1.0):
    """`SparsityCriterion_channel_bounds` (`sparsity_loss_unify.py:197-236`):
    flops bounds + annealed bounds on the channel densities toward
    sqrt(target), both mean-squared hinges, + network term."""
    upper, lower = _bounds(epoch, num_epochs, target)
    loss_blocks = _bound_penalty(flops_perc, upper, lower)
    ct = math.sqrt(target)
    p = jnp.clip(epoch / (0.33 * num_epochs), 0.0, 1.0)
    progress = jnp.cos(p * (math.pi / 2)) ** 2
    upper_c = channel_upper_start - progress * (channel_upper_start - ct)
    lower_c = progress * ct
    loss_channel = _bound_penalty(channel_s, upper_c, lower_c)
    loss_net = (flops / full_flops - target) ** 2
    return channel_loss_factor * loss_channel + loss_blocks + loss_net


def sparsity_channel_bounds_v2(epoch, channel_s, flops_perc, flops, *, target,
                               num_epochs, full_flops,
                               channel_loss_factor=1.0):
    """`SparsityCriterion_channel_bounds_v2` (`sparsity_loss_unify.py:239-280`)
    — the seventh criterion. Identical to `_channel_bounds` except the
    channel UPPER bound starts at 0.85 instead of 1.0
    (`sparsity_loss_unify.py:259`), i.e. even after the bounds fully relax
    the channel density is still pushed below 85%."""
    return sparsity_channel_bounds(
        epoch, channel_s, flops_perc, flops, target=target,
        num_epochs=num_epochs, full_flops=full_flops,
        channel_loss_factor=channel_loss_factor, channel_upper_start=0.85)


def cross_entropy(logits, labels):
    """Plain mean CE over integer labels (torch ``nn.CrossEntropyLoss``)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=-1))


def cross_entropy_label_smooth(logits, labels, epsilon, num_classes=None):
    """`CrossEntropyLabelSmooth` (`utils/criterion.py:13-25`)."""
    n = num_classes or logits.shape[-1]
    logp = jax.nn.log_softmax(logits, axis=-1)
    onehot = jax.nn.one_hot(labels, n, dtype=logits.dtype)
    targets = (1.0 - epsilon) * onehot + epsilon / n
    return jnp.sum(jnp.mean(-targets * logp, axis=0))


def kd_loss(student_logits, teacher_logits, temperature):
    """KL(teacher || student) at temperature T, scaled by T^2 — matches
    ``F.kl_div(log_softmax(s/T), softmax(t/T), reduction='batchmean') * T**2``
    (reference `train/main.py:574-578`)."""
    t = jax.lax.stop_gradient(teacher_logits)
    log_p_s = jax.nn.log_softmax(student_logits / temperature, axis=-1)
    p_t = jax.nn.softmax(t / temperature, axis=-1)
    log_p_t = jax.nn.log_softmax(t / temperature, axis=-1)
    kl = jnp.sum(p_t * (log_p_t - log_p_s), axis=-1)
    return jnp.mean(kl) * temperature**2


def total_train_loss(student_logits, teacher_logits, labels, loss_flops, *,
                     lambda_act, alpha_kd, t_kd, label_smooth=0.0):
    """``lambda_act * loss_flops + CE + alpha_kd * KD`` (`train/main.py:579`)."""
    # Losses always reduce in f32: under AMP the model emits bf16 logits,
    # and softmax/log-softmax in bf16 loses the gradient's low bits.
    # No-op on the default f32 path.
    student_logits = student_logits.astype(jnp.float32)
    teacher_logits = teacher_logits.astype(jnp.float32)
    if label_smooth:
        ce = cross_entropy_label_smooth(student_logits, labels, label_smooth)
    else:
        ce = cross_entropy(student_logits, labels)
    kd = kd_loss(student_logits, teacher_logits, t_kd)
    return lambda_act * loss_flops + ce + alpha_kd * kd, {
        "loss_cls": ce,
        "loss_kd": kd,
        "loss_flops": loss_flops,
    }
