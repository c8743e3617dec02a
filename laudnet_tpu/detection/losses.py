"""Detection losses: the LAUD sparsity injection + focal/box losses.

``loss_sparse`` is the exact term the reference patches into every detector
(`mmdetection-2.21.0/mmdet/models/detectors/two_stage.py:157-159`,
`mmdetection-3.3.0/mmdet/models/detectors/base_detr.py:123-132`):
``(flops / dense_flops - sparsity_target) ** 2``, logged with the realized
``flops_rate``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def loss_sparse(additional, sparsity_target: float):
    """Returns (loss, flops_rate) from a backbone's ``additional`` stats."""
    rate = additional["flops"] / jnp.maximum(additional["dense_flops"], 1e-9)
    return (rate - sparsity_target) ** 2, rate


def focal_loss(logits, targets_onehot, alpha: float = 0.25,
               gamma: float = 2.0):
    """Sigmoid focal loss, summed over classes, mean over anchors given a
    validity mask baked into ``targets_onehot`` (zeros = background)."""
    p = jax.nn.sigmoid(logits)
    ce = -(
        targets_onehot * jax.nn.log_sigmoid(logits)
        + (1 - targets_onehot) * jax.nn.log_sigmoid(-logits)
    )
    p_t = targets_onehot * p + (1 - targets_onehot) * (1 - p)
    a_t = targets_onehot * alpha + (1 - targets_onehot) * (1 - alpha)
    return a_t * (1 - p_t) ** gamma * ce


def smooth_l1(pred, target, beta: float = 1.0 / 9.0):
    diff = jnp.abs(pred - target)
    return jnp.where(diff < beta, 0.5 * diff**2 / beta, diff - 0.5 * beta)
