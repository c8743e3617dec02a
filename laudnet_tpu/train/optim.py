"""Optimizer factory with backbone/masker parameter groups.

The reference splits parameters into backbone vs masker groups with separate
LR multipliers (`models/laud_resnet.py:365-401`) and drives SGD with nesterov
momentum and uniform weight decay (`utils/hyperparams.py:44-62`). Here that
becomes an optax pipeline: a masked scale for the lr_mult split + injectable
per-step learning rate (the schedule is computed inside the train step).
"""

from __future__ import annotations

from typing import Any

import jax
import optax


def is_masker_path(path) -> bool:
    """True if a param path belongs to a gating head: CNN maskers (name
    contains 'masker', reference `laud_resnet.py:365-401`) or ViT policy
    heads ('token_policy'/'head_policy'/'layer_policy', the AdaViT
    decision networks)."""
    return any("masker" in str(k) or "_policy" in str(k) for k in path)


def param_group_labels(params) -> Any:
    """Label pytree: 'masker' for gating-head params, 'backbone' otherwise."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: "masker" if is_masker_path(path) else "backbone", params
    )


def is_frozen_path(path) -> bool:
    """True for fixed (non-trainable) leaves: the T2T performer's random
    feature matrix ``w`` (`models/t2t.py` — stop_gradient zeroes its grad,
    but weight decay is gradient-independent and would shrink it every
    step; torch keeps requires_grad=False params out of the optimizer).
    The leaf name alone is too loose (any future param named 'w' would
    silently stop decaying), so require the t2t stem scope in the path
    (the performers live at ``t2t_stem/attn{1,2}/w``)."""
    if not path or str(getattr(path[-1], "key", path[-1])) != "w":
        return False
    return any(
        "t2t" in str(getattr(k, "key", k)).lower() for k in path[:-1]
    )


def make_sgd(params, *, momentum=0.9, nesterov=True, weight_decay=5e-5,
             backbone_lr_mult=1.0, masker_lr_mult=1.0,
             decay_weights_only=False):
    """SGD + nesterov + decoupled-into-gradient weight decay (torch-style:
    ``g += wd * p`` before momentum), with per-group LR multipliers.
    Fixed leaves (`is_frozen_path`) are masked out of the decay.
    ``decay_weights_only`` is the reference's
    ``weigh_decay_apply_on_all=False`` mode (biases/BN exempt from decay).

    The returned optimizer expects the LR via ``optax.inject_hyperparams`` —
    update the ``learning_rate`` hyperparam each step, or wrap in a schedule.
    """
    labels = param_group_labels(params)

    # Callable mask: multi_transform hands each group a masked sub-tree,
    # so the mask must be computed from whatever tree the transform sees.
    if decay_weights_only:
        decay_mask = weights_only_decay_mask
    else:
        def decay_mask(tree):
            return jax.tree_util.tree_map_with_path(
                lambda path, _: not is_frozen_path(path), tree
            )

    def group(mult):
        return optax.chain(
            optax.add_decayed_weights(weight_decay, mask=decay_mask),
            optax.trace(decay=momentum, nesterov=nesterov),
            optax.scale(mult),
        )

    grouped = optax.multi_transform(
        {"backbone": group(backbone_lr_mult), "masker": group(masker_lr_mult)},
        labels,
    )
    return optax.inject_hyperparams(
        lambda learning_rate: optax.chain(grouped, optax.scale(-learning_rate))
    )(learning_rate=0.0)


def weights_only_decay_mask(tree):
    """The reference's ``weigh_decay_apply_on_all=False`` grouping
    (`utils/optimizer.py::get_parameters`): decay only leaves whose name
    contains 'weight'/'kernel' AND have rank > 1 — biases, BN scales and
    1-D params get weight_decay 0."""
    def keep(path, leaf):
        if is_frozen_path(path):
            return False
        name = str(path[-1]) if path else ""
        return (("kernel" in name or "weight" in name)
                and getattr(leaf, "ndim", 0) > 1)

    return jax.tree_util.tree_map_with_path(keep, tree)


def make_rmsprop(params, *, alpha=0.9, momentum=0.9, weight_decay=5e-5,
                 eps=1e-8, backbone_lr_mult=1.0, masker_lr_mult=1.0):
    """torch-style RMSprop (the reference's ``--optimizer RMSprop``,
    `utils/optimizer.py:18-22`: ``alpha=0.9`` smoothing, heavy-ball
    momentum, weight decay folded into the gradient), with the same
    backbone/masker LR groups as :func:`make_sgd`. torch's RMSprop keeps
    the raw (uncentered) second moment and applies momentum AFTER the
    rescale — optax.scale_by_rms(decay=alpha) + trace matches that order.
    torch divides by ``sqrt(nu) + eps`` while optax defaults to
    ``sqrt(nu + eps)`` (eps_in_sqrt=True); at tiny gradients (|g|~1e-5,
    e.g. masker heads early in training) those differ by >10x in step
    size, so eps_in_sqrt=False is required for parity.
    """
    labels = param_group_labels(params)

    def decay_mask(tree):
        return jax.tree_util.tree_map_with_path(
            lambda path, _: not is_frozen_path(path), tree
        )

    def group(mult):
        return optax.chain(
            optax.add_decayed_weights(weight_decay, mask=decay_mask),
            optax.scale_by_rms(decay=alpha, eps=eps, eps_in_sqrt=False),
            optax.trace(decay=momentum, nesterov=False),
            optax.scale(mult),
        )

    grouped = optax.multi_transform(
        {"backbone": group(backbone_lr_mult), "masker": group(masker_lr_mult)},
        labels,
    )
    return optax.inject_hyperparams(
        lambda learning_rate: optax.chain(grouped, optax.scale(-learning_rate))
    )(learning_rate=0.0)
