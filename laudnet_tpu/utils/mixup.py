"""Mixup augmentation (reference `utils/utils.py:227-246`)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def mixup_data(key, x, y, alpha: float = 1.0, num_classes: int = 1000):
    """Returns mixed inputs and soft targets: lam*x + (1-lam)*x[perm]."""
    k1, k2 = jax.random.split(key)
    lam = jax.random.beta(k1, alpha, alpha) if alpha > 0 else 1.0
    perm = jax.random.permutation(k2, x.shape[0])
    mixed = lam * x + (1 - lam) * x[perm]
    y1 = jax.nn.one_hot(y, num_classes)
    y2 = jax.nn.one_hot(y[perm], num_classes)
    return mixed, lam * y1 + (1 - lam) * y2


def mixup_criterion(logits, soft_targets):
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.mean(jnp.sum(soft_targets * logp, axis=-1))
