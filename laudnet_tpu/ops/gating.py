"""Differentiable discrete gating primitives.

Semantics follow the reference maskers (LAUDNet
`imagenet_classification/models/utils.py:47-65,113-131`): every gate produces a
pair of logits per decision; training samples a hard straight-through
Gumbel-softmax over the pair, evaluation takes the deterministic comparison
``logits_on >= logits_off`` (ties resolve to *on*, matching torch's ``>=``).

All functions are pure and shape-static, safe under ``jit``/``vmap``/``grad``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gumbel_softmax(key, logits, tau, axis=-1, hard=True):
    """Gumbel-softmax with optional straight-through hard sampling.

    Matches ``torch.nn.functional.gumbel_softmax`` semantics: Gumbel(0,1) noise
    is added to the logits, softmax is taken over ``axis`` at temperature
    ``tau``; with ``hard=True`` the forward value is the one-hot argmax while
    the gradient flows through the soft sample (straight-through estimator).
    """
    gumbels = jax.random.gumbel(key, logits.shape, dtype=logits.dtype)
    y_soft = jax.nn.softmax((logits + gumbels) / tau, axis=axis)
    if not hard:
        return y_soft
    index = jnp.argmax(y_soft, axis=axis)
    y_hard = jax.nn.one_hot(
        index, logits.shape[axis], axis=axis if axis >= 0 else logits.ndim + axis,
        dtype=logits.dtype,
    )
    # Straight-through: forward = y_hard, backward = d(y_soft).
    return y_hard + y_soft - jax.lax.stop_gradient(y_soft)


def binary_gate(logits_pair, temperature, *, training, key=None):
    """Turn paired (on, off) logits into a 0/1 mask.

    ``logits_pair`` has shape ``(..., 2, G)`` where index 0 along the pair axis
    holds the *keep* logits and index 1 the *skip* logits (the reference's
    ``view(b, 2, c//2, ...)`` channel split, `models/utils.py:55-60`).

    Training: hard straight-through Gumbel-softmax over the pair axis, keep
    channel 0. Eval: ``(on >= off)`` deterministic comparison.

    Returns a float mask of shape ``(..., G)``.
    """
    if training:
        if key is None:
            raise ValueError("binary_gate requires a PRNG key in training mode")
        y = gumbel_softmax(key, logits_pair, temperature, axis=-2, hard=True)
        return y[..., 0, :]
    on = logits_pair[..., 0, :]
    off = logits_pair[..., 1, :]
    return (on >= off).astype(logits_pair.dtype)
