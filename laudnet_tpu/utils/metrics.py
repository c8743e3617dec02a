"""Metrics helpers (reference `utils/utils.py:20-59,227-246`)."""

from __future__ import annotations

import jax.numpy as jnp


class AverageMeter:
    """Running average (host-side)."""

    def __init__(self, name: str = "", fmt: str = ":f"):
        self.name, self.fmt = name, fmt
        self.reset()

    def reset(self):
        self.val = self.sum = self.count = 0.0
        self.avg = 0.0

    def update(self, val, n=1):
        val = float(val)
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)

    def __str__(self):
        return f"{self.name} {self.val:{self.fmt[1:]}} ({self.avg:{self.fmt[1:]}})"


def topk_accuracy(logits, labels, topk=(1,), weights=None):
    """Top-k accuracy in percent, per the reference's `accuracy()`.

    When k exceeds the class count (smoke runs with --num_classes < 5),
    the entry degrades to top-C accuracy (trivially 100%) rather than
    erroring — the log column is only meaningful when C >= k.

    ``weights``: optional per-example weights (e.g. a 0/1 valid mask for
    a wrap-padded final eval batch) — weighted mean instead of mean."""
    import jax

    maxk = min(max(topk), logits.shape[-1])  # k may exceed tiny class counts
    _, pred = jax.lax.top_k(logits, maxk)
    correct = pred == labels[:, None]

    def agg(hit):
        if weights is None:
            return jnp.mean(hit)
        return (hit * weights).sum() / jnp.maximum(weights.sum(), 1.0)

    return tuple(
        100.0 * agg(jnp.any(correct[:, :min(k, maxk)], axis=1)
                    .astype(jnp.float32))
        for k in topk
    )
