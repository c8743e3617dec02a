"""Per-iteration LR and Gumbel-temperature schedules.

Pure functions of (epoch, step, steps_per_epoch) so they can run either on
host (python floats) or traced inside the train step (jnp scalars). Formulas
match the reference (`utils/scheduler.py:20-58`, `train/main.py:760-772`).
"""

from __future__ import annotations

import jax.numpy as jnp


def lr_at(step, *, base_lr, total_epochs, steps_per_epoch, scheduler="cosine",
          warmup_epochs=0, warmup_lr=None, lr_min=0.0, lr_decay_rate=0.1,
          lr_decay_step=30, milestones=()):
    """Learning rate at a global iteration (reference `utils/scheduler.py`).

    ``step`` may be a python int or traced scalar. Only 'cosine' and 'linear'
    are smooth; step schedules use floor divisions that are jit-safe too.
    """
    step = jnp.asarray(step, jnp.float32)
    total_steps = total_epochs * steps_per_epoch
    warmup_steps = warmup_epochs * steps_per_epoch
    if warmup_lr is None:
        warmup_lr = base_lr * 0.1

    if scheduler == "cosine":
        decay_total = jnp.maximum(total_steps - warmup_steps, 1)
        t_cur = step - warmup_steps
        main = lr_min + 0.5 * (base_lr - lr_min) * (
            1 + jnp.cos(jnp.pi * t_cur / decay_total)
        )
    elif scheduler == "linear":
        main = base_lr * (1 - step / total_steps)
    elif scheduler == "multistep":
        epoch = jnp.floor(step / steps_per_epoch)
        main = base_lr * lr_decay_rate ** jnp.floor(epoch / lr_decay_step)
    elif scheduler == "uneven_multistep":
        epoch = jnp.floor(step / steps_per_epoch)
        n = sum((jnp.asarray(m, jnp.float32) <= epoch).astype(jnp.float32)
                for m in milestones)
        main = base_lr * lr_decay_rate**n
    elif scheduler == "rmsprop_step":
        # per-iteration step decay (reference `utils/scheduler.py:33-35`)
        main = base_lr * lr_decay_rate ** jnp.floor(
            step / (lr_decay_step * steps_per_epoch)
        )
    elif scheduler == "exponential":
        epoch = jnp.floor(step / steps_per_epoch)
        main = base_lr * lr_decay_rate ** jnp.floor(epoch / lr_decay_step)
    else:
        raise NotImplementedError(scheduler)

    if warmup_epochs:
        warm = warmup_lr + (base_lr - warmup_lr) * (step / warmup_steps)
        return jnp.where(step < warmup_steps, warm, main)
    return main


def gumbel_temperature_at(step, *, t0, t_last, t_last_epoch, steps_per_epoch,
                          temp_scheduler="exp"):
    """Gumbel-softmax temperature at a global iteration
    (reference `train/main.py:760-772`). Anneals t0 -> t_last over
    ``t_last_epoch`` epochs, then holds t_last."""
    step = jnp.asarray(step, jnp.float32)
    total = jnp.asarray(t_last_epoch * steps_per_epoch, jnp.float32)
    if temp_scheduler == "exp":
        alpha = (t_last / t0) ** (1.0 / float(t_last_epoch * steps_per_epoch))
        temp = t0 * alpha**step
    elif temp_scheduler == "linear":
        temp = (t0 - t_last) * (1 - step / total) + t_last
    else:  # cosine
        temp = 0.5 * (t0 - t_last) * (1 + jnp.cos(jnp.pi * step / total)) + t_last
    return jnp.where(step >= total, jnp.asarray(t_last, jnp.float32), temp)
