"""Functional train/eval steps for LAUD training (KD + sparsity + CE).

TPU-native rebuild of the reference trainer hot loop (`train/main.py:527-604`):
one jitted ``train_step`` contains the per-iteration LR schedule, Gumbel
temperature annealing, student forward (Gumbel-ST masks, BN updates), frozen
teacher forward, the composite loss ``lambda_act * sparsity + CE + alpha_kd *
KD``, and the SGD update. ``epoch``/``step`` enter as traced values so a
single compilation serves the whole run; under a data mesh the batch arrives
sharded and XLA inserts the gradient all-reduce.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

from laudnet_tpu.train import losses, schedules
from laudnet_tpu.utils.metrics import topk_accuracy


@flax.struct.dataclass
class TrainConfig:
    num_epochs: int = flax.struct.field(pytree_node=False, default=100)
    steps_per_epoch: int = flax.struct.field(pytree_node=False, default=1000)
    base_lr: float = flax.struct.field(pytree_node=False, default=0.08)
    lr_min: float = flax.struct.field(pytree_node=False, default=0.0)
    scheduler: str = flax.struct.field(pytree_node=False, default="cosine")
    warmup_epochs: int = flax.struct.field(pytree_node=False, default=0)
    # Gumbel temperature (reference defaults: train_scripts.sh)
    t0: float = flax.struct.field(pytree_node=False, default=5.0)
    t_last: float = flax.struct.field(pytree_node=False, default=0.1)
    t_last_epoch: int = flax.struct.field(pytree_node=False, default=100)
    temp_scheduler: str = flax.struct.field(pytree_node=False, default="exp")
    # Loss weights
    lambda_act: float = flax.struct.field(pytree_node=False, default=10.0)
    alpha_kd: float = flax.struct.field(pytree_node=False, default=0.5)
    t_kd: float = flax.struct.field(pytree_node=False, default=4.0)
    label_smooth: float = flax.struct.field(pytree_node=False, default=0.0)
    target_rate: float = flax.struct.field(pytree_node=False, default=0.5)
    full_flops: float = flax.struct.field(pytree_node=False, default=4.1e9)
    # which sparsity criterion to use (reference ships 6 variants;
    # `SparsityCriterion_bounds` is the one its trainer wires up)
    sparsity_criterion: str = flax.struct.field(
        pytree_node=False, default="bounds"
    )
    dyn_mode: Any = flax.struct.field(
        pytree_node=False, default=("both",) * 4
    )


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def teacher_logits_fn(teacher_model, teacher_variables, images):
    """Run a frozen teacher and return plain logits.

    Handles the three teacher families uniformly: static ResNet
    (``apply(vars, x, training=False) -> logits``), static LAUD-RegNet /
    dense LAUD-ViT (``apply(vars, x, temperature, training=False) ->
    output-with-.logits``).
    """
    try:
        out = teacher_model.apply(teacher_variables, images, training=False)
    except TypeError:
        # models whose __call__ requires a (unused, gates-off) temperature
        out = teacher_model.apply(
            teacher_variables, images, jnp.float32(0.1), training=False
        )
    return getattr(out, "logits", out)


def compute_sparsity_loss(cfg: TrainConfig, epoch, out):
    """Dispatch over the seven reference criteria
    (`utils/sparsity_loss_unify.py`; trainer default = 'bounds').

    The 'bounds' criterion only consumes ``flops_perc``/``flops``, so it
    applies unchanged to :class:`LAUDViTOutput` (per-block flops_perc over
    the transformer depth) — the ViT sparsity loss the reference defers to
    AdaViT (`train/main.py:563-579` composes it identically)."""
    common = dict(target=cfg.target_rate, num_epochs=cfg.num_epochs,
                  full_flops=cfg.full_flops)
    name = cfg.sparsity_criterion
    if name == "bounds":
        return losses.sparsity_bounds(epoch, out.flops_perc, out.flops,
                                      **common)
    if name == "basic":
        ch = jnp.concatenate(out.channel_s)
        return losses.sparsity_basic(epoch, ch, out.flops_perc, out.flops,
                                     **common)
    if name == "channel_factor":
        return losses.sparsity_channel_factor(
            epoch, out.channel_s, out.flops_perc, out.flops,
            dyn_mode=cfg.dyn_mode, **common)
    if name == "cs":
        return losses.sparsity_cs(
            epoch, out.channel_s, out.spatial_s3, out.flops_perc, out.flops,
            dyn_mode=cfg.dyn_mode, **common)
    if name == "cs_v2":
        return losses.sparsity_cs_v2(
            epoch, out.channel_s, out.spatial_s3, out.flops_perc, out.flops,
            dyn_mode=cfg.dyn_mode, **common)
    if name == "channel_bounds":
        ch = jnp.concatenate(out.channel_s)
        return losses.sparsity_channel_bounds(
            epoch, ch, out.flops_perc, out.flops, **common)
    if name == "channel_bounds_v2":
        ch = jnp.concatenate(out.channel_s)
        return losses.sparsity_channel_bounds_v2(
            epoch, ch, out.flops_perc, out.flops, **common)
    raise ValueError(f"unknown sparsity criterion {name}")


def create_train_state(model, optimizer, sample_batch, *, rng,
                       temperature=5.0, variables=None) -> TrainState:
    """Pass ``variables`` (an already-initialized/loaded dict) to skip the
    model.init forward — at real batch sizes an eager init costs minutes of
    op-by-op work whose result would be immediately replaced."""
    if variables is None:
        variables = model.init(
            {"params": rng}, sample_batch, temperature, training=False
        )
    params = variables["params"]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=optimizer.init(params),
    )


def make_train_step(model, teacher_model, teacher_variables, optimizer,
                    cfg: TrainConfig) -> Callable:
    """Build the jittable train step. ``teacher_variables`` is a frozen
    (params, batch_stats) variables dict; the teacher runs in eval mode
    (reference wraps it in DDP but never updates it, `train/main.py:290-295,
    570-573`)."""

    def train_step(state: TrainState, images, labels, gumbel_rng):
        step = state.step
        lr = schedules.lr_at(
            step, base_lr=cfg.base_lr, total_epochs=cfg.num_epochs,
            steps_per_epoch=cfg.steps_per_epoch, scheduler=cfg.scheduler,
            warmup_epochs=cfg.warmup_epochs, lr_min=cfg.lr_min,
        )
        temp = schedules.gumbel_temperature_at(
            step, t0=cfg.t0, t_last=cfg.t_last, t_last_epoch=cfg.t_last_epoch,
            steps_per_epoch=cfg.steps_per_epoch,
            temp_scheduler=cfg.temp_scheduler,
        )
        epoch = step.astype(jnp.float32) / cfg.steps_per_epoch
        rng = jax.random.fold_in(gumbel_rng, step)

        teacher_logits = teacher_logits_fn(
            teacher_model, teacher_variables, images
        )

        def loss_fn(params):
            out, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                images, temp, training=True,
                rngs={"gumbel": rng}, mutable=["batch_stats"],
            )
            loss_flops = compute_sparsity_loss(cfg, epoch, out)
            total, parts = losses.total_train_loss(
                out.logits, teacher_logits, labels, loss_flops,
                lambda_act=cfg.lambda_act, alpha_kd=cfg.alpha_kd,
                t_kd=cfg.t_kd, label_smooth=cfg.label_smooth,
            )
            aux = dict(
                parts,
                batch_stats=mutated["batch_stats"],
                logits=out.logits,
                act_rate=out.flops_perc.mean(),
                flops=out.flops,
            )
            return total, aux

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        opt_state = state.opt_state
        opt_state.hyperparams["learning_rate"] = lr
        updates, opt_state = optimizer.update(grads, opt_state, state.params)
        params = optax.apply_updates(state.params, updates)

        top1, top5 = topk_accuracy(aux["logits"], labels, topk=(1, 5))
        metrics = {
            "loss": loss,
            "loss_cls": aux["loss_cls"],
            "loss_kd": aux["loss_kd"],
            "loss_flops": aux["loss_flops"],
            "act_rate": aux["act_rate"],
            "flops": aux["flops"],
            "lr": lr,
            "temperature": temp,
            "top1": top1,
            "top5": top5,
        }
        new_state = TrainState(
            step=step + 1,
            params=params,
            batch_stats=aux["batch_stats"],
            opt_state=opt_state,
        )
        return new_state, metrics

    return train_step


def make_eval_step(model, cfg: TrainConfig) -> Callable:
    """Eval forward at the final temperature (deterministic masks,
    reference `train/main.py:607-757`)."""

    def eval_step(params, batch_stats, images, labels, weights=None):
        out = model.apply(
            {"params": params, "batch_stats": batch_stats},
            images, cfg.t_last, training=False,
        )
        # ``weights``: 0/1 valid mask for a wrap-padded final val batch
        # (padding keeps the batch divisible by the device count; the
        # mask keeps top1/top5 exact). act_rate/flops/densities are
        # per-BLOCK batch-mean stats, not per-image — they stay plain
        # means; the pad rows are wrapped copies of real images, so the
        # diagnostic stats remain representative.
        top1, top5 = topk_accuracy(out.logits, labels, topk=(1, 5),
                                   weights=weights)
        # n_valid is the GLOBAL valid-row count (weights is sharded over
        # the batch axis, so the sum spans all hosts). Callers must weight
        # the per-batch means by this — weighting by a host-local count
        # skews the aggregate whenever hosts have different final-batch
        # tails (advisor r4).
        n_valid = (jnp.float32(labels.shape[0]) if weights is None
                   else weights.sum().astype(jnp.float32))
        stats = {
            "top1": top1,
            "top5": top5,
            "n_valid": n_valid,
            "act_rate": out.flops_perc.mean(),
            "flops": out.flops,
        }
        # density breakdown: CNN (per-stage s3/s2/s1/channel) or ViT
        # (per-block token/head/attn/mlp) — the all_density matrix analog
        for k in ("spatial_s3", "spatial_s2", "spatial_s1", "channel_s",
                  "token_density", "head_density", "attn_density",
                  "mlp_density"):
            if getattr(out, k, None) is not None:
                stats[k] = getattr(out, k)
        return stats

    return eval_step
