"""Pipeline-parallel LAUD-ViT training (GPipe over a 'stage' mesh axis).

The reference has no pipeline parallelism (single-node DDP only, SURVEY
§2.6); this is the TPU-native layer-scaling path for trunks that exceed one
chip's HBM: the transformer blocks split into ``S`` contiguous stages over
the 'stage' mesh axis and microbatches stream through ``lax.ppermute``
rotations (:mod:`laudnet_tpu.parallel.pp`), while the patch embed, the
classifier head and the KD teacher run data-parallel over the mesh's 'data'
axis. Everything is ONE jitted SPMD program; reverse-mode AD through the
GPipe schedule yields exact gradients (``tests/test_tp_pp.py`` pins parity
against the sequential trunk).

Stats plumbing: each stage writes its blocks' rows of a ``(B, depth, 5)``
stats buffer carried alongside the activations — the LINEAR densities
``[token_density, head_density, attn_density, mlp_density, token_keep]``.
Microbatch means of linear densities average exactly to the global batch
means, so the FLOPs bookkeeping (quadratic in token density) is recomputed
AFTER the pipeline from the averaged densities via
``vit_block_bookkeeping`` — pp reports bit-comparable flops_perc to the
data-parallel step (the correctness oracle), unlike naive per-microbatch
bookkeeping whose E[rho_mb^2] != (E[rho])^2.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from laudnet_tpu.parallel.pp import pipeline_apply, stack_layer_params


def make_pp_mesh(n_stages: int, n_devices: int | None = None) -> Mesh:
    """A ``(data, stage)`` mesh: the inner (fastest-varying, ICI-adjacent)
    axis carries the pipeline so stage hops ride neighbor links."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    if len(devices) % n_stages:
        raise ValueError(f"{len(devices)} devices not divisible by "
                         f"pp={n_stages}")
    grid = np.asarray(devices).reshape(-1, n_stages)
    return Mesh(grid, ("data", "stage"))


def pp_vit_forward(model, params, images, temperature, *, mesh: Mesh,
                   microbatches: int, rng=None, training: bool = False):
    """:class:`~laudnet_tpu.models.laud_vit.LAUDViT` forward with the block
    trunk pipelined over ``mesh``'s 'stage' axis. Same output contract as
    ``model.apply`` (a ``LAUDViTOutput``), same parameter tree — only the
    execution schedule differs, so the data-parallel step remains the
    correctness oracle.

    Gumbel noise: block ``i`` on microbatch ``m`` of data shard ``s``
    draws from ``fold_in(fold_in(fold_in(rng, s), m), i)`` — independent
    streams per (data shard, microbatch, block), like the flax path's
    per-module folding (different draws, same distribution)."""
    from laudnet_tpu.models.laud_vit import (
        LAUDViTBlock, LAUDViTOutput, vit_block_bookkeeping,
        vit_policy_flops,
    )

    depth, d = model.depth, model.dim
    n_stages = mesh.shape["stage"]
    if depth % n_stages:
        raise ValueError(f"depth {depth} not divisible by {n_stages} stages")
    per_stage = depth // n_stages
    b = images.shape[0]

    # --- stem: data-parallel, reusing the model's own param subtrees ----
    if model.stem == "t2t":
        from laudnet_tpu.models.t2t import T2TStem, t2t_stem_flops

        x = T2TStem(embed_dim=d, param_dtype=model.param_dtype).apply(
            {"params": params["t2t_stem"]}, images)
        n = x.shape[1]
        stem_flops = float(t2t_stem_flops(d))
    else:
        p = model.patch_size
        x = nn.Conv(d, (p, p), strides=p, dtype=model.dtype,
                    param_dtype=model.param_dtype).apply(
            {"params": params["patch_embed"]}, images)
        n = x.shape[1] * x.shape[2]
        x = x.reshape(b, n, d)
        stem_flops = float(images.shape[3] * d * p * p * n)
    x = jnp.concatenate(
        [jnp.broadcast_to(params["cls_token"], (b, 1, d)), x], axis=1)
    x = x + params["pos_embed"]
    if model.dtype is not None:
        # mirror the dp path: cls/pos are f32 masters, the residual
        # stream re-enters the AMP compute dtype (laud_vit.py __call__)
        x = x.astype(model.dtype)
    l = n + 1
    token_mask = jnp.ones((b, l), jnp.float32)

    block = LAUDViTBlock(
        dim=d, num_heads=model.num_heads, mlp_ratio=model.mlp_ratio,
        token_skip=model.token_skip, head_skip=model.head_skip,
        layer_skip=model.layer_skip, book_len=l, attn_impl=model.attn_impl,
        linear_impl=model.linear_impl, dtype=model.dtype,
        param_dtype=model.param_dtype,
    )
    stacked, n_layers = stack_layer_params(params)
    if n_layers != depth:
        raise ValueError(f"{n_layers} block_* subtrees != depth {depth}")
    stacked = jax.tree_util.tree_map(
        lambda a: a.reshape((n_stages, per_stage) + a.shape[1:]), stacked)

    if b % microbatches:
        raise ValueError(f"batch {b} not divisible into {microbatches} "
                         f"microbatches")
    mbid = jnp.repeat(jnp.arange(microbatches, dtype=jnp.int32),
                      b // microbatches)
    stats0 = jnp.zeros((b, depth, 5), jnp.float32)

    def stage_fn(p_stage, buf):
        y, m, stats = buf["x"], buf["mask"], buf["stats"]
        sid = jax.lax.axis_index("stage")
        # fold the data-shard index in too: without it every 'data' shard
        # would draw bit-identical Gumbel noise for its local rows
        # (correlated gates, effective noise samples / dp), unlike the dp
        # oracle which draws iid over the global batch
        did = (jax.lax.axis_index("data") if "data" in mesh.shape
               else jnp.int32(0))
        mb_id = buf["mbid"][0]
        mb = y.shape[0]
        for j in range(per_stage):
            pj = jax.tree_util.tree_map(lambda a: a[j], p_stage)
            gidx = sid * per_stage + j
            rngs = None
            if training and rng is not None:
                rngs = {"gumbel": jax.random.fold_in(jax.random.fold_in(
                    jax.random.fold_in(rng, did), mb_id), gidx)}
            y, m, st = block.apply({"params": pj}, y, m, temperature,
                                   training=training, rngs=rngs)
            row = jnp.stack([
                jnp.broadcast_to(st.token_density, (mb,)),
                jnp.broadcast_to(st.head_density, (mb,)),
                jnp.broadcast_to(st.attn_density, (mb,)),
                jnp.broadcast_to(st.mlp_density, (mb,)),
                st.token_keep.astype(jnp.float32),
            ], axis=-1)  # (mb, 5)
            stats = jax.lax.dynamic_update_slice(
                stats, row[:, None, :].astype(stats.dtype), (0, gidx, 0))
        return {"x": y, "mask": m, "stats": stats, "mbid": buf["mbid"]}

    out = pipeline_apply(
        stage_fn, stacked,
        {"x": x, "mask": token_mask, "stats": stats0, "mbid": mbid},
        mesh=mesh, microbatches=microbatches,
        batch_axis="data" if "data" in mesh.shape else None,
    )

    # --- head: data-parallel ---------------------------------------------
    y = nn.LayerNorm(param_dtype=model.param_dtype).apply(
        {"params": params["norm"]}, out["x"])
    logits = nn.Dense(model.num_classes, param_dtype=model.param_dtype
                      ).apply({"params": params["head"]}, y[:, 0])

    # FLOPs bookkeeping from the globally averaged densities (same
    # formula the blocks use in the dp path; quadratic terms must see the
    # GLOBAL token density, not per-microbatch ones)
    mean = out["stats"].mean(0)  # (depth, 5)
    hidden = int(d * model.mlp_ratio)
    pflops = vit_policy_flops(
        l, d, model.num_heads, token_skip=model.token_skip,
        head_skip=model.head_skip, layer_skip=model.layer_skip)
    sparse, dense = jax.vmap(
        lambda r: vit_block_bookkeeping(
            r[0], r[1], r[2], r[3], l_book=l, d=d, h=model.num_heads,
            hidden=hidden, policy_flops=pflops)
    )(mean)
    flops = (jnp.asarray(stem_flops, jnp.float32) + sparse.sum()
             + d * model.num_classes)
    return LAUDViTOutput(
        logits=logits,
        token_density=mean[:, 0], head_density=mean[:, 1],
        attn_density=mean[:, 2], mlp_density=mean[:, 3],
        flops_perc=sparse / dense, flops=flops,
        token_keep=out["stats"][:, :, 4].T,  # (depth, B)
    )


def make_pp_train_step(model, teacher_model, teacher_variables, optimizer,
                       cfg, *, mesh: Mesh, microbatches: int):
    """The LAUD-ViT train step with the trunk pipelined — same signature,
    loss and metrics as :func:`laudnet_tpu.train.trainer.make_train_step`
    (KD + CE + sparsity, per-iter LR/temperature schedules), so the train
    CLI's loop and checkpointing drive it unchanged."""
    import optax

    from laudnet_tpu.train import losses, schedules
    from laudnet_tpu.train.trainer import (
        TrainState, compute_sparsity_loss, teacher_logits_fn,
    )
    from laudnet_tpu.utils.metrics import topk_accuracy

    def train_step(state: TrainState, images, labels, gumbel_rng):
        step = state.step
        lr = schedules.lr_at(
            step, base_lr=cfg.base_lr, total_epochs=cfg.num_epochs,
            steps_per_epoch=cfg.steps_per_epoch, scheduler=cfg.scheduler,
            warmup_epochs=cfg.warmup_epochs, lr_min=cfg.lr_min,
        )
        temp = schedules.gumbel_temperature_at(
            step, t0=cfg.t0, t_last=cfg.t_last,
            t_last_epoch=cfg.t_last_epoch,
            steps_per_epoch=cfg.steps_per_epoch,
            temp_scheduler=cfg.temp_scheduler,
        )
        epoch = step.astype(jnp.float32) / cfg.steps_per_epoch
        rng = jax.random.fold_in(gumbel_rng, step)

        teacher_logits = teacher_logits_fn(
            teacher_model, teacher_variables, images)

        def loss_fn(params):
            out = pp_vit_forward(
                model, params, images, temp, mesh=mesh,
                microbatches=microbatches, rng=rng, training=True)
            loss_flops = compute_sparsity_loss(cfg, epoch, out)
            total, parts = losses.total_train_loss(
                out.logits, teacher_logits, labels, loss_flops,
                lambda_act=cfg.lambda_act, alpha_kd=cfg.alpha_kd,
                t_kd=cfg.t_kd, label_smooth=cfg.label_smooth,
            )
            aux = dict(parts, logits=out.logits,
                       act_rate=out.flops_perc.mean(), flops=out.flops)
            return total, aux

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        opt_state = state.opt_state
        opt_state.hyperparams["learning_rate"] = lr
        updates, opt_state = optimizer.update(grads, opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)

        top1, top5 = topk_accuracy(aux["logits"], labels, topk=(1, 5))
        metrics = {
            "loss": loss, "loss_cls": aux["loss_cls"],
            "loss_kd": aux["loss_kd"], "loss_flops": aux["loss_flops"],
            "act_rate": aux["act_rate"], "flops": aux["flops"],
            "lr": lr, "temperature": temp, "top1": top1, "top5": top5,
        }
        return TrainState(step=step + 1, params=params,
                          batch_stats=state.batch_stats,
                          opt_state=opt_state), metrics

    return train_step
