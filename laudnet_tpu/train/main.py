"""LAUD ImageNet training CLI (reference `train/main.py`).

TPU-native single-controller trainer: one process drives all local devices
through a jitted data-parallel train step (no mp.spawn/DDP — the mesh +
sharded batches replace NCCL, SURVEY.md §2.6). Supports the reference's
experiment surface: per-stage dash-separated dynamic configs, Gumbel
temperature schedules, FLOPs-targeted sparsity loss with KD, recipe presets
via python config files, auto-resume, CSV metric logs and per-stage density
dumps.

Run without ``--data_url`` to smoke-train on synthetic data::

    python -m laudnet_tpu.train.main --arch uni_resnet50 \
        --dyn_mode spatial-spatial-spatial-spatial \
        --mask_spatial_granularity 4-4-2-1 --target_rate 0.5 \
        --epochs 1 --steps_per_epoch 5 --batch_size 16
"""

from __future__ import annotations

import argparse
import csv
import os
import time

import jax
import jax.numpy as jnp
import numpy as np


RESNET_ARCHS = ("uni_resnet50", "uni_resnet101")
REGNET_ARCHS = tuple(
    f"lad_regnet_{k}" for k in (
        "y_400mf", "y_800mf", "y_1_6gf", "y_3_2gf", "y_8gf", "y_16gf",
        "y_32gf", "y_128gf", "x_400mf", "x_800mf", "x_1_6gf", "x_3_2gf",
        "x_8gf", "x_16gf", "x_32gf",
    )
)
VIT_ARCHS = ("laud_deit_small", "laud_deit_tiny", "laud_deit_base",
             "laud_t2t_vit_19")


def arch_family(arch: str) -> str:
    if arch in RESNET_ARCHS:
        return "resnet"
    if arch in REGNET_ARCHS:
        return "regnet"
    if arch in VIT_ARCHS:
        return "vit"
    raise ValueError(f"unknown arch {arch}")


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="LAUDNet-TPU ImageNet training")
    p.add_argument("--arch", default="uni_resnet50",
                   choices=list(RESNET_ARCHS + REGNET_ARCHS + VIT_ARCHS))
    p.add_argument("--config", default=None,
                   help="python config file selecting hyperparams_set_index")
    p.add_argument("--hyperparams_set_index", type=int, default=None)
    p.add_argument("--train_url", default="./output")
    p.add_argument("--data_url", default=None,
                   help="ImageNet root with train/ and val/; synthetic if unset")
    # dynamic config (dash-separated per stage, reference `main.py:111-134`)
    p.add_argument("--dyn_mode", default="spatial-spatial-spatial-spatial")
    p.add_argument("--mask_spatial_granularity", default="4-4-2-1")
    p.add_argument("--channel_dyn_granularity", default="1-1-1-1")
    p.add_argument("--spatial_mask_channel_group", default="1-1-1-1")
    p.add_argument("--channel_masker", default="MLP-MLP-MLP-MLP")
    p.add_argument("--channel_masker_layers", default="1-1-1-1")
    p.add_argument("--masker_reduction", default="16-16-16-16")
    # ViT paradigms (comma-separated subset of token,head,layer)
    p.add_argument("--vit_skip", default="token,head,layer",
                   help="LAUD-ViT gated paradigms (comma list)")
    p.add_argument("--vit_attn", default="reference",
                   choices=["reference", "fused"],
                   help="ViT attention impl: 'fused' runs the Pallas "
                        "kernel forward (exact recomputed gradients) — "
                        "TPU only")
    p.add_argument("--vit_linear", default="dense",
                   choices=["dense", "int8_qat"],
                   help="'int8_qat' fine-tunes the STUDENT under the "
                        "int8 serving path's fake-quant numerics "
                        "(straight-through gradients, ops/quant.py); "
                        "the teacher stays dense")
    p.add_argument("--conv_impl", default="dense",
                   choices=["dense", "int8_qat"],
                   help="CNN QAT (LAUD-ResNet archs): 'int8_qat' "
                        "fine-tunes the student's convs under the W8A8 "
                        "QuantConv fake-quant numerics — including the "
                        "gate flips quantization noise causes at the "
                        "masker inputs; the teacher stays dense")
    # gumbel temperature
    p.add_argument("--t0", type=float, default=5.0)
    p.add_argument("--t_last", type=float, default=0.1)
    p.add_argument("--t_last_epoch", type=int, default=None)
    p.add_argument("--temp_scheduler", default="exp",
                   choices=["exp", "linear", "cosine"])
    # sparsity + KD (reference defaults from train_scripts.sh)
    p.add_argument("--target_rate", type=float, default=0.5)
    p.add_argument("--lambda_act", type=float, default=10.0)
    p.add_argument("--T_kd", type=float, default=4.0)
    p.add_argument("--alpha_kd", type=float, default=0.5)
    p.add_argument("--lr_mult", type=float, default=1.0)
    # checkpoints
    p.add_argument("--finetune_from", default=None,
                   help="torch .pth[.tar] with static weights (strict=False)")
    p.add_argument("--teacher_path", default=None)
    p.add_argument("--evaluate_from", default=None)
    # overrides / smoke knobs
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--steps_per_epoch", type=int, default=None,
                   help="only for synthetic data")
    p.add_argument("--input_size", type=int, default=224)
    p.add_argument("--num_classes", type=int, default=1000)
    p.add_argument("--print_freq", type=int, default=10)
    p.add_argument("--no_native_loader", action="store_true",
                   help="force the PIL input pipeline even when the native "
                        "C++ loader is available")
    # extra train-time augmentations (reference --colorjitter /
    # --autoaugment / --change_light); any of these forces the PIL loader
    p.add_argument("--colorjitter", action="store_true")
    p.add_argument("--autoaugment", action="store_true")
    p.add_argument("--change_light", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    # multi-host bring-up (the reference's dist.init_process_group flags,
    # `train/main.py:92,261-262`): every host runs the same command with
    # its own --dist_process_id; batch_size stays the GLOBAL batch
    p.add_argument("--dist_coordinator", default=None,
                   help="coordinator address host:port for "
                        "jax.distributed.initialize")
    p.add_argument("--dist_num_processes", type=int, default=None)
    p.add_argument("--dist_process_id", type=int, default=None)
    p.add_argument("--tp", type=int, default=1,
                   help="tensor-parallel group size (Megatron layout, "
                        "parallel/tp.py): ViT archs shard qkv/fc1 "
                        "column-wise and proj/fc2 row-wise; ResNets "
                        "shard conv2/conv3/fc. Composes with --fsdp "
                        "(which then shards the data axis). No reference "
                        "analog (DDP only)")
    p.add_argument("--fsdp", action="store_true",
                   help="shard params + optimizer state over the data "
                        "axis (ZeRO-3 analog, parallel/fsdp.py) instead "
                        "of replicating them per device")
    p.add_argument("--pp", type=int, default=1,
                   help="pipeline-parallel stage count (GPipe schedule, "
                        "parallel/pp_train.py): ViT archs split their "
                        "block trunk into --pp contiguous stages over a "
                        "'stage' mesh axis; remaining devices carry data "
                        "parallelism. ViT-only; exclusive with --tp/"
                        "--fsdp. No reference analog (DDP only)")
    p.add_argument("--pp_microbatches", type=int, default=4,
                   help="microbatches streamed through the pipeline per "
                        "step (bubble fraction = (S-1)/(M+S-1))")
    p.add_argument("--optimizer", default="SGD",
                   choices=["SGD", "RMSprop"],
                   help="the reference's --optimizer switch "
                        "(utils/optimizer.py); RMSprop uses alpha=0.9 + "
                        "momentum, torch semantics")
    p.add_argument("--no_decay_biases", action="store_true",
                   help="the reference's weigh_decay_apply_on_all=False: "
                        "weight decay only on rank>1 kernels (biases/BN "
                        "exempt)")
    p.add_argument("--amp", action="store_true",
                   help="bf16 mixed-precision training: body convs/matmuls/"
                        "norms compute in bfloat16 (native MXU dtype) with "
                        "f32 master params; gating heads, softmax, losses "
                        "and BN statistics stay f32. The reference pins "
                        "use_amp=False (`train/main.py:138`); on TPU bf16 "
                        "needs no loss scaling (f32-range exponent)")
    return p.parse_args(argv)


def _stage_list(spec: str, cast=str):
    return tuple(cast(v) for v in spec.split("-"))


def _density_rows(s):
    """The reference's 4x(blocks) ``all_density`` matrix (`main.py:454-459`):
    s3/s2/s1/channel per CNN block, or token/head/attn/mlp per ViT block."""
    if "spatial_s3" in s:
        return np.stack([
            np.concatenate([np.asarray(v) for v in s["spatial_s3"]]),
            np.concatenate([np.asarray(v) for v in s["spatial_s2"]]),
            np.concatenate([np.asarray(v) for v in s["spatial_s1"]]),
            np.concatenate([np.asarray(v) for v in s["channel_s"]]),
        ])
    return np.stack([
        np.asarray(s["token_density"]),
        np.asarray(s["head_density"]),
        np.asarray(s["attn_density"]),
        np.asarray(s["mlp_density"]),
    ])


def _pad_val_batch(images, labels, full_bs: int):
    """Wrap-pad a final partial val batch (drop_last=False tail) up to the
    full local batch size so the data-axis sharding divides evenly, and
    return a 0/1 validity mask — the eval step weights its stats by it,
    keeping top1/top5/act_rate exact over real rows only. Without this, a
    val set not divisible by (local_bs x hosts) dies in put_global_batch
    (shard_shape rejects uneven batches) after a full training epoch."""
    n = len(labels)
    weights = np.ones((full_bs,), np.float32)
    if n == full_bs:
        return images, labels, weights
    reps = -(-full_bs // n)  # ceil
    images = np.concatenate([np.asarray(images)] * reps)[:full_bs]
    labels = np.concatenate([np.asarray(labels)] * reps)[:full_bs]
    weights[n:] = 0.0
    return images, labels, weights


def main(argv=None):
    from laudnet_tpu import models
    from laudnet_tpu.data import (
        DataLoader, ImageFolderDataset, eval_transform, synthetic_batches,
        train_transform,
    )
    from laudnet_tpu.parallel import make_mesh, data_parallel_shardings
    from laudnet_tpu.train import optim
    from laudnet_tpu.train.checkpoint import CheckpointManager
    from laudnet_tpu.train.hyperparams import get_hyperparams
    from laudnet_tpu.train.trainer import (
        TrainConfig, create_train_state, make_eval_step, make_train_step,
    )
    from laudnet_tpu.utils.config import Config
    from laudnet_tpu.utils.flops import resnet_full_flops
    from laudnet_tpu.utils.logging_utils import Logger
    from laudnet_tpu.utils.metrics import AverageMeter

    args = parse_args(argv)
    from laudnet_tpu.parallel import initialize_distributed, put_global_batch

    # must run before any device use (multi-host no-ops when unset)
    initialize_distributed(args.dist_coordinator, args.dist_num_processes,
                           args.dist_process_id)
    n_proc = jax.process_count()
    proc_id = jax.process_index()
    set_index = args.hyperparams_set_index
    if args.config:
        cfg = Config.fromfile(args.config)
        set_index = cfg.train_cfg["hyperparams_set_index"]
    recipe = get_hyperparams(set_index if set_index is not None else 2)
    epochs = args.epochs or recipe.epochs
    batch_size = args.batch_size or recipe.batch_size
    if batch_size % n_proc:
        raise ValueError(f"global batch {batch_size} must divide over "
                         f"{n_proc} processes")
    # per-host batch, the reference's per-GPU division (`main.py:324-325`)
    local_bs = batch_size // n_proc
    t_last_epoch = args.t_last_epoch or epochs

    os.makedirs(args.train_url, exist_ok=True)
    if proc_id == 0:
        log = Logger(os.path.join(args.train_url, "train.log"))
    else:  # one writer per shared train_url; workers stay quiet
        log = lambda *a, **k: None
    log(f"devices: {jax.devices()} ({n_proc} processes)")

    family = arch_family(args.arch)
    model_ctor = getattr(models, args.arch)
    # AMP: student AND teacher compute in bf16 (KD targets shift ~1e-2 in
    # logit space; losses reduce in f32 — `train/losses.py`)
    amp_dtype = jnp.bfloat16 if args.amp else None
    if family == "vit" and args.conv_impl != "dense":
        raise SystemExit("--conv_impl applies to LAUD-ResNets; for ViT "
                         "QAT use --vit_linear int8_qat")
    if family != "vit" and args.vit_linear != "dense":
        raise SystemExit("--vit_linear applies to ViT archs; for "
                         "LAUD-ResNet QAT use --conv_impl int8_qat")
    if family == "vit":
        skips = set(args.vit_skip.split(","))
        model = model_ctor(
            num_classes=args.num_classes,
            token_skip="token" in skips,
            head_skip="head" in skips,
            layer_skip="layer" in skips,
            attn_impl=args.vit_attn,
            linear_impl=args.vit_linear,
            dtype=amp_dtype,
        )
        # dense teacher of the same geometry (all gates off); the reference
        # defers ViT training to AdaViT — this is the native equivalent
        teacher = model_ctor(
            num_classes=args.num_classes,
            token_skip=False, head_skip=False, layer_skip=False,
            attn_impl=args.vit_attn,
            dtype=amp_dtype,
        )
    else:
        stage_kwargs = dict(
            num_classes=args.num_classes,
            input_size=args.input_size,
            dyn_mode=_stage_list(args.dyn_mode),
            mask_spatial_granularity=_stage_list(
                args.mask_spatial_granularity, int),
            channel_dyn_granularity=_stage_list(
                args.channel_dyn_granularity, int),
            spatial_mask_channel_group=_stage_list(
                args.spatial_mask_channel_group, int),
            channel_masker=_stage_list(args.channel_masker),
            channel_masker_layers=_stage_list(args.channel_masker_layers, int),
            reduction_ratio=_stage_list(args.masker_reduction, int),
            dtype=amp_dtype,
        )
        if family == "resnet":
            stage_kwargs["conv_impl"] = args.conv_impl
        elif args.conv_impl != "dense":
            raise SystemExit("--conv_impl int8_qat is LAUD-ResNet-only "
                             "(QuantConv covers the ResNet conv set)")
        model = model_ctor(**stage_kwargs)
        if family == "regnet":
            from laudnet_tpu.models import regnet_static

            key = args.arch[len("lad_regnet_"):]
            teacher = regnet_static(key, num_classes=args.num_classes,
                                    input_size=args.input_size,
                                    dtype=amp_dtype)
        else:
            layers = ((3, 4, 6, 3) if args.arch == "uni_resnet50"
                      else (3, 4, 23, 3))
            teacher = models.ResNet(layers=layers,
                                    num_classes=args.num_classes,
                                    dtype=amp_dtype)

    # data
    if args.data_url:
        extra_aug = (args.colorjitter or args.autoaugment
                     or args.change_light)
        train_ds = ImageFolderDataset(
            os.path.join(args.data_url, "train"),
            train_transform(
                args.input_size,
                color_jitter=0.4 if args.colorjitter else 0.0,
                auto_augment="original" if args.autoaugment else None,
                change_light=args.change_light,
            ),
        )
        val_ds = ImageFolderDataset(
            os.path.join(args.data_url, "val"), eval_transform(args.input_size)
        )
        from laudnet_tpu.data.native_loader import (
            NativeDataLoader, native_available,
        )

        # flags first: native_available() may compile the C++ loader, which
        # must not run when the user opted out or needs the PIL-only augs
        if (not args.no_native_loader and not extra_aug
                and native_available()):
            log("input pipeline: native C++ loader (data/csrc/loader.cpp)")
            train_loader = NativeDataLoader(
                train_ds, local_bs, train=True, size=args.input_size,
                seed=args.seed, shard=(proc_id, n_proc))
            val_loader = NativeDataLoader(
                val_ds, local_bs, train=False, size=args.input_size,
                shuffle=False, drop_last=False, shard=(proc_id, n_proc))
        else:
            train_loader = DataLoader(train_ds, local_bs, seed=args.seed,
                                      shard=(proc_id, n_proc))
            val_loader = DataLoader(val_ds, local_bs, shuffle=False,
                                    drop_last=False,
                                    shard=(proc_id, n_proc))
        steps_per_epoch = len(train_loader)
    else:
        steps_per_epoch = args.steps_per_epoch or 10
        log("no --data_url: training on synthetic data (smoke mode)")

    if family == "resnet":
        full_flops = resnet_full_flops(layers, input_size=args.input_size,
                                       num_classes=args.num_classes)
    elif family == "vit":
        from laudnet_tpu.models.laud_vit import vit_dense_flops

        full_flops = vit_dense_flops(model, input_size=args.input_size)
    else:
        # RegNet: the static teacher's in-graph bookkeeping IS the dense
        # count (all gates off => sparse == dense, incl. the SE quirk)
        probe = jnp.zeros((1, args.input_size, args.input_size, 3),
                          jnp.float32)
        tv = jax.jit(lambda: teacher.init(
            {"params": jax.random.PRNGKey(0)}, probe, 1.0, training=False))()
        full_flops = float(jax.jit(
            lambda v: teacher.apply(v, probe, 1.0, training=False).flops
        )(tv))
        del tv
    log(f"full_flops (dense multiply-adds): {full_flops / 1e9:.3f} G")

    alpha_kd = args.alpha_kd
    if args.teacher_path is None and args.data_url:
        # The reference REQUIRES teacher weights (strict load,
        # `train/main.py:294`); distilling a real run toward a random
        # teacher would silently degrade accuracy, so disable KD instead.
        # (Synthetic smoke runs keep KD to exercise the code path.)
        log("WARNING: no --teacher_path; disabling KD (alpha_kd=0) — a "
            "random teacher would corrupt real-data training")
        alpha_kd = 0.0
    cfg = TrainConfig(
        num_epochs=epochs, steps_per_epoch=steps_per_epoch,
        base_lr=recipe.lr, lr_min=recipe.lr_min, scheduler=recipe.scheduler,
        warmup_epochs=recipe.warmup_epochs,
        t0=args.t0, t_last=args.t_last, t_last_epoch=t_last_epoch,
        temp_scheduler=args.temp_scheduler,
        lambda_act=args.lambda_act, alpha_kd=alpha_kd, t_kd=args.T_kd,
        label_smooth=recipe.label_smooth, target_rate=args.target_rate,
        full_flops=full_flops,
    )

    if args.tp > 1 and family == "regnet":
        raise SystemExit("--tp supports ViT and ResNet archs (no Megatron "
                         "rules for the RegNet block layout yet)")
    if jax.device_count() % args.tp:
        raise SystemExit(f"--tp {args.tp} must divide the device count "
                         f"({jax.device_count()})")
    if args.pp > 1:
        # GPipe over the ViT trunk (parallel/pp_train.py)
        if family != "vit":
            raise SystemExit("--pp supports ViT archs only (the trunk "
                             "split needs homogeneous block_* layers)")
        if args.tp > 1 or args.fsdp:
            raise SystemExit("--pp is exclusive with --tp/--fsdp in this "
                             "CLI (compose via parallel/ APIs directly)")
        if jax.device_count() % args.pp:
            raise SystemExit(f"--pp {args.pp} must divide the device "
                             f"count ({jax.device_count()})")
        if model.depth % args.pp:
            raise SystemExit(f"--pp {args.pp} must divide the model depth "
                             f"({model.depth})")
        if (local_bs * n_proc) % args.pp_microbatches:
            raise SystemExit(
                f"global batch {local_bs * n_proc} must be divisible by "
                f"--pp_microbatches {args.pp_microbatches}")
    data_axis = jax.device_count() // (args.tp * args.pp)
    per_shard = ((local_bs * n_proc) // args.pp_microbatches
                 if args.pp > 1 else local_bs * n_proc)
    if per_shard % data_axis:
        # catch this here with a readable message instead of the opaque
        # GSPMD shard_shape error it becomes inside device_put
        raise SystemExit(
            f"{'microbatch' if args.pp > 1 else 'global batch'} "
            f"{per_shard} (--batch_size {batch_size}) must be divisible "
            f"by the data axis ({jax.device_count()} devices / "
            f"tp*pp {args.tp * args.pp} = {data_axis})")
    if args.pp > 1:
        from laudnet_tpu.parallel import make_pp_mesh

        mesh = make_pp_mesh(args.pp)
        log(f"PP: GPipe {args.pp} stages x "
            f"{model.depth // args.pp} layers/stage, "
            f"{args.pp_microbatches} microbatches, dp={data_axis}")
    else:
        mesh = make_mesh(model_parallel=args.tp)
    if args.tp > 1 and family == "vit" and args.vit_attn == "fused":
        # partition-aware fused attention: each model-axis shard runs the
        # Pallas kernel on its local heads (parallel/tp.py)
        if model.num_heads % args.tp == 0:
            model = model.clone(tp_mesh=mesh)
            teacher = teacher.clone(tp_mesh=mesh)
        else:
            log(f"--tp {args.tp} does not divide {model.num_heads} heads; "
                "attention falls back to the reference graph under TP "
                "(GSPMD still shards the matmuls)")
            model = model.clone(attn_impl="reference")
            teacher = teacher.clone(attn_impl="reference")
    batch_sh, repl = data_parallel_shardings(mesh)
    rng = jax.random.PRNGKey(args.seed)
    sample = jnp.zeros((local_bs, args.input_size, args.input_size, 3),
                       jnp.float32)

    variables = jax.jit(
        lambda: model.init({"params": rng}, sample, 1.0, training=False)
    )()
    if args.finetune_from:
        from laudnet_tpu.convert import (
            convert_regnet_state_dict, convert_resnet_state_dict,
            convert_vit_state_dict, load_pth_tar,
        )

        convert = {"regnet": convert_regnet_state_dict,
                   "vit": convert_vit_state_dict,
                   "resnet": convert_resnet_state_dict}[family]
        loaded = convert(load_pth_tar(args.finetune_from))
        variables = _merge_loose(variables, loaded)
        log(f"loaded finetune weights from {args.finetune_from}")

    def init_teacher():
        try:
            return teacher.init({"params": rng}, sample, training=False)
        except TypeError:
            return teacher.init({"params": rng}, sample, 1.0, training=False)

    teacher_vars = jax.jit(init_teacher)()
    if args.teacher_path:
        from laudnet_tpu.convert import (
            convert_regnet_state_dict, convert_resnet_state_dict,
            convert_vit_state_dict, load_pth_tar,
        )

        convert = {"regnet": convert_regnet_state_dict,
                   "vit": convert_vit_state_dict,
                   "resnet": convert_resnet_state_dict}[family]
        teacher_vars = _merge_loose(
            teacher_vars, convert(load_pth_tar(args.teacher_path))
        )
        log(f"loaded teacher from {args.teacher_path}")

    # lr_mult scales the BACKBONE group (maskers stay at 1.0) — the
    # reference's get_optim_policies convention (`laud_resnet.py:399-400`;
    # its per-iter scheduler has an inverted branch that is dead for every
    # shipped arch name — SURVEY.md §2.2 scheduler quirk)
    if args.optimizer == "RMSprop":
        optimizer = optim.make_rmsprop(
            variables["params"],
            momentum=recipe.momentum, weight_decay=recipe.weight_decay,
            backbone_lr_mult=args.lr_mult, masker_lr_mult=1.0,
        )
        if args.no_decay_biases:
            raise SystemExit("--no_decay_biases is SGD-only (the reference "
                             "applies get_parameters grouping only there)")
    else:
        optimizer = optim.make_sgd(
            variables["params"],
            momentum=recipe.momentum, nesterov=recipe.nesterov,
            weight_decay=recipe.weight_decay,
            backbone_lr_mult=args.lr_mult, masker_lr_mult=1.0,
            decay_weights_only=args.no_decay_biases,
        )
    state = create_train_state(model, optimizer, sample, rng=rng,
                               variables=variables)
    state_sh = repl
    tp_specs = None
    if args.tp > 1:
        # Megatron tensor parallelism, GSPMD-executed: the TP rules match
        # on trailing param names, so one pass over the WHOLE TrainState
        # also shards the momentum buffers (same inner tree) while step/
        # batch_stats/maskers stay replicated (parallel/tp.py).
        from laudnet_tpu.parallel import (
            RESNET_TP_RULES, VIT_TP_RULES, tensor_parallel_specs,
        )

        rules = VIT_TP_RULES if family == "vit" else RESNET_TP_RULES
        tp_specs = tensor_parallel_specs(state, rules, mesh=mesh)
        state_sh = tp_specs
        log(f"TP: Megatron {family} layout over model axis "
            f"(tp={args.tp}, dp={jax.device_count() // args.tp})")
    if args.fsdp:
        # ZeRO-3 analog: every large leaf of the TrainState (params AND
        # the momentum buffers, which share their shapes) splits its
        # largest dim over the data axis; GSPMD all-gathers weights at
        # use and reduce-scatters gradients (parallel/fsdp.py). With
        # --tp, FSDP takes the largest dim the TP layout left free.
        from laudnet_tpu.parallel import fsdp_specs

        state_sh = fsdp_specs(state, mesh=mesh, axis="data",
                              base_specs=tp_specs)
        log("FSDP: params + optimizer state sharded over the data axis")
    state = jax.device_put(state, state_sh)
    teacher_vars = jax.device_put(teacher_vars, repl)

    ckpt = CheckpointManager(os.path.join(args.train_url, "ckpt"))
    if ckpt.latest_step() is not None:
        state, meta = ckpt.restore(jax.eval_shape(lambda s: s, state))
        state = jax.device_put(state, state_sh)
        log(f"auto-resumed from step {int(state.step)}")

    if args.pp > 1:
        from laudnet_tpu.parallel import make_pp_train_step

        train_step = jax.jit(
            make_pp_train_step(model, teacher, teacher_vars, optimizer,
                               cfg, mesh=mesh,
                               microbatches=args.pp_microbatches),
            donate_argnums=(0,),
        )
    else:
        train_step = jax.jit(
            make_train_step(model, teacher, teacher_vars, optimizer, cfg),
            donate_argnums=(0,),
        )
    eval_step = jax.jit(make_eval_step(model, cfg))

    if args.evaluate_from:
        # evaluation-only path (reference `main.py:304-307,435-436`)
        from laudnet_tpu.convert import (
            convert_regnet_state_dict, convert_resnet_state_dict,
            convert_vit_state_dict, load_pth_tar,
        )

        convert = {"regnet": convert_regnet_state_dict,
                   "vit": convert_vit_state_dict,
                   "resnet": convert_resnet_state_dict}[family]
        loaded = convert(load_pth_tar(args.evaluate_from))
        if family == "vit":
            # plain DeiT checkpoints carry no policy heads; keep init ones
            from laudnet_tpu.convert import merge_variables

            params = merge_variables(jax.device_get(state.params),
                                     loaded["params"])
        else:
            params = loaded["params"]
        bstats = loaded.get("batch_stats", state.batch_stats)
        top1 = top5 = act = gflops = 0.0
        n_val = 0
        val_batches = (
            val_loader.epoch(0) if args.data_url
            else synthetic_batches(local_bs, args.input_size,
                                   args.num_classes, 2,
                                   seed=10_000 + proc_id * 7919)
        )
        for images, labels in val_batches:
            images, labels, w = _pad_val_batch(images, labels, local_bs)
            s = jax.device_get(eval_step(
                params, bstats,
                put_global_batch(images, batch_sh),
                put_global_batch(labels, batch_sh),
                put_global_batch(w, batch_sh),
            ))
            bsz = float(s["n_valid"])  # global valid rows (advisor r4)
            top1 += float(s["top1"]) * bsz
            top5 += float(s["top5"]) * bsz
            act += float(s["act_rate"]) * bsz
            gflops += float(s["flops"]) / 1e9 * bsz
            n_val += bsz
        if n_val == 0:
            raise RuntimeError(
                f"empty validation set under {args.data_url!r} — nothing "
                "to evaluate")
        log(f"evaluate: top1 {top1 / n_val:.3f} top5 {top5 / n_val:.3f} "
            f"act_rate {act / n_val:.3f} GFLOPs {gflops / n_val:.3f}")
        return top1 / n_val

    csv_path = os.path.join(args.train_url, "log.txt")
    if proc_id == 0 and not os.path.exists(csv_path):
        with open(csv_path, "w", newline="") as f:
            csv.writer(f).writerow(
                ["epoch", "train_top1", "train_loss", "val_top1", "val_top5",
                 "act_rate", "gflops", "lr", "temperature"]
            )

    # On auto-resume, recover the running best from best_result.txt so the
    # first post-resume epoch cannot overwrite model-best with a worse one.
    best_top1 = -1.0
    best_path = os.path.join(args.train_url, "best_result.txt")
    if os.path.exists(best_path):
        try:
            best_top1 = float(open(best_path).read().split()[0])
            log(f"restored best top1 {best_top1:.3f} from best_result.txt")
        except (ValueError, IndexError):
            pass
    start_epoch = int(state.step) // steps_per_epoch
    for epoch in range(start_epoch, epochs):
        meters = {k: AverageMeter(k) for k in
                  ("loss", "top1", "act_rate", "flops")}
        dev_sums = {k: jnp.float32(0.0) for k in meters}
        dev_count = 0
        batches = (
            train_loader.epoch(epoch) if args.data_url
            else synthetic_batches(local_bs, args.input_size,
                                   args.num_classes, steps_per_epoch,
                                   seed=epoch + proc_id * 7919)
        )
        t0 = time.time()
        m = {}
        for i, (images, labels) in enumerate(batches):
            images = put_global_batch(images, batch_sh)
            labels = put_global_batch(labels, batch_sh)
            state, m = train_step(state, images, labels, rng)
            # metrics accumulate on-device EVERY step (reference averages
            # every iteration, `main.py:581-588`) without a per-step host
            # sync; the epoch-end device_get folds them into the meters
            bsz = len(labels)
            for k in meters:
                dev_sums[k] = dev_sums[k] + m[k] * bsz
            dev_count += bsz
            if i % args.print_freq == 0:
                m_host = jax.device_get(m)
                log(f"epoch {epoch} [{i}/{steps_per_epoch}] "
                    f"loss {float(m_host['loss']):.4f} "
                    f"top1 {float(m_host['top1']):.2f} "
                    f"act {float(m_host['act_rate']):.3f} "
                    f"lr {float(m_host['lr']):.5f} T {float(m_host['temperature']):.3f}")
        if dev_count:
            sums_host = jax.device_get(dev_sums)
            for k in meters:
                meters[k].update(float(sums_host[k]) / dev_count, dev_count)
        train_time = time.time() - t0

        # validation
        val_top1 = val_top5 = act = gflops = 0.0
        n_val = 0
        val_batches = (
            val_loader.epoch(0) if args.data_url
            else synthetic_batches(local_bs, args.input_size,
                                   args.num_classes, 2,
                                   seed=10_000 + proc_id * 7919)
        )
        density_rows = None
        for images, labels in val_batches:
            images, labels, w = _pad_val_batch(images, labels, local_bs)
            s = jax.device_get(eval_step(
                state.params, state.batch_stats,
                put_global_batch(images, batch_sh),
                put_global_batch(labels, batch_sh),
                put_global_batch(w, batch_sh),
            ))
            # weight by the GLOBAL valid count returned from eval_step —
            # the per-batch stats are global weighted means, so a
            # host-local count would skew the aggregate when hosts have
            # different final-batch tails (advisor r4)
            bsz = float(s["n_valid"])
            val_top1 += float(s["top1"]) * bsz
            val_top5 += float(s["top5"]) * bsz
            act += float(s["act_rate"]) * bsz
            gflops += float(s["flops"]) / 1e9 * bsz
            n_val += bsz
            # batch-size-weighted val-set average (reference accumulates
            # densities over the whole val set, `main.py:625-660`)
            rows = _density_rows(s) * bsz
            density_rows = rows if density_rows is None else (
                density_rows + rows)
        if n_val == 0:
            raise RuntimeError(
                f"empty validation set under {args.data_url!r} — check "
                "that val/ contains class directories with images")
        density_rows = density_rows / n_val
        val_top1, val_top5 = val_top1 / n_val, val_top5 / n_val
        act, gflops = act / n_val, gflops / n_val
        log(f"epoch {epoch}: val top1 {val_top1:.3f} top5 {val_top5:.3f} "
            f"act_rate {act:.3f} GFLOPs {gflops:.3f} ({train_time:.1f}s train)")

        is_best = val_top1 > best_top1
        if is_best:
            best_top1 = val_top1
        if proc_id == 0:  # one writer per shared train_url
            np.savetxt(
                os.path.join(args.train_url, "all_density_latest.txt"),
                density_rows)
            with open(csv_path, "a", newline="") as f:
                m_host = jax.device_get(m)
                csv.writer(f).writerow(
                    [epoch, meters["top1"].avg, meters["loss"].avg,
                     val_top1, val_top5, act, gflops, float(m_host["lr"]),
                     float(m_host["temperature"])]
                )
            if is_best:
                np.savetxt(
                    os.path.join(args.train_url, "all_density_best.txt"),
                    density_rows)
                with open(os.path.join(args.train_url,
                                       "best_result.txt"), "w") as f:
                    f.write(f"{best_top1:.6f}\t{act:.6f}\t{gflops:.6f}")
        # orbax coordinates across processes (barrier inside save) — every
        # process must participate, not just the writer. Save the sharded
        # state directly: a device_get here would crash on multi-host
        # (leaves span non-addressable devices under --fsdp) and defeats
        # ZeRO-3 by gathering the full state onto every host.
        ckpt.save(int(state.step), state,
                  metadata={"epoch": epoch, "val_top1": val_top1},
                  is_best=is_best)
    ckpt.close()
    log(f"done; best top1 {best_top1:.3f}")
    return best_top1


def _merge_loose(variables, loaded):
    """strict=False load: copy loaded leaves that exist in the target
    (reference `main.py:281` semantics — maskers stay fresh)."""

    def merge(dst, src):
        for k, v in src.items():
            if k in dst:
                if isinstance(v, dict):
                    merge(dst[k], v)
                elif dst[k].shape == v.shape:
                    dst[k] = jnp.asarray(v, dst[k].dtype)
        return dst

    out = jax.tree_util.tree_map(lambda x: x, variables)  # copy containers
    out = jax.device_get(out)
    for coll in loaded:
        if coll in out:
            merge(out[coll], loaded[coll])
    return out


if __name__ == "__main__":
    main()
