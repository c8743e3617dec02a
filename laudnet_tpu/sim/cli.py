"""Latency-prediction CLI (reference `DyNetSimulator/eval_example.py`).

Usage::

    python -m laudnet_tpu.sim.cli resnet101 --hardware v100 --mode spatial \
        --act-rate 0.5 --granularity 4-4-2-1

Prints per-mode predicted latency (seconds per batch and ms per image).
``--hardware`` accepts the five GPU presets and the TPU presets (v5e, v5p).
"""

from __future__ import annotations

import argparse

from laudnet_tpu.sim.dynamic import DynamicPredictor
from laudnet_tpu.sim.hardware import GPU_PRESETS, TPU_PRESETS
from laudnet_tpu.sim.models import MODEL_GEOMETRY, predict_network
from laudnet_tpu.sim.tpu import TPUPredictor, tpu_predict_network


def stage_list_to_blocks(model: str, per_stage):
    """Expand a per-stage list (e.g. granularity 4-4-2-1) to per-block."""
    blocks = MODEL_GEOMETRY[model]
    # stage boundaries via resolution drops
    out = []
    stage = -1
    last_h = None
    for g in blocks:
        if g.h != last_h:
            stage += 1
            last_h = g.h
        out.append(per_stage[min(stage, len(per_stage) - 1)])
    return out


VIT_GEOMETRY = {
    # depth, dim, heads, mlp_ratio
    "deit_small": dict(depth=12, dim=384, num_heads=6, mlp_ratio=4.0),
    "deit_tiny": dict(depth=12, dim=192, num_heads=3, mlp_ratio=4.0),
    "t2t_vit": dict(depth=14, dim=448, num_heads=7, mlp_ratio=3.0),
}


def _run_vit_gpu(args):
    """T2T-ViT three-paradigm sweep (reference `adavit/simulate_adavit.py`)."""
    from laudnet_tpu.sim.adavit import simulate_laud_t2t_vit
    from laudnet_tpu.sim.transformer import TransformerPredictor

    spec = GPU_PRESETS[args.hardware].with_batch(1)
    p = TransformerPredictor(spec)
    bs = args.batch_size or 128
    d = args.act_rate
    rows = [
        ("dense", dict(token_skip=False, head_skip=False, layer_skip=False)),
        ("layer", dict(token_skip=False, head_skip=False, layer_density=d)),
        ("token", dict(head_skip=False, layer_skip=False, token_density=d)),
        ("head", dict(token_skip=False, layer_skip=False, head_density=d)),
        ("s+c+l", dict(token_density=d, head_density=d, layer_density=d)),
    ]
    print(f"# {args.model} on {spec.name} (batch {bs}, density {d})")
    geo = VIT_GEOMETRY[args.model]
    for name, kw in rows:
        rep = simulate_laud_t2t_vit(
            p, B=bs, depth=geo["depth"], dim=geo["dim"],
            head_num=geo["num_heads"], mlp_ratio=geo["mlp_ratio"], **kw
        )
        print(f"{name:8s}: {rep.latency * 1e3:8.3f} ms/batch "
              f"({rep.latency / bs * 1e3:7.4f} ms/img)")


def _run_vit_tpu(args):
    """ViT paradigm sweep on the TPU model (`sim/tpu.py::tpu_predict_vit`):
    token selection shrinks every downstream matmul; head/layer masking run
    at dense shapes (masks fuse for free) — the model ranks the paradigms
    the way the chip measures them."""
    from laudnet_tpu.sim.tpu import tpu_predict_vit

    spec = TPU_PRESETS[args.hardware]
    if args.batch_size:
        spec = spec.with_batch(args.batch_size)
    p = TPUPredictor(spec)
    geo = VIT_GEOMETRY[args.model]
    d = args.act_rate
    caps = (d,) * geo["depth"]
    rows = [
        ("dense", dict(mode="dense")),
        ("token", dict(mode="token", token_capacity=caps)),
        ("head", dict(mode="head")),
        ("layer", dict(mode="layer")),
    ]
    bs = spec.batch_size
    print(f"# {args.model} on {spec.name} (batch {bs}, capacity {d})")
    for name, kw in rows:
        rep = tpu_predict_vit(p, depth=geo["depth"], dim=geo["dim"],
                              num_heads=geo["num_heads"],
                              mlp_ratio=geo["mlp_ratio"], **kw)
        print(f"{name:8s}: {rep.latency * 1e3:8.3f} ms/batch "
              f"({rep.latency / bs * 1e3:7.4f} ms/img) "
              f"[compute {rep.compute_latency * 1e3:.3f} ms, "
              f"memory {rep.memory_latency * 1e3:.3f} ms]")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("model",
                    choices=sorted(MODEL_GEOMETRY) + sorted(VIT_GEOMETRY))
    ap.add_argument("--hardware", default="v100",
                    choices=sorted(GPU_PRESETS) + sorted(TPU_PRESETS))
    ap.add_argument("--mode", default="all",
                    help="one of static/spatial/channel/layer/all, or a "
                         "dash-separated per-stage list (the reference's "
                         "--dyn_mode channel-channel-layer-layer configs; "
                         "TPU hardware only)")
    ap.add_argument("--act-rate", type=float, default=1.0)
    ap.add_argument("--granularity", default="4-4-2-1",
                    help="per-stage spatial patch sizes, dash separated")
    ap.add_argument("--batch-size", type=int, default=None)
    ap.add_argument("--plan", default=None, metavar="KEEPS",
                    help="comma-separated calibrated per-block token keeps "
                         "(ViT models): rank the paradigms and print the "
                         "chosen ExecutionPlan instead of the latency table")
    ap.add_argument("--snap", action="store_true",
                    help="with --plan: allow the plan to CHOOSE the "
                         "lane-snapped budget variant (it is always "
                         "priced in the ranking)")
    ap.add_argument("--int8", action="store_true",
                    help="with --plan: allow the plan to CHOOSE the W8A8 "
                         "block-engine variants (always priced when the "
                         "block engine ranks; inexact — quantization)")
    args = ap.parse_args(argv)

    if args.plan is not None:
        from laudnet_tpu.sim.plan import plan_vit_serving

        if args.model not in VIT_GEOMETRY:
            raise SystemExit("--plan currently supports the ViT models")
        g = VIT_GEOMETRY[args.model]
        keeps = [float(v) for v in args.plan.split(",")]
        # price the implementation that would serve (mirrors
        # ServingEngine._block_engine_ok's geometry gate)
        dh = g["dim"] // g["num_heads"]
        block_ok = (g["num_heads"] % 2 == 0 and g["dim"] % 128 == 0
                    and (2 * dh) % 128 == 0)
        plan = plan_vit_serving(
            keeps, depth=g["depth"], dim=g["dim"],
            num_heads=g["num_heads"], mlp_ratio=g["mlp_ratio"],
            spec=args.hardware if args.hardware in TPU_PRESETS else "v5e",
            batch_size=args.batch_size or 128,
            fused_block=block_ok, fused_attention=not block_ok,
            snap_capacities=args.snap, allow_int8=args.int8,
        )
        print(f"# {args.model} serving plan ({args.hardware})")
        print(f"mode     : {plan.mode}")
        if plan.token_capacity:
            print("caps     : "
                  + ",".join(f"{c:.3f}" for c in plan.token_capacity))
        print(f"latency  : {plan.predicted_latency * 1e3:.3f} ms/batch "
              f"(dense {plan.dense_latency * 1e3:.3f})")
        print(f"speedup  : {plan.predicted_speedup:.3f}x")
        for m, v in sorted(plan.ranking.items(), key=lambda kv: kv[1]):
            print(f"  {m:8s} {v * 1e3:8.3f} ms")
        return plan

    if args.model in VIT_GEOMETRY:
        if args.hardware in GPU_PRESETS:
            return _run_vit_gpu(args)
        return _run_vit_tpu(args)

    grans = [int(v) for v in args.granularity.split("-")]
    gran_blocks = stage_list_to_blocks(args.model, grans)
    n_blocks = len(MODEL_GEOMETRY[args.model])
    rates = [args.act_rate] * n_blocks

    _MODES = ("static", "spatial", "channel", "layer", "pallas",
              "channel_gather")
    if "-" in args.mode:
        # per-stage paradigm list, expanded to per-block like granularity
        stage_modes = args.mode.split("-")
        bad = [m for m in stage_modes if m not in _MODES]
        if bad:
            raise SystemExit(f"unknown mode(s) in per-stage list: {bad}")
        if args.hardware in GPU_PRESETS:
            raise SystemExit(
                "per-stage --mode lists are supported on the TPU hardware "
                "models only (the GPU predictor prices uniform paradigms)")
        modes = [stage_list_to_blocks(args.model, stage_modes)]
    elif args.mode == "all":
        modes = ["static", "spatial", "channel", "layer"]
    elif args.mode in _MODES:
        if (args.hardware in GPU_PRESETS
                and args.mode in ("pallas", "channel_gather")):
            raise SystemExit(
                f"--mode {args.mode} models a TPU engine; use a TPU "
                "--hardware preset")
        modes = [args.mode]
    else:
        raise SystemExit(f"unknown --mode {args.mode!r}")

    if args.hardware in GPU_PRESETS:
        spec = GPU_PRESETS[args.hardware]
        if args.batch_size:
            spec = spec.with_batch(args.batch_size)
        pred = DynamicPredictor(spec)
        run = lambda m: predict_network(pred, args.model, m, rates, gran_blocks)
        bs = spec.batch_size
    else:
        spec = TPU_PRESETS[args.hardware]
        if args.batch_size:
            spec = spec.with_batch(args.batch_size)
        pred = TPUPredictor(spec)
        run = lambda m: tpu_predict_network(pred, args.model, m, rates,
                                            gran_blocks)
        bs = spec.batch_size

    print(f"# {args.model} on {spec.name} (batch {bs}, "
          f"act_rate {args.act_rate}, granularity {args.granularity})")
    for m in modes:
        rep = run(m)
        label = args.mode if isinstance(m, list) else m
        print(f"{label:8s}: {rep.latency * 1e3:8.3f} ms/batch "
              f"({rep.latency / bs * 1e3:7.4f} ms/img) "
              f"[compute {rep.compute_latency * 1e3:.3f} ms, "
              f"memory {rep.memory_latency * 1e3:.3f} ms]")


if __name__ == "__main__":
    main()
