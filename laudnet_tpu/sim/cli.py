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


def _run_t2t(args):
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
    print(f"# t2t_vit on {spec.name} (batch {bs}, density {d})")
    for name, kw in rows:
        rep = simulate_laud_t2t_vit(p, B=bs, **kw)
        print(f"{name:8s}: {rep.latency * 1e3:8.3f} ms/batch "
              f"({rep.latency / bs * 1e3:7.4f} ms/img)")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("model", choices=sorted(MODEL_GEOMETRY) + ["t2t_vit"])
    ap.add_argument("--hardware", default="v100",
                    choices=sorted(GPU_PRESETS) + sorted(TPU_PRESETS))
    ap.add_argument("--mode", default="all",
                    choices=["static", "spatial", "channel", "layer", "all"])
    ap.add_argument("--act-rate", type=float, default=1.0)
    ap.add_argument("--granularity", default="4-4-2-1",
                    help="per-stage spatial patch sizes, dash separated")
    ap.add_argument("--batch-size", type=int, default=None)
    args = ap.parse_args(argv)

    if args.model == "t2t_vit":
        if args.hardware not in GPU_PRESETS:
            ap.error("t2t_vit simulation currently supports GPU presets")
        return _run_t2t(args)

    grans = [int(v) for v in args.granularity.split("-")]
    gran_blocks = stage_list_to_blocks(args.model, grans)
    n_blocks = len(MODEL_GEOMETRY[args.model])
    rates = [args.act_rate] * n_blocks

    modes = (["static", "spatial", "channel", "layer"]
             if args.mode == "all" else [args.mode])

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
        print(f"{m:8s}: {rep.latency * 1e3:8.3f} ms/batch "
              f"({rep.latency / bs * 1e3:7.4f} ms/img) "
              f"[compute {rep.compute_latency * 1e3:.3f} ms, "
              f"memory {rep.memory_latency * 1e3:.3f} ms]")


if __name__ == "__main__":
    main()
