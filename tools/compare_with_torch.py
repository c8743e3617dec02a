"""Checkpoint-parity gate: compare this framework vs the PyTorch reference.

Given a reference LAUD checkpoint (``.pth``/``.pth.tar``), builds the torch
model from `/root/reference` (oracle), converts the weights through
`laudnet_tpu.convert`, runs both on the same inputs, and reports
logits/mask/FLOPs agreement — the BASELINE.json acceptance gate
("converted checkpoints reproduce reference top-1 and per-image masks").

Usage::

    python tools/compare_with_torch.py --checkpoint laud_r101_channel.pth.tar \
        --arch uni_resnet101 --dyn_mode channel-channel-channel-channel \
        --channel_dyn_granularity 2-2-2-2 [--images img_dir]

Without ``--images`` it uses fixed random inputs (mask parity is
input-agnostic: any disagreement indicates a conversion/numerics bug).
"""

from __future__ import annotations

import argparse
import importlib.util
import os
import sys
import types

import numpy as np

REF = "/root/reference/imagenet_classification"


def load_reference_module():
    pkg = types.ModuleType("refmodels")
    pkg.__path__ = [os.path.join(REF, "models")]
    sys.modules.setdefault("refmodels", pkg)

    def _load(name):
        spec = importlib.util.spec_from_file_location(
            f"refmodels.{name}", os.path.join(REF, "models", f"{name}.py")
        )
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"refmodels.{name}"] = mod
        spec.loader.exec_module(mod)
        return mod

    _load("utils")
    return _load("laud_resnet")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--arch", default="uni_resnet101",
                    choices=["uni_resnet50", "uni_resnet101"])
    ap.add_argument("--dyn_mode", default="channel-channel-channel-channel")
    ap.add_argument("--mask_spatial_granularity", default="1-1-1-1")
    ap.add_argument("--channel_dyn_granularity", default="2-2-2-2")
    ap.add_argument("--channel_masker", default="MLP-MLP-MLP-MLP")
    ap.add_argument("--channel_masker_layers", default="2-2-2-2")
    ap.add_argument("--temperature", type=float, default=0.1)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--images", default=None)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import torch

    from laudnet_tpu import models as our_models
    from laudnet_tpu.convert import convert_resnet_state_dict, load_pth_tar

    ref_laud = load_reference_module()
    split = lambda s, c=str: [c(v) for v in s.split("-")]
    layers = [3, 4, 6, 3] if args.arch == "uni_resnet50" else [3, 4, 23, 3]

    ref = ref_laud.ResNet(
        ref_laud.Bottleneck, layers, num_classes=1000, input_size=224,
        dyn_mode=split(args.dyn_mode),
        mask_spatial_granularity=split(args.mask_spatial_granularity, int),
        channel_dyn_granularity=split(args.channel_dyn_granularity, int),
        channel_masker=split(args.channel_masker),
        channel_masker_layers=split(args.channel_masker_layers, int),
        lr_mult=1.0,
    )
    state = load_pth_tar(args.checkpoint)
    missing = ref.load_state_dict(
        {k: torch.from_numpy(np.asarray(v)) for k, v in state.items()},
        strict=False,
    )
    print(f"torch load: missing={len(missing.missing_keys)} "
          f"unexpected={len(missing.unexpected_keys)}")
    ref.eval()

    variables = convert_resnet_state_dict(
        state, channel_masker_layers=split(args.channel_masker_layers, int)[0]
    )
    ours = getattr(our_models, args.arch)(
        dyn_mode=tuple(split(args.dyn_mode)),
        mask_spatial_granularity=tuple(
            split(args.mask_spatial_granularity, int)),
        channel_dyn_granularity=tuple(
            split(args.channel_dyn_granularity, int)),
        channel_masker=tuple(split(args.channel_masker)),
        channel_masker_layers=tuple(split(args.channel_masker_layers, int)),
    )

    if args.images:
        from laudnet_tpu.data import ImageFolderDataset, eval_transform

        ds = ImageFolderDataset(args.images, eval_transform(224))
        x = np.stack([ds.load(i, 0)[0] for i in range(args.batch)])
    else:
        x = np.random.default_rng(0).standard_normal(
            (args.batch, 224, 224, 3)
        ).astype(np.float32)

    with torch.no_grad():
        t_out = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                    temperature=args.temperature)
    j_out = ours.apply(variables, jnp.asarray(x), args.temperature,
                       training=False)

    logit_err = float(np.abs(np.asarray(j_out.logits) - t_out[0].numpy()).max())
    top1_match = float(
        (np.argmax(np.asarray(j_out.logits), -1)
         == t_out[0].numpy().argmax(-1)).mean()
    )
    fp_err = float(np.abs(np.asarray(j_out.flops_perc)
                          - t_out[5].numpy()).max())
    print(f"max |logit diff|: {logit_err:.2e}")
    print(f"top-1 agreement: {top1_match * 100:.1f}%")
    print(f"max |flops_perc diff|: {fp_err:.2e}")
    ok = logit_err < 5e-3 and top1_match == 1.0 and fp_err < 1e-4
    print("PARITY:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
