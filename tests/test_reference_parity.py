"""End-to-end numerical parity vs the reference PyTorch implementation.

These tests import the reference (read-only, at /root/reference) as a *test
oracle*: a freshly initialised reference LAUD-ResNet is converted through
:mod:`laudnet_tpu.convert` and both models must produce the same eval-mode
logits, masks, sparsities, and FLOPs on the same input. This pins the exact
semantics BASELINE.json demands (per-image mask parity, top-1 parity) without
needing the released checkpoints.

Skipped automatically when the reference tree is unavailable.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REF_PATH = "/root/reference/imagenet_classification"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_PATH), reason="reference tree not mounted"
)

if os.path.isdir(REF_PATH):
    # Load the reference modules directly (its package __init__ needs
    # torchvision, which isn't installed); build a synthetic package so the
    # relative `.utils` import inside laud_resnet resolves.
    import importlib.util
    import types

    import torch

    torch.manual_seed(0)

    _pkg = types.ModuleType("refmodels")
    _pkg.__path__ = [os.path.join(REF_PATH, "models")]
    sys.modules["refmodels"] = _pkg

    def _load(name):
        spec = importlib.util.spec_from_file_location(
            f"refmodels.{name}", os.path.join(REF_PATH, "models", f"{name}.py")
        )
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"refmodels.{name}"] = mod
        spec.loader.exec_module(mod)
        return mod

    _load("utils")
    ref_laud = _load("laud_resnet")

from laudnet_tpu.convert import convert_resnet_state_dict
from laudnet_tpu.models import laud_resnet as our_laud


CONFIGS = [
    dict(
        id="spatial-g4",
        dyn_mode=["spatial"] * 4,
        mask_spatial_granularity=[4, 4, 2, 1],
        channel_dyn_granularity=[1, 1, 1, 1],
        channel_masker=["MLP"] * 4,
        channel_masker_layers=[1, 1, 1, 1],
    ),
    dict(
        id="layer",
        dyn_mode=["layer"] * 4,
        mask_spatial_granularity=[16, 8, 4, 2],
        channel_dyn_granularity=[1, 1, 1, 1],
        channel_masker=["MLP"] * 4,
        channel_masker_layers=[1, 1, 1, 1],
    ),
    dict(
        id="channel-mlp2",
        dyn_mode=["channel"] * 4,
        mask_spatial_granularity=[1, 1, 1, 1],
        channel_dyn_granularity=[2, 2, 2, 2],
        channel_masker=["MLP"] * 4,
        channel_masker_layers=[2, 2, 2, 2],
    ),
    dict(
        id="both-convlinear",
        dyn_mode=["both"] * 4,
        mask_spatial_granularity=[4, 4, 2, 1],
        channel_dyn_granularity=[2, 2, 2, 2],
        channel_masker=["conv_linear"] * 4,
        channel_masker_layers=[2, 2, 2, 2],
    ),
]


def build_pair(cfg, input_size=64, num_classes=10):
    """Reference model (torch, eval) + converted flax variables + our model."""
    torch.manual_seed(42)
    ref = ref_laud.ResNet(
        ref_laud.Bottleneck,
        [1, 1, 1, 1],
        num_classes=num_classes,
        input_size=input_size,
        spatial_mask_channel_group=[1, 1, 1, 1],
        mask_spatial_granularity=cfg["mask_spatial_granularity"],
        channel_dyn_granularity=cfg["channel_dyn_granularity"],
        dyn_mode=cfg["dyn_mode"],
        channel_masker=cfg["channel_masker"],
        channel_masker_layers=cfg["channel_masker_layers"],
        lr_mult=1.0,
    )
    ref.eval()

    state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    variables = convert_resnet_state_dict(
        state, channel_masker_layers=cfg["channel_masker_layers"][0]
    )

    ours = our_laud.LAUDResNet(
        layers=(1, 1, 1, 1),
        num_classes=num_classes,
        input_size=input_size,
        spatial_mask_channel_group=(1, 1, 1, 1),
        mask_spatial_granularity=tuple(cfg["mask_spatial_granularity"]),
        channel_dyn_granularity=tuple(cfg["channel_dyn_granularity"]),
        dyn_mode=tuple(cfg["dyn_mode"]),
        channel_masker=tuple(cfg["channel_masker"]),
        channel_masker_layers=tuple(cfg["channel_masker_layers"]),
    )
    return ref, ours, variables


@pytest.mark.parametrize("cfg", CONFIGS, ids=[c["id"] for c in CONFIGS])
def test_eval_forward_parity(cfg):
    ref, ours, variables = build_pair(cfg)

    rng = np.random.default_rng(7)
    x = rng.standard_normal((2, 3, 64, 64)).astype(np.float32)

    with torch.no_grad():
        out = ref(torch.from_numpy(x), temperature=0.1)
    ref_logits, ref_s3, ref_s2, ref_s1, ref_ch, ref_fp, ref_flops = out

    got = ours.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)),
                     0.1, training=False)

    np.testing.assert_allclose(
        np.asarray(got.logits), ref_logits.numpy(), rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(got.flops_perc), ref_fp.numpy(), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        float(got.flops), float(ref_flops), rtol=1e-5
    )
    for stage in range(4):
        np.testing.assert_allclose(
            np.asarray(got.spatial_s3[stage]),
            ref_s3[stage].numpy(), rtol=1e-5, atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(got.spatial_s2[stage]),
            ref_s2[stage].numpy(), rtol=1e-5, atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(got.spatial_s1[stage]),
            ref_s1[stage].numpy(), rtol=1e-5, atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(got.channel_s[stage]),
            ref_ch[stage].numpy(), rtol=1e-5, atol=1e-6,
        )


def test_eval_mask_parity_per_image():
    """The BASELINE gate: per-image eval masks must match bit-for-bit.

    We compare the spatial masker decisions on a shared block input by
    extracting the reference block-0 masker and our converted one.
    """
    cfg = CONFIGS[0]
    ref, ours, variables = build_pair(cfg)

    rng = np.random.default_rng(11)
    x = rng.standard_normal((4, 64, 16, 16)).astype(np.float32)

    ref_block = ref.layer1[0]
    with torch.no_grad():
        ref_mask, _, _ = ref_block.masker_spatial(
            torch.from_numpy(x), temperature=0.1
        )

    from laudnet_tpu.models.maskers import SpatialMasker

    masker = SpatialMasker(mask_channel_group=1, mask_size=ref_block.mask_size)
    sub_vars = {
        "params": variables["params"]["layer1_0"]["masker_spatial"],
    }
    our_mask, _, _ = masker.apply(
        sub_vars, jnp.asarray(x.transpose(0, 2, 3, 1)), 0.1, training=False
    )
    np.testing.assert_array_equal(
        np.asarray(our_mask)[..., 0], ref_mask.numpy()[:, 0]
    )


@pytest.mark.parametrize("cfg", [CONFIGS[2], CONFIGS[1]],
                         ids=["channel-mlp2-full", "layer-full"])
def test_full_depth_r101_parity(cfg):
    """Full [3,4,23,3] R101 at 224 (the released-checkpoint geometry,
    reference `laud_resnet.py:426-436`): logits + per-image channel/spatial
    mask parity through 23 chained stage-3 blocks in fp32 — the depth where
    mask drift would appear first (VERDICT r1 #7)."""
    torch.manual_seed(42)
    layers = [3, 4, 23, 3]
    gran = cfg["mask_spatial_granularity"]
    if cfg["id"] == "layer":
        gran = [56, 28, 14, 7]  # reference layer-mode full-res granularity
    ref = ref_laud.ResNet(
        ref_laud.Bottleneck, layers, num_classes=1000, input_size=224,
        spatial_mask_channel_group=[1, 1, 1, 1],
        mask_spatial_granularity=gran,
        channel_dyn_granularity=cfg["channel_dyn_granularity"],
        dyn_mode=cfg["dyn_mode"],
        channel_masker=cfg["channel_masker"],
        channel_masker_layers=cfg["channel_masker_layers"],
        lr_mult=1.0,
    )
    ref.eval()
    state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    variables = convert_resnet_state_dict(
        state, channel_masker_layers=cfg["channel_masker_layers"][0]
    )
    ours = our_laud.LAUDResNet(
        layers=tuple(layers), num_classes=1000, input_size=224,
        spatial_mask_channel_group=(1, 1, 1, 1),
        mask_spatial_granularity=tuple(gran),
        channel_dyn_granularity=tuple(cfg["channel_dyn_granularity"]),
        dyn_mode=tuple(cfg["dyn_mode"]),
        channel_masker=tuple(cfg["channel_masker"]),
        channel_masker_layers=tuple(cfg["channel_masker_layers"]),
    )

    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 3, 224, 224)).astype(np.float32)

    # capture per-image reference masks via forward hooks
    ref_masks = []

    def hook(mod, args, out):
        ref_masks.append(out[0].detach().numpy())

    handles = []
    for stage in (ref.layer1, ref.layer2, ref.layer3, ref.layer4):
        for block in stage:
            if getattr(block, "masker_channel", None) is not None:
                handles.append(block.masker_channel.register_forward_hook(hook))
            if getattr(block, "masker_spatial", None) is not None:
                handles.append(block.masker_spatial.register_forward_hook(hook))
    with torch.no_grad():
        out = ref(torch.from_numpy(x), temperature=0.1)
    for h in handles:
        h.remove()
    ref_logits, ref_s3, _, _, ref_ch, ref_fp, ref_flops = out
    assert len(ref_masks) == 33

    def capture_ours(mdl, method_name):
        return mdl.name in ("masker_channel", "masker_spatial")

    got, inter = ours.apply(
        variables, jnp.asarray(x.transpose(0, 2, 3, 1)), 0.1, training=False,
        capture_intermediates=capture_ours,
    )

    # per-image mask parity, every one of the 33 blocks, bit-for-bit
    import re

    tree = inter["intermediates"]
    scopes = sorted(tree, key=lambda s: tuple(
        int(v) for v in re.match(r"layer(\d+)_(\d+)", s).groups()))
    assert len(scopes) == 33
    for scope, want in zip(scopes, ref_masks):
        sub = tree[scope]
        key = ("masker_channel" if "masker_channel" in sub
               else "masker_spatial")
        ours_mask = np.asarray(sub[key]["__call__"][0][0])
        if key == "masker_spatial":
            # ours (B, m, m, g) vs reference (B, g, m, m)
            ours_mask = ours_mask.transpose(0, 3, 1, 2)
        np.testing.assert_array_equal(ours_mask, want, err_msg=scope)

    np.testing.assert_allclose(
        np.asarray(got.logits), ref_logits.numpy(), rtol=1e-3, atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(got.flops_perc), ref_fp.numpy(), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(float(got.flops), float(ref_flops), rtol=1e-5)


@pytest.mark.skipif(not os.path.isdir(REF_PATH), reason="no reference mount")
@pytest.mark.parametrize("cfg", CONFIGS, ids=[c["id"] for c in CONFIGS])
def test_export_roundtrip_loads_into_reference(cfg, tmp_path):
    """The REVERSE converter: export our flax variables to a torch
    .pth.tar, load it into the actual reference model with strict=True,
    and assert logit parity — the 'switch back' path for reference users
    (`convert/torch_export.py`)."""
    from laudnet_tpu.convert import load_pth_tar, save_pth_tar
    from laudnet_tpu.convert.torch_export import export_resnet_state_dict

    ref, ours, variables = build_pair(cfg)
    # export OUR (converted) variables and load them back into a FRESH
    # reference model instance
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in export_resnet_state_dict(variables).items()}
    torch.manual_seed(7)  # different init than build_pair's
    ref2 = ref_laud.ResNet(
        ref_laud.Bottleneck, [1, 1, 1, 1], num_classes=10, input_size=64,
        spatial_mask_channel_group=[1, 1, 1, 1],
        mask_spatial_granularity=cfg["mask_spatial_granularity"],
        channel_dyn_granularity=cfg["channel_dyn_granularity"],
        dyn_mode=cfg["dyn_mode"],
        channel_masker=cfg["channel_masker"],
        channel_masker_layers=cfg["channel_masker_layers"],
        lr_mult=1.0,
    )
    missing, unexpected = ref2.load_state_dict(sd, strict=True), None
    ref2.eval()

    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref_out = ref2(torch.from_numpy(x), temperature=0.1)
    ref_logits = ref_out[0].numpy()

    our_out = ours.apply(variables, jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                         0.1, training=False)
    np.testing.assert_allclose(np.asarray(our_out.logits), ref_logits,
                               rtol=2e-4, atol=2e-4)

    # and the file format roundtrips through our own loader too
    path = str(tmp_path / "export.pth.tar")
    save_pth_tar(variables, path, epoch=3)
    re_imported = convert_resnet_state_dict(
        load_pth_tar(path),
        channel_masker_layers=cfg["channel_masker_layers"][0])
    flat_a = jax.tree_util.tree_leaves_with_path(variables["params"])
    flat_b_tree = re_imported["params"]
    for kp, leaf in flat_a:
        node = flat_b_tree
        for k in kp:
            node = node[k.key]
        np.testing.assert_array_equal(np.asarray(leaf), node)
