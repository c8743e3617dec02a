"""LAUD-RegNet parity vs the reference torch implementation.

torchvision is not installed, so we shim the three symbols the reference
imports (`ConvNormActivation`, `SqueezeExcitation`, `_make_divisible`) with
equivalent torch modules, then compare eval-mode outputs through the
converter — same oracle strategy as test_reference_parity.
"""

import os
import sys
import types

import jax.numpy as jnp
import numpy as np
import pytest

REF_PATH = "/root/reference/imagenet_classification"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_PATH), reason="reference tree not mounted"
)

if os.path.isdir(REF_PATH):
    import torch
    import torch.nn as tnn

    class ConvNormActivation(tnn.Sequential):
        def __init__(self, in_ch, out_ch, kernel_size=3, stride=1,
                     padding=None, groups=1, norm_layer=tnn.BatchNorm2d,
                     activation_layer=tnn.ReLU, dilation=1, inplace=True):
            if padding is None:
                padding = (kernel_size - 1) // 2 * dilation
            layers = [tnn.Conv2d(in_ch, out_ch, kernel_size, stride, padding,
                                 dilation=dilation, groups=groups,
                                 bias=norm_layer is None)]
            if norm_layer is not None:
                layers.append(norm_layer(out_ch))
            if activation_layer is not None:
                layers.append(activation_layer(inplace=inplace))
            super().__init__(*layers)
            self.out_channels = out_ch

    class SqueezeExcitation(tnn.Module):
        def __init__(self, input_channels, squeeze_channels,
                     activation=tnn.ReLU, scale_activation=tnn.Sigmoid):
            super().__init__()
            self.avgpool = tnn.AdaptiveAvgPool2d(1)
            self.fc1 = tnn.Conv2d(input_channels, squeeze_channels, 1)
            self.fc2 = tnn.Conv2d(squeeze_channels, input_channels, 1)
            self.activation = activation()
            self.scale_activation = scale_activation()

        def forward(self, x):
            s = self.avgpool(x)
            s = self.activation(self.fc1(s))
            s = self.scale_activation(self.fc2(s))
            return x * s

    def _make_divisible(v, divisor, min_value=None):
        if min_value is None:
            min_value = divisor
        new_v = max(min_value, int(v + divisor / 2) // divisor * divisor)
        if new_v < 0.9 * v:
            new_v += divisor
        return new_v

    tv = types.ModuleType("torchvision")
    tv_ops = types.ModuleType("torchvision.ops")
    tv_ops_misc = types.ModuleType("torchvision.ops.misc")
    tv_ops_misc.ConvNormActivation = ConvNormActivation
    tv_ops_misc.SqueezeExcitation = SqueezeExcitation
    tv_models = types.ModuleType("torchvision.models")
    tv_models_utils = types.ModuleType("torchvision.models._utils")
    tv_models_utils._make_divisible = _make_divisible
    tv_iru = types.ModuleType("torchvision._internally_replaced_utils")
    tv_iru.load_state_dict_from_url = lambda *a, **k: None
    for name, mod in {
        "torchvision": tv, "torchvision.ops": tv_ops,
        "torchvision.ops.misc": tv_ops_misc,
        "torchvision.models": tv_models,
        "torchvision.models._utils": tv_models_utils,
        "torchvision._internally_replaced_utils": tv_iru,
    }.items():
        sys.modules.setdefault(name, mod)

    import importlib.util

    def _load(name):
        spec = importlib.util.spec_from_file_location(
            f"refmodels.{name}", os.path.join(REF_PATH, "models", f"{name}.py")
        )
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"refmodels.{name}"] = mod
        spec.loader.exec_module(mod)
        return mod

    if "refmodels" not in sys.modules:
        pkg = types.ModuleType("refmodels")
        pkg.__path__ = [os.path.join(REF_PATH, "models")]
        sys.modules["refmodels"] = pkg
    if "refmodels.utils" not in sys.modules:
        _load("utils")
    ref_regnet = _load("laud_regnet")

from laudnet_tpu.convert.torch_loader import convert_regnet_state_dict
from laudnet_tpu.models import laud_regnet as ours


def test_regnet_params_match_reference():
    for key, cfg in ours._REGNET_CFGS.items():
        ref_p = ref_regnet.BlockParams.from_init_params(**cfg)
        our_p = ours.regnet_params(**cfg)
        assert tuple(ref_p.depths) == our_p.depths, key
        assert tuple(ref_p.widths) == our_p.widths, key
        assert tuple(ref_p.group_widths) == our_p.group_widths, key


@pytest.mark.parametrize("dyn_mode,masker,layers", [
    ("spatial", "MLP", 1),
    ("channel", "conv_linear", 2),
    ("both", "MLP", 2),
])
def test_regnet_eval_parity(dyn_mode, masker, layers):
    torch.manual_seed(11)
    cfg = dict(depth=14, w_0=56, w_a=38.84, w_m=2.4, group_width=16,
               se_ratio=0.25)  # regnet_y_800mf
    ref_params = ref_regnet.BlockParams.from_init_params(**cfg)
    ref = ref_regnet.LAD_RegNet(
        ref_params, num_classes=10, input_size=64,
        mask_spatial_granularity=[4, 4, 2, 1],
        channel_dyn_granularity=[2, 2, 2, 2],
        dyn_mode=[dyn_mode] * 4,
        channel_masker=[masker] * 4,
        channel_masker_layers=[layers] * 4,
        lr_mult=1.0,
    )
    ref.eval()

    state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    variables = convert_regnet_state_dict(state, channel_masker_layers=layers)

    model = ours.LAUDRegNet(
        params_cfg=ours.regnet_params(**cfg),
        num_classes=10, input_size=64,
        mask_spatial_granularity=(4, 4, 2, 1),
        channel_dyn_granularity=(2, 2, 2, 2),
        dyn_mode=(dyn_mode,) * 4,
        channel_masker=(masker,) * 4,
        channel_masker_layers=(layers,) * 4,
    )

    rng = np.random.default_rng(5)
    x = rng.standard_normal((2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        out = ref(torch.from_numpy(x), temperature=0.1)
    ref_logits, ref_s3, ref_s2, ref_s1, ref_ch, ref_fp, ref_flops = out

    got = model.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)),
                      0.1, training=False)
    np.testing.assert_allclose(np.asarray(got.logits), ref_logits.numpy(),
                               rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(np.asarray(got.flops_perc), ref_fp.numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(got.flops), float(ref_flops), rtol=1e-5)
    for s in range(4):
        np.testing.assert_allclose(np.asarray(got.channel_s[s]),
                                   ref_ch[s].numpy(), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(got.spatial_s3[s]),
                                   ref_s3[s].numpy(), rtol=1e-5, atol=1e-6)
