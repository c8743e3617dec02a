"""ViT checkpoint-converter parity vs a torch oracle.

Builds a timm-convention DeiT in torch (pre-norm blocks, exact-erf GELU,
qkv packed (3,heads,dh)-major), converts its state dict through
`laudnet_tpu.convert.convert_vit_state_dict`, and asserts the skip-free
LAUDViT reproduces the torch logits — the ViT analog of the CNN parity
gates (`tests/test_reference_parity.py`)."""

import math

import jax
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from laudnet_tpu.convert import convert_vit_state_dict  # noqa: E402
from laudnet_tpu.models.laud_vit import LAUDViT  # noqa: E402

DIM, HEADS, DEPTH, PS, NC = 64, 4, 3, 8, 11


class TorchBlock(tnn.Module):
    def __init__(self):
        super().__init__()
        self.norm1 = tnn.LayerNorm(DIM, eps=1e-6)  # timm DeiT convention
        self.attn = tnn.Module()
        self.attn.qkv = tnn.Linear(DIM, 3 * DIM)
        self.attn.proj = tnn.Linear(DIM, DIM)
        self.norm2 = tnn.LayerNorm(DIM, eps=1e-6)  # timm DeiT convention
        self.mlp = tnn.Module()
        self.mlp.fc1 = tnn.Linear(DIM, 2 * DIM)
        self.mlp.fc2 = tnn.Linear(2 * DIM, DIM)

    def forward(self, x):
        b, l, d = x.shape
        h, dh = HEADS, DIM // HEADS
        y = self.norm1(x)
        qkv = self.attn.qkv(y).reshape(b, l, 3, h, dh).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        a = torch.softmax(q @ k.transpose(-2, -1) / math.sqrt(dh), dim=-1)
        o = (a @ v).transpose(1, 2).reshape(b, l, d)
        x = x + self.attn.proj(o)
        y = self.norm2(x)
        y = self.mlp.fc2(torch.nn.functional.gelu(self.mlp.fc1(y)))
        return x + y


class TorchDeiT(tnn.Module):
    def __init__(self):
        super().__init__()
        self.patch_embed = tnn.Module()
        self.patch_embed.proj = tnn.Conv2d(3, DIM, PS, stride=PS)
        self.cls_token = tnn.Parameter(torch.randn(1, 1, DIM) * 0.02)
        n = (32 // PS) ** 2
        self.pos_embed = tnn.Parameter(torch.randn(1, n + 1, DIM) * 0.02)
        self.blocks = tnn.ModuleList([TorchBlock() for _ in range(DEPTH)])
        self.norm = tnn.LayerNorm(DIM, eps=1e-6)  # timm DeiT convention
        self.head = tnn.Linear(DIM, NC)

    def forward(self, x):  # x: NCHW
        b = x.shape[0]
        t = self.patch_embed.proj(x).flatten(2).transpose(1, 2)  # (B,N,D)
        t = torch.cat([self.cls_token.expand(b, -1, -1), t], dim=1)
        t = t + self.pos_embed
        for blk in self.blocks:
            t = blk(t)
        return self.head(self.norm(t)[:, 0])


def test_vit_converter_logit_parity():
    torch.manual_seed(0)
    oracle = TorchDeiT().eval()
    x = np.random.default_rng(1).standard_normal((2, 32, 32, 3)).astype(
        np.float32)
    with torch.no_grad():
        want = oracle(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()

    state = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    loaded = convert_vit_state_dict(state)

    model = LAUDViT(depth=DEPTH, dim=DIM, num_heads=HEADS, mlp_ratio=2.0,
                    patch_size=PS, num_classes=NC, token_skip=False,
                    head_skip=False, layer_skip=False)
    got = model.apply(loaded, jax.numpy.asarray(x), 0.1, training=False)
    np.testing.assert_allclose(np.asarray(got.logits), want,
                               rtol=2e-4, atol=2e-4)


def test_vit_converter_into_gated_model():
    """Converted weights merge under a gated LAUDViT (policies stay at
    init, the strict=False analog) and the model still runs."""
    from laudnet_tpu.convert import merge_variables

    torch.manual_seed(0)
    oracle = TorchDeiT().eval()
    state = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    loaded = convert_vit_state_dict(state)

    model = LAUDViT(depth=DEPTH, dim=DIM, num_heads=HEADS, mlp_ratio=2.0,
                    patch_size=PS, num_classes=NC)
    x = jax.numpy.zeros((1, 32, 32, 3))
    v = model.init({"params": jax.random.PRNGKey(0)}, x, 1.0, training=False)
    params = merge_variables(v["params"], loaded["params"])
    out = model.apply({"params": params}, x, 0.1, training=False)
    assert np.isfinite(np.asarray(out.logits)).all()
    # backbone weights actually landed
    np.testing.assert_allclose(
        np.asarray(params["block_0"]["qkv"]["kernel"]),
        state["blocks.0.attn.qkv.weight"].T, rtol=1e-6)
