"""Mask algebra unit tests, verified against torch-CPU oracles.

The oracles re-state the reference ops' math with torch functional calls (the
reference itself is torch), so agreement here pins the exact semantics:
contiguous-group broadcast, conv_transpose zero-upsample, all-ones dilate,
nearest interpolation indices.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from laudnet_tpu.ops import masking


def torch_apply_channel_mask(x, mask):
    b, c, h, w = x.shape
    _, g = mask.shape
    if (g > 1) and (g != c):
        m = mask.repeat(1, c // g).view(b, c // g, g).transpose(-1, -2).reshape(b, c, 1, 1)
    else:
        m = mask.view(b, g, 1, 1)
    return x * m


def torch_apply_spatial_mask(x, mask):
    b, c, h, w = x.shape
    _, g, hm, _ = mask.shape
    if (g > 1) and (g != c):
        mask = mask.unsqueeze(1).repeat(1, c // g, 1, 1, 1).transpose(1, 2).reshape(b, c, hm, hm)
    return x * mask


def torch_expand_mask(x, stride, padding, g):
    if stride > 1:
        pad_kernel = torch.zeros((g, 1, stride, stride))
        pad_kernel[:, :, 0, 0] = 1
    dilate_kernel = torch.ones((g, g, 1 + 2 * padding, 1 + 2 * padding))
    x = x.float()
    if stride > 1:
        x = F.conv_transpose2d(x, pad_kernel, stride=stride, groups=x.size(1))
    x = F.conv2d(x, dilate_kernel, padding=padding, stride=1)
    return x > 0.5


@pytest.mark.parametrize("g,c", [(1, 8), (4, 8), (8, 8), (2, 16)])
def test_apply_channel_mask_matches_torch(g, c):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((3, 5, 5, c)).astype(np.float32)
    mask = (rng.random((3, g)) > 0.5).astype(np.float32)
    ours = masking.apply_channel_mask(jnp.asarray(x), jnp.asarray(mask))
    theirs = torch_apply_channel_mask(
        torch.from_numpy(x).permute(0, 3, 1, 2), torch.from_numpy(mask)
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=0, atol=0)


@pytest.mark.parametrize("g,c", [(1, 8), (2, 8), (4, 4)])
def test_apply_spatial_mask_matches_torch(g, c):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 6, 6, c)).astype(np.float32)
    mask = (rng.random((2, 6, 6, g)) > 0.5).astype(np.float32)
    ours = masking.apply_spatial_mask(jnp.asarray(x), jnp.asarray(mask))
    theirs = torch_apply_spatial_mask(
        torch.from_numpy(x).permute(0, 3, 1, 2),
        torch.from_numpy(mask).permute(0, 3, 1, 2),
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs)


@pytest.mark.parametrize("stride,padding,g", [(1, 0, 1), (1, 1, 1), (2, 1, 1),
                                              (1, 1, 2), (2, 1, 2), (2, 0, 1)])
def test_expand_mask_matches_torch(stride, padding, g):
    rng = np.random.default_rng(2)
    mask = (rng.random((2, 7, 7, g)) > 0.6).astype(np.float32)
    ours = masking.expand_mask(jnp.asarray(mask), stride=stride, padding=padding)
    theirs = torch_expand_mask(
        torch.from_numpy(mask).permute(0, 3, 1, 2), stride, padding, g
    ).permute(0, 2, 3, 1).numpy()
    assert np.asarray(ours).shape == theirs.shape
    np.testing.assert_array_equal(np.asarray(ours), theirs)


@pytest.mark.parametrize("in_size,out_size", [(7, 14), (7, 28), (14, 14), (4, 8)])
def test_upsample_nearest_matches_torch(in_size, out_size):
    rng = np.random.default_rng(3)
    mask = rng.random((2, in_size, in_size, 3)).astype(np.float32)
    ours = masking.upsample_mask_nearest(jnp.asarray(mask), out_size)
    theirs = F.interpolate(
        torch.from_numpy(mask).permute(0, 3, 1, 2), size=out_size, mode="nearest"
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_array_equal(np.asarray(ours), theirs)


@pytest.mark.parametrize("in_size,out_size", [(56, 14), (56, 56), (8, 2), (7, 1)])
def test_adaptive_avg_pool_matches_torch(in_size, out_size):
    rng = np.random.default_rng(4)
    x = rng.standard_normal((2, in_size, in_size, 5)).astype(np.float32)
    ours = masking.adaptive_avg_pool(jnp.asarray(x), out_size)
    theirs = F.adaptive_avg_pool2d(
        torch.from_numpy(x).permute(0, 3, 1, 2), out_size
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, rtol=1e-6, atol=1e-6)


def test_expand_mask_identity_when_no_pad_single_group():
    mask = jnp.asarray(np.eye(4, dtype=np.float32)[None, :, :, None])
    out = masking.expand_mask(mask, stride=1, padding=0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(mask) > 0.5)


def test_extra_eval_transforms():
    from PIL import Image
    from laudnet_tpu.data.transforms import ecenter_crop_transform, tencrop_transform

    img = Image.fromarray(
        (np.random.default_rng(0).random((300, 400, 3)) * 255).astype(np.uint8)
    )
    e = ecenter_crop_transform(224)(img)
    assert e.shape == (224, 224, 3)
    t = tencrop_transform(224)(img)
    assert t.shape == (10, 224, 224, 3)
