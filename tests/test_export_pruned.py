"""Static channel-pruning export: exactness vs the dynamic masked graph."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from laudnet_tpu.infer import export_pruned_resnet
from laudnet_tpu.models import laud_resnet


def test_export_matches_dynamic_model_for_fixed_masks():
    layers = (1, 1, 1, 1)
    gran = (2, 2, 2, 2)
    model = laud_resnet.LAUDResNet(
        layers=layers, num_classes=10, input_size=64,
        dyn_mode=("channel",) * 4,
        channel_dyn_granularity=gran,
        channel_masker=("MLP",) * 4, channel_masker_layers=(1, 1, 1, 1),
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 3))
    variables = model.init({"params": jax.random.PRNGKey(1)}, x, 1.0,
                           training=False)

    # force each block's masker to a FIXED mask: zero the kernel, set the
    # paired biases to +/-20 so the eval comparison is unambiguous
    params = jax.device_get(variables["params"])
    rng = np.random.default_rng(3)
    masks = []
    scopes = [s for s in sorted(params) if s.startswith("layer")]
    for scope in scopes:
        fc = params[scope]["masker_channel"]["fc"]
        g = fc["bias"].shape[0] // 2
        m = (rng.random(g) > 0.4).astype(np.float32)
        m[0] = 1.0  # keep at least one group
        bias = np.concatenate([np.where(m > 0, 20.0, -20.0),
                               np.where(m > 0, -20.0, 20.0)]).astype(
            np.float32)
        params[scope]["masker_channel"]["fc"] = {
            "kernel": jnp.zeros_like(fc["kernel"]),
            "bias": jnp.asarray(bias),
        }
        masks.append(m)
    variables = {"params": params, "batch_stats": variables["batch_stats"]}

    out_dyn = model.apply(variables, x, 0.1, training=False)
    # confirm the forced masks were realized
    realized = np.concatenate([np.asarray(v) for v in out_dyn.channel_s])
    expected = np.asarray([m.mean() for m in masks])
    np.testing.assert_allclose(realized, expected, atol=1e-6)

    fwd = export_pruned_resnet(variables, masks, layers=layers,
                               channel_dyn_granularity=gran, input_size=64)
    got = jax.jit(fwd)(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(out_dyn.logits),
                               rtol=2e-4, atol=2e-4)


def test_int8_export_close_to_float_export():
    """W8A8 export (`export_pruned_resnet(int8=True)`): logits stay close
    to the float export and preserve argmax — the second approximation
    layer on top of the frozen policy, with its error bounded here."""
    layers = (1, 1, 1, 1)
    gran = (2, 2, 2, 2)
    model = laud_resnet.LAUDResNet(
        layers=layers, num_classes=10, input_size=64,
        dyn_mode=("channel",) * 4,
        channel_dyn_granularity=gran,
        channel_masker=("MLP",) * 4, channel_masker_layers=(1, 1, 1, 1),
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 64, 64, 3))
    variables = model.init({"params": jax.random.PRNGKey(1)}, x, 1.0,
                           training=False)
    params = jax.device_get(variables["params"])
    rng = np.random.default_rng(5)
    masks = []
    for scope in [s for s in sorted(params) if s.startswith("layer")]:
        g = params[scope]["masker_channel"]["fc"]["bias"].shape[0] // 2
        m = (rng.random(g) > 0.4).astype(np.float32)
        m[0] = 1.0
        masks.append(m)

    f32 = jax.jit(export_pruned_resnet(
        variables, masks, layers=layers, channel_dyn_granularity=gran,
        input_size=64))(x)
    q = jax.jit(export_pruned_resnet(
        variables, masks, layers=layers, channel_dyn_granularity=gran,
        input_size=64, int8=True))(x)
    rel = float(jnp.linalg.norm(q - f32) / jnp.linalg.norm(f32))
    assert rel < 0.06, rel
    assert (jnp.argmax(q, -1) == jnp.argmax(f32, -1)).all()

    # static activation scales (no runtime abs-max pass): calibrated on
    # the same batch they must reproduce the dynamic-scale result almost
    # exactly, and the recorder emits one positive scale per conv site
    from laudnet_tpu.infer.export_pruned import calibrate_export_act_scales

    scales = calibrate_export_act_scales(
        variables, masks, [x], layers=layers,
        channel_dyn_granularity=gran, input_size=64)
    # stem + 4 stage-first blocks (each: downsample + conv1/2/3)
    n_sites = 1 + 4 * 4
    assert len(scales) == n_sites and all(s > 0 for s in scales)
    qs = jax.jit(export_pruned_resnet(
        variables, masks, layers=layers, channel_dyn_granularity=gran,
        input_size=64, int8=True, act_scales=scales))(x)
    np.testing.assert_allclose(np.asarray(qs), np.asarray(q), atol=0.05)
    rel_s = float(jnp.linalg.norm(qs - f32) / jnp.linalg.norm(f32))
    assert rel_s < 0.06, rel_s


def test_calibrate_channel_masks():
    from laudnet_tpu.infer import calibrate_channel_masks

    def mask_fn(images):
        b = images.shape[0]
        # block 0: group 0 always on, group 1 on 25% of samples
        m0 = np.zeros((b, 2), np.float32)
        m0[:, 0] = 1.0
        m0[: b // 4, 1] = 1.0
        # block 1: all groups off -> must keep the strongest one
        m1 = np.zeros((b, 3), np.float32)
        return [m0, m1]

    batches = [np.zeros((8, 4, 4, 3)) for _ in range(2)]
    masks = calibrate_channel_masks(mask_fn, batches)
    np.testing.assert_array_equal(masks[0], [1.0, 0.0])
    assert masks[1].sum() == 1.0  # fallback keeps one group


def test_calibration_fidelity_metric():
    from laudnet_tpu.infer import calibrate_channel_masks, calibration_fidelity

    def mask_fn(images):
        b = images.shape[0]
        # group 0 always on; group 1 on half the samples; group 2 never
        m = np.zeros((b, 3), np.float32)
        m[:, 0] = 1.0
        m[: b // 2, 1] = 1.0
        return [m]

    batches = [np.zeros((8, 4, 4, 3))]
    static = calibrate_channel_masks(mask_fn, batches)
    np.testing.assert_array_equal(static[0], [1.0, 1.0, 0.0])
    fid = calibration_fidelity(mask_fn, static, batches)
    # half the images agree on all 3 groups, half on 2/3
    np.testing.assert_allclose(fid["mean_agreement"], (1.0 + 2 / 3) / 2)
    # static mask covers every dynamically-ON group here
    np.testing.assert_allclose(fid["mean_coverage"], 1.0)


def test_calibrate_patch_capacity_per_image():
    """Per-stage capacities must cover the per-image density tail, not just
    the batch mean (ADVICE r1 medium finding)."""
    from laudnet_tpu.infer import calibrate_patch_capacity
    from laudnet_tpu.models import laud_resnet

    model = laud_resnet.LAUDResNet(
        layers=(1, 1, 1, 1), num_classes=10, input_size=64,
        dyn_mode=("spatial",) * 4, mask_spatial_granularity=(4, 4, 2, 1),
        channel_masker=("MLP",) * 4, channel_masker_layers=(1, 1, 1, 1),
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 64, 64, 3))
    v = model.init({"params": jax.random.PRNGKey(1)}, x, 1.0, training=False)
    out = model.apply(v, x, 0.1, training=False)
    s3i = [np.asarray(s) for s in out.spatial_s3_img]
    assert all(s.shape[1] == 4 for s in s3i)
    # per-image means must average to the recorded batch means
    for img, mean in zip(s3i, out.spatial_s3):
        np.testing.assert_allclose(img.mean(axis=1), np.asarray(mean),
                                   atol=1e-6)

    caps = calibrate_patch_capacity(
        lambda b: model.apply(v, b, 0.1, training=False), [x],
        quantile=1.0, margin=0.0,
    )
    assert len(caps) == 4
    for c, img in zip(caps, s3i):
        assert c >= img.max() - 1e-6  # covers the worst image of the stage


def test_make_channel_mask_fn_captures_block_masks_in_order():
    from laudnet_tpu.infer.calibrate import make_channel_mask_fn
    from laudnet_tpu.models import laud_resnet

    model = laud_resnet.LAUDResNet(
        layers=(2, 1, 1, 1), num_classes=10, input_size=64,
        dyn_mode=("channel",) * 4, channel_dyn_granularity=(2, 2, 2, 2),
        channel_masker=("MLP",) * 4, channel_masker_layers=(1, 1, 1, 1),
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (3, 64, 64, 3))
    v = model.init({"params": jax.random.PRNGKey(1)}, x, 1.0, training=False)
    mask_fn = make_channel_mask_fn(model, v)
    masks = mask_fn(x)
    assert len(masks) == 5  # 2+1+1+1 blocks
    # group counts follow stage widths / granularity (64,128,256,512)/2... wait
    # width = planes*group_width; groups = width/gran = 32,64,128,256
    assert [m.shape for m in masks] == [(3, 32), (3, 32), (3, 64), (3, 128),
                                        (3, 256)]
    # captured masks must equal the densities the model reports
    out = model.apply(v, x, 0.1, training=False)
    want = np.concatenate([np.asarray(s) for s in out.channel_s])
    np.testing.assert_allclose(
        np.asarray([m.mean() for m in masks]), want, atol=1e-6
    )


def test_export_rejects_mask_granularity_mismatch():
    """A mask whose groups x granularity != conv width must raise, not
    silently drop trailing channels from the slicing AND the bias
    folding (r4 review finding)."""
    layers = (1, 1, 1, 1)
    model = laud_resnet.LAUDResNet(
        layers=layers, num_classes=10, input_size=64,
        dyn_mode=("channel",) * 4, channel_dyn_granularity=(2, 2, 2, 2),
        channel_masker=("MLP",) * 4, channel_masker_layers=(1, 1, 1, 1),
    )
    x = jnp.zeros((1, 64, 64, 3))
    variables = jax.eval_shape(
        lambda: model.init({"params": jax.random.PRNGKey(0)}, x, 1.0,
                           training=False)
    )
    variables = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), variables)
    masks = [np.ones(4, np.float32)] * 4  # widths are 64/128/256/512 / 2
    with pytest.raises(ValueError, match="granularity"):
        export_pruned_resnet(variables, masks, layers=layers,
                             channel_dyn_granularity=(2, 2, 2, 2),
                             input_size=64)


def test_calibrators_reject_empty_batches():
    from laudnet_tpu.infer.calibrate import (
        calibrate_channel_masks,
        calibrate_patch_capacity,
        calibrate_token_capacity,
        calibration_fidelity,
    )

    for fn in (lambda: calibrate_token_capacity(lambda x: x, []),
               lambda: calibrate_channel_masks(lambda x: x, []),
               lambda: calibration_fidelity(lambda x: x, [], []),
               lambda: calibrate_patch_capacity(lambda x: x, [])):
        with pytest.raises(ValueError, match="no calibration batches"):
            fn()
