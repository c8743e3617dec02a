"""DETR-family detector over the LAUD backbone (VERDICT r1 #6)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from laudnet_tpu.detection.detr import (
    DETRDetector,
    cxcywh_to_xyxy,
    detr_detect,
    detr_loss,
    generalized_iou,
    hungarian_match,
)


def tiny_detr(**kw):
    d = dict(num_classes=3, num_queries=8, dim=32, enc_layers=1,
             dec_layers=1, backbone_layers=(1, 1, 1, 1),
             dyn_mode=("channel",) * 4, sparsity_target=0.5)
    d.update(kw)
    return DETRDetector(**d)


def gt(b=1, m=2, size=64):
    boxes = jnp.asarray([[[4.0, 4.0, 24.0, 24.0], [32.0, 32.0, 56.0, 60.0]]]
                        * b)
    labels = jnp.asarray([[0, 2]] * b, jnp.int32)
    valid = jnp.ones((b, m), jnp.float32)
    return boxes, labels, valid


def test_hungarian_match_exact():
    # cost favors q2->gt0, q0->gt1; greedy would also find it, but add a
    # case where greedy fails: classic anti-greedy matrix
    cost = jnp.asarray([[[1.0, 2.0], [4.0, 8.0]]])  # q0,q1 x gt0,gt1
    # greedy picks (q0,gt0)=1 then (q1,gt1)=8 -> 9; optimal: (q0,gt1)=2 +
    # (q1,gt0)=4 -> 6
    m = np.asarray(hungarian_match(cost))
    assert m.shape == (1, 2)
    assert m[0, 1] == 0 and m[0, 0] == 1


def test_generalized_iou_cases():
    a = jnp.asarray([0.0, 0.0, 2.0, 2.0])
    assert float(generalized_iou(a, a)) == pytest.approx(1.0)
    b = jnp.asarray([2.0, 2.0, 4.0, 4.0])
    assert float(generalized_iou(a, b)) == pytest.approx(-0.5)


def test_detr_forward_contract():
    """The backbone contract generalizes to set prediction: outputs carry
    cls/boxes per query AND the LAUD additional stats."""
    model = tiny_detr()
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 3))
    v = model.init({"params": jax.random.PRNGKey(1)}, x, training=False)
    out = model.apply(v, x, training=False)
    assert out["cls_logits"].shape == (2, 8, 4)
    assert out["boxes_cxcywh"].shape == (2, 8, 4)
    assert float(out["boxes_cxcywh"].min()) >= 0
    assert float(out["boxes_cxcywh"].max()) <= 1
    assert "flops" in out["additional"] and "dense_flops" in out["additional"]
    assert out["model_configs"]["dyn_mode"] == ("channel",) * 4


def test_detr_loss_and_grads_jit():
    model = tiny_detr()
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 64, 3))
    boxes, labels, valid = gt()
    v = model.init({"params": jax.random.PRNGKey(1)}, x, training=False)

    @jax.jit
    def loss_of(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": v.get("batch_stats", {})},
            x, training=True, rngs={"gumbel": jax.random.PRNGKey(2)},
            mutable=["batch_stats"],
        )
        total, metrics = detr_loss(out, boxes, labels, valid, num_classes=3,
                                   image_size=64.0)
        return total, metrics

    (total, metrics), g = jax.value_and_grad(loss_of, has_aux=True)(
        v["params"]
    )
    assert np.isfinite(float(total))
    for k in ("loss_cls", "loss_l1", "loss_giou", "loss_sparse",
              "flops_rate"):
        assert np.isfinite(float(metrics[k])), k

    def gnorm(tree):
        return float(sum(jnp.abs(l).sum()
                         for l in jax.tree_util.tree_leaves(tree)))

    assert gnorm(g["backbone"]["layer1_0"]["conv1"]) > 0
    assert gnorm(g["backbone"]["layer1_0"]["masker_channel"]) > 0
    assert gnorm(g["cls_head"]) > 0
    assert gnorm(g["box_head"]) > 0


def test_detr_mask2former_variant():
    model = tiny_detr(with_masks=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 64, 3))
    boxes, labels, valid = gt()
    masks = jnp.zeros((1, 2, 64, 64)).at[:, 0, 4:24, 4:24].set(1.0) \
        .at[:, 1, 32:60, 32:56].set(1.0)
    v = model.init({"params": jax.random.PRNGKey(1)}, x, training=False)
    out, _ = model.apply(v, x, training=True,
                         rngs={"gumbel": jax.random.PRNGKey(2)},
                         mutable=["batch_stats"])
    assert out["mask_logits"].shape[:2] == (1, 8)
    total, metrics = detr_loss(out, boxes, labels, valid, num_classes=3,
                               image_size=64.0, gt_masks=masks)
    assert np.isfinite(float(total))
    assert float(metrics["loss_mask"]) > 0


def test_detr_detect_shapes():
    model = tiny_detr()
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 3))
    v = model.init({"params": jax.random.PRNGKey(1)}, x, training=False)
    out = model.apply(v, x, training=False)
    det = detr_detect(out, 64.0)
    assert det["boxes"].shape == (2, 8, 4)
    assert det["scores"].shape == (2, 8)


def test_cxcywh_roundtrip():
    xyxy = jnp.asarray([[2.0, 4.0, 10.0, 12.0]])
    cxcywh = jnp.asarray([[6.0, 8.0, 8.0, 8.0]])
    np.testing.assert_allclose(np.asarray(cxcywh_to_xyxy(cxcywh)),
                               np.asarray(xyxy), atol=1e-6)
