"""Loss-function tests: sparsity criteria, KD, label smoothing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from laudnet_tpu.train import losses


def test_kd_matches_torch():
    rng = np.random.default_rng(0)
    s = rng.standard_normal((8, 10)).astype(np.float32)
    t = rng.standard_normal((8, 10)).astype(np.float32)
    ours = float(losses.kd_loss(jnp.asarray(s), jnp.asarray(t), 4.0))
    theirs = float(
        F.kl_div(F.log_softmax(torch.from_numpy(s) / 4.0, 1),
                 F.softmax(torch.from_numpy(t) / 4.0, 1),
                 reduction="batchmean") * 16.0
    )
    assert abs(ours - theirs) < 1e-5


def test_label_smooth_matches_torch_formula():
    rng = np.random.default_rng(1)
    logits = rng.standard_normal((4, 6)).astype(np.float32)
    labels = np.asarray([0, 2, 5, 1])
    ours = float(losses.cross_entropy_label_smooth(
        jnp.asarray(logits), jnp.asarray(labels), 0.1))
    lp = F.log_softmax(torch.from_numpy(logits), 1)
    tgt = torch.zeros_like(lp).scatter_(
        1, torch.from_numpy(labels)[:, None], 1)
    tgt = 0.9 * tgt + 0.1 / 6
    theirs = float((-tgt * lp).mean(0).sum())
    assert abs(ours - theirs) < 1e-5


def test_bounds_anneal_matches_reference_shape():
    # epoch 0: bounds pinned AT the target (progress=1) -> block penalties
    l0 = losses.sparsity_bounds(0.0, jnp.asarray([0.9, 0.1]),
                                jnp.asarray(2.0), target=0.5, num_epochs=100,
                                full_flops=4.0)
    assert float(l0) == pytest.approx((0.4**2 + 0.4**2) / 2, abs=1e-6)
    # after 33% of epochs bounds relax to (1, 0): only the net-level term
    l1 = losses.sparsity_bounds(40.0, jnp.asarray([0.9, 0.1]),
                                jnp.asarray(2.0), target=0.5, num_epochs=100,
                                full_flops=4.0)
    assert float(l1) == pytest.approx(0.0, abs=1e-9)


@pytest.mark.parametrize("crit", ["bounds", "basic", "channel_factor", "cs",
                                  "cs_v2", "channel_bounds",
                                  "channel_bounds_v2"])
def test_all_criteria_dispatch(crit):
    from laudnet_tpu.train.trainer import TrainConfig, compute_sparsity_loss
    from laudnet_tpu.models.laud_resnet import LAUDOutput

    out = LAUDOutput(
        logits=jnp.zeros((1, 10)),
        spatial_s3=tuple(jnp.full((2,), 0.7) for _ in range(4)),
        spatial_s2=tuple(jnp.full((2,), 0.8) for _ in range(4)),
        spatial_s1=tuple(jnp.full((2,), 0.9) for _ in range(4)),
        channel_s=tuple(jnp.full((2,), 0.6) for _ in range(4)),
        flops_perc=jnp.full((8,), 0.55),
        flops=jnp.asarray(2.2e9),
    )
    cfg = TrainConfig(sparsity_criterion=crit, full_flops=4.1e9,
                      target_rate=0.5)
    v = compute_sparsity_loss(cfg, jnp.asarray(50.0), out)
    assert np.isfinite(float(v))


def test_sparsity_bounds_matches_reference_oracle():
    """Exact agreement with the reference SparsityCriterion_bounds."""
    import importlib.util
    import os

    path = "/root/reference/imagenet_classification/utils/sparsity_loss_unify.py"
    if not os.path.exists(path):
        pytest.skip("reference not mounted")
    spec = importlib.util.spec_from_file_location("ref_sl", path)
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    crit = ref.SparsityCriterion_bounds(sparsity_target=0.5, num_epochs=100,
                                        full_flops=4.0)
    for epoch in (0, 10, 25, 40, 99):
        want = float(crit(epoch, torch.tensor([0.9, 0.1, 0.55]),
                          torch.tensor(2.2)))
        got = float(losses.sparsity_bounds(
            float(epoch), jnp.asarray([0.9, 0.1, 0.55]), jnp.asarray(2.2),
            target=0.5, num_epochs=100, full_flops=4.0))
        assert abs(want - got) < 1e-6, epoch


@pytest.mark.parametrize("v2", [False, True])
def test_sparsity_channel_bounds_matches_reference_oracle(v2):
    """Exact agreement with SparsityCriterion_channel_bounds{,_v2}
    (`sparsity_loss_unify.py:197-280`) — the two criteria differ only in
    the channel upper bound's start (1.0 vs 0.85)."""
    import importlib.util
    import os

    path = "/root/reference/imagenet_classification/utils/sparsity_loss_unify.py"
    if not os.path.exists(path):
        pytest.skip("reference not mounted")
    spec = importlib.util.spec_from_file_location("ref_sl2", path)
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    cls = (ref.SparsityCriterion_channel_bounds_v2 if v2
           else ref.SparsityCriterion_channel_bounds)
    ours = (losses.sparsity_channel_bounds_v2 if v2
            else losses.sparsity_channel_bounds)
    crit = cls(flops_perc_target=0.5, num_epochs=100, full_flops=4.0,
               channel_loss_factor=1.3)
    ch = [0.95, 0.6, 0.3]
    fp = [0.9, 0.1, 0.55]
    for epoch in (0, 5, 20, 33, 80):
        want = float(crit(epoch, torch.tensor(ch), torch.tensor(fp),
                          torch.tensor(2.2)))
        got = float(ours(
            float(epoch), jnp.asarray(ch), jnp.asarray(fp), jnp.asarray(2.2),
            target=0.5, num_epochs=100, full_flops=4.0,
            channel_loss_factor=1.3))
        assert abs(want - got) < 1e-6, (v2, epoch)
