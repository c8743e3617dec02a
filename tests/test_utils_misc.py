"""Coverage for the small utility modules: config loading, hyperparameter
recipes, mixup, logging, meters."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from laudnet_tpu.train.hyperparams import get_hyperparams
from laudnet_tpu.utils.config import Config
from laudnet_tpu.utils.logging_utils import Logger, ProgressMeter
from laudnet_tpu.utils.metrics import AverageMeter, topk_accuracy
from laudnet_tpu.utils.mixup import mixup_criterion, mixup_data


def test_config_fromfile(tmp_path):
    p = tmp_path / "cfg.py"
    p.write_text("train_cfg = dict(hyperparams_set_index=2)\nextra = [1, 2]\n")
    cfg = Config.fromfile(str(p))
    assert cfg.train_cfg["hyperparams_set_index"] == 2
    assert cfg["extra"] == [1, 2]
    with pytest.raises((IOError, FileNotFoundError)):
        Config.fromfile(str(tmp_path / "missing.py"))


def test_hyperparams_published_recipes():
    """Set 2 = bs512 lr0.04, set 3 = bs1024 lr0.08, 100 eps cosine, wd 5e-5
    (reference `utils/hyperparams.py:44-62,124-142`)."""
    r2 = get_hyperparams(2)
    assert (r2.batch_size, r2.lr) == (512, pytest.approx(0.04))
    r3 = get_hyperparams(3)
    assert (r3.batch_size, r3.lr) == (1024, pytest.approx(0.08))
    for r in (r2, r3):
        assert r.epochs == 100
        assert r.weight_decay == pytest.approx(5e-5)
    with pytest.raises(KeyError):
        get_hyperparams(999)


def test_mixup_properties():
    key = jax.random.PRNGKey(0)
    x = jnp.arange(24.0).reshape(4, 2, 3, 1)
    y = jnp.array([0, 1, 2, 3])
    mixed, soft = mixup_data(key, x, y, alpha=1.0, num_classes=4)
    assert mixed.shape == x.shape and soft.shape == (4, 4)
    np.testing.assert_allclose(np.asarray(soft.sum(-1)), 1.0, rtol=1e-6)
    # alpha=0 -> identity mix
    mixed0, soft0 = mixup_data(key, x, y, alpha=0.0, num_classes=4)
    np.testing.assert_allclose(np.asarray(mixed0), np.asarray(x))
    # criterion equals CE on hard targets when lam == 1
    logits = jax.random.normal(key, (4, 4))
    ce = -jnp.mean(jnp.take_along_axis(
        jax.nn.log_softmax(logits), y[:, None], 1))
    np.testing.assert_allclose(float(mixup_criterion(logits, soft0)),
                               float(ce), rtol=1e-6)


def test_logger_tees_to_file(tmp_path):
    path = str(tmp_path / "log.txt")
    log = Logger(path)
    log("hello world")
    assert "hello world" in open(path).read()


def test_meters():
    m = AverageMeter("loss")
    m.update(1.0)
    m.update(3.0)
    assert m.avg == pytest.approx(2.0)
    pm = ProgressMeter(10, [m], prefix="ep0")
    s = pm.display(5) if hasattr(pm, "display") else str(pm)
    assert s is None or "loss" in str(s)


def test_topk_accuracy_values():
    logits = jnp.asarray([[0.1, 0.9, 0.0], [0.8, 0.1, 0.1]])
    labels = jnp.asarray([1, 2])
    top1, top2 = topk_accuracy(logits, labels, topk=(1, 2))
    assert float(top1) == pytest.approx(50.0)
    assert float(top2) == pytest.approx(50.0)
    # k beyond class count degrades to top-C (documented)
    (top5,) = topk_accuracy(logits, labels, topk=(5,))
    assert float(top5) == pytest.approx(100.0)


def test_topk_accuracy_weighted_ignores_pad_rows():
    # rows 2,3 are wrap-pad copies (weight 0): accuracy must equal the
    # 2-row unweighted value even though the pad rows are all-correct
    logits = jnp.asarray([[0.1, 0.9, 0.0], [0.8, 0.1, 0.1],
                          [0.0, 9.0, 0.0], [0.0, 9.0, 0.0]])
    labels = jnp.asarray([1, 2, 1, 1])
    w = jnp.asarray([1.0, 1.0, 0.0, 0.0])
    top1, top2 = topk_accuracy(logits, labels, topk=(1, 2), weights=w)
    assert float(top1) == pytest.approx(50.0)
    assert float(top2) == pytest.approx(50.0)


def test_pad_val_batch_wraps_and_masks():
    from laudnet_tpu.train.main import _pad_val_batch

    images = np.arange(3 * 2).reshape(3, 2).astype(np.float32)
    labels = np.asarray([7, 8, 9], np.int32)
    pi, pl, w = _pad_val_batch(images, labels, 8)
    assert pi.shape == (8, 2) and pl.shape == (8,) and w.shape == (8,)
    assert w.tolist() == [1, 1, 1, 0, 0, 0, 0, 0]
    np.testing.assert_array_equal(pl[3:6], labels)  # wrapped copies
    # full batch passes through untouched
    fi, fl, fw = _pad_val_batch(images, labels, 3)
    assert fi is images and fl is labels and fw.sum() == 3
