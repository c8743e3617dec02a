"""Config-driven detection CLI (reference `tools/train.py` +
`tools/test_get_info.py` analog)."""

import json
import os

import pytest

from laudnet_tpu.detection import build_detector
from laudnet_tpu.detection.cli import main as det_cli


def _write_cfg(path, *, type_="RetinaNet", extra=""):
    path.write_text(
        "model = dict(\n"
        f"    type={type_!r},\n"
        "    num_classes=3,\n"
        "    backbone_layers=(1, 1, 1, 1),\n"
        "    dyn_mode=('channel',) * 4,\n"
        "    sparsity_target=0.5,\n"
        "    temperature=0.1,\n"
        f"{extra}"
        ")\n"
        "train_cfg = dict(epochs=1, backbone_lr_mult=0.2,\n"
        "                 init_from='does/not/exist.pth.tar')\n"
    )
    return str(path)


def test_build_detector_all_types():
    for type_, extra in [
        ("RetinaNet", {}),
        ("FasterRCNN", {}),
        ("MaskRCNN", {}),
        ("DETRDetector", dict(num_queries=8, dim=32,
                              enc_layers=1, dec_layers=1)),
        ("Mask2Former", dict(num_queries=8, dim=32,
                             enc_layers=1, dec_layers=1)),
    ]:
        cfg = dict(type=type_, num_classes=3, backbone_layers=(1, 1, 1, 1),
                   dyn_mode=("channel",) * 4, **extra)
        model, kind = build_detector(cfg)
        assert kind in ("retinanet", "faster_rcnn", "detr")
        if type_ in ("MaskRCNN", "Mask2Former"):
            assert model.with_masks

    with pytest.raises(ValueError):
        build_detector(dict(type="YOLO"))


def test_cli_train_then_eval_info_retinanet(tmp_path):
    cfg = _write_cfg(tmp_path / "cfg.py")
    work = str(tmp_path / "out")
    history = det_cli(["train", cfg, "--work_dir", work, "--image_size", "64",
                       "--batch_size", "2", "--epochs", "1",
                       "--steps_per_epoch", "3"])
    assert len(history) >= 1
    assert all(h["loss"] == h["loss"] for h in history)  # finite
    assert os.path.exists(os.path.join(work, "log.json"))

    res = det_cli(["eval_info", cfg, "--work_dir", work, "--image_size", "64",
                   "--batch_size", "2", "--eval_steps", "2"])
    assert 0.0 <= res["mAP"] <= 1.0
    assert res["mean_flops"] > 0
    assert 0.0 < res["mean_flops_rate"] <= 1.0 + 1e-6
    saved = json.load(open(os.path.join(work, "eval_info.json")))
    assert saved["n_images"] == 4


def test_cli_train_detr(tmp_path):
    cfg = _write_cfg(
        tmp_path / "detr.py", type_="DETRDetector",
        extra="    num_queries=8,\n    dim=32,\n"
              "    enc_layers=1,\n    dec_layers=1,\n"
              "    out_indices=(2, 3),\n",
    )
    work = str(tmp_path / "out_detr")
    history = det_cli(["train", cfg, "--work_dir", work, "--image_size", "64",
                       "--batch_size", "2", "--epochs", "1",
                       "--steps_per_epoch", "2"])
    assert history[-1]["loss"] == history[-1]["loss"]
    assert "flops_rate" in history[-1]

    res = det_cli(["eval_info", cfg, "--work_dir", work, "--image_size", "64",
                   "--batch_size", "2", "--eval_steps", "1"])
    assert res["n_images"] == 2
