"""Training-CLI smoke test (synthetic data, 8-device CPU mesh)."""

import os

import numpy as np


def test_train_main_smoke(tmp_path):
    from laudnet_tpu.train.main import main

    best = main([
        "--arch", "uni_resnet50",
        "--dyn_mode", "channel-channel-channel-channel",
        "--channel_dyn_granularity", "2-2-2-2",
        "--channel_masker_layers", "2-2-2-2",
        "--epochs", "1", "--steps_per_epoch", "2", "--batch_size", "8",
        "--input_size", "32", "--num_classes", "10",
        "--train_url", str(tmp_path), "--print_freq", "1",
    ])
    assert np.isfinite(best)
    assert os.path.exists(tmp_path / "log.txt")
    assert os.path.exists(tmp_path / "best_result.txt")
    assert os.path.exists(tmp_path / "all_density_latest.txt")
    dens = np.loadtxt(tmp_path / "all_density_latest.txt")
    assert dens.shape[0] == 4  # s3/s2/s1/channel rows


def test_train_main_vit_smoke(tmp_path):
    """One CLI command trains LAUD-DeiT on synthetic data (VERDICT r1 #4):
    KD from a dense ViT teacher + bounds sparsity over flops_perc."""
    from laudnet_tpu.train.main import main

    best = main([
        "--arch", "laud_deit_tiny",
        "--epochs", "1", "--steps_per_epoch", "2", "--batch_size", "8",
        "--input_size", "32", "--num_classes", "10",
        "--target_rate", "0.5",
        "--train_url", str(tmp_path), "--print_freq", "1",
    ])
    assert np.isfinite(best)
    dens = np.loadtxt(tmp_path / "all_density_latest.txt")
    assert dens.shape == (4, 12)  # token/head/attn/mlp rows x depth


def test_train_main_vit_int8_qat_smoke(tmp_path):
    """--vit_linear int8_qat fine-tunes the student under fake-quant
    int8 numerics (straight-through gradients) end-to-end."""
    from laudnet_tpu.train.main import main

    best = main([
        "--arch", "laud_deit_tiny",
        "--vit_linear", "int8_qat",
        "--epochs", "1", "--steps_per_epoch", "2", "--batch_size", "8",
        "--input_size", "32", "--num_classes", "10",
        "--target_rate", "0.5",
        "--train_url", str(tmp_path), "--print_freq", "1",
    ])
    assert np.isfinite(best)


def test_train_main_regnet_smoke(tmp_path):
    """RegNet training exposure (reference train_scripts.sh:28-40 trains
    lad_regnet_y with --lr_mult; VERDICT r1 #9)."""
    from laudnet_tpu.train.main import main

    best = main([
        "--arch", "lad_regnet_y_400mf",
        "--dyn_mode", "channel-channel-channel-channel",
        "--channel_dyn_granularity", "2-2-2-2",
        "--channel_masker_layers", "2-2-2-2",
        "--lr_mult", "0.1",
        "--epochs", "1", "--steps_per_epoch", "2", "--batch_size", "8",
        "--input_size", "32", "--num_classes", "10",
        "--train_url", str(tmp_path), "--print_freq", "1",
    ])
    assert np.isfinite(best)
    dens = np.loadtxt(tmp_path / "all_density_latest.txt")
    assert dens.shape[0] == 4


def test_train_main_fsdp_smoke(tmp_path):
    """--fsdp trains with params + optimizer state sharded over the data
    axis (ZeRO-3 analog) and still produces a finite result."""
    from laudnet_tpu.train.main import main

    best = main([
        "--arch", "uni_resnet50",
        "--dyn_mode", "channel-channel-channel-channel",
        "--channel_dyn_granularity", "2-2-2-2",
        "--epochs", "1", "--steps_per_epoch", "2", "--batch_size", "8",
        "--input_size", "32", "--num_classes", "10",
        "--train_url", str(tmp_path), "--print_freq", "1",
        "--fsdp",
    ])
    assert np.isfinite(best)
    log = (tmp_path / "train.log").read_text()
    assert "FSDP" in log


def test_train_main_amp_fsdp_smoke(tmp_path):
    """--amp composes with --fsdp: bf16 body compute over f32 master
    params that are themselves sharded over the data axis (the ZeRO-3
    path keeps masters f32; only the in-graph compute is bf16)."""
    from laudnet_tpu.train.main import main

    best = main([
        "--arch", "uni_resnet50",
        "--dyn_mode", "spatial-spatial-spatial-spatial",
        "--mask_spatial_granularity", "4-4-2-1",
        "--epochs", "1", "--steps_per_epoch", "2", "--batch_size", "8",
        "--input_size", "32", "--num_classes", "10",
        "--train_url", str(tmp_path), "--print_freq", "1",
        "--amp", "--fsdp",
    ])
    assert np.isfinite(best)
