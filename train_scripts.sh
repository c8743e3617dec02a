#!/usr/bin/env bash
# Worked training examples (reference `imagenet_classification/train_scripts.sh`).
# One process drives all local TPU chips (data-parallel mesh); no mp.spawn/DDP.
set -e

DATA=${DATA:-/data/imagenet}

# 1) Channel-mode LAUD-ResNet50, granularity 2-2-2-2, target 0.5
python -m laudnet_tpu.train.main \
  --arch uni_resnet50 --data_url "$DATA" \
  --config configs/finetune_100eps_1024bs_lr0x08.py \
  --dyn_mode channel-channel-channel-channel \
  --channel_dyn_granularity 2-2-2-2 \
  --channel_masker MLP-MLP-MLP-MLP --channel_masker_layers 2-2-2-2 \
  --t0 5.0 --t_last 0.1 --temp_scheduler exp \
  --target_rate 0.5 --lambda_act 10.0 --T_kd 4.0 --alpha_kd 0.5 \
  --finetune_from checkpoints/resnet50_torchvision.pth \
  --teacher_path checkpoints/resnet50_torchvision.pth \
  --train_url output/laud_r50_channel2222_t0.5

# 2) Layer-mode LAUD-ResNet50 (spatial masker over the whole map)
python -m laudnet_tpu.train.main \
  --arch uni_resnet50 --data_url "$DATA" \
  --config configs/finetune_100eps_1024bs_lr0x08.py \
  --dyn_mode layer-layer-layer-layer \
  --mask_spatial_granularity 56-28-14-7 \
  --t0 5.0 --t_last 0.1 --temp_scheduler exp \
  --target_rate 0.5 --lambda_act 10.0 --T_kd 4.0 --alpha_kd 0.5 \
  --train_url output/laud_r50_layer_t0.5

# 3) Spatial-mode LAUD-ResNet101, granularity 4-4-2-1 (headline config)
python -m laudnet_tpu.train.main \
  --arch uni_resnet101 --data_url "$DATA" \
  --config configs/finetune_100eps_512bs_lr0x04.py \
  --dyn_mode spatial-spatial-spatial-spatial \
  --mask_spatial_granularity 4-4-2-1 \
  --t0 5.0 --t_last 0.1 --temp_scheduler exp \
  --target_rate 0.5 --lambda_act 10.0 --T_kd 4.0 --alpha_kd 0.5 \
  --train_url output/laud_r101_spatial4421_t0.5
