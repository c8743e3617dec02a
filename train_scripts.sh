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
# add --amp for bf16 mixed precision (measured 1.75x the f32 step on v5e;
# f32 masters + f32 gating heads — the reference pins use_amp=False)

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

# 4) RegNetY-1.6GF channel mode with backbone lr_mult 0.1
#    (reference `train_scripts.sh:28-40`)
python -m laudnet_tpu.train.main \
  --arch lad_regnet_y_1_6gf --data_url "$DATA" \
  --config configs/finetune_100eps_512bs_lr0x04.py \
  --dyn_mode channel-channel-channel-channel \
  --channel_dyn_granularity 2-2-2-2 \
  --t0 5.0 --t_last 0.1 --temp_scheduler exp \
  --target_rate 0.5 --lambda_act 10.0 --T_kd 4.0 --alpha_kd 0.5 \
  --lr_mult 0.1 \
  --train_url output/laud_regnety16_channel_t0.5

# 5) Native LAUD-DeiT-S (token/head/layer skipping; the reference defers
#    to the external AdaViT repo — here it trains in-framework)
python -m laudnet_tpu.train.main \
  --arch laud_deit_small --data_url "$DATA" \
  --vit_skip token,head,layer \
  --t0 5.0 --t_last 0.1 --temp_scheduler exp \
  --target_rate 0.5 --lambda_act 10.0 --T_kd 4.0 --alpha_kd 0.5 \
  --train_url output/laud_deit_s_t0.5

# --- COCO detection finetuning (reference `tools/scripts_LAUDNet.sh`) -------
# Config-driven: model + sparsity target + backbone lr_mult live in the file.
python -m laudnet_tpu.detection.cli train \
  configs/detection/retinanet_laud_r101_channel_2222_0x6.py \
  --work_dir output/det_retinanet_channel_0x6
python -m laudnet_tpu.detection.cli train \
  configs/detection/faster_rcnn_laud_r101_layer_0x5.py \
  --work_dir output/det_faster_layer_0x5
python -m laudnet_tpu.detection.cli train \
  configs/detection/mask_rcnn_laud_r101_channel_2222_0x8.py \
  --work_dir output/det_mask_channel_0x8
python -m laudnet_tpu.detection.cli train \
  configs/detection/ddq_detr_laud_r101_channel_2222_0x5.py \
  --work_dir output/det_ddq_channel_0x5
python -m laudnet_tpu.detection.cli train \
  configs/detection/mask2former_laud_r101_channel_2222_0x5.py \
  --work_dir output/det_m2f_channel_0x5
# Eval with per-image FLOPs/sparsity accounting (`tools/test_get_info.py`):
python -m laudnet_tpu.detection.cli eval_info \
  configs/detection/retinanet_laud_r101_channel_2222_0x6.py \
  --work_dir output/det_retinanet_channel_0x6
