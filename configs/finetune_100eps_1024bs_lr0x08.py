# 100-epoch ImageNet finetune, global batch 1024, lr 0.08 (recipe set 3).
# Reference: `imagenet_classification/configs/finetune_100eps_1024bs_lr0x08.py`.
train_cfg = dict(hyperparams_set_index=3)
