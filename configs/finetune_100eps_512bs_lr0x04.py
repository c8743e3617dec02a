# 100-epoch ImageNet finetune, global batch 512, lr 0.04 (recipe set 2).
train_cfg = dict(hyperparams_set_index=2)
