#!/usr/bin/env bash
# FARE2 image AT, ViT-H (reference scripts/train_fare_vith.sh):
# 10k steps, warmup 700, bs=128, lr=1e-5, PGD-10 Linf eps=2/255.
python3 -m leaf_tpu.train.fare_driver \
    --model ViT-H-14 \
    --pretrained "${CLIP_CKPT:?set CLIP_CKPT to the local laion ViT-H checkpoint}" \
    --imagenet-root "${IMAGENET_ROOT:?set IMAGENET_ROOT}" \
    --steps 10000 --warmup 700 --batch-size 128 \
    --loss l2 --inner-loss l2 --opt adamw --lr 1e-5 --wd 1e-4 \
    --attack pgd --norm linf --eps 2 \
    --iterations-adv 10 --stepsize-adv 1 "$@"
