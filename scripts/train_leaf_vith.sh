#!/usr/bin/env bash
# LEAF ViT-H recipe: same as ViT-L but bs=64 x accum 2 (reference
# scripts/train_leaf_vith.sh).
python3 -m leaf_tpu.train.driver \
    --model ViT-H-14 \
    --pretrained "${FARE2_CKPT:?set FARE2_CKPT}" \
    --train-data "${DATACOMP_SHARDS:?set DATACOMP_SHARDS}" \
    --dataset-type webdataset --train-num-samples 80000 \
    --imagenet-val "${IMAGENET_VAL:-}" \
    --val-text-classification fancyzhx/ag_news \
    --save-frequency 1 --zeroshot-frequency 1 \
    --warmup 1400 --batch-size 64 --accum-freq 2 \
    --lr 1e-5 --wd 1e-4 --epochs 30 \
    --k_adv 1 --k_adv_test 1 --rho 50 --n_charmer_test 20 \
    --n_val_imagenet 1000 --seed 1 --precision bf16 \
    --custom_out_folder ViT-H_constrained_ --constrain "$@"
