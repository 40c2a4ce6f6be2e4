#!/usr/bin/env bash
# LEAF ViT-L recipe (reference scripts/train_leaf_vitl.sh):
# FARE2 init, DataComp-small 80k, bs=128, lr=1e-5, 30 epochs, rho=50 k=1
# constrained.  Point --pretrained at a local FARE2 checkpoint
# (HF or OpenCLIP format; the reference pulls hf-hub:chs20/fare2-clip).
# FARE2's text tower is OpenAI-derived → QuickGELU; the -quickgelu
# config matches (the factory would also auto-adopt it from the
# checkpoint's config.json, with a warning).
python3 -m leaf_tpu.train.driver \
    --model ViT-L-14-quickgelu \
    --pretrained "${FARE2_CKPT:?set FARE2_CKPT to the local fare2-clip checkpoint}" \
    --train-data "${DATACOMP_SHARDS:?set DATACOMP_SHARDS, e.g. /data/datacomp/{00000000..00001287}.tar}" \
    --dataset-type webdataset \
    --train-num-samples 80000 \
    --imagenet-val "${IMAGENET_VAL:-}" \
    --val-text-classification fancyzhx/ag_news \
    --save-frequency 1 --zeroshot-frequency 1 \
    --warmup 1400 --batch-size 128 --accum-freq 1 \
    --lr 1e-5 --wd 1e-4 --epochs 30 \
    --k_adv 1 --k_adv_test 1 --rho 50 --n_charmer_test 20 \
    --n_val_imagenet 1000 --seed 1 \
    --precision bf16 \
    --custom_out_folder ViT-L-FARE2_constrained_ \
    --constrain "$@"
