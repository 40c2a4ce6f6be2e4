#!/usr/bin/env bash
# Dress rehearsal for the accuracy north-star (docs/REPLICATION.md §5):
# the IDENTICAL driver invocation as scripts/train_leaf_vitl.sh — same
# model, batch size, rho, constraint, precision, flag surface — with
# synthetic captions and reduced evals, so the full
# driver→attack→train→checkpoint→eval pipeline runs end-to-end at
# ViT-L scale in a container with no egress.  Random init unless
# FARE2_CKPT is set (the rehearsal proves wiring, not accuracy).
set -euo pipefail
OUT=${DRESS_LOGS:-./logs}
python3 -m leaf_tpu.train.driver \
    --model ViT-L-14-quickgelu \
    ${FARE2_CKPT:+--pretrained "$FARE2_CKPT"} \
    --dataset-type synthetic \
    --train-num-samples "${DRESS_SAMPLES:-1280}" \
    --val-text-classification synthetic \
    --n_val_text 32 \
    --save-frequency 1 --zeroshot-frequency 1 \
    --warmup 1400 --batch-size "${DRESS_BATCH:-128}" --accum-freq 1 \
    --lr 1e-5 --wd 1e-4 --epochs "${DRESS_EPOCHS:-2}" \
    --k_adv 1 --k_adv_test 1 --rho "${DRESS_RHO:-50}" --n_charmer_test 20 \
    --n_val_imagenet 0 --seed 1 \
    --precision bf16 \
    --logs "$OUT" \
    --custom_out_folder dress_rehearsal_ \
    --constrain "$@"

# the §4 standalone eval on the rehearsal's final full-model export
CKPT_DIR=$(ls -d "$OUT"/dress_rehearsal_*/checkpoints 2>/dev/null | head -1)
EPOCH=$(ls "$CKPT_DIR" | grep -o 'model_epoch_[0-9]*' | sort -t_ -k3 -n | tail -1)
python3 -m leaf_tpu.evals.zero_shot_text \
    --model ViT-L-14-quickgelu \
    --pretrained "$CKPT_DIR/$EPOCH" \
    --dataset synthetic --rho 20 --k 1 --n_test 32 \
    --label-encoder image --precision bf16 \
    --output-dir "$OUT"/dress_rehearsal_eval
echo "dress rehearsal complete: $CKPT_DIR/$EPOCH"
