#!/usr/bin/env bash
# The reference's four-stage training chain (SURVEY.md §3.3; reference
# options/release_train_stage_{I,II,III,IV}*.yml), run end-to-end on the
# demo dataset.  Each stage loads the previous stage's exports exactly the
# way the reference's `pretrain_network_{g,gt,d}` keys chain them:
#
#   I   : TRQVAE (VQGAN+GAN+EMA codebook) from scratch
#   II  : PGTFormer code prediction; g <- I.net_g (strict_load_g:false),
#         teacher <- I (params_ema)
#   III : end-to-end + GAN; g <- II.net_g, d <- I.net_d, teacher <- I
#   IV  : fine-tune (focal token, TemporalLPIPS, GradL1); g <- III.net_g,
#         d <- III.net_d, teacher <- I
#
# Dataset: tools/make_demo_dataset.py --augment 9 (~1000 distinct train
# frames) — see configs/demo_stage_I.yml header for why augmentation is
# load-bearing for the GAN stages on demo-scale data.
#
# Usage: tools/run_demo_chain.sh [DATA_ROOT] [EXP_PREFIX]
#   DATA_ROOT  default /tmp/vfhq_demo_r5 (built if absent)
#   EXP_PREFIX default exp/chain
set -euo pipefail
cd "$(dirname "$0")/.."

DATA=${1:-/tmp/vfhq_demo_r5}
PRE=${2:-exp/chain}
I1=${STAGE1_ITERS:-10000}
I2=${STAGE2_ITERS:-1600}
I3=${STAGE3_ITERS:-3000}
I4=${STAGE4_ITERS:-2400}
COMMON=(--bf16 --pallas --data-root "$DATA/train" --val-data-root "$DATA/val")

# guard on an AUGMENTED clip dir: a pre-existing unaugmented dataset at
# $DATA would otherwise silently skip the --augment 9 rebuild and recreate
# the round-4 D-memorization collapse (BASELINE.md round-4 caveat)
[ -d "$DATA/train/GT/demo_000_a00" ] || python tools/make_demo_dataset.py --out "$DATA" --augment 9

# ---- stage I ---------------------------------------------------------
python -m pgtformer_tpu.train_cli -opt configs/demo_stage_I.yml \
    "${COMMON[@]}" --exp-dir "${PRE}_stage1" --total-iter "$I1"
python tools/export_teacher.py --exp "${PRE}_stage1" --step "$I1" \
    --out /tmp/chain_teacher.pth

# ---- stage II --------------------------------------------------------
python -m pgtformer_tpu.train_cli -opt configs/demo_stage_II.yml \
    "${COMMON[@]}" --exp-dir "${PRE}_stage2" --total-iter "$I2" \
    --teacher-ckpt /tmp/chain_teacher.pth \
    --student-ckpt "${PRE}_stage1/net_g_${I1}"

# ---- stage III -------------------------------------------------------
python -m pgtformer_tpu.train_cli -opt configs/demo_stage_III.yml \
    "${COMMON[@]}" --exp-dir "${PRE}_stage3" --total-iter "$I3" \
    --teacher-ckpt /tmp/chain_teacher.pth \
    --student-ckpt "${PRE}_stage2/net_g_${I2}" \
    --disc-ckpt "${PRE}_stage1/net_d_${I1}"

# ---- stage IV --------------------------------------------------------
python -m pgtformer_tpu.train_cli -opt configs/demo_stage_IV.yml \
    "${COMMON[@]}" --exp-dir "${PRE}_stage4" --total-iter "$I4" \
    --teacher-ckpt /tmp/chain_teacher.pth \
    --student-ckpt "${PRE}_stage3/net_g_${I3}" \
    --disc-ckpt "${PRE}_stage3/net_d_${I3}"

echo "chain complete: ${PRE}_stage{1,2,3,4}"
