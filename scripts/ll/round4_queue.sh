#!/bin/bash
# Round-4 training queue (sequential: one chip). Carryover from round 3,
# whose training window lost ~5 h to a TPU-tunnel outage (see
# results/QUALITY.md). Priority order:
#
#  1. Pyramid retrain with the guide-lr lever — round 3 diagnosed
#     scale-dependent guide collapse (results/pyramid_diagnosis_60k.json:
#     the full-res level collapses to one luma bin) but never got the
#     chip time to retrain. Full 120k budget.
#  2. Complete any baseline leg the round-3 endgame had to time-box
#     (Dilated to 40k, UNet to 40k — skipped automatically if done).
#  3. l16/s32 with batch 4 via the device dataset: the quality bracket
#     scaled with capacity (33.37 dB); batch>1 + longer training is the
#     remaining sanctioned lever toward the 36.1 dB per-image oracle.
set -x
cd "$(dirname "$0")/../.."

COMMON1024B4="--eval_data_dir data_ll/test --batch_size 4 \
  --output_resolution 1024 1024 --fliplr --flipud --rotate \
  --norandom_crop --cache_images --device_normalize --device_data \
  --learning_rate 1e-4 --lr_schedule cosine --lr_end 1e-6 \
  --lr_warmup_steps 500"
COMMON1024B1="--eval_data_dir data_ll/test --batch_size 1 \
  --output_resolution 1024 1024 --fliplr --flipud --rotate \
  --norandom_crop --cache_images --device_normalize --device_data \
  --learning_rate 1e-4 --lr_schedule cosine --lr_end 1e-6 \
  --lr_warmup_steps 500"

# ---- 1. pyramid retrain (guide lever; round-2 baseline was 28.40)
python -m hdrnet_tpu.bin.train output/ll_gpyrnn_g05 data_ll/train \
  $COMMON1024B4 --model_name HDRNetGaussianPyrNN --guide_lr_scale 0.5 \
  --max_steps 120000
python -m hdrnet_tpu.bin.evaluate output/ll_gpyrnn_g05 data_ll/test \
  --json output/ll_gpyrnn_g05/eval_test.json
python scripts/diagnose_pyramid.py output/ll_gpyrnn_g05 data_ll/test \
  --json results/pyramid_diagnosis_retrained.json || true

# ---- 2. finish time-boxed round-3 baselines (resume; no-ops if done)
python -m hdrnet_tpu.bin.train output/ll1024_dilated_d3_w64 data_ll/train \
  $COMMON1024B1 --model_name DilatedConvolutions --depth 3 --width 64 \
  --max_steps 40000
python -m hdrnet_tpu.bin.evaluate output/ll1024_dilated_d3_w64 data_ll/test \
  --json output/ll1024_dilated_d3_w64/eval_test.json
python -m hdrnet_tpu.bin.train output/ll1024_unet_d9_w32 data_ll/train \
  $COMMON1024B1 --model_name UNet --depth 9 --width 32 --max_steps 40000
python -m hdrnet_tpu.bin.evaluate output/ll1024_unet_d9_w32 data_ll/test \
  --json output/ll1024_unet_d9_w32/eval_test.json

# ---- 3. l16/s32 batch-4 long run (round-3 best: 33.37 @ b1/100k)
python -m hdrnet_tpu.bin.train output/ll1024_l16s32_b4 data_ll/train \
  $COMMON1024B4 --luma_bins 16 --spatial_bin 32 --guide_lr_scale 0.5 \
  --max_steps 120000
python -m hdrnet_tpu.bin.evaluate output/ll1024_l16s32_b4 data_ll/test \
  --json output/ll1024_l16s32_b4/eval_test.json

bash scripts/consolidate_round3.sh || true
echo QUEUE4_DONE
