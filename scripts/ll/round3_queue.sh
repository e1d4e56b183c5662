#!/bin/bash
# Round-3 quality queue (sequential: one chip).
#
# 1. Reference's best config l16/s32 @ the exact 2048^2/b1 training
#    geometry (published anchor 32.7 dB, compare_to_unet.py:46).
# 2. l8/s16 retrain with the guide-lr lever + longer decay (anchor
#    31.8 dB, compare_to_unet.py:51; round-2 run reached 31.04).
# 3. UNet d9/w32 + DilatedConvolutions d3/w64 baseline quality points
#    on the 1024^2 procedural set (reference table rows for the
#    quality-vs-runtime figure, compare_to_unet.py:19-44).
# 4. Pyramid retrain with the guide-lr lever (round-2: 28.40 @1024^2).
set -x
cd "$(dirname "$0")/../.."

COMMON2048="--eval_data_dir data_ll2048/test --batch_size 1 \
  --output_resolution 2048 2048 --fliplr --flipud --rotate \
  --norandom_crop --cache_images --device_normalize --device_data \
  --learning_rate 1e-4 --lr_schedule cosine --lr_end 1e-6 \
  --lr_warmup_steps 500"

COMMON1024="--eval_data_dir data_ll/test --batch_size 4 \
  --output_resolution 1024 1024 --fliplr --flipud --rotate \
  --norandom_crop --cache_images --device_normalize --device_data \
  --learning_rate 1e-4 --lr_schedule cosine --lr_end 1e-6 \
  --lr_warmup_steps 500"

# ---- 1. l16/s32 (the reference's best bracket config)
python -m hdrnet_tpu.bin.train output/ll2048_l16s32 data_ll2048/train \
  $COMMON2048 --luma_bins 16 --spatial_bin 32 --guide_lr_scale 0.5 \
  --max_steps 100000
python -m hdrnet_tpu.bin.evaluate output/ll2048_l16s32 data_ll2048/test \
  --json output/ll2048_l16s32/eval_test.json
python -m hdrnet_tpu.bin.fit_grid data_ll2048/test --limit 4 \
  --luma_bins 16 --spatial_bin 32 \
  --json output/ll2048_l16s32/oracle_test.json

# ---- 2. l8/s16 retrain (guide lever + longer run)
python -m hdrnet_tpu.bin.train output/ll2048_l8s16_g05 data_ll2048/train \
  $COMMON2048 --luma_bins 8 --spatial_bin 16 --guide_lr_scale 0.5 \
  --max_steps 140000
python -m hdrnet_tpu.bin.evaluate output/ll2048_l8s16_g05 data_ll2048/test \
  --json output/ll2048_l8s16_g05/eval_test.json

# ---- 3. baselines for the quality-vs-runtime figure
python -m hdrnet_tpu.bin.train output/ll1024_unet_d9_w32 data_ll/train \
  $COMMON1024 --model_name UNet --depth 9 --width 32 --max_steps 40000
python -m hdrnet_tpu.bin.evaluate output/ll1024_unet_d9_w32 data_ll/test \
  --json output/ll1024_unet_d9_w32/eval_test.json

python -m hdrnet_tpu.bin.train output/ll1024_dilated_d3_w64 data_ll/train \
  $COMMON1024 --model_name DilatedConvolutions --depth 3 --width 64 \
  --max_steps 40000
python -m hdrnet_tpu.bin.evaluate output/ll1024_dilated_d3_w64 data_ll/test \
  --json output/ll1024_dilated_d3_w64/eval_test.json

# ---- 4. pyramid retrain with the guide lever
python -m hdrnet_tpu.bin.train output/ll_gpyrnn_g05 data_ll/train \
  $COMMON1024 --model_name HDRNetGaussianPyrNN --guide_lr_scale 0.5 \
  --max_steps 120000
python -m hdrnet_tpu.bin.evaluate output/ll_gpyrnn_g05 data_ll/test \
  --json output/ll_gpyrnn_g05/eval_test.json

echo QUEUE_DONE
