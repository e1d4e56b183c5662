#!/bin/bash
# Round-3 quality queue, part 2 (sequential: one chip).
#
# The first queue's UNet leg OOM'd at b4@1024^2 full-res (20.8G >
# 15.75G HBM).  The reference trains both full-res baselines at
# batch_size **1** with --nobatch_norm (scripts/ll/train_unet.sh,
# train_dilated.sh), so the retrains here match that geometry at our
# 1024^2 procedural workload: b1, no BN (our default), 40k cosine.
#
# 3'. UNet d9/w32 + DilatedConvolutions d3/w64 baseline quality points
#     (reference table rows, compare_to_unet.py:19-44).
# 4'. Pyramid retrain with the guide-lr lever at round-2's exact
#     geometry/budget (b4@1024^2, 60k) so the delta is attributable.
set -x
cd "$(dirname "$0")/../.."

COMMON1024B1="--eval_data_dir data_ll/test --batch_size 1 \
  --output_resolution 1024 1024 --fliplr --flipud --rotate \
  --norandom_crop --cache_images --device_normalize --device_data \
  --learning_rate 1e-4 --lr_schedule cosine --lr_end 1e-6 \
  --lr_warmup_steps 500"

COMMON1024B4="--eval_data_dir data_ll/test --batch_size 4 \
  --output_resolution 1024 1024 --fliplr --flipud --rotate \
  --norandom_crop --cache_images --device_normalize --device_data \
  --learning_rate 1e-4 --lr_schedule cosine --lr_end 1e-6 \
  --lr_warmup_steps 500"

# ---- 3'a. DilatedConvolutions d3/w64 (reference row: 24.5 dB)
rm -rf output/ll1024_dilated_d3_w64
python -m hdrnet_tpu.bin.train output/ll1024_dilated_d3_w64 data_ll/train \
  $COMMON1024B1 --model_name DilatedConvolutions --depth 3 --width 64 \
  --max_steps 40000
python -m hdrnet_tpu.bin.evaluate output/ll1024_dilated_d3_w64 data_ll/test \
  --json output/ll1024_dilated_d3_w64/eval_test.json

# ---- 3'b. UNet d9/w32 (reference row: 35.7 dB)
rm -rf output/ll1024_unet_d9_w32
python -m hdrnet_tpu.bin.train output/ll1024_unet_d9_w32 data_ll/train \
  $COMMON1024B1 --model_name UNet --depth 9 --width 32 --max_steps 40000
python -m hdrnet_tpu.bin.evaluate output/ll1024_unet_d9_w32 data_ll/test \
  --json output/ll1024_unet_d9_w32/eval_test.json

# ---- 4'. pyramid retrain with the guide lever (round-2: 28.40)
python -m hdrnet_tpu.bin.train output/ll_gpyrnn_g05 data_ll/train \
  $COMMON1024B4 --model_name HDRNetGaussianPyrNN --guide_lr_scale 0.5 \
  --max_steps 60000
python -m hdrnet_tpu.bin.evaluate output/ll_gpyrnn_g05 data_ll/test \
  --json output/ll_gpyrnn_g05/eval_test.json

echo QUEUE2_DONE
