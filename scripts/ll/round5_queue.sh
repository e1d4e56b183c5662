#!/bin/bash
# Round-5 chip queue — QUALITY round (VERDICT r4 items 1-4).
# Single serialized controller for the one-chip box; every leg is
# idempotent and deadline-guarded; training legs use `timeout -s INT`
# so the loop checkpoints on expiry.
#
#   1. wait for the already-running pyramid resume (leg1, PID file),
#      then eval + per-level guide diagnosis           (VERDICT #1)
#   2. usm 60k-step fully-annealed run + eval + oracle (VERDICT #2)
#   3. UNet d9/w32 resume 7284 -> 50k (re-paced cosine) + eval
#                                                      (VERDICT #3)
#   4. Dilated d3/w64 resume 2203 -> 30k + eval        (VERDICT #3)
#   5. l8/s16 @2048 anchor retrain with the guide-range regularizer
#      probe (100k cosine) + eval + guide_stats        (VERDICT #4)
#
# maxfma A/B (#5), downsample-fix bench (#6), st stretch (#8) and the
# final cache-warming bench run interactively after this queue.
set -x
cd "$(dirname "$0")/../.."

DEADLINE=${DEADLINE:?set DEADLINE epoch}
left() { echo $(( DEADLINE - $(date +%s) )); }

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
COMMON2048B4="--eval_data_dir data_ll/test --batch_size 4 \
  --output_resolution 2048 2048 --fliplr --flipud --rotate \
  --norandom_crop --cache_images --device_normalize --device_data \
  --learning_rate 1e-4 --lr_schedule cosine --lr_end 1e-6 \
  --lr_warmup_steps 500"

# ---- 1. pyramid: wait for the running resume leg, then eval+diagnose
if [ -f /tmp/leg1.pid ]; then
  P=$(cat /tmp/leg1.pid)
  while kill -0 "$P" 2>/dev/null; do sleep 20; done
fi
if [ ! -f results/ll_gpyrnn_g05_r5/eval_test.json ] \
    && [ "$(left)" -gt 1200 ]; then
  mkdir -p results/ll_gpyrnn_g05_r5
  timeout 700 python -m hdrnet_tpu.bin.evaluate output/ll_gpyrnn_g05 \
    data_ll/test --json results/ll_gpyrnn_g05_r5/eval_test.json || true
  cp output/ll_gpyrnn_g05/config.json output/ll_gpyrnn_g05/summaries.jsonl \
    results/ll_gpyrnn_g05_r5/ 2>/dev/null || true
fi
if [ ! -f results/pyramid_diagnosis_r5.json ] && [ "$(left)" -gt 800 ]; then
  timeout 700 python scripts/diagnose_pyramid.py output/ll_gpyrnn_g05 \
    data_ll/test --json results/pyramid_diagnosis_r5.json || true
fi

# ---- 2. usm: full ll-class budget (60k annealed) + eval + oracle
if [ ! -f output/usm_l8s16_v3/eval_test.json ] && [ "$(left)" -gt 4200 ]; then
  CAP=$(( $(left) - 2900 )); [ "$CAP" -gt 4500 ] && CAP=4500
  timeout -s INT "$CAP" python -m hdrnet_tpu.bin.train \
    output/usm_l8s16_v3 data_ll/train \
    $COMMON1024B4 --data_pipeline UnsharpMaskDataPipeline \
    --blur_sigma 8.0 --sharpen 3.0 --guide_lr_scale 0.5 \
    --max_steps 60000 > output/usm_train_v3.log 2>&1 || true
  tail -3 output/usm_train_v3.log
  timeout 600 python -m hdrnet_tpu.bin.evaluate output/usm_l8s16_v3 \
    data_usm/test --json output/usm_l8s16_v3/eval_test.json || true
  mkdir -p results/usm_l8s16_v3
  cp output/usm_l8s16_v3/eval_test.json output/usm_l8s16_v3/config.json \
    output/usm_l8s16_v3/summaries.jsonl results/usm_l8s16_v3/ 2>/dev/null \
    || true
fi
if [ ! -f results/usm_oracle_test.json ] && [ "$(left)" -gt 1800 ]; then
  timeout 1200 python -m hdrnet_tpu.bin.fit_grid data_usm/test --limit 8 \
    --json results/usm_oracle_test.json || true
fi

# ---- 3. UNet resume to 50k on a re-paced cosine (converged baseline)
if [ ! -f results/ll1024_unet_d9_w32_r5/eval_test.json ] \
    && [ "$(left)" -gt 3600 ]; then
  CAP=$(( $(left) - 2400 )); [ "$CAP" -gt 9000 ] && CAP=9000
  timeout -s INT "$CAP" python -m hdrnet_tpu.bin.train \
    output/ll1024_unet_d9_w32 data_ll/train \
    $COMMON1024B1 --model_name UNet --depth 9 --width 32 \
    --max_steps 50000 > output/unet_train_r5.log 2>&1 || true
  tail -3 output/unet_train_r5.log
  mkdir -p results/ll1024_unet_d9_w32_r5
  timeout 600 python -m hdrnet_tpu.bin.evaluate output/ll1024_unet_d9_w32 \
    data_ll/test --json results/ll1024_unet_d9_w32_r5/eval_test.json || true
  cp output/ll1024_unet_d9_w32/config.json \
    output/ll1024_unet_d9_w32/summaries.jsonl \
    results/ll1024_unet_d9_w32_r5/ 2>/dev/null || true
fi

# ---- 4. Dilated resume to 30k (converged baseline)
if [ ! -f results/ll1024_dilated_d3_w64_r5/eval_test.json ] \
    && [ "$(left)" -gt 2800 ]; then
  CAP=$(( $(left) - 1900 )); [ "$CAP" -gt 5400 ] && CAP=5400
  timeout -s INT "$CAP" python -m hdrnet_tpu.bin.train \
    output/ll1024_dilated_d3_w64 data_ll/train \
    $COMMON1024B1 --model_name DilatedConvolutions --depth 3 --width 64 \
    --max_steps 30000 > output/dilated_train_r5.log 2>&1 || true
  tail -3 output/dilated_train_r5.log
  mkdir -p results/ll1024_dilated_d3_w64_r5
  timeout 600 python -m hdrnet_tpu.bin.evaluate \
    output/ll1024_dilated_d3_w64 data_ll/test \
    --json results/ll1024_dilated_d3_w64_r5/eval_test.json || true
  cp output/ll1024_dilated_d3_w64/config.json \
    output/ll1024_dilated_d3_w64/summaries.jsonl \
    results/ll1024_dilated_d3_w64_r5/ 2>/dev/null || true
fi

# ---- 5. l8/s16 @2048 anchor: guide-range-regularizer probe, 100k
if [ ! -f results/ll2048_l8s16_r5/eval_test.json ] \
    && [ "$(left)" -gt 3000 ]; then
  CAP=$(( $(left) - 1400 )); [ "$CAP" -gt 6600 ] && CAP=6600
  timeout -s INT "$CAP" python -m hdrnet_tpu.bin.train \
    output/ll2048_l8s16_r5 data_ll/train \
    $COMMON2048B4 --guide_lr_scale 0.5 \
    --guide_reg 0.03 --guide_reg_target 0.15 \
    --max_steps 100000 > output/ll2048_r5_train.log 2>&1 || true
  tail -3 output/ll2048_r5_train.log
  mkdir -p results/ll2048_l8s16_r5
  timeout 700 python -m hdrnet_tpu.bin.evaluate output/ll2048_l8s16_r5 \
    data_ll/test --json results/ll2048_l8s16_r5/eval_test.json || true
  cp output/ll2048_l8s16_r5/config.json \
    output/ll2048_l8s16_r5/summaries.jsonl \
    results/ll2048_l8s16_r5/ 2>/dev/null || true
fi
if [ ! -f results/guide_stats_l8s16_r5.json ] && [ "$(left)" -gt 600 ] \
    && [ -f results/ll2048_l8s16_r5/eval_test.json ]; then
  timeout 500 python scripts/guide_stats.py output/ll2048_l8s16_r5 \
    data_ll/test --json results/guide_stats_l8s16_r5.json || true
fi

echo "ROUND5_QUEUE_DONE $(date -u +%H:%M:%S) left=$(left)"
