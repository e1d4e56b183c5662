#!/bin/bash
# Round-4 chip queue v4 — re-budgeted after the v3 session died right
# after its bench leg (bench_round4_check.json landed; everything else
# still pending, and the env wipe lost the round-3 output/ checkpoints).
#
# This session has ~4.5 h of chip. Order = VERDICT.md round-3 items,
# cheapest-first so the adaptive pyramid leg absorbs the remainder:
#   6. batch-4 regression probe (exp_batch)
#   5. usm second-family evidence: dataset + train + eval + oracle
#   2a/2b. UNet + Dilated baseline quality on the SAME @1024 held-out
#          set as the committed plain-model row (ll_l8s16_cos: 29.95 dB)
#   2c. per-model runtimes @1024 (figure x-axis)
#   3. pyramid retrain with guide-lr + guide-range regularizer,
#      max_steps sized to remaining time so the cosine fully anneals
#   (tail, if time) runtimes @2048, l8/s16 guide-reg probe
#   then consolidate (quality json + usm json + compare figure).
#
# Training legs size max_steps to the leg budget (full cosine anneal
# beats a truncated longer schedule) and use `timeout -s INT` so the
# loop checkpoints on expiry. Every leg is idempotent.
set -x
cd "$(dirname "$0")/../.."

DEADLINE=${DEADLINE:-$(( $(date +%s) + 15300 ))}
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

# ---- 0. bench check (already done this round; kept for idempotence)
if [ ! -f results/bench_round4_check.json ] && [ "$(left)" -gt 2400 ]; then
  timeout 3000 python bench.py > results/bench_round4_check.json \
    2> results/bench_round4_check_stages.txt || true
fi

# ---- 6. batch-4 regression probe
if [ ! -s results/exp_batch_r4.txt ] && [ "$(left)" -gt 1500 ]; then
  timeout 1400 python scripts/exp_batch.py > results/exp_batch_r4.txt 2>&1 \
    || true
  tail -12 results/exp_batch_r4.txt
fi

# ---- 5. usm workload: materialized test set + train + eval + bracket
if [ ! -d data_usm/test ]; then
  python scripts/make_usm_dataset.py data_ll/test data_usm/test \
    --blur_sigma 4.0 --sharpen 1.0 > results/usm_identity.txt 2>&1 || true
  tail -2 results/usm_identity.txt
fi
if [ ! -f output/usm_l8s16/eval_test.json ] && [ "$(left)" -gt 2700 ]; then
  timeout -s INT 1400 python -m hdrnet_tpu.bin.train output/usm_l8s16 \
    data_ll/train \
    $COMMON1024B4 --data_pipeline UnsharpMaskDataPipeline \
    --blur_sigma 4.0 --sharpen 1.0 --guide_lr_scale 0.5 \
    --max_steps 12000 > output/usm_train.log 2>&1 || true
  tail -3 output/usm_train.log
  timeout 600 python -m hdrnet_tpu.bin.evaluate output/usm_l8s16 \
    data_usm/test --json output/usm_l8s16/eval_test.json || true
fi
if [ ! -f results/usm_oracle_test.json ] && [ "$(left)" -gt 1100 ]; then
  timeout 900 python -m hdrnet_tpu.bin.fit_grid data_usm/test --limit 8 \
    --json results/usm_oracle_test.json || true
fi

# ---- 2a. UNet baseline (same @1024 held-out set as ll_l8s16_cos)
if [ ! -f output/ll1024_unet_d9_w32/eval_test.json ] \
    && [ "$(left)" -gt 2500 ]; then
  timeout -s INT 1800 python -m hdrnet_tpu.bin.train \
    output/ll1024_unet_d9_w32 data_ll/train \
    $COMMON1024B1 --model_name UNet --depth 9 --width 32 \
    --max_steps 25000 > output/unet_train.log 2>&1 || true
  tail -3 output/unet_train.log
  timeout 600 python -m hdrnet_tpu.bin.evaluate output/ll1024_unet_d9_w32 \
    data_ll/test --json output/ll1024_unet_d9_w32/eval_test.json || true
fi

# ---- 2b. Dilated baseline
if [ ! -f output/ll1024_dilated_d3_w64/eval_test.json ] \
    && [ "$(left)" -gt 2100 ]; then
  timeout -s INT 1400 python -m hdrnet_tpu.bin.train \
    output/ll1024_dilated_d3_w64 data_ll/train \
    $COMMON1024B1 --model_name DilatedConvolutions --depth 3 --width 64 \
    --max_steps 18000 > output/dilated_train.log 2>&1 || true
  tail -3 output/dilated_train.log
  timeout 600 python -m hdrnet_tpu.bin.evaluate \
    output/ll1024_dilated_d3_w64 data_ll/test \
    --json output/ll1024_dilated_d3_w64/eval_test.json || true
fi

# ---- 2c. per-model runtimes @1024 BEFORE the pyramid leg
if [ ! -f results/model_runtimes_1024.json ] && [ "$(left)" -gt 1300 ]; then
  timeout 1100 python scripts/bench_models.py --res 1024 1024 --iters 50 \
    --models HDRNetCurves HDRNetGaussianPyrNN UNet:9:32 \
             DilatedConvolutions:3:64 \
    --out results/model_runtimes_1024.json || true
fi

# ---- 3. pyramid retrain with the guide levers — ADAPTIVE budget:
# remaining chip time minus 1500 s (eval + diagnose + tail legs),
# max_steps sized at the measured ~7.5 steps/s so cosine fully anneals.
if [ ! -f output/ll_gpyrnn_g05/eval_test.json ] \
    && [ "$(left)" -gt 3000 ]; then
  CAP=$(( $(left) - 1500 )); [ "$CAP" -gt 6500 ] && CAP=6500
  MS=$(( CAP * 75 / 10 )); [ "$MS" -gt 48000 ] && MS=48000
  timeout -s INT "$CAP" \
    python -m hdrnet_tpu.bin.train output/ll_gpyrnn_g05 data_ll/train \
    $COMMON1024B4 --model_name HDRNetGaussianPyrNN --guide_lr_scale 0.5 \
    --guide_reg 0.03 --guide_reg_target 0.15 \
    --max_steps "$MS" > output/gpyrnn_train.log 2>&1 || true
  tail -3 output/gpyrnn_train.log
  timeout 600 python -m hdrnet_tpu.bin.evaluate output/ll_gpyrnn_g05 \
    data_ll/test --json output/ll_gpyrnn_g05/eval_test.json || true
  timeout 700 python scripts/diagnose_pyramid.py output/ll_gpyrnn_g05 \
    data_ll/test --json results/pyramid_diagnosis_retrained.json || true
fi

# ---- tail: runtimes @2048 (reference-figure resolution)
if [ ! -f results/model_runtimes_2048.json ] && [ "$(left)" -gt 1500 ]; then
  timeout 1300 python scripts/bench_models.py --res 2048 2048 --iters 30 \
    --models HDRNetCurves HDRNetCurves:luma_bins=16:spatial_bin=32 \
             HDRNetGaussianPyrNN UNet:9:32 DilatedConvolutions:3:64 \
    --out results/model_runtimes_2048.json || true
fi

# ---- tail: l8/s16 guide-range-regularizer probe @1024
if [ ! -f output/ll1024_l8s16_reg/eval_test.json ] \
    && [ "$(left)" -gt 2400 ]; then
  CAP=$(( $(left) - 1000 )); [ "$CAP" -gt 1500 ] && CAP=1500
  MS=$(( CAP * 10 )); [ "$MS" -gt 15000 ] && MS=15000
  timeout -s INT "$CAP" python -m hdrnet_tpu.bin.train \
    output/ll1024_l8s16_reg data_ll/train \
    $COMMON1024B4 --guide_lr_scale 0.5 \
    --guide_reg 0.03 --guide_reg_target 0.15 \
    --max_steps "$MS" > output/l8s16reg_train.log 2>&1 || true
  timeout 600 python -m hdrnet_tpu.bin.evaluate output/ll1024_l8s16_reg \
    data_ll/test --json output/ll1024_l8s16_reg/eval_test.json || true
  timeout 400 python scripts/guide_stats.py output/ll1024_l8s16_reg \
    data_ll/test --json results/guide_stats_l8s16_reg.json || true
fi

# ---- consolidate: quality json + usm json + figure (always runs)
bash scripts/consolidate_round4.sh > output/consolidate4.log 2>&1 || true
tail -30 output/consolidate4.log
echo QUEUE4V4_DONE
