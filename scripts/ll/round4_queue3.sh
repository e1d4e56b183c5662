#!/bin/bash
# Round-4 chip queue v3 — re-budgeted for a ~4 h chip window (queue v2
# assumed 5 h; this round the compile caches and datasets were wiped, so
# the bench-warm leg alone costs ~40 min cold).
#
# Priorities = VERDICT.md round-3 "Next round" items, ordered so the
# cheap, high-value legs land before the single expensive one:
#   1. bench check        — warms output/jax_cache_bench for the
#                           driver's official BENCH_r04 capture
#   6. batch-4 regression probe (scripts/exp_batch.py; shares the cache)
#   5. usm second-family evidence: train + eval + identity/oracle bracket
#   2. UNet + Dilated baseline quality points on the SAME @1024 held-out
#      set as the committed plain-model row (ll_l8s16_cos: 29.95 dB)
#   2. per-model runtimes (figure x-axis) — before pyramid so the figure
#      is guaranteed even if the pyramid leg eats the tail
#   3. pyramid retrain with guide-lr + guide-range regularizer —
#      ADAPTIVE: max_steps sized to whatever chip time remains
#   4. (optional) l8/s16 guide-reg probe if time remains
#   then consolidate (quality json + usm json + compare figure).
#
# Every leg is idempotent (skipped if its artifact exists) and
# deadline-guarded. DEADLINE is a unix epoch; default = +4h from launch.
set -x
cd "$(dirname "$0")/../.."

DEADLINE=${DEADLINE:-$(( $(date +%s) + 14400 ))}
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

# ---- 1. bench check (warms output/jax_cache_bench for the driver)
if [ ! -f results/bench_round4_check.json ] && [ "$(left)" -gt 2400 ]; then
  timeout 3000 python bench.py > results/bench_round4_check.json \
    2> results/bench_round4_check_stages.txt || true
  tail -8 results/bench_round4_check_stages.txt
fi

# ---- 6. batch-4 regression probe (compiles overlap the bench cache)
if [ ! -f results/exp_batch_r4.txt ] && [ "$(left)" -gt 1500 ]; then
  timeout 1500 python scripts/exp_batch.py > results/exp_batch_r4.txt 2>&1 \
    || true
  tail -20 results/exp_batch_r4.txt
fi

# ---- 5. usm workload: materialized test set + train + eval + bracket
if [ ! -d data_usm/test ]; then
  python scripts/make_usm_dataset.py data_ll/test data_usm/test \
    --blur_sigma 4.0 --sharpen 1.0 > results/usm_identity.txt 2>&1 || true
  tail -2 results/usm_identity.txt
fi
if [ ! -f output/usm_l8s16/eval_test.json ] && [ "$(left)" -gt 2200 ]; then
  timeout -s INT 1400 python -m hdrnet_tpu.bin.train output/usm_l8s16 \
    data_ll/train \
    $COMMON1024B4 --data_pipeline UnsharpMaskDataPipeline \
    --blur_sigma 4.0 --sharpen 1.0 --guide_lr_scale 0.5 \
    --max_steps 30000 || true
  timeout 700 python -m hdrnet_tpu.bin.evaluate output/usm_l8s16 \
    data_usm/test --json output/usm_l8s16/eval_test.json || true
fi
if [ ! -f results/usm_oracle_test.json ] && [ "$(left)" -gt 1200 ]; then
  timeout 1000 python -m hdrnet_tpu.bin.fit_grid data_usm/test --limit 8 \
    --json results/usm_oracle_test.json || true
fi

# ---- 2a. UNet baseline (same @1024 set as ll_l8s16_cos = 29.95 dB)
if [ ! -f output/ll1024_unet_d9_w32/eval_test.json ] \
    && [ "$(left)" -gt 2400 ]; then
  timeout -s INT 1900 python -m hdrnet_tpu.bin.train \
    output/ll1024_unet_d9_w32 data_ll/train \
    $COMMON1024B1 --model_name UNet --depth 9 --width 32 \
    --max_steps 25000 || true
  timeout 700 python -m hdrnet_tpu.bin.evaluate output/ll1024_unet_d9_w32 \
    data_ll/test --json output/ll1024_unet_d9_w32/eval_test.json || true
fi

# ---- 2b. Dilated baseline
if [ ! -f output/ll1024_dilated_d3_w64/eval_test.json ] \
    && [ "$(left)" -gt 2000 ]; then
  timeout -s INT 1500 python -m hdrnet_tpu.bin.train \
    output/ll1024_dilated_d3_w64 data_ll/train \
    $COMMON1024B1 --model_name DilatedConvolutions --depth 3 --width 64 \
    --max_steps 20000 || true
  timeout 700 python -m hdrnet_tpu.bin.evaluate \
    output/ll1024_dilated_d3_w64 data_ll/test \
    --json output/ll1024_dilated_d3_w64/eval_test.json || true
fi

# ---- 2c. per-model runtimes BEFORE the pyramid leg (figure x-axis)
if [ ! -f results/model_runtimes_1024.json ] && [ "$(left)" -gt 1400 ]; then
  timeout 1200 python scripts/bench_models.py --res 1024 1024 --iters 50 \
    --models HDRNetCurves HDRNetGaussianPyrNN UNet:9:32 \
             DilatedConvolutions:3:64 \
    --out results/model_runtimes_1024.json || true
fi
if [ ! -f results/model_runtimes_2048.json ] && [ "$(left)" -gt 1600 ]; then
  timeout 1400 python scripts/bench_models.py --res 2048 2048 --iters 50 \
    --models HDRNetCurves HDRNetCurves:luma_bins=16:spatial_bin=32 \
             HDRNetGaussianPyrNN UNet:9:32 DilatedConvolutions:3:64 \
    --out results/model_runtimes_2048.json || true
fi

# ---- 3. pyramid retrain with the guide levers — ADAPTIVE budget:
# all remaining chip time minus 1700 s (eval + diagnose + consolidate),
# max_steps sized at the measured 8.1 steps/s so cosine fully anneals.
if [ ! -f output/ll_gpyrnn_g05/eval_test.json ] \
    && [ "$(left)" -gt 3400 ]; then
  CAP=$(( $(left) - 1700 )); [ "$CAP" -gt 7600 ] && CAP=7600
  MS=$(( CAP * 75 / 10 )); [ "$MS" -gt 60000 ] && MS=60000
  timeout -s INT "$CAP" \
    python -m hdrnet_tpu.bin.train output/ll_gpyrnn_g05 data_ll/train \
    $COMMON1024B4 --model_name HDRNetGaussianPyrNN --guide_lr_scale 0.5 \
    --guide_reg 0.03 --guide_reg_target 0.15 \
    --max_steps "$MS" || true
  timeout 700 python -m hdrnet_tpu.bin.evaluate output/ll_gpyrnn_g05 \
    data_ll/test --json output/ll_gpyrnn_g05/eval_test.json || true
  timeout 800 python scripts/diagnose_pyramid.py output/ll_gpyrnn_g05 \
    data_ll/test --json results/pyramid_diagnosis_retrained.json || true
fi

# ---- 4. (optional) l8/s16 guide-range-regularizer probe @1024
if [ ! -f output/ll1024_l8s16_reg/eval_test.json ] \
    && [ "$(left)" -gt 2400 ]; then
  timeout -s INT 1500 python -m hdrnet_tpu.bin.train \
    output/ll1024_l8s16_reg data_ll/train \
    $COMMON1024B4 --guide_lr_scale 0.5 \
    --guide_reg 0.03 --guide_reg_target 0.15 \
    --max_steps 30000 || true
  timeout 700 python -m hdrnet_tpu.bin.evaluate output/ll1024_l8s16_reg \
    data_ll/test --json output/ll1024_l8s16_reg/eval_test.json || true
  timeout 400 python scripts/guide_stats.py output/ll1024_l8s16_reg \
    data_ll/test --json results/guide_stats_l8s16_reg.json || true
fi

# ---- consolidate: quality json + usm json + figure (always runs)
bash scripts/consolidate_round4.sh > output/consolidate4.log 2>&1 || true
tail -30 output/consolidate4.log
echo QUEUE4V3_DONE
