#!/bin/bash
# Round-4 chip queue v2 — deadline-driven, one leg at a time (one chip).
# Priorities = VERDICT.md round-3 "Next round" items:
#   1. driver-verifiable bench evidence (check run; warms the compile
#      cache for the driver's official BENCH_r04 capture)
#   6. batch-4 vs single-stream regression probe (scripts/exp_batch.py)
#   5. second workload family end-to-end: unsharp-mask (usm) trained +
#      identity/oracle bracket
#   2. real baseline quality points: UNet d9/w32 + Dilated d3/w64 on
#      the SAME @1024 held-out set as the committed plain-model row
#      (results/ll_l8s16_cos: 29.95 dB) so the figure is same-data
#   3. pyramid retrain with the guide-lr lever (round-3 diagnosis:
#      scale-dependent guide collapse, results/pyramid_diagnosis_60k.json)
#   then: per-model runtimes + quality json + compare figure.
#
# Every leg is idempotent (skipped if its eval artifact exists) and
# deadline-guarded so the chip is free for the driver's end-of-round
# bench. DEADLINE is a unix epoch; default = +5h from launch.
set -x
cd "$(dirname "$0")/../.."

DEADLINE=${DEADLINE:-$(( $(date +%s) + 18000 ))}
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

# ---- 1. bench check (also warms output/jax_cache_bench for the driver)
if [ ! -f results/bench_round4_check.json ] && [ "$(left)" -gt 2000 ]; then
  timeout 3000 python bench.py > results/bench_round4_check.json \
    2> results/bench_round4_check_stages.txt || true
  tail -5 results/bench_round4_check_stages.txt
fi

# ---- 6. batch-4 regression probe
if [ ! -f results/exp_batch_r4.txt ] && [ "$(left)" -gt 1800 ]; then
  timeout 1800 python scripts/exp_batch.py > results/exp_batch_r4.txt 2>&1 \
    || true
  tail -20 results/exp_batch_r4.txt
fi

# ---- 5. usm workload: train + eval + bracket
if [ ! -d data_usm/test ]; then
  python scripts/make_usm_dataset.py data_ll/test data_usm/test \
    --blur_sigma 4.0 --sharpen 1.0 > results/usm_identity.txt 2>&1 || true
fi
if [ ! -f output/usm_l8s16/eval_test.json ] && [ "$(left)" -gt 3600 ]; then
  timeout 3300 python -m hdrnet_tpu.bin.train output/usm_l8s16 data_ll/train \
    $COMMON1024B4 --data_pipeline UnsharpMaskDataPipeline \
    --blur_sigma 4.0 --sharpen 1.0 --guide_lr_scale 0.5 \
    --max_steps 30000 || true
  timeout 1200 python -m hdrnet_tpu.bin.evaluate output/usm_l8s16 \
    data_usm/test --json output/usm_l8s16/eval_test.json || true
fi
if [ ! -f results/usm_oracle_test.json ] && [ "$(left)" -gt 1500 ]; then
  timeout 1500 python -m hdrnet_tpu.bin.fit_grid data_usm/test --limit 8 \
    --json results/usm_oracle_test.json || true
fi

# ---- 2a. UNet baseline (same @1024 set as ll_l8s16_cos = 29.95 dB)
if [ ! -f output/ll1024_unet_d9_w32/eval_test.json ] \
    && [ "$(left)" -gt 4200 ]; then
  timeout -s INT 4500 python -m hdrnet_tpu.bin.train \
    output/ll1024_unet_d9_w32 data_ll/train \
    $COMMON1024B1 --model_name UNet --depth 9 --width 32 \
    --max_steps 25000 || true
  timeout 1200 python -m hdrnet_tpu.bin.evaluate output/ll1024_unet_d9_w32 \
    data_ll/test --json output/ll1024_unet_d9_w32/eval_test.json || true
fi

# ---- 3. pyramid retrain with the guide-lr lever (round-2: 28.40 @60k)
if [ ! -f output/ll_gpyrnn_g05/eval_test.json ] \
    && [ "$(left)" -gt 5400 ]; then
  timeout -s INT $(( $(left) - 4800 > 7200 ? 7200 : $(left) - 4800 )) \
    python -m hdrnet_tpu.bin.train output/ll_gpyrnn_g05 data_ll/train \
    $COMMON1024B4 --model_name HDRNetGaussianPyrNN --guide_lr_scale 0.5 \
    --guide_reg 0.03 --guide_reg_target 0.15 \
    --max_steps 60000 || true
  timeout 1200 python -m hdrnet_tpu.bin.evaluate output/ll_gpyrnn_g05 \
    data_ll/test --json output/ll_gpyrnn_g05/eval_test.json || true
  timeout 1800 python scripts/diagnose_pyramid.py output/ll_gpyrnn_g05 \
    data_ll/test --json results/pyramid_diagnosis_retrained.json || true
fi

# ---- 2b. Dilated baseline
if [ ! -f output/ll1024_dilated_d3_w64/eval_test.json ] \
    && [ "$(left)" -gt 3000 ]; then
  timeout -s INT $(( $(left) - 1800 > 3900 ? 3900 : $(left) - 1800 )) \
    python -m hdrnet_tpu.bin.train output/ll1024_dilated_d3_w64 \
    data_ll/train \
    $COMMON1024B1 --model_name DilatedConvolutions --depth 3 --width 64 \
    --max_steps 20000 || true
  timeout 1200 python -m hdrnet_tpu.bin.evaluate \
    output/ll1024_dilated_d3_w64 data_ll/test \
    --json output/ll1024_dilated_d3_w64/eval_test.json || true
fi

# ---- consolidate: runtimes + quality json + figure
bash scripts/consolidate_round4.sh > output/consolidate4.log 2>&1 || true
tail -30 output/consolidate4.log
echo QUEUE4V2_DONE
