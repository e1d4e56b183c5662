#!/bin/bash
# Round-4 queue v5b — the final chip tail, launched after the
# maxfma-default decision (queue v5a artifacts):
#   1. usm retrain on the now device-resident synthetic pipeline
#      (VERDICT item 5) + eval on the materialized test set
#   2. bench.py final — re-warms output/jax_cache_bench for the
#      driver's BENCH_r04 (the slab px-bf16 fix and any guide-default
#      flip changed the serving HLO) and records the round-4 numbers
#   3. pyramid retrain with the guide levers, sized to the remaining
#      window (VERDICT item 3) + eval + per-level diagnosis
#   4. consolidate (quality json + usm json + compare figure)
# DEADLINE (unix epoch) bounds the pyramid leg; default +105 min.
set -x
cd "$(dirname "$0")/../.."

DEADLINE=${DEADLINE:-$(( $(date +%s) + 6300 ))}
left() { echo $(( DEADLINE - $(date +%s) )); }

COMMON1024B4="--eval_data_dir data_ll/test --batch_size 4 \
  --output_resolution 1024 1024 --fliplr --flipud --rotate \
  --norandom_crop --cache_images --device_normalize --device_data \
  --learning_rate 1e-4 --lr_schedule cosine --lr_end 1e-6 \
  --lr_warmup_steps 500"

# ---- 1. usm retrain (device-resident synthesis; ~9 steps/s expected).
# Operator strength sigma=8/sharpen=3: identity is then ~29 dB on the
# held-out set (sigma=4/sharpen=1 left identity at 45.7 dB — too close
# to a no-op to evidence anything, results/usm_identity.txt history).
if [ ! -f output/usm_l8s16/eval_test.json ]; then
  timeout -s INT 1500 python -m hdrnet_tpu.bin.train output/usm_l8s16 \
    data_ll/train \
    $COMMON1024B4 --data_pipeline UnsharpMaskDataPipeline \
    --blur_sigma 8.0 --sharpen 3.0 --guide_lr_scale 0.5 \
    --max_steps 11000 > output/usm_train.log 2>&1 || true
  tail -3 output/usm_train.log
  timeout 600 python -m hdrnet_tpu.bin.evaluate output/usm_l8s16 \
    data_usm/test --json output/usm_l8s16/eval_test.json || true
fi
if [ ! -f results/usm_oracle_test.json ]; then
  timeout 900 python -m hdrnet_tpu.bin.fit_grid data_usm/test --limit 8 \
    --json results/usm_oracle_test.json || true
fi

# ---- 2. final bench: cache re-warm for the driver + round-4 record
if [ ! -f results/bench_round4_final.json ]; then
  timeout 3000 python bench.py > results/bench_round4_final.json \
    2> results/bench_round4_final_stages.txt || true
  tail -12 results/bench_round4_final_stages.txt
fi

# ---- 3. pyramid retrain, adaptive to the remaining window
if [ ! -f output/ll_gpyrnn_g05/eval_test.json ] \
    && [ "$(left)" -gt 1900 ]; then
  CAP=$(( $(left) - 1300 ))
  MS=$(( CAP * 75 / 10 )); [ "$MS" -gt 48000 ] && MS=48000
  timeout -s INT "$CAP" \
    python -m hdrnet_tpu.bin.train output/ll_gpyrnn_g05 data_ll/train \
    $COMMON1024B4 --model_name HDRNetGaussianPyrNN --guide_lr_scale 0.5 \
    --guide_reg 0.03 --guide_reg_target 0.15 \
    --max_steps "$MS" > output/gpyrnn_train.log 2>&1 || true
  tail -3 output/gpyrnn_train.log
  timeout 500 python -m hdrnet_tpu.bin.evaluate output/ll_gpyrnn_g05 \
    data_ll/test --json output/ll_gpyrnn_g05/eval_test.json || true
  timeout 600 python scripts/diagnose_pyramid.py output/ll_gpyrnn_g05 \
    data_ll/test --json results/pyramid_diagnosis_retrained.json || true
fi

# ---- 3b. (optional tail) l8/s16 guide-range-reg probe @1024
# (VERDICT item 4 lever test; plain curves trains ~26 st/s at b4@1024)
if [ ! -f output/ll1024_l8s16_reg/eval_test.json ] \
    && [ "$(left)" -gt 2300 ]; then
  timeout -s INT 1400 python -m hdrnet_tpu.bin.train \
    output/ll1024_l8s16_reg data_ll/train \
    $COMMON1024B4 --guide_lr_scale 0.5 \
    --guide_reg 0.03 --guide_reg_target 0.15 \
    --max_steps 30000 > output/l8s16reg_train.log 2>&1 || true
  timeout 500 python -m hdrnet_tpu.bin.evaluate output/ll1024_l8s16_reg \
    data_ll/test --json output/ll1024_l8s16_reg/eval_test.json || true
  timeout 400 python scripts/guide_stats.py output/ll1024_l8s16_reg \
    data_ll/test --json results/guide_stats_l8s16_reg.json || true
fi

# ---- 4. consolidate
bash scripts/consolidate_round4.sh > output/consolidate4.log 2>&1 || true
tail -30 output/consolidate4.log
echo QUEUE5B_DONE
