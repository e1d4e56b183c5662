#!/bin/bash
# Round-5 chip queue v2 — QUALITY round (VERDICT r4 items 1-6, 8).
# Replaces round5_queue.sh: every training leg's max_steps is sized to
# its cap at the measured step rate (round-4 lesson: a truncated cosine
# leaves a high-LR snapshot that evals WORSE than a short annealed run),
# and the serving probe + final bench-cache re-warm are in the queue so
# the driver's end-of-round bench.py capture hits a warm cache.
#
# Measured rates (this box, device-resident data):
#   usm    b4@1024 HDRNetCurves   24.3 st/s  -> 60k  = ~41 min
#   UNet   b1@1024 d9/w32          5.76 st/s -> 43k  = ~124 min
#   dilated b1@1024 d3/w64         8.2 st/s  -> 28k  = ~57 min
#   ll     b1@2048 l8/s16         28 st/s    -> 140k = ~84 min
set -x
cd "$(dirname "$0")/../.."

DEADLINE=${DEADLINE:?set DEADLINE epoch}
left() { echo $(( DEADLINE - $(date +%s) )); }

# The axon tunnel has multi-minute outage windows (round 4: two; round
# 5: a ~30-min one at 07:42). A leg started during an outage burns its
# whole timeout and its artifact is skipped forever, so gate every chip
# leg on a liveness probe (same probe as bench.py's, in a subprocess so
# backend init is covered by the timeout).
wait_tunnel() {
  while [ "$(left)" -gt 300 ]; do
    if timeout 240 python -c 'import jax, jax.numpy as jnp; jax.jit(lambda a: (a*a+1).sum())(jnp.ones((8,8))).block_until_ready()' >/dev/null 2>&1; then
      return 0
    fi
    echo "tunnel down, retrying at $(date -u +%H:%M:%S) (left=$(left)s)"
    sleep 30
  done
  return 1
}

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
COMMON2048B1="--eval_data_dir data_ll/test --batch_size 1 \
  --output_resolution 2048 2048 --fliplr --flipud --rotate \
  --norandom_crop --cache_images --device_normalize --device_data \
  --learning_rate 1e-4 --lr_schedule cosine --lr_end 1e-6 \
  --lr_warmup_steps 500"

# ---- 1. pyramid: wait for the running 48k resume, then eval+diagnose
#         (VERDICT #1)
if [ -f /tmp/leg1.pid ]; then
  P=$(cat /tmp/leg1.pid)
  while kill -0 "$P" 2>/dev/null; do sleep 20; done
fi
if [ ! -f results/ll_gpyrnn_g05_r5/eval_test.json ] \
    && [ "$(left)" -gt 1200 ] && wait_tunnel; then
  mkdir -p results/ll_gpyrnn_g05_r5
  timeout 700 python -m hdrnet_tpu.bin.evaluate output/ll_gpyrnn_g05 \
    data_ll/test --json results/ll_gpyrnn_g05_r5/eval_test.json || true
  cp output/ll_gpyrnn_g05/config.json output/ll_gpyrnn_g05/summaries.jsonl \
    results/ll_gpyrnn_g05_r5/ 2>/dev/null || true
fi
if [ ! -f results/pyramid_diagnosis_r5.json ] && [ "$(left)" -gt 900 ] && wait_tunnel; then
  timeout 700 python scripts/diagnose_pyramid.py output/ll_gpyrnn_g05 \
    data_ll/test --json results/pyramid_diagnosis_r5.json || true
fi

# ---- 2. serving probe: batched-downsample on-chip validation + timing
#         and the curves relu-vs-maxfma A/B (VERDICT #5, #6); also
#         re-warms the downsample entries in the bench compile cache
if [ ! -f results/exp_r5_serving.json ] && [ "$(left)" -gt 2400 ] && wait_tunnel; then
  timeout 2200 python scripts/exp_r5_serving.py \
    --out results/exp_r5_serving.json \
    2> results/exp_r5_serving.log || true
  tail -12 results/exp_r5_serving.log
fi

# ---- 3. usm: full ll-class budget, fully annealed 60k + eval + oracle
#         (VERDICT #2)
if [ ! -f results/usm_l8s16_v3/eval_test.json ] && [ "$(left)" -gt 6600 ] && wait_tunnel; then
  timeout -s INT 3600 python -m hdrnet_tpu.bin.train \
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
if [ ! -f results/usm_oracle_test.json ] && [ "$(left)" -gt 4000 ] && wait_tunnel; then
  timeout 1300 python -m hdrnet_tpu.bin.fit_grid data_usm/test --limit 8 \
    --json results/usm_oracle_test.json || true
fi

# ---- 4. UNet resume 7284 -> 50k re-paced cosine (converged baseline,
#         VERDICT #3)
if [ ! -f results/ll1024_unet_d9_w32_r5/eval_test.json ] \
    && [ "$(left)" -gt 11900 ] && wait_tunnel; then
  timeout -s INT 8900 python -m hdrnet_tpu.bin.train \
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

# ---- 5. Dilated resume 2203 -> 30k (converged baseline, VERDICT #3)
if [ ! -f results/ll1024_dilated_d3_w64_r5/eval_test.json ] \
    && [ "$(left)" -gt 7200 ] && wait_tunnel; then
  timeout -s INT 4200 python -m hdrnet_tpu.bin.train \
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

# ---- 6. l8/s16 @2048 anchor: same cohort as round 4's best (b1, 140k
#         cosine, guide_lr_scale 0.5) + the guide-range-regularizer
#         probe (VERDICT #4; r4 guide stats: only 4/8 luma bins used)
if [ ! -f results/ll2048_l8s16_r5/eval_test.json ] \
    && [ "$(left)" -gt 9400 ] && wait_tunnel; then
  timeout -s INT 6400 python -m hdrnet_tpu.bin.train \
    output/ll2048_l8s16_r5 data_ll/train \
    $COMMON2048B1 --guide_lr_scale 0.5 \
    --guide_reg 0.03 --guide_reg_target 0.15 \
    --max_steps 140000 > output/ll2048_r5_train.log 2>&1 || true
  tail -3 output/ll2048_r5_train.log
  mkdir -p results/ll2048_l8s16_r5
  timeout 700 python -m hdrnet_tpu.bin.evaluate output/ll2048_l8s16_r5 \
    data_ll/test --json results/ll2048_l8s16_r5/eval_test.json || true
  cp output/ll2048_l8s16_r5/config.json \
    output/ll2048_l8s16_r5/summaries.jsonl \
    results/ll2048_l8s16_r5/ 2>/dev/null || true
fi
if [ ! -f results/guide_stats_l8s16_r5.json ] && [ "$(left)" -gt 2600 ] \
    && [ -f results/ll2048_l8s16_r5/eval_test.json ] && wait_tunnel; then
  timeout 500 python scripts/guide_stats.py output/ll2048_l8s16_r5 \
    data_ll/test --json results/guide_stats_l8s16_r5.json || true
fi

# ---- 7. st stretch: third trained family on the synthesized 2-style
#         dataset (VERDICT #8); 30k annealed, 6-channel conditioning
if [ ! -f results/st_curves_r5/eval_test.json ] && [ "$(left)" -gt 6000 ] && wait_tunnel; then
  timeout -s INT 3000 python -m hdrnet_tpu.bin.train \
    output/st_curves_r5 data_st/train \
    --eval_data_dir data_st/test --data_pipeline StyleTransferDataPipeline \
    --batch_size 16 --output_resolution 256 256 \
    --model_name StyleTransferCurves --nobatch_norm \
    --channel_multiplier 2 --cache_images --device_normalize \
    --device_data --fliplr --norandom_crop \
    --learning_rate 1e-4 --lr_schedule cosine --lr_end 1e-6 \
    --lr_warmup_steps 500 --guide_lr_scale 0.5 \
    --max_steps 30000 > output/st_train_r5.log 2>&1 || true
  tail -3 output/st_train_r5.log
  mkdir -p results/st_curves_r5
  timeout 600 python -m hdrnet_tpu.bin.evaluate output/st_curves_r5 \
    data_st/test --json results/st_curves_r5/eval_test.json || true
  cp output/st_curves_r5/config.json output/st_curves_r5/summaries.jsonl \
    results/st_curves_r5/ 2>/dev/null || true
fi

# ---- 8. final bench re-warm so the driver's BENCH_r05 capture is warm
#         (ops/downsample.py changed since the round-4 warm; and if the
#         maxfma default flips after leg 2, this warms the new kernel)
if [ "$(left)" -gt 400 ] && wait_tunnel; then
  timeout $(( $(left) > 2000 ? 1900 : $(left) - 60 )) \
    python bench.py > results/bench_round5_check.json \
    2> results/bench_round5_check_stages.txt || true
  cat results/bench_round5_check.json
fi

echo "ROUND5_QUEUE3_DONE $(date -u +%H:%M:%S) left=$(left)"
