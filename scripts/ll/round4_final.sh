#!/bin/bash
# Round-4 FINAL chip tail — takes over from queue v4 (whose bash was
# stopped; only its pyramid train leg still runs). Driver BENCH_r04
# lands right after the round ends, so the chip MUST be free and the
# bench compile cache warm (the px-bf16 downsample fix f02e576 changed
# the serving HLO after the last bench run) by HARD_END.
#
#   1. SIGINT the pyramid train at CUT_AT (loop checkpoints on INT)
#   2. eval the pyramid checkpoint          (VERDICT item 3)
#   3. bench.py final — validates the bf16 slab kernel on real v5e and
#      re-warms output/jax_cache_bench      (VERDICT items 1 + 6)
#   4. usm retrain on the device-resident synthetic pipeline
#      (66a7758 landed AFTER the failed 00:23 leg) + eval
#                                            (VERDICT item 5)
#   5. pyramid per-level guide diagnosis     (VERDICT item 3 "healthy")
#   6. consolidate (CPU)
set -x
cd "$(dirname "$0")/../.."

TRAIN_PID=${TRAIN_PID:-18169}
CUT_AT=${CUT_AT:?set CUT_AT epoch}
HARD_END=${HARD_END:?set HARD_END epoch}
left() { echo $(( HARD_END - $(date +%s) )); }

# ---- 1. cut the pyramid train so the cosine tail stops cleanly
while [ "$(date +%s)" -lt "$CUT_AT" ] && kill -0 "$TRAIN_PID" 2>/dev/null; do
  sleep 10
done
if kill -0 "$TRAIN_PID" 2>/dev/null; then
  kill -INT "$TRAIN_PID"
  for i in $(seq 1 30); do
    kill -0 "$TRAIN_PID" 2>/dev/null || break
    sleep 10
  done
  kill -0 "$TRAIN_PID" 2>/dev/null && kill -9 "$TRAIN_PID"
fi
sleep 5

# ---- 2. pyramid eval
if [ ! -f output/ll_gpyrnn_g05/eval_test.json ] && [ "$(left)" -gt 3100 ]; then
  timeout 600 python -m hdrnet_tpu.bin.evaluate output/ll_gpyrnn_g05 \
    data_ll/test --json output/ll_gpyrnn_g05/eval_test.json || true
fi

# ---- 3. final bench (also the on-chip gate for the bf16 slab kernel)
if [ ! -s results/bench_round4_final.json ] && [ "$(left)" -gt 2500 ]; then
  timeout 1500 python bench.py > results/bench_round4_final.json \
    2> results/bench_round4_final_stages.txt || true
  tail -12 results/bench_round4_final_stages.txt
  grep -q '"metric"' results/bench_round4_final.json \
    || echo BENCH_FINAL_FAILED > /tmp/bench_failed.flag
fi

# ---- 4. usm retrain (device-resident synthesis; plain curves ~20 st/s)
if [ ! -f output/usm_l8s16_v2/eval_test.json ] && [ "$(left)" -gt 1500 ] \
    && [ ! -f /tmp/bench_failed.flag ]; then
  CAP=$(( $(left) - 1150 )); [ "$CAP" -gt 1250 ] && CAP=1250
  timeout -s INT "$CAP" python -m hdrnet_tpu.bin.train \
    output/usm_l8s16_v2 data_ll/train \
    --eval_data_dir data_ll/test --batch_size 4 \
    --output_resolution 1024 1024 --fliplr --flipud --rotate \
    --norandom_crop --cache_images --device_normalize --device_data \
    --learning_rate 1e-4 --lr_schedule cosine --lr_end 1e-6 \
    --lr_warmup_steps 500 \
    --data_pipeline UnsharpMaskDataPipeline \
    --blur_sigma 8.0 --sharpen 3.0 --guide_lr_scale 0.5 \
    --max_steps 15000 > output/usm_train_v2.log 2>&1 || true
  tail -3 output/usm_train_v2.log
  timeout 500 python -m hdrnet_tpu.bin.evaluate output/usm_l8s16_v2 \
    data_usm/test --json output/usm_l8s16_v2/eval_test.json || true
fi

# ---- 5. pyramid per-level diagnosis
if [ ! -f results/pyramid_diagnosis_retrained.json ] \
    && [ "$(left)" -gt 560 ]; then
  timeout 500 python scripts/diagnose_pyramid.py output/ll_gpyrnn_g05 \
    data_ll/test --json results/pyramid_diagnosis_retrained.json || true
fi

# ---- 6. consolidate (CPU only)
bash scripts/consolidate_round4.sh > output/consolidate4.log 2>&1 || true
tail -30 output/consolidate4.log
echo ROUND4_FINAL_DONE
