#!/bin/bash
# Round-3 (restarted session) chip queue. The previous round-3 session's
# endgame used clock-adaptive budgets tuned for an end-of-day window; the
# driver restarted round 3 with a fresh ~12 h window (start ~01:00 UTC),
# so this queue re-plans with a hard training DEADLINE and per-leg
# skip/shrink gates based on measured step rates:
#   dilated d3/w64 @1024 b1  ~7.7 st/s   (resume 26094 -> 40k, ~30 min)
#   UNet    d9/w32 @1024 b1  ~8 st/s     (40k, ~85 min)
#   gpyrnn  @1024 b4         ~8.2 st/s   (guide-lr retrain, sized to clock)
#   curves l16/s32 @1024 b4  ~26 st/s    (long run, sized to clock)
# Runs unattended (setsid) so it survives session loss; every leg
# re-checks tunnel liveness and the deadline before starting.
set -x
cd "$(dirname "$0")/../.."

DEADLINE=$(date -u -d 'today 11:20' +%s)   # stop training by 11:20 UTC
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

# ---- 1. validate the row-gather preview-downsample kernel on-chip
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

# ---- 2. clean bench on the idle chip with the validated variant
wait_tunnel
HDRNET_TPU_DS_VARIANT=$DS_VARIANT timeout 3600 python bench.py \
  > results/bench_round3_final.json \
  2> results/bench_round3_final_stages.txt || true
cat results/bench_round3_final_stages.txt results/bench_round3_final.json

# ---- 3. Dilated: resume 26094 -> 40k (judge figure point; ~30 min)
wait_tunnel
if [ "$(mins_left)" -ge 45 ]; then
  timeout 4500 python -m hdrnet_tpu.bin.train \
    output/ll1024_dilated_d3_w64 data_ll/train \
    $COMMON1024B1 --model_name DilatedConvolutions --depth 3 --width 64 \
    --max_steps 40000 || true
fi
timeout 2400 python -m hdrnet_tpu.bin.evaluate \
  output/ll1024_dilated_d3_w64 data_ll/test \
  --json output/ll1024_dilated_d3_w64/eval_test.json || true

# ---- 4. UNet d9/w32 baseline (judge figure point; ~85 min at 40k)
wait_tunnel
M=$(mins_left)
if   [ "$M" -ge 330 ]; then USTEPS=40000
elif [ "$M" -ge 200 ]; then USTEPS=25000
elif [ "$M" -ge 120 ]; then USTEPS=12000
else USTEPS=0; fi
if [ "$USTEPS" -gt 0 ]; then
  rm -rf output/ll1024_unet_d9_w32   # crashed step-0 dir from the outage
  timeout 9000 python -m hdrnet_tpu.bin.train \
    output/ll1024_unet_d9_w32 data_ll/train \
    $COMMON1024B1 --model_name UNet --depth 9 --width 32 \
    --max_steps "$USTEPS" || true
  timeout 2400 python -m hdrnet_tpu.bin.evaluate \
    output/ll1024_unet_d9_w32 data_ll/test \
    --json output/ll1024_unet_d9_w32/eval_test.json || true
fi

# ---- 5. pyramid retrain with the guide-lr lever (proves the round-3
#         scale-dependent-collapse diagnosis; round-2 baseline 28.40@60k)
wait_tunnel
M=$(mins_left)
if   [ "$M" -ge 260 ]; then PSTEPS=80000
elif [ "$M" -ge 200 ]; then PSTEPS=60000
elif [ "$M" -ge 140 ]; then PSTEPS=40000
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

# ---- 6. l16/s32 batch-4 long run (remaining lever toward the oracle)
wait_tunnel
M=$(mins_left)
if   [ "$M" -ge 120 ]; then LSTEPS=120000
elif [ "$M" -ge 80 ]; then LSTEPS=80000
elif [ "$M" -ge 45 ]; then LSTEPS=40000
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

# ---- 7. consolidate: quality json + on-device runtimes + figure
wait_tunnel
bash scripts/consolidate_round3.sh > output/consolidate.log 2>&1 || true
tail -20 output/consolidate.log
echo QUEUE3B_DONE
