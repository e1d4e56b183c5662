#!/bin/bash
# Post-queue consolidation: copy round-3 quality artifacts into
# results/, write the quality summary JSON, measure per-model runtimes,
# and build the quality-vs-runtime figure (the reference's
# compare_to_unet figure). Ordered so the device-independent artifacts
# land even if the on-device runtime measurement fails (tunnel).
set -xe
cd "$(dirname "$0")/.."

for run in ll2048_l16s32 ll2048_l8s16_g05 ll1024_unet_d9_w32 \
           ll1024_dilated_d3_w64 ll_gpyrnn_g05 ll1024_l16s32_b4; do
  if [ -d "output/$run" ]; then
    mkdir -p "results/$run"
    cp -f "output/$run"/eval_test.json "results/$run/" 2>/dev/null || true
    cp -f "output/$run"/oracle_test.json "results/$run/" 2>/dev/null || true
    cp -f "output/$run"/config.json "results/$run/" 2>/dev/null || true
    cp -f "output/$run"/summaries.jsonl "results/$run/" 2>/dev/null || true
  fi
done

# --- 1. quality summary from whatever evals exist (CPU-only)
python - <<'EOF'
import json, os
rows = []
for run, label in [
    ('ll2048_l16s32', 'HDRNetCurves l16/s32 @2048'),
    ('ll1024_l16s32_b4', 'HDRNetCurves l16/s32 @1024 b4'),
    ('ll2048_l8s16_g05', 'HDRNetCurves l8/s16 @2048 (guide-lr 0.5)'),
    ('results/ll2048_l8s16_cos', 'HDRNetCurves l8/s16 @2048 (round 2)'),
    ('ll1024_unet_d9_w32', 'UNet d9/w32 @1024'),
    ('ll1024_dilated_d3_w64', 'Dilated d3/w64 @1024'),
    ('results/ll_gpyrnn_cos', 'GaussianPyrNN @1024 (round 2)'),
    ('ll_gpyrnn_g05', 'GaussianPyrNN @1024 (guide-lr 0.5)'),
]:
  p = run if run.startswith('results/') else f'results/{run}'
  f = os.path.join(p, 'eval_test.json')
  if os.path.exists(f):
    rec = json.load(open(f))
    rows.append((label, rec['mean_psnr_db'], rec.get('step')))
print(f'{"run":48s} {"PSNR dB":>8s} {"step":>8s}')
for label, p, s in rows:
  print(f'{label:48s} {p:8.2f} {s or 0:8d}')
json.dump({l: {'psnr_db': p, 'step': s} for l, p, s in rows},
          open('results/round3_quality.json', 'w'), indent=2)
EOF

# --- 1b. serving-path quality parity on the flagship checkpoint:
#   eval PSNR through the fused serving kernel must match the training
#   graph; plus the bf16-backbone A/B (opt-in fast path).
if [ -d output/ll2048_l16s32 ]; then
  python -m hdrnet_tpu.bin.evaluate output/ll2048_l16s32 data_ll2048/test \
    --serving --json results/ll2048_l16s32/eval_serving.json || true
  python -m hdrnet_tpu.bin.evaluate output/ll2048_l16s32 data_ll2048/test \
    --serving --coeff_bf16 \
    --json results/ll2048_l16s32/eval_serving_bf16.json || true
fi

# --- 2. per-model runtimes (on-device; may fail if the tunnel is down)
python scripts/bench_models.py --res 2048 2048 --iters 50 \
  --models HDRNetCurves HDRNetCurves:luma_bins=16:spatial_bin=32 \
           HDRNetGaussianPyrNN UNet:9:32 DilatedConvolutions:3:64 \
  --out results/model_runtimes_2048.json || true

# --- 2b. bf16-backbone speed A/B (same method, curves models only)
python scripts/bench_models.py --res 2048 2048 --iters 50 --coeff_bf16 \
  --models HDRNetCurves HDRNetCurves:luma_bins=16:spatial_bin=32 \
  --out results/model_runtimes_2048_bf16.json || true

# --- 3. figure: framework points (PSNR from evals, runtime from step 2)
python - <<'EOF'
import json, os
if not os.path.exists('results/model_runtimes_2048.json'):
  print('no runtimes (tunnel?) — figure skipped'); raise SystemExit
rt = json.load(open('results/model_runtimes_2048.json'))
q = json.load(open('results/round3_quality.json'))
args = ['results/compare_baselines.png']
def ms(spec):
  return rt.get(spec, {}).get('ms')
pts = []
def add(label_key, spec):
  for l, rec in q.items():
    if label_key in l and rec['psnr_db']:
      m = ms(spec)
      if m:
        pts.append(f"{l.replace(':', ' ')}:{rec['psnr_db']:.2f}:{m}")
      break
add('l16/s32', 'HDRNetCurves:luma_bins=16:spatial_bin=32')
add('l8/s16 @2048 (guide-lr', 'HDRNetCurves')
add('UNet', 'UNet:9:32')
add('Dilated', 'DilatedConvolutions:3:64')
add('GaussianPyrNN', 'HDRNetGaussianPyrNN')
if not pts:
  print('no joinable points — figure skipped'); raise SystemExit
for p in pts:
  args += ['--point', p]
from hdrnet_tpu.bin import compare_baselines
compare_baselines.main(args)
print('figure written with %d points' % len(pts))
EOF
echo CONSOLIDATE_DONE
