#!/bin/bash
# Round-4 consolidation: quality summary (same-data @1024 cohort +
# carried @2048 cohort), usm workload artifacts, per-model runtimes at
# 2048 and 1024, and the quality-vs-runtime figure (the reference's
# compare_to_unet.py figure, scripts/extra_figures/compare_to_unet.py).
set -x
cd "$(dirname "$0")/.."

for run in ll_gpyrnn_g05 ll1024_unet_d9_w32 ll1024_dilated_d3_w64 \
           usm_l8s16_v2; do
  if [ -d "output/$run" ]; then
    mkdir -p "results/$run"
    for f in eval_test.json oracle_test.json config.json summaries.jsonl; do
      cp -f "output/$run/$f" "results/$run/" 2>/dev/null || true
    done
  fi
done

# --- 1. quality summary (CPU-only; merges committed round-3 rows)
python - <<'EOF'
import json, os

def ev(path):
  f = os.path.join(path, 'eval_test.json')
  return json.load(open(f)) if os.path.exists(f) else None

rows = {}
# @1024 same-data cohort (held-out data_ll/test at 1024^2)
for run, label in [
    ('results/ll_l8s16_cos', 'HDRNetCurves l8/s16 @1024 (round 2)'),
    ('results/ll_gpyrnn_cos', 'GaussianPyrNN @1024 (round 2)'),
    ('results/ll_gpyrnn_g05', 'GaussianPyrNN @1024 (guide-lr 0.5)'),
    ('results/ll1024_unet_d9_w32', 'UNet d9/w32 @1024'),
    ('results/ll1024_dilated_d3_w64', 'Dilated d3/w64 @1024'),
]:
  rec = ev(run)
  if rec:
    rows[label] = {'psnr_db': rec['mean_psnr_db'], 'step': rec.get('step'),
                   'cohort': '1024'}
# @2048 cohort (committed round-3 evals)
for run, label in [
    ('results/ll2048_l16s32', 'HDRNetCurves l16/s32 @2048'),
    ('results/ll2048_l8s16_g05', 'HDRNetCurves l8/s16 @2048 (guide-lr 0.5)'),
    ('results/ll2048_l8s16_cos', 'HDRNetCurves l8/s16 @2048 (round 2)'),
]:
  rec = ev(run)
  if rec:
    rows[label] = {'psnr_db': rec['mean_psnr_db'], 'step': rec.get('step'),
                   'cohort': '2048'}
print(f'{"run":48s} {"PSNR dB":>8s} {"step":>8s}')
for l, r in rows.items():
  print(f'{l:48s} {r["psnr_db"]:8.2f} {r["step"] or 0:8d}')
json.dump(rows, open('results/round4_quality.json', 'w'), indent=2)
EOF

# --- 1b. usm workload summary (verdict item 5: second family evidence)
python - <<'EOF'
import json, os, re
out = {}
f = 'results/usm_l8s16_v2/eval_test.json'
if os.path.exists(f):
  rec = json.load(open(f))
  out['usm HDRNetCurves l8/s16 @1024'] = {
      'psnr_db': rec['mean_psnr_db'], 'step': rec.get('step')}
if os.path.exists('results/usm_identity.txt'):
  m = re.search(r'mean identity PSNR ([\d.]+) dB',
                open('results/usm_identity.txt').read())
  if m:
    out['identity'] = {'psnr_db': float(m.group(1))}
if os.path.exists('results/usm_oracle_test.json'):
  rec = json.load(open('results/usm_oracle_test.json'))
  out['per-image oracle (grid fit)'] = {
      'psnr_db': rec['mean_oracle_psnr'], 'n_images': rec['n_images']}
if out:
  json.dump(out, open('results/usm_quality.json', 'w'), indent=2)
  print(json.dumps(out, indent=2))
EOF

# --- 2. per-model runtimes (on-device; skipped unless RUN_RUNTIMES=1 —
# the end-of-round tail cannot afford a 20-min device leg here)
if [ "${RUN_RUNTIMES:-0}" = 1 ] && [ ! -f results/model_runtimes_2048.json ]; then
  python scripts/bench_models.py --res 2048 2048 --iters 50 \
    --models HDRNetCurves HDRNetCurves:luma_bins=16:spatial_bin=32 \
             HDRNetGaussianPyrNN UNet:9:32 DilatedConvolutions:3:64 \
    --out results/model_runtimes_2048.json || true
fi
if [ "${RUN_RUNTIMES:-0}" = 1 ] && [ ! -f results/model_runtimes_1024.json ]; then
  python scripts/bench_models.py --res 1024 1024 --iters 50 \
    --models HDRNetCurves HDRNetGaussianPyrNN UNet:9:32 \
             DilatedConvolutions:3:64 \
    --out results/model_runtimes_1024.json || true
fi

# --- 3. figure: same-data @1024 PSNR vs @1024 serving runtime
python - <<'EOF'
import json, os
need = ['results/model_runtimes_1024.json', 'results/round4_quality.json']
if not all(os.path.exists(p) for p in need):
  print('missing inputs — figure skipped'); raise SystemExit
rt = json.load(open('results/model_runtimes_1024.json'))
q = json.load(open('results/round4_quality.json'))
def ms(spec):
  rec = rt.get(spec)
  return rec['ms'] if isinstance(rec, dict) else rec
pairs = [
    ('HDRNetCurves l8/s16 @1024 (round 2)', 'HDRNetCurves'),
    ('GaussianPyrNN @1024 (guide-lr 0.5)', 'HDRNetGaussianPyrNN'),
    ('UNet d9/w32 @1024', 'UNet:9:32'),
    ('Dilated d3/w64 @1024', 'DilatedConvolutions:3:64'),
]
args = ['results/compare_baselines.png']
for label, spec in pairs:
  if label in q and ms(spec):
    args += ['--point', f"{label.replace(':', ' ')}:"
                        f"{q[label]['psnr_db']:.2f}:{ms(spec)}"]
if len(args) < 3:
  print('no joinable points — figure skipped'); raise SystemExit
from hdrnet_tpu.bin import compare_baselines
compare_baselines.main(args)
print('figure written:', (len(args) - 1) // 2, 'points')
EOF
echo CONSOLIDATE4_DONE
