#!/bin/bash
# Deployment benchmark sweep (reference: scripts/benchmark.sh, which
# froze graphs and ran the C++/GL benchmark binary). TPU equivalent:
# StableHLO export + the native PJRT serving driver.
set -e
chkpts=${1:-output/checkpoints}
out=${2:-output/bench}
mkdir -p "$out"
for ckpt in "$chkpts"/*/; do
  name=$(basename "$ckpt")
  [ -f "$ckpt/config.json" ] || continue
  echo "== $name"
  python -m hdrnet_tpu.bin.export "$ckpt" --fullres 2160 3840
  ./hdrnet_tpu/native/pjrt_serve "$ckpt/serve_fn.mlir" \
      --iters 100 --burn 3 --report "$out/$name.json" \
      || ./hdrnet_tpu/native/pjrt_serve "$ckpt/enhance_fn.mlir" \
      --iters 100 --burn 3 --report "$out/$name.json"
done
