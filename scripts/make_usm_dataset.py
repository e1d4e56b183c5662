#!/usr/bin/env python
"""Materialize an unsharp-mask test set from existing input images.

The usm workload (reference scripts/usm/*.sh) synthesizes its target
on the fly during training (UnsharpMaskDataPipeline, data/pipeline.py);
for the held-out bracket artifacts (identity PSNR, per-image oracle via
bin/fit_grid) we need a materialized filelist/input/output layout.
This writes targets with EXACTLY the pipeline's math (same
native.gaussian_blur, same clip) so evaluate-on-the-fly and
evaluate-on-files agree bit-for-bit.

  python scripts/make_usm_dataset.py data_ll/test data_usm/test \
      --blur_sigma 4.0 --sharpen 1.0
"""

import argparse
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
  p = argparse.ArgumentParser(description=__doc__)
  p.add_argument('src', help='source dir (filelist.txt + input/)')
  p.add_argument('out')
  p.add_argument('--blur_sigma', type=float, default=4.0)
  p.add_argument('--sharpen', type=float, default=1.0)
  args = p.parse_args(argv)

  from hdrnet_tpu import native
  from hdrnet_tpu.data import images

  with open(os.path.join(args.src, 'filelist.txt')) as f:
    names = [l.strip() for l in f if l.strip()]
  os.makedirs(os.path.join(args.out, 'input'), exist_ok=True)
  os.makedirs(os.path.join(args.out, 'output'), exist_ok=True)
  psnrs = []
  for n in names:
    src = os.path.join(args.src, 'input', n)
    inp = images.imread_float(src)
    blurred = native.gaussian_blur(inp, args.blur_sigma)
    target = np.clip(inp + args.sharpen * (inp - blurred), 0.0, 1.0)
    shutil.copyfile(src, os.path.join(args.out, 'input', n))
    images.imwrite(os.path.join(args.out, 'output', n), target)
    mse = float(np.mean((inp - target) ** 2))
    psnrs.append(-10.0 * np.log10(max(mse, 1e-12)))
    print(f'{n}: identity {psnrs[-1]:.2f} dB', flush=True)
  with open(os.path.join(args.out, 'filelist.txt'), 'w') as f:
    f.write('\n'.join(names) + '\n')
  print(f'mean identity PSNR {np.mean(psnrs):.2f} dB over {len(names)}')


if __name__ == '__main__':
  main()
