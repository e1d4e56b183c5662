#!/usr/bin/env python
"""Fused-kernel tuning harness (not part of the test suite).

Times `enhance_fused` (the serving hot path) at a given resolution
across tile-shape overrides, to pick `_choose_tile` candidates with
measurements rather than folklore. Chained-iteration timing (same
method as bench.py) so tunnel latency doesn't pollute the numbers.

  python scripts/kernel_tuning.py --res 2160 3840 --iters 20
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
  p = argparse.ArgumentParser()
  p.add_argument('--res', type=int, nargs=2, default=[2160, 3840])
  p.add_argument('--iters', type=int, default=20)
  p.add_argument('--repeats', type=int, default=3)
  p.add_argument('--tiles', type=str, default=None,
                 help='semicolon list of THxTW overrides, e.g. '
                      '"64x128;128x256;default"')
  p.add_argument('--variants', type=str, default=None,
                 help='semicolon list of accumulation variants '
                      '(chain;split2), timed at the default tile')
  p.add_argument('--strips', type=str, default='0',
                 help='semicolon list of strip-loop row counts '
                      '(0 = straight-line kernel)')
  p.add_argument('--compute_dtype', type=str, default='float32',
                 help='float32 | bfloat16 (forward contraction dtype)')
  args = p.parse_args()

  import jax
  import jax.numpy as jnp
  from hdrnet_tpu.ops import pallas as pk

  h, w = args.res
  rng = np.random.RandomState(0)
  grid = jnp.asarray(rng.randn(1, 16, 16, 8, 12) * 0.05, np.float32)
  img_cf = jnp.asarray(rng.rand(1, 3, h, w), np.float32)
  ccm = jnp.asarray(rng.randn(4, 3) * 0.3, np.float32)
  curves = jnp.asarray(rng.rand(6, 16), np.float32)
  mix = jnp.asarray(rng.rand(4, 1), np.float32)
  gparams = (ccm, curves, mix)

  if args.tiles:
    combos = []
    for spec in args.tiles.split(';'):
      if spec == 'default':
        combos.append(None)
      else:
        th, tw = spec.split('x')
        combos.append((int(th), int(tw)))
  else:
    combos = [None, (8, 128), (32, 128), (64, 128), (128, 128),
              (64, 256), (128, 256), (32, 512), (64, 512), (128, 512),
              (256, 512)]

  n = args.iters
  variants = (args.variants.split(';') if args.variants
              else [pk._ACCUM_VARIANT])
  strips = [int(s) for s in args.strips.split(';')]
  for variant in variants:
   pk._ACCUM_VARIANT = variant
   if len(variants) > 1:
     print(f'-- variant {variant}')
   for strip in strips:
    if len(strips) > 1:
      print(f'-- strip {strip}')
    for combo in combos:
     pk._TILE_OVERRIDE = combo
     try:
      plans = pk.plan_tiles(h, w, 16, 16)
      if plans is None:
        print(f'{combo}: infeasible')
        continue
      yp, xp = plans
      desc = (f'tile=({yp.tile:4d},{xp.tile:4d}) nc=({yp.n_cells},'
              f'{xp.n_cells}) tiles={yp.n_tiles * xp.n_tiles:5d}')

      @jax.jit
      def chain(x):
        for _ in range(n):
          x = pk.enhance_fused(grid, x, gparams, 'curves', 3, 3, True,
                               clip_output=True, strip=strip,
                               compute_dtype=args.compute_dtype)
        return x.reshape(-1)[0]

      t0 = time.time()
      float(chain(img_cf))
      compile_s = time.time() - t0
      ts = []
      for _ in range(args.repeats):
        t0 = time.time()
        float(chain(img_cf))
        ts.append((time.time() - t0) / n)
      ms = sorted(ts)[len(ts) // 2] * 1e3
      gpix = h * w / (ms * 1e-3) / 1e9
      print(f'{desc}  {ms:7.3f} ms  {gpix:5.2f} GPix/s  '
            f'(compile {compile_s:.0f}s)')
     except Exception as e:  # noqa: BLE001 - tuning harness, keep going
      print(f'{combo}: FAILED {type(e).__name__}: {str(e)[:300]}')
     finally:
      pk._TILE_OVERRIDE = None


if __name__ == '__main__':
  main()
