#!/usr/bin/env python
"""Per-model serving runtime at a given resolution (figure input).

Times each model's serving path (fused where available, composite
otherwise) with the same chained-iteration method as bench.py, and
writes {model: ms_per_frame} JSON for bin/compare_baselines.py.

  python scripts/bench_models.py --out runtimes.json \
      --models HDRNetCurves UNet:9:32 DilatedConvolutions:3:64
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
  p = argparse.ArgumentParser()
  p.add_argument('--res', type=int, nargs=2, default=[2048, 2048])
  p.add_argument('--iters', type=int, default=50)
  p.add_argument('--models', nargs='+',
                 default=['HDRNetCurves', 'HDRNetGaussianPyrNN',
                          'UNet:9:32', 'DilatedConvolutions:3:64'])
  p.add_argument('--out', type=str, default=None)
  p.add_argument('--coeff_bf16', action='store_true',
                 help='run the coefficient backbone in bfloat16 '
                      '(serving A/B for the opt-in fast path)')
  args = p.parse_args()

  import jax
  import jax.numpy as jnp
  from hdrnet_tpu.config import ModelConfig
  from hdrnet_tpu.models import make_model
  from hdrnet_tpu.inference import Enhancer

  h, w = args.res
  rng = np.random.RandomState(0)
  full = jnp.asarray(rng.rand(1, h, w, 3), np.float32)
  lowres = jnp.asarray(rng.rand(1, 256, 256, 3), np.float32)
  n = args.iters
  results = {}

  for spec in args.models:
    # Spec grammar: Name[:depth[:width]] for the baselines, plus
    # key=val overrides for any ModelConfig field, e.g.
    #   HDRNetCurves:luma_bins=16:spatial_bin=32
    parts = spec.split(':')
    name = parts[0]
    kw = {}
    pos = ('depth', 'width')
    for i, part in enumerate(parts[1:]):
      if '=' in part:
        k, v = part.split('=', 1)
        kw[k] = int(v) if v.lstrip('-').isdigit() else v
      else:
        kw[pos[i]] = int(part)
    cfg = ModelConfig(model_name=name, **kw)
    model = make_model(cfg)
    # jit the init: eager per-op dispatch through the tunnel takes
    # minutes for the deeper models.
    variables = jax.jit(lambda k: model.init(k, lowres, full,
                                             train=True))(
        jax.random.PRNGKey(0))
    enh = Enhancer(config=cfg, variables=variables,
                   coeff_bf16=args.coeff_bf16)

    def step(f):
      return enh._forward(lowres, f, clip=True)

    @jax.jit
    def chain(x):
      for _ in range(n):
        x = step(x)
      return x.reshape(-1)[0]

    t0 = time.time(); float(chain(full)); comp = time.time() - t0
    ts = []
    for _ in range(3):
      t0 = time.time(); float(chain(full)); ts.append(time.time() - t0)
    ms = sorted(ts)[1] / n * 1e3
    path = 'fused' if enh.use_fused else 'composite'
    print(f'{spec:32s} {ms:8.3f} ms/frame @{h}x{w} [{path}] '
          f'(compile {comp:.0f}s)', flush=True)
    results[spec] = {'ms': round(ms, 3), 'path': path,
                     'res': [h, w]}

  if args.out:
    with open(args.out, 'w') as f:
      json.dump(results, f, indent=2)


if __name__ == '__main__':
  main()
