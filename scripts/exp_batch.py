#!/usr/bin/env python
"""Batch-4 vs single-frame serving regression probe (round 4).

Round 3's bench recorded 4K batched throughput (341 fps) BELOW
single-stream (380 fps), inverting rounds 1-2. This measures each
serving stage at b=1 and b=4 with identical chained-timing methodology
to localize the regression: fused kernel alone, e2e without downsample,
full process (incl. downsample), plus the XLA-side grid-window
extraction that the fused path runs per call.

python scripts/exp_batch.py | tee results/exp_batch_r4.txt
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax
import jax.numpy as jnp
import numpy as np

cache = os.path.join(os.path.dirname(__file__), '..', 'output',
                     'jax_cache_bench')
os.makedirs(cache, exist_ok=True)
jax.config.update('jax_compilation_cache_dir', cache)

from hdrnet_tpu.config import ModelConfig
from hdrnet_tpu.inference import Enhancer
from hdrnet_tpu.models import make_model
from hdrnet_tpu.ops import bilateral_slice_apply

H, W = 2160, 3840


def timed_feedback(fn, n, x0, *args, repeats=3):
  @jax.jit
  def chain(x, *a):
    for _ in range(n):
      x = fn(x, *a)
    return x.reshape(-1)[0]
  t0 = time.time()
  float(chain(x0, *args))
  comp = time.time() - t0
  ts = []
  for _ in range(repeats):
    t0 = time.time()
    float(chain(x0, *args))
    ts.append((time.time() - t0) / n)
  return sorted(ts)[len(ts) // 2], comp


def main():
  rng = np.random.RandomState(0)
  cfg = ModelConfig(model_name='HDRNetCurves')
  model = make_model(cfg)
  lowres = jnp.asarray(rng.rand(1, 256, 256, 3), np.float32)
  full1 = jnp.asarray(rng.rand(1, H, W, 3), np.float32)
  variables = model.init(jax.random.PRNGKey(0), lowres, full1)
  enh = Enhancer(config=cfg, variables=variables)
  process = enh._process_fn()

  full4 = jnp.asarray(rng.rand(4, H, W, 3), np.float32)
  low4 = jnp.asarray(rng.rand(4, 256, 256, 3), np.float32)
  grid1 = jnp.asarray(rng.randn(1, 16, 16, 8, 3, 4) * .05, np.float32)
  grid4 = jnp.asarray(rng.randn(4, 16, 16, 8, 3, 4) * .05, np.float32)
  guide1 = jnp.asarray(rng.rand(1, H, W), np.float32)
  guide4 = jnp.asarray(rng.rand(4, H, W), np.float32)

  rows = []
  def rec(name, bt, t, comp):
    per = t / bt
    rows.append((name, bt, per))
    print(f'{name:28s} b{bt}: {per*1e3:7.3f} ms/frame '
          f'({1/per:6.1f} fps) compile {comp:.0f}s', flush=True)

  for bt, full, low, grid, guide in ((1, full1, lowres, grid1, guide1),
                                     (4, full4, low4, grid4, guide4)):
    n = 100 if bt == 1 else 50
    t, c = timed_feedback(
        lambda f, g, gu: bilateral_slice_apply(g, gu, f), n, full, grid,
        guide)
    rec('kernel alone', bt, t, c)
    t, c = timed_feedback(lambda f, l: enh._forward(l, f, clip=True), n,
                          full, low)
    rec('e2e w/o downsample', bt, t, c)
    t, c = timed_feedback(lambda f: process(f, clip=True), n, full)
    rec('process incl downsample', bt, t, c)

  print()
  per = {(r[0], r[1]): r[2] for r in rows}
  for name in ('kernel alone', 'e2e w/o downsample',
               'process incl downsample'):
    b1, b4 = per[(name, 1)], per[(name, 4)]
    print(f'{name:28s} b4/b1 per-frame ratio: {b4/b1:5.3f}')


if __name__ == '__main__':
  main()
