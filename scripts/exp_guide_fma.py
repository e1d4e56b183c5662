#!/usr/bin/env python
"""Measured prototype for the maxfma curves-guide rewrite (round 4).

VERDICT r3 item 10: the in-kernel curves guide is ~160 of ~390 VPU
ops/pixel on the fused serving path; the 'maxfma' variant (see
ops/pallas.py _CURVES_IMPLS) folds the knot constants and the channel
mix out of the per-pixel work, cutting per-knot plane ops from 4 to
2-3. This times the fused serving forward at 4K b1 under both
implementations with the bench methodology (chained on-device feedback,
median of repeats) and prints the verdict. Default stays 'relu' unless
this shows a real win.

  python scripts/exp_guide_fma.py | tee results/exp_guide_fma.txt
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
from hdrnet_tpu.ops import pallas as pk

H, W = 2160, 3840


def timed(fn, n, x0, repeats=5):
  @jax.jit
  def chain(x):
    for _ in range(n):
      x = fn(x)
    return x.reshape(-1)[0]
  t0 = time.time()
  float(chain(x0))
  comp = time.time() - t0
  ts = []
  for _ in range(repeats):
    t0 = time.time()
    float(chain(x0))
    ts.append((time.time() - t0) / n)
  return sorted(ts)[len(ts) // 2], comp


def main():
  rng = np.random.RandomState(0)
  cfg = ModelConfig(model_name='HDRNetCurves')
  model = make_model(cfg)
  lowres = jnp.asarray(rng.rand(1, 256, 256, 3), np.float32)
  full = jnp.asarray(rng.rand(1, H, W, 3), np.float32)
  variables = model.init(jax.random.PRNGKey(0), lowres, full)
  enh = Enhancer(config=cfg, variables=variables)

  print('device:', jax.devices()[0].device_kind, flush=True)
  results = {}
  outs = {}
  for impl in ('relu', 'maxfma'):
    os.environ['HDRNET_TPU_CURVES_IMPL'] = impl
    assert pk.default_curves_impl() == impl
    # Re-trace per impl: the env var is read at trace time.
    fn = lambda f: enh._forward(lowres, f, clip=True)
    t, comp = timed(fn, 100, full)
    outs[impl] = np.asarray(jax.jit(fn)(full))
    results[impl] = t
    print(f'{impl:8s}: e2e 4K w/o downsample {t*1e3:7.3f} ms/frame '
          f'({1/t:6.1f} fps) compile {comp:.0f}s', flush=True)
  del os.environ['HDRNET_TPU_CURVES_IMPL']

  diff = float(np.max(np.abs(outs['relu'] - outs['maxfma'])))
  speedup = results['relu'] / results['maxfma']
  print(f'on-chip max|relu - maxfma| = {diff:.2e}')
  print(f'maxfma speedup on fused e2e: {speedup:.3f}x')
  print('VERDICT:', 'flip default' if speedup > 1.03 and diff < 1e-4
        else 'keep relu default')


if __name__ == '__main__':
  main()
