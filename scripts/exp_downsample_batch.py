#!/usr/bin/env python
"""Downsample-stage batch probe (round 4).

exp_batch.py localized the batch-4 serving regression entirely in the
downsample stage: process-minus-forward = 0.54 ms/frame at b1 vs
0.90 ms/frame at b4 (kernel-alone ratio 1.005, e2e-w/o-ds ratio 0.964).
This measures the stage via the same chained deltas at b1/b2/b4 under
three downsample variants (slab kernel with the new host-side bf16
one-hot, and the XLA take/take path) to answer:

  1. does the px-bf16 fix move the slab stage toward the ~0.12 ms
     HBM-read roofline (the in-kernel f32->bf16 conversion of the
     (3840, 256) one-hot ran 3x per program x 24 programs/frame)?
  2. does the b4 penalty track the slab kernel (disappears under
     'xla') or the surrounding transpose/backbone scheduling
     (persists under 'xla')?

  python scripts/exp_downsample_batch.py | tee results/exp_downsample_batch.txt
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

H, W = 2160, 3840


def timed_feedback(fn, n, x0, repeats=3):
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
  full1 = jnp.asarray(rng.rand(1, H, W, 3), np.float32)
  variables = model.init(jax.random.PRNGKey(0), lowres, full1)
  enh = Enhancer(config=cfg, variables=variables)
  process = enh._process_fn()
  print('device:', jax.devices()[0].device_kind, flush=True)

  results = {}
  for bt in (1, 2, 4):
    full = (full1 if bt == 1
            else jnp.asarray(rng.rand(bt, H, W, 3), np.float32))
    low = (lowres if bt == 1
           else jnp.asarray(rng.rand(bt, 256, 256, 3), np.float32))
    n = 100 if bt == 1 else 50
    t_fwd, c = timed_feedback(
        lambda f: enh._forward(low, f, clip=True), n, full)
    print(f'b{bt} e2e w/o ds        : {t_fwd/bt*1e3:7.3f} ms/frame '
          f'(compile {c:.0f}s)', flush=True)
    for variant in ('slab', 'xla'):
      os.environ['HDRNET_TPU_DS_VARIANT'] = variant
      t, c = timed_feedback(lambda f: process(f, clip=True), n, full)
      ds = (t - t_fwd) / bt
      results[(bt, variant)] = ds
      print(f'b{bt} process ds={variant:4s}  : {t/bt*1e3:7.3f} ms/frame '
            f'-> ds stage {ds*1e3:6.3f} ms/frame (compile {c:.0f}s)',
            flush=True)
    del os.environ['HDRNET_TPU_DS_VARIANT']

  print()
  for variant in ('slab', 'xla'):
    b1, b4 = results[(1, variant)], results[(4, variant)]
    print(f'ds={variant:4s}: b1 {b1*1e3:6.3f} ms  b4 {b4*1e3:6.3f} ms '
          f'b4/b1 {b4/max(b1, 1e-9):5.3f}')
  roof = H * W * 3 * 4 / 819e9
  print(f'HBM full-frame-read roofline: {roof*1e3:.3f} ms')


if __name__ == '__main__':
  main()
