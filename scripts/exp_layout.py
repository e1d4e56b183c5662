#!/usr/bin/env python
"""Measure the HWC<->CHW layout-conversion cost of the serving path.

The fused kernel is channel-first inside (every channel plane is a
(sublane, lane) tile); the public API is channels-last, so each frame
pays transpose-in + transpose-out. This experiment measures, on the
real chip with 100-iteration feedback chains:

  A. public channels-last fused serve (transposes included)
  B. the same kernel on channel-first data (cf -> cf chain, no
     transposes)
  C. slice-apply op: channels-last public wrapper vs cf core
  D. a bare transpose pair in a non-affine chain (XLA-fusion caveat:
     differential A-B is the authoritative number)

  python scripts/exp_layout.py --iters 100
"""

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timed_feedback_chain(fn, n, x0, *args, repeats=3):
  import jax

  @jax.jit
  def chain(x, *a):
    for _ in range(n):
      x = fn(x, *a)
    return x.reshape(-1)[0]

  float(chain(x0, *args))
  ts = []
  for _ in range(repeats):
    t0 = time.time()
    float(chain(x0, *args))
    ts.append((time.time() - t0) / n)
  return sorted(ts)[len(ts) // 2]


def main():
  p = argparse.ArgumentParser()
  p.add_argument('--iters', type=int, default=100)
  p.add_argument('--res', type=int, nargs=2, default=[2160, 3840])
  p.add_argument('--json', dest='json_out', default=None)
  args = p.parse_args()

  import jax
  cache_dir = (os.environ.get('HDRNET_TPU_CACHE_DIR')
               or os.path.join(os.path.dirname(
                   os.path.dirname(os.path.abspath(__file__))),
                   'output', 'jax_cache_bench'))
  os.makedirs(cache_dir, exist_ok=True)
  jax.config.update('jax_compilation_cache_dir', cache_dir)
  import jax.numpy as jnp
  from hdrnet_tpu.config import ModelConfig
  from hdrnet_tpu.models import make_model
  from hdrnet_tpu.inference import Enhancer
  from hdrnet_tpu.ops import bilateral_slice_apply
  from hdrnet_tpu.ops import pallas as pk

  H, W = args.res
  n = args.iters
  rng = np.random.RandomState(0)
  dev = jax.devices()[0]
  print(f'device: {dev.device_kind} ({dev.platform}); {H}x{W}; '
        f'{n}-iter chains', flush=True)

  cfg = ModelConfig(model_name='HDRNetCurves')
  model = make_model(cfg)
  lowres = jnp.asarray(rng.rand(1, 256, 256, 3), np.float32)
  full = jnp.asarray(rng.rand(1, H, W, 3), np.float32)
  full_cf = jnp.asarray(rng.rand(1, 3, H, W), np.float32)
  variables = model.init(jax.random.PRNGKey(0), lowres, full)
  enh = Enhancer(config=cfg, variables=variables)
  assert enh.use_fused

  res = {}

  # --- A: public channels-last fused forward (transposes inside)
  def f_hwc(f, l):
    return enh._forward(l, f, clip=True)
  res['fused_serve_hwc_ms'] = timed_feedback_chain(f_hwc, n, full,
                                                   lowres) * 1e3

  # --- B: same kernel, channel-first end to end (no transposes)
  def f_cf(fcf, l):
    return enh._fused_forward_cf(l, fcf, clip=True)
  res['fused_serve_cf_ms'] = timed_feedback_chain(f_cf, n, full_cf,
                                                  lowres) * 1e3

  # --- C: slice-apply public (hwc) vs core (cf)
  grid = jnp.asarray(rng.randn(1, 16, 16, 8, 3, 4) * 0.05, np.float32)
  guide = jnp.asarray(rng.rand(1, H, W), np.float32)
  res['slice_apply_hwc_ms'] = timed_feedback_chain(
      lambda f, g, gu: bilateral_slice_apply(g, gu, f), n, full, grid,
      guide) * 1e3
  packed = grid.reshape(1, 16, 16, 8, 12)
  res['slice_apply_cf_ms'] = timed_feedback_chain(
      lambda fcf: pk.slice_apply_fwd(packed, guide, fcf, 3, 3, True),
      n, full_cf) * 1e3

  # --- D: bare transpose pair through a non-affine op (XLA may fuse;
  # informational only)
  def tpair(f):
    cf = jnp.transpose(f, (0, 3, 1, 2))
    cf = jnp.maximum(cf, 0.0)
    return jnp.transpose(cf, (0, 2, 3, 1))
  res['transpose_pair_relu_ms'] = timed_feedback_chain(tpair, n,
                                                       full) * 1e3
  res['relu_only_hwc_ms'] = timed_feedback_chain(
      lambda f: jnp.maximum(f, 0.0), n, full) * 1e3

  # --- uint8 transpose pair (stream-path cost scale)
  fu8 = jnp.asarray((rng.rand(1, H, W, 3) * 255).astype(np.uint8))
  def tpair_u8(f):
    cf = jnp.transpose(f, (0, 3, 1, 2))
    cf = cf ^ jnp.uint8(1)
    return jnp.transpose(cf, (0, 2, 3, 1))
  res['transpose_pair_u8_ms'] = timed_feedback_chain(tpair_u8, n,
                                                     fu8) * 1e3

  gpix = H * W / 1e9
  for k, v in res.items():
    extra = ''
    if k.startswith(('fused', 'slice')):
      extra = f'  ({gpix / (v / 1e3):.2f} GPix/s)'
    print(f'{k:28s} {v:8.3f} ms{extra}', flush=True)
  d = res['fused_serve_hwc_ms'] - res['fused_serve_cf_ms']
  print(f'=> layout conversion cost in fused serve: {d:.3f} ms/frame '
        f'({100 * d / res["fused_serve_hwc_ms"]:.0f}% of the hwc path)')
  if args.json_out:
    with open(args.json_out, 'w') as f:
      json.dump(res, f, indent=2)


if __name__ == '__main__':
  main()
