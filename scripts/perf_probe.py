#!/usr/bin/env python
"""Stage-overhead probes on the real chip (round-3 perf work).

Measures candidate implementations of the two fixed-cost serving
stages the round-2 verdict flagged (downsample 1.8 ms, coefficient
net 1.95 ms — together dwarfing the 3 ms full-res kernel) so the
winners can ship in the serving path. Chained-iteration timing (same
method as bench.py: data-dependent feedback, one scalar fetch).
"""

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def timed(fn, n, *args, repeats=3):
  import jax
  import jax.numpy as jnp

  @jax.jit
  def chain(*a):
    acc = jnp.zeros(())
    for _ in range(n):
      acc = acc + fn(*a, acc * 1e-30)
    return acc

  float(chain(*args))
  ts = []
  for _ in range(repeats):
    t0 = time.time()
    float(chain(*args))
    ts.append((time.time() - t0) / n)
  return sorted(ts)[len(ts) // 2]


def main():
  p = argparse.ArgumentParser()
  p.add_argument('--iters', type=int, default=30)
  p.add_argument('--what', type=str, default='down,coeff')
  args = p.parse_args()

  import jax
  import jax.numpy as jnp
  from hdrnet_tpu.ops.resize import resize_nearest, _nearest_indices

  rng = np.random.RandomState(0)
  H, W = 2160, 3840
  full = jnp.asarray(rng.rand(1, H, W, 3), np.float32)
  n = args.iters
  T = functools.partial(timed, n=n)

  what = set(args.what.split(','))

  if 'down' in what:
    # -- variant A: current (jnp.take rows then cols)
    t = timed(lambda f, e: resize_nearest(f + e, (256, 256)).sum(), n, full)
    print(f'down A take-take      : {t*1e3:7.3f} ms')

    iy = np.asarray(_nearest_indices(H, 256))
    ix = np.asarray(_nearest_indices(W, 256))

    # -- variant B: rows via take, cols via one-hot matmul (f32)
    px = np.zeros((W, 256), np.float32)
    px[ix, np.arange(256)] = 1.0
    pxj = jnp.asarray(px)

    def down_b(f, e):
      r = jnp.take(f + e, jnp.asarray(iy), axis=1)  # (1,256,W,3)
      out = jnp.einsum('bhwc,wk->bhkc', r, pxj)
      return out.sum()
    t = timed(down_b, n, full)
    print(f'down B take+matmul    : {t*1e3:7.3f} ms')

    # -- variant C: both axes one-hot matmul f32
    py = np.zeros((256, H), np.float32)
    py[np.arange(256), iy] = 1.0
    pyj = jnp.asarray(py)

    def down_c(f, e):
      r = jnp.einsum('yh,bhwc->bywc', pyj, f + e)
      out = jnp.einsum('bywc,wk->bykc', r, pxj)
      return out.sum()
    t = timed(down_c, n, full)
    print(f'down C matmul-matmul  : {t*1e3:7.3f} ms')

    # -- variant D: dynamic_slice-free reshape gather: rows grouped
    # 2160 = 16 groups x 135; within-group offsets static
    off = iy.reshape(256 // 16, 16) - (np.arange(16) * 135)[None, :] \
        if False else None
    # direct: rows = f[:, iy] via advanced indexing (gather), cols via
    # strided slice when W % 256 == 0 (3840 = 15*256 -> stride 15)
    def down_e(f, e):
      r = (f + e)[:, iy]          # row gather
      out = r[:, :, ::15]          # static stride = nearest for 3840->256
      return out.sum()
    t = timed(down_e, n, full)
    print(f'down E gather+stride  : {t*1e3:7.3f} ms')

    # -- variant F: transpose-to-channel-first then gathers
    def down_f(f, e):
      cf = jnp.transpose(f + e, (0, 3, 1, 2))
      r = cf[:, :, iy][:, :, :, ix]
      return r.sum()
    t = timed(down_f, n, full)
    print(f'down F cf-gathers     : {t*1e3:7.3f} ms')

    # -- variant G: bf16 matmul-matmul
    pyb = pyj.astype(jnp.bfloat16)
    pxb = pxj.astype(jnp.bfloat16)

    def down_g(f, e):
      fb = (f + e).astype(jnp.bfloat16)
      r = jnp.einsum('yh,bhwc->bywc', pyb, fb)
      out = jnp.einsum('bywc,wk->bykc', r, pxb)
      return out.astype(jnp.float32).sum()
    t = timed(down_g, n, full)
    print(f'down G bf16 matmuls   : {t*1e3:7.3f} ms')

  if 'coeff' in what:
    from hdrnet_tpu.config import ModelConfig
    from hdrnet_tpu.models.hdrnet import CoefficientBackbone
    cfg = ModelConfig(model_name='HDRNetCurves')
    bb = CoefficientBackbone(cfg, 3, 4)
    lowres = jnp.asarray(rng.rand(1, 256, 256, 3), np.float32)
    v = bb.init(jax.random.PRNGKey(0), lowres)

    t = timed(lambda l, e: bb.apply(v, l + e).sum(), n, lowres)
    print(f'coeff f32 b1          : {t*1e3:7.3f} ms')

    # batch 4 (does it amortize fixed overheads?)
    low4 = jnp.asarray(rng.rand(4, 256, 256, 3), np.float32)
    t = timed(lambda l, e: bb.apply(v, l + e).sum(), n, low4)
    print(f'coeff f32 b4          : {t*1e3:7.3f} ms')

    # bf16 params + input
    vb = jax.tree.map(lambda x: x.astype(jnp.bfloat16), v)
    lowb = lowres.astype(jnp.bfloat16)
    t = timed(lambda l, e: bb.apply(vb, l + e.astype(jnp.bfloat16))
              .astype(jnp.float32).sum(), n, lowb)
    print(f'coeff bf16 b1         : {t*1e3:7.3f} ms')

    # where does the time go? splat-only probe
    import flax.linen as nn
    from hdrnet_tpu.models.layers import ConvBlock

    class SplatOnly(nn.Module):
      cfg: ModelConfig
      @nn.compact
      def __call__(self, x):
        c = self.cfg
        n_ds = int(np.log2(c.net_input_size / c.spatial_bin))
        for i in range(n_ds):
          x = ConvBlock(c.channel_multiplier * (2 ** i) * c.luma_bins, 3,
                        stride=2, batch_norm=False,
                        name=f'splat_conv{i+1}')(x)
        return x
    sp = SplatOnly(cfg)
    vsp = {'params': {k: v['params'][k] for k in v['params']
                      if k.startswith('splat')}}
    t = timed(lambda l, e: sp.apply(vsp, l + e).sum(), n, lowres)
    print(f'coeff splat-only f32  : {t*1e3:7.3f} ms')


if __name__ == '__main__':
  main()
