#!/usr/bin/env python
"""Round-4 downsample kernel variants: chase the batched regression.

Round-3's slab kernel (ops/downsample.py) runs 4K->256 at ~0.65 ms
(~150-200 GB/s effective vs the 819 GB/s roofline = 0.12 ms) and
degrades ~27%/frame at batch 4. Variants measured here, all bit-exact
one-hot formulations:

  v0: current library kernel (2-D grid (b, 24), q=2, row stacking).
  v1: 1-D flattened grid over (b*c*g)//q slabs, q=6, raised
      vmem_limit_bytes (the default 16 MB scoped limit is what capped
      q<=2), rows still VPU-stacked.
  v2: like v1 but row selection as an MXU one-hot dot
      (Py (per,span) @ slab (span,w)) instead of per-row VPU reads.

python scripts/exp_downsample_v2.py | tee results/exp_downsample_v2_r4.txt
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax
jax.config.update('jax_compilation_cache_dir',
                  os.path.join(os.path.dirname(__file__), '..', 'output',
                               'jax_cache_bench'))
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import hdrnet_tpu.ops.downsample as ds
from hdrnet_tpu.ops.resize import _nearest_indices

H, W, S = 2160, 3840, 256


def split3(x):
  hi = x.astype(jnp.bfloat16)
  rem = x - hi.astype(jnp.float32)
  mid = rem.astype(jnp.bfloat16)
  lo = (rem - mid.astype(jnp.float32)).astype(jnp.bfloat16)
  return hi, mid, lo


def dot3(x, p):
  out = None
  for part in split3(x):
    d = jax.lax.dot_general(part, p, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    out = d if out is None else out + d
  return out


def make_v1(q, span, per, offsets):
  def kern(img_ref, px_ref, py_ref, out_ref):
    px = px_ref[...].astype(jnp.bfloat16)
    for qq in range(q):
      rows = [img_ref[qq, int(j), :] for j in offsets]
      sel = jnp.stack(rows, axis=0)
      out_ref[qq] = dot3(sel, px)
  return kern


def make_v2(q, span, per, offsets):
  """Row selection via MXU: hi/mid/lo split FIRST (exact), then
  Py @ part @ Px as single-pass bf16 dots (one-hot x bf16 is exact)."""
  def kern(img_ref, px_ref, py_ref, out_ref):
    px = px_ref[...].astype(jnp.bfloat16)
    py = py_ref[...].astype(jnp.bfloat16)
    for qq in range(q):
      x = img_ref[qq]
      acc = None
      for part in split3(x):
        rows = jax.lax.dot_general(py, part, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        d = jax.lax.dot_general(rows.astype(jnp.bfloat16), px,
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        acc = d if acc is None else acc + d
      out_ref[qq] = acc
  return kern


def variant(image_cf, q, mxu_rows, vmem_mb=64, two_level=False):
  b, c, h, w = image_cf.shape
  g = int(np.gcd(h, S))
  span, per = h // g, S // g
  iy = _nearest_indices(h, S)
  offsets = tuple(int(v) for v in iy[:per])
  px = jnp.asarray(ds._col_onehot(w, S))
  py = np.zeros((per, span), np.float32)
  py[np.arange(per), list(offsets)] = 1.0
  py = jnp.asarray(py)
  n_slabs = b * c * g
  assert n_slabs % q == 0
  slabs = image_cf.reshape(n_slabs, span, w)
  del mxu_rows
  kern = (make_v2 if two_level else make_v1)(q, span, per, offsets)
  out = pl.pallas_call(
      kern,
      grid=(n_slabs // q,),
      in_specs=[
          pl.BlockSpec((q, span, w), lambda k: (k, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((w, S), lambda k: (0, 0), memory_space=pltpu.VMEM),
          pl.BlockSpec((per, span), lambda k: (0, 0),
                       memory_space=pltpu.VMEM),
      ],
      out_specs=pl.BlockSpec((q, per, S), lambda k: (k, 0, 0),
                             memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((n_slabs, per, S), jnp.float32),
      compiler_params=pltpu.CompilerParams(
          vmem_limit_bytes=vmem_mb * 2 ** 20),
  )(slabs, px, py)
  return out.reshape(b, c, S, S)


def timed_chain(fn, n, *args, repeats=3):
  @jax.jit
  def chain(*a):
    acc = jnp.zeros(())
    for _ in range(n):
      acc = acc + fn(*a, acc * 1e-30)
    return acc
  t0 = time.time(); float(chain(*args)); comp = time.time() - t0
  ts = []
  for _ in range(repeats):
    t0 = time.time(); float(chain(*args)); ts.append((time.time() - t0) / n)
  return sorted(ts)[len(ts) // 2], comp


def main():
  rng = np.random.RandomState(0)
  cf1 = jnp.asarray(rng.rand(1, 3, H, W), np.float32)
  want = jax.jit(lambda v: ds.nearest_lowres_cf(v, S, variant='xla'))(cf1)

  cases = [
      ('v0 lib slab q2', lambda f: ds.nearest_lowres_cf(f, S)),
      ('v1 1d q6 vpu-rows', lambda f: variant(f, 6, False)),
      ('v1 1d q12 vpu-rows', lambda f: variant(f, 12, False)),
      ('v2 1d q6 mxu-rows', lambda f: variant(f, 6, None, two_level=True)),
      ('v2 1d q12 mxu-rows', lambda f: variant(f, 12, None, two_level=True)),
      ('v2 1d q24 mxu-rows', lambda f: variant(f, 24, None, vmem_mb=100,
                                               two_level=True)),
  ]
  for name, fn in cases:
    try:
      got = jax.jit(fn)(cf1)
      d = float(jnp.max(jnp.abs(got - want)))
      line = f'{name:22s} max|diff|={d:.2e}'
      for bt in (1, 4):
        n = 100 if bt == 1 else 50
        cf = jnp.asarray(rng.rand(bt, 3, H, W), np.float32)
        t, c = timed_chain(lambda f, eps, fn=fn: fn(f + eps).sum(), n, cf)
        line += f'  b{bt} {t/bt*1e3:6.3f} ms/fr'
      print(line, flush=True)
    except Exception as e:
      print(f'{name:22s} FAILED: {type(e).__name__}: {str(e)[:140]}',
            flush=True)


if __name__ == '__main__':
  main()
