"""Fast nearest-neighbor preview downsample (serving hot path).

The reference computes the 256x256 coefficient-net input with a
per-frame ``cv::resize(..., INTER_NEAREST)`` inside the measured
benchmark iteration (benchmark/src/processor.cc:110-122). The TF1
convention it trains with (data_pipeline.py:165-169) is
``src = floor(dst * in/out)`` — the same table `ops/resize.py` uses.

XLA lowers the straightforward gather/strided-slice formulations of
that subsample poorly on TPU (measured ~0.9 ms for a 4K frame — ~7x
the HBM-read roofline), so this module provides a Pallas kernel:

  * the row pattern repeats with period ``span = H/gcd(H, s)`` input
    rows per ``per = s/gcd`` output rows, so a 1-D grid over the
    ``gcd`` row groups gives every program a *static* in-block row
    pattern;
  * the column subsample is a one-hot matmul on the MXU
    (``P[w, x] = 1.0`` iff column w is the nearest source of output
    column x) — exact (each output is 1.0 * source + zeros, and 1.0
    is exact in every MXU pass), and runs in the DMA shadow of the
    next row-group's fetch.

Operates channel-first (B, C, H, W) — the serving frame layout — and
returns (B, C, s, s). ``nearest_lowres_cf`` falls back to the XLA
gather path off-TPU or for degenerate shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hdrnet_tpu.ops.resize import _nearest_indices


def _make_kernel(per, span, n_chan, offsets):
  def kern(img_ref, px_ref, out_ref):
    for c in range(n_chan):
      rows = [img_ref[0, c, int(j), :] for j in offsets]
      sel = jnp.stack(rows, axis=0)  # (per, W)
      out_ref[0, c] = jax.lax.dot_general(
          sel, px_ref[...], (((1,), (0,)), ((), ())),
          precision=jax.lax.Precision.HIGHEST,
          preferred_element_type=jnp.float32)
  return kern


@functools.lru_cache(maxsize=None)
def _col_onehot(w, s):
  ix = _nearest_indices(w, s)
  p = np.zeros((w, s), np.float32)
  p[ix, np.arange(s)] = 1.0
  return p


def pallas_feasible(h, w, s):
  g = int(np.gcd(h, s))
  span, per = h // g, s // g
  # Each program holds one (C, span, W) row group + the (W, s) one-hot
  # in VMEM; bound the footprint (f32) to stay well under 16 MB.
  vmem = (3 * span * w + w * s + 3 * per * s) * 4
  return per <= 64 and span * g == h and vmem < 10 * 2 ** 20


def nearest_lowres_cf(image_cf, s, interpret=False):
  """(B, C, H, W) float32 -> (B, C, s, s) nearest-downsampled.

  Bit-exact to resize_nearest (ops/resize.py) on the same frame.
  """
  b, c, h, w = image_cf.shape
  if (h, w) == (s, s):
    return image_cf
  if jax.default_backend() != 'tpu' and not interpret:
    iy = jnp.asarray(_nearest_indices(h, s))
    ix = jnp.asarray(_nearest_indices(w, s))
    return jnp.take(jnp.take(image_cf, iy, axis=2), ix, axis=3)
  if not pallas_feasible(h, w, s):
    iy = jnp.asarray(_nearest_indices(h, s))
    ix = jnp.asarray(_nearest_indices(w, s))
    return jnp.take(jnp.take(image_cf, iy, axis=2), ix, axis=3)

  g = int(np.gcd(h, s))
  span, per = h // g, s // g
  iy = _nearest_indices(h, s)
  offsets = tuple(int(v) for v in iy[:per])  # group-local row pattern
  px = jnp.asarray(_col_onehot(w, s))

  kern = _make_kernel(per, span, c, offsets)
  out = pl.pallas_call(
      kern,
      grid=(b, g),
      in_specs=[
          pl.BlockSpec((1, c, span, w), lambda bi, k: (bi, 0, k, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((w, s), lambda bi, k: (0, 0),
                       memory_space=pltpu.VMEM),
      ],
      out_specs=pl.BlockSpec((1, c, per, s), lambda bi, k: (bi, 0, k, 0),
                             memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((b, c, s, s), jnp.float32),
      interpret=interpret,
  )(image_cf, px)
  return out
