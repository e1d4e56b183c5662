"""Image resizing with the exact sampling conventions of the reference.

The reference mixes three conventions, all replicated here:
  * legacy TF1 nearest (lowres production, data_pipeline.py:165-169):
    src = floor(dst * in/out), clipped;
  * legacy TF1 bilinear, align_corners=False (augmentation resize,
    data_pipeline.py:161-162): src = dst * in/out (no half-pixel shift);
  * bilinear align_corners=True (Gaussian pyramid, models.py:260-263 and
    the coarse-to-fine upsample-add, models.py:285-287):
    src = dst * (in-1)/(out-1).

All are separable 1-D resamples with *static* index/weight tables
(computed with numpy at trace time), so they lower to constant-index
gathers + elementwise math — no dynamic gather on TPU.

Operates on (..., H, W, C) arrays.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _nearest_indices(n_in, n_out):
  scale = n_in / n_out
  idx = np.floor(np.arange(n_out) * scale).astype(np.int64)
  return np.clip(idx, 0, n_in - 1)


def _linear_taps(n_in, n_out, align_corners):
  if align_corners and n_out > 1:
    src = np.arange(n_out) * ((n_in - 1) / max(n_out - 1, 1))
  else:
    src = np.arange(n_out) * (n_in / n_out)
  i0 = np.floor(src).astype(np.int64)
  frac = (src - i0).astype(np.float32)
  i0 = np.clip(i0, 0, n_in - 1)
  i1 = np.clip(i0 + 1, 0, n_in - 1)
  return i0, i1, frac


def resize_nearest(x, size):
  """Legacy TF1 nearest-neighbor resize on the (-3, -2) axes."""
  h, w = size
  if x.shape[-3] == h and x.shape[-2] == w:
    return x
  iy = _nearest_indices(x.shape[-3], h)
  ix = _nearest_indices(x.shape[-2], w)
  x = jnp.take(x, jnp.asarray(iy), axis=-3)
  return jnp.take(x, jnp.asarray(ix), axis=-2)


def resize_bilinear_traced(x, size, true_in, true_out,
                           align_corners=True):
  """Bilinear resize of a PADDED array with TRACED true extents.

  `x` is (..., Hp, Wp, C) padded to a static bucket; `size` = (hp, wp)
  static padded output extent; `true_in`/`true_out` = traced (h, w)
  int32 pairs of the logical images. Rows/cols beyond the true output
  extent are garbage for the caller to crop. Enables one-compile
  bucketed serving of the Gaussian-pyramid models, whose per-level
  resamples depend on the true size (models.py:252-265).
  """
  import jax.numpy as jnp  # noqa: F811 (module already imported)
  h, w = size
  dtype = x.dtype

  def taps(n_out_static, t_in, t_out, axis_len_in):
    i = jnp.arange(n_out_static, dtype=jnp.float32)
    t_in_f = t_in.astype(jnp.float32)
    t_out_f = t_out.astype(jnp.float32)
    if align_corners:
      src = i * ((t_in_f - 1.0) / jnp.maximum(t_out_f - 1.0, 1.0))
    else:
      src = i * (t_in_f / t_out_f)
    i0 = jnp.floor(src).astype(jnp.int32)
    frac = (src - i0.astype(jnp.float32)).astype(jnp.float32)
    i0 = jnp.clip(i0, 0, t_in - 1)
    i1 = jnp.clip(i0 + 1, 0, t_in - 1)
    i0 = jnp.minimum(i0, axis_len_in - 1)
    i1 = jnp.minimum(i1, axis_len_in - 1)
    return i0, i1, frac

  y0, y1, fy = taps(h, true_in[0], true_out[0], x.shape[-3])
  x0, x1, fx = taps(w, true_in[1], true_out[1], x.shape[-2])
  fy = fy.reshape(h, 1, 1)
  fx = fx.reshape(w, 1)
  a = jnp.take(x, y0, axis=-3)
  b = jnp.take(x, y1, axis=-3)
  x = a + (b - a) * fy.astype(dtype)
  a = jnp.take(x, x0, axis=-2)
  b = jnp.take(x, x1, axis=-2)
  return a + (b - a) * fx.astype(dtype)


def resize_bilinear(x, size, align_corners=False):
  """Separable bilinear resize on the (-3, -2) axes."""
  h, w = size
  if x.shape[-3] == h and x.shape[-2] == w:
    return x
  dtype = x.dtype
  y0, y1, fy = _linear_taps(x.shape[-3], h, align_corners)
  x0, x1, fx = _linear_taps(x.shape[-2], w, align_corners)
  fy = jnp.asarray(fy).reshape(h, 1, 1)  # broadcast over (..., h, W, C)
  fx = jnp.asarray(fx).reshape(w, 1)     # broadcast over (..., H, w, C)
  a = jnp.take(x, jnp.asarray(y0), axis=-3)
  b = jnp.take(x, jnp.asarray(y1), axis=-3)
  x = a + (b - a) * fy.astype(dtype)
  a = jnp.take(x, jnp.asarray(x0), axis=-2)
  b = jnp.take(x, jnp.asarray(x1), axis=-2)
  return a + (b - a) * fx.astype(dtype)
