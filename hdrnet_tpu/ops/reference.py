"""Pure-jnp oracle for the bilateral slice / slice-apply ops.

This module is the *numerics-exact executable spec* for the fused Pallas
kernels in :mod:`hdrnet_tpu.ops.pallas`. It reproduces, op by op, the
semantics of the reference C++/CUDA kernels:

  * forward slice-apply        — ops/bilateral_slice_apply.cc:24-82
  * grid cotangent (VJP)       — ops/bilateral_slice_apply.cc:84-138
  * guide cotangent (VJP)      — ops/bilateral_slice_apply.cc:140-206
  * input cotangent (VJP)      — ops/bilateral_slice_apply.cc:208-259

Boundary conventions are *intentionally inconsistent* in the reference and
replicated here verbatim:

  * forward / guide-VJP / input-VJP: spatial + depth taps are evaluated at
    their unclamped positions but gathered at clamp()ed indices;
  * grid-VJP: the image side uses MIRROR boundary (implemented as a
    symmetric pad, cf. jax/bilateral_slice.py:163-181) and the depth weight
    is overridden to exactly 1 at the z extremes
    (bilateral_slice_apply.cc:121-125).

Everything here is unbatched (batch via jax.vmap) and written for clarity
and correctness, not speed. The Pallas kernels are conformance-gated
against these functions at <=1e-5.

Layouts (channels-last, TPU-native):
  grid:  (gh, gw, gd, no, ni_tot)   ni_tot = n_in + 1 if has_offset
  guide: (h, w) in [0, 1]
  image: (h, w, n_in)
  out:   (h, w, no)
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from hdrnet_tpu.numerics import (
    lerp_weight,
    smoothed_lerp_weight,
    smoothed_lerp_weight_grad,
)


def _spatial_taps(extent, grid_extent, dtype=jnp.float32):
  """Per-pixel 2-tap spatial interpolation: indices + weights.

  Sampling rule of the forward op (bilateral_slice_apply.cc:41-60):
  ``gxf = (x + 0.5) * grid_extent / extent``, taps at floor(gxf - 0.5) and
  +1, tent weights evaluated at the *unclamped* tap centers.

  Returns (i0, i1, w0, w1, clamped0, clamped1) with shape (extent,).
  """
  scale = grid_extent / extent
  gf = (jnp.arange(extent, dtype=dtype) + 0.5) * scale
  i0 = jnp.floor(gf - 0.5).astype(jnp.int32)
  i1 = i0 + 1
  w0 = lerp_weight(i0.astype(dtype) + 0.5, gf)
  w1 = lerp_weight(i1.astype(dtype) + 0.5, gf)
  c0 = jnp.clip(i0, 0, grid_extent - 1)
  c1 = jnp.clip(i1, 0, grid_extent - 1)
  return i0, i1, w0, w1, c0, c1


def _depth_taps(guide, grid_depth):
  """Per-pixel 2-tap depth interpolation driven by the guide.

  ``gzf = guide * grid_depth`` (no +0.5 — see the reference TODO at
  bilateral_slice_apply.cc:43), smoothed tent weights at unclamped tap
  centers, clamped gather indices.
  """
  gzf = guide * grid_depth
  z0 = jnp.floor(gzf - 0.5).astype(jnp.int32)
  z1 = z0 + 1
  w0 = smoothed_lerp_weight(z0.astype(guide.dtype) + 0.5, gzf)
  w1 = smoothed_lerp_weight(z1.astype(guide.dtype) + 0.5, gzf)
  c0 = jnp.clip(z0, 0, grid_depth - 1)
  c1 = jnp.clip(z1, 0, grid_depth - 1)
  return gzf, w0, w1, c0, c1


def _slice_channels(grid, guide, z_w0, z_w1, z_c0, z_c1):
  """Trilinearly slices every channel of ``grid`` at the guide-indexed taps.

  grid: (gh, gw, gd, C); guide: (h, w); z_*: (h, w).
  Returns (h, w, C).
  """
  gh, gw, _, _ = grid.shape
  h, w = guide.shape
  _, _, wy0, wy1, yc0, yc1 = _spatial_taps(h, gh, guide.dtype)
  _, _, wx0, wx1, xc0, xc1 = _spatial_taps(w, gw, guide.dtype)

  # Broadcast row/col taps against the (h, w) plane.
  yc0 = yc0[:, None]
  yc1 = yc1[:, None]
  wy0 = wy0[:, None, None]
  wy1 = wy1[:, None, None]
  xc0 = xc0[None, :]
  xc1 = xc1[None, :]
  wx0 = wx0[None, :, None]
  wx1 = wx1[None, :, None]
  zw0 = z_w0[:, :, None]
  zw1 = z_w1[:, :, None]

  def corner(yc, xc, zc):
    # Advanced indexing: (h, 1), (1, w), (h, w) -> (h, w, C)
    return grid[yc, xc, zc]

  out = (wy0 * wx0 * (zw0 * corner(yc0, xc0, z_c0) +
                      zw1 * corner(yc0, xc0, z_c1)) +
         wy0 * wx1 * (zw0 * corner(yc0, xc1, z_c0) +
                      zw1 * corner(yc0, xc1, z_c1)) +
         wy1 * wx0 * (zw0 * corner(yc1, xc0, z_c0) +
                      zw1 * corner(yc1, xc0, z_c1)) +
         wy1 * wx1 * (zw0 * corner(yc1, xc1, z_c0) +
                      zw1 * corner(yc1, xc1, z_c1)))
  return out


def bilateral_slice(grid, guide):
  """Trilinear slice of a bilateral grid (no affine apply).

  grid: (gh, gw, gd, C), guide: (h, w) -> (h, w, C).
  Semantics of the reference BilateralSlice op
  (ops/bilateral_slice.cc:25-70).
  """
  _, z_w0, z_w1, z_c0, z_c1 = _depth_taps(guide, grid.shape[2])
  return _slice_channels(grid, guide, z_w0, z_w1, z_c0, z_c1)


def _extend_image(image, h, w, has_offset):
  """Appends the affine offset's implicit all-ones channel."""
  if has_offset:
    ones = jnp.ones((h, w, 1), dtype=image.dtype)
    return jnp.concatenate([image, ones], axis=-1) if image.shape[-1] else ones
  return image


def bilateral_slice_apply(grid, guide, image, has_offset=True):
  """Fused slice + per-pixel affine apply (the HDRNet hot op).

  grid:  (gh, gw, gd, no, ni_tot)
  guide: (h, w)
  image: (h, w, n_in) with n_in = ni_tot - 1 if has_offset else ni_tot
  Returns (h, w, no).
  Reference: ops/bilateral_slice_apply.cc:24-82.
  """
  gh, gw, gd, no, ni_tot = grid.shape
  h, w = guide.shape
  sliced = bilateral_slice(grid.reshape(gh, gw, gd, no * ni_tot), guide)
  sliced = sliced.reshape(h, w, no, ni_tot)
  image_ext = _extend_image(image, h, w, has_offset)
  return jnp.einsum('hwij,hwj->hwi', sliced, image_ext)


# ---------------------------------------------------------------------------
# VJPs
# ---------------------------------------------------------------------------


def _pad_amounts(h, w, gh, gw):
  """Mirror padding needed so a plain splat covers the reference's
  gather-with-MirrorBoundary grid gradient (cf. jax/bilateral_slice.py
  _compute_scale_pad:111-135). Static Python ints."""
  pad_y = math.ceil(0.5 * h / gh)
  pad_x = math.ceil(0.5 * w / gw)
  return pad_y, pad_x


def _sym_pad(x, pad_y, pad_x):
  pads = [(pad_y, pad_y), (pad_x, pad_x)] + [(0, 0)] * (x.ndim - 2)
  return jnp.pad(x, pads, mode='symmetric')


def _grid_grad_spatial_weights(extent, grid_extent, pad, dtype=jnp.float32):
  """(extent + 2*pad, grid_extent) tent-weight matrix, direct evaluation.

  Row y' (padded pixel coordinate, offset by -pad) against every grid cell.
  Matches the direct ``LerpWeight(gx + 0.5, gxf)`` evaluation of
  bilateral_slice_apply.cc:110-117.
  """
  scale = grid_extent / extent
  coords = jnp.arange(-pad, extent + pad, dtype=dtype)
  gf = (coords + 0.5) * scale  # (extent',)
  cells = jnp.arange(grid_extent, dtype=dtype) + 0.5  # (grid_extent,)
  return lerp_weight(cells[None, :], gf[:, None])


def _grid_grad_depth_weights(guide_padded, grid_depth):
  """(h', w', gd) smoothed tent weights with the z-extreme overrides.

  Direct per-cell evaluation + override-to-1 rules of
  bilateral_slice_apply.cc:120-125.
  """
  gzf = guide_padded * grid_depth  # (h', w')
  cells = jnp.arange(grid_depth, dtype=guide_padded.dtype) + 0.5  # (gd,)
  wz = smoothed_lerp_weight(cells[None, None, :], gzf[:, :, None])
  low = (gzf < 0.5)[:, :, None] & (jnp.arange(grid_depth) == 0)[None, None, :]
  high = ((gzf > grid_depth - 0.5)[:, :, None]
          & (jnp.arange(grid_depth) == grid_depth - 1)[None, None, :])
  return jnp.where(low | high, 1.0, wz)


def bilateral_slice_apply_grid_vjp(guide, image, ct, grid_shape,
                                   has_offset=True):
  """Grid cotangent. Independent of the grid values.

  guide: (h, w); image: (h, w, n_in); ct: (h, w, no).
  Returns (gh, gw, gd, no, ni_tot).
  Reference: ops/bilateral_slice_apply.cc:84-138 (gather over mirrored
  pixels), implemented as a splat over symmetric-padded tensors.
  """
  gh, gw, gd, no, ni_tot = grid_shape
  h, w = guide.shape
  pad_y, pad_x = _pad_amounts(h, w, gh, gw)

  w_y = _grid_grad_spatial_weights(h, gh, pad_y, guide.dtype)   # (h', gh)
  w_x = _grid_grad_spatial_weights(w, gw, pad_x, guide.dtype)   # (w', gw)
  guide_p = _sym_pad(guide, pad_y, pad_x)
  w_k = _grid_grad_depth_weights(guide_p, gd)                   # (h', w', gd)

  image_ext = _extend_image(image, h, w, has_offset)
  f = _sym_pad(ct[..., :, None] * image_ext[..., None, :], pad_y, pad_x)
  # f: (h', w', no, ni_tot)
  return jnp.einsum('ya,xb,yxk,yxij->abkij', w_y, w_x, w_k, f,
                    optimize=True)


def bilateral_slice_apply_guide_vjp(grid, guide, image, ct, has_offset=True):
  """Guide cotangent: re-interpolate with d(wz)/d(guide).

  Reference: ops/bilateral_slice_apply.cc:140-206. The depth weight
  derivative is ``grid_depth * SmoothedLerpWeightGrad`` at the two
  unclamped taps, gathered at clamped indices.
  """
  gh, gw, gd, no, ni_tot = grid.shape
  h, w = guide.shape
  gzf = guide * gd
  z0 = jnp.floor(gzf - 0.5).astype(jnp.int32)
  z1 = z0 + 1
  dw0 = gd * smoothed_lerp_weight_grad(z0.astype(guide.dtype) + 0.5, gzf)
  dw1 = gd * smoothed_lerp_weight_grad(z1.astype(guide.dtype) + 0.5, gzf)
  c0 = jnp.clip(z0, 0, gd - 1)
  c1 = jnp.clip(z1, 0, gd - 1)

  sliced_dz = _slice_channels(
      grid.reshape(gh, gw, gd, no * ni_tot), guide, dw0, dw1, c0, c1)
  sliced_dz = sliced_dz.reshape(h, w, no, ni_tot)
  image_ext = _extend_image(image, h, w, has_offset)
  return jnp.einsum('hwij,hwj,hwi->hw', sliced_dz, image_ext, ct)


def bilateral_slice_apply_input_vjp(grid, guide, ct, has_offset=True):
  """Input cotangent: sliced affine matrix transposed, applied to ct.

  Reference: ops/bilateral_slice_apply.cc:208-259.
  Returns (h, w, n_in).
  """
  gh, gw, gd, no, ni_tot = grid.shape
  h, w = guide.shape
  n_in = ni_tot - 1 if has_offset else ni_tot
  sliced = bilateral_slice(grid.reshape(gh, gw, gd, no * ni_tot), guide)
  sliced = sliced.reshape(h, w, no, ni_tot)
  return jnp.einsum('hwij,hwi->hwj', sliced[..., :n_in], ct)


# --- VJPs for the plain (non-apply) slice, derived from the apply VJPs ----


def bilateral_slice_grid_vjp(guide, ct, grid_shape):
  """Grid cotangent of the plain slice. grid_shape: (gh, gw, gd, C).

  Reference: ops/bilateral_slice.cc:72-118 — identical math to the apply
  grid VJP with an all-ones input weighting.
  """
  gh, gw, gd, c = grid_shape
  h, w = guide.shape
  empty = jnp.zeros((h, w, 0), dtype=ct.dtype)
  vjp = bilateral_slice_apply_grid_vjp(
      guide, empty, ct, (gh, gw, gd, c, 1), has_offset=True)
  return vjp.reshape(gh, gw, gd, c)


def bilateral_slice_guide_vjp(grid, guide, ct):
  """Guide cotangent of the plain slice (ops/bilateral_slice.cc:120-168)."""
  gh, gw, gd, c = grid.shape
  h, w = guide.shape
  empty = jnp.zeros((h, w, 0), dtype=ct.dtype)
  return bilateral_slice_apply_guide_vjp(
      grid.reshape(gh, gw, gd, c, 1), guide, empty, ct, has_offset=True)
