"""Interpolation numerics shared by every bilateral-grid op.

These are the TPU-native (JAX) equivalents of the reference kernels'
interpolation primitives (reference: hdrnet/ops/numerics.h:53-126 and
jax/numerics.py:20-97). All functions are elementwise and jit/vmap/pallas
friendly.

Conventions (OpenGL-style):
  * integer sample coordinates live at pixel *centers* (k + 0.5),
  * continuous query coordinates live on the pixel *edge* lattice.

``EPS = 1e-8`` matches the reference smoothing constant
(ops/numerics.h:83, 109).
"""

from __future__ import annotations

import jax.numpy as jnp

EPS = 1e-8


def lerp_weight(x, xs):
  """Tent (linear interpolation) weight between query ``x`` and sample ``xs``.

  Returns 1 when ``x == xs`` and 0 when ``|x - xs| >= 1``.
  Reference: ops/numerics.h:53-57.
  """
  return jnp.maximum(1.0 - jnp.abs(x - xs), 0.0)


def smoothed_abs(x, eps=EPS):
  """``sqrt(x*x + eps)`` — smoothed |x|. Reference: ops/numerics.h:83-85."""
  return jnp.sqrt(x * x + eps)


def smoothed_abs_grad(x, eps=EPS):
  """Smoothed sign(x): ``x / sqrt(x*x + eps)``. Reference: numerics.h:89-91."""
  return x * jnp.reciprocal(jnp.sqrt(x * x + eps))


def smoothed_lerp_weight(x, xs, eps=EPS):
  """Tent weight with a smoothed kink at 0, used on the guide/range axis.

  ``max(1 - sqrt((x-xs)^2 + eps), 0)``. Reference: ops/numerics.h:108-113.
  """
  return jnp.maximum(1.0 - smoothed_abs(x - xs, eps), 0.0)


def smoothed_lerp_weight_grad(x, xs, eps=EPS):
  """d smoothed_lerp_weight(x, xs) / d xs.

  Zero where the smoothed |dx| exceeds 1 (outside the tent support),
  otherwise the smoothed sign of dx. Reference: ops/numerics.h:116-126.
  """
  dx = x - xs
  abs_dx = smoothed_abs(dx, eps)
  return jnp.where(abs_dx > 1.0, 0.0, smoothed_abs_grad(dx, eps))


def mirror_boundary(x, extent):
  """Mirror (reflect, no repeated edge sample... actually edge-inclusive).

  Maps -1 -> 0, -2 -> 1, extent -> extent-1, extent+1 -> extent-2.
  Matches ``MirrorBoundary`` (ops/numerics.h:72-80). Valid for
  ``-extent <= x < 2 * extent``.
  """
  x = jnp.where(x < 0, -x - 1, x)
  return jnp.where(x >= extent, 2 * extent - 1 - x, x)
