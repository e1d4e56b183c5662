"""Public, differentiable bilateral slice / slice-apply ops.

This is the TPU-native replacement for the reference op binding layer
(hdrnet/hdrnet_ops.py + hdrnet/layers.py:99-148): batched, registered
with custom VJPs, and dispatched to one of two backends:

  * ``reference`` — pure-jnp oracle (hdrnet_tpu.ops.reference), runs on any
    backend; used for conformance tests and as the CPU fallback.
  * ``pallas``    — fused Pallas TPU kernels (hdrnet_tpu.ops.pallas),
    the production path.

API (batched, channels-last):
  bilateral_slice(grid, guide)
      grid (b, gh, gw, gd, C), guide (b, h, w) -> (b, h, w, C)
  bilateral_slice_apply(grid, guide, image, has_offset=True)
      grid (b, gh, gw, gd, no, ni_tot) or packed (b, gh, gw, gd, no*ni_tot)
      guide (b, h, w), image (b, h, w, n_in) -> (b, h, w, no)

The packed rank-5 grid layout flattens (no, ni_tot) row-major
(channel = i * ni_tot + j), matching the reference's tf.reshape pack
(hdrnet/layers.py:139-148).
"""

from __future__ import annotations

import functools
import logging

import jax
import jax.numpy as jnp

from hdrnet_tpu.ops import reference as ref

log = logging.getLogger('hdrnet_tpu.ops')

# Default backend: pallas on TPU, reference elsewhere. Resolved lazily so
# importing this module never touches the TPU runtime.
_DEFAULT_BACKEND = None


def default_backend():
  global _DEFAULT_BACKEND
  if _DEFAULT_BACKEND is None:
    try:
      _DEFAULT_BACKEND = (
          'pallas' if jax.default_backend() == 'tpu' else 'reference')
    except Exception:  # pragma: no cover
      _DEFAULT_BACKEND = 'reference'
  return _DEFAULT_BACKEND


def set_default_backend(name):
  """Force the op backend ('pallas' | 'reference' | 'pallas_interpret',
  optionally with a depth strategy suffix, e.g. 'pallas:loop')."""
  global _DEFAULT_BACKEND
  if name is not None:
    _parse_backend(name)  # validate
  _DEFAULT_BACKEND = name


def _parse_backend(backend):
  """'pallas[:zstrategy]' / 'pallas_interpret[:zstrategy]' / 'reference'
  -> (kind, z_strategy)."""
  kind, _, z = backend.partition(':')
  if kind not in ('pallas', 'reference', 'pallas_interpret'):
    raise ValueError(f'unknown backend: {backend}')
  if kind == 'reference' and z:
    raise ValueError(f'reference backend takes no strategy: {backend}')
  return kind, (z or None)


def _get_impl(backend):
  kind, z_strategy = _parse_backend(backend)
  if kind == 'reference':
    return _REFERENCE_IMPL
  from hdrnet_tpu.ops import pallas as pk
  return pk.get_impl(interpret=(kind == 'pallas_interpret'),
                     z_strategy=z_strategy)


class _ReferenceImpl:
  """Batched wrappers (vmap) around the unbatched oracle functions."""

  @staticmethod
  def forward(grid, guide, image, has_offset):
    fn = functools.partial(ref.bilateral_slice_apply, has_offset=has_offset)
    return jax.vmap(fn)(grid, guide, image)

  @staticmethod
  def vjps(grid, guide, image, ct, has_offset):
    d_grid = jax.vmap(functools.partial(
        ref.bilateral_slice_apply_grid_vjp,
        grid_shape=grid.shape[1:], has_offset=has_offset))(guide, image, ct)
    d_guide = jax.vmap(functools.partial(
        ref.bilateral_slice_apply_guide_vjp,
        has_offset=has_offset))(grid, guide, image, ct)
    d_image = jax.vmap(functools.partial(
        ref.bilateral_slice_apply_input_vjp,
        has_offset=has_offset))(grid, guide, ct)
    return d_grid, d_guide, d_image


_REFERENCE_IMPL = _ReferenceImpl


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _slice_apply(grid, guide, image, has_offset, backend):
  return _get_impl(backend).forward(grid, guide, image, has_offset)


def _slice_apply_fwd(grid, guide, image, has_offset, backend):
  out = _get_impl(backend).forward(grid, guide, image, has_offset)
  return out, (grid, guide, image)


def _slice_apply_bwd(has_offset, backend, res, ct):
  grid, guide, image = res
  d_grid, d_guide, d_image = _get_impl(backend).vjps(
      grid, guide, image, ct, has_offset)
  return (d_grid.astype(grid.dtype), d_guide.astype(guide.dtype),
          d_image.astype(image.dtype))


_slice_apply.defvjp(_slice_apply_fwd, _slice_apply_bwd)


def bilateral_slice_apply(grid, guide, image, has_offset=True, backend=None,
                          z_strategy=None):
  """Fused bilateral slice + per-pixel affine apply. Differentiable.

  Args:
    grid: (b, gh, gw, gd, no, ni_tot) or packed (b, gh, gw, gd, no*ni_tot).
    guide: (b, h, w) in [0, 1].
    image: (b, h, w, n_in); n_in = ni_tot - 1 if has_offset else ni_tot.
    has_offset: whether the last grid input-channel is an additive offset.
    backend: op backend override; defaults to pallas on TPU. May carry a
      depth strategy suffix ('pallas:loop').
    z_strategy: Pallas depth-contraction strategy ('unroll' | 'loop');
      overrides any suffix in `backend`.

  Returns:
    (b, h, w, no).
  """
  backend = backend or default_backend()
  if z_strategy is not None and backend != 'reference':
    backend = backend.partition(':')[0] + ':' + z_strategy
  if backend.startswith('pallas'):
    from hdrnet_tpu.ops import pallas as pk
    gh, gw = grid.shape[1], grid.shape[2]
    if not pk.feasible(guide.shape[1], guide.shape[2], gh, gw):
      log.warning(
          'bilateral_slice_apply: image %dx%d infeasible for the pallas '
          'tile planner with grid %dx%d; falling back to the XLA '
          'reference path (slower)', guide.shape[1], guide.shape[2], gh,
          gw)
      backend = 'reference'  # image too small relative to grid
  packed = grid.ndim == 5
  if packed:
    n_in = image.shape[-1]
    ni_tot = n_in + 1 if has_offset else n_in
    if grid.shape[-1] % ni_tot:
      raise ValueError(
          f'packed grid channels {grid.shape[-1]} not divisible by {ni_tot}')
    no = grid.shape[-1] // ni_tot
    grid = grid.reshape(grid.shape[:-1] + (no, ni_tot))
  elif grid.ndim != 6:
    raise ValueError(f'grid must be rank 5 or 6, got {grid.shape}')
  return _slice_apply(grid, guide, image, bool(has_offset), backend)


def bilateral_slice(grid, guide, backend=None):
  """Batched trilinear slice of a bilateral grid. Differentiable.

  grid: (b, gh, gw, gd, C), guide: (b, h, w) -> (b, h, w, C).

  Implemented as slice-apply with a zero-channel input and an offset-only
  grid; gradients match the reference BilateralSlice VJPs
  (ops/bilateral_slice.cc:72-168).
  """
  b, gh, gw, gd, c = grid.shape
  h, w = guide.shape[1:]
  empty = jnp.zeros((b, h, w, 0), dtype=guide.dtype)
  grid6 = grid.reshape(b, gh, gw, gd, c, 1)
  return bilateral_slice_apply(grid6, guide, empty, has_offset=True,
                               backend=backend)
