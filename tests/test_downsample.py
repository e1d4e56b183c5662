"""Pallas preview-downsample kernel vs the resize_nearest table.

The serving pipeline's per-frame 256x256 preview (the reference's
cv::resize INTER_NEAREST inside the measured iteration,
processor.cc:110-122) runs as a Pallas kernel (ops/downsample.py).
f32 frames must match resize_nearest BIT-exactly (one-hot HIGHEST
matmul). uint8 frames are selected exactly, but the post-selection
normalize lowers as multiply-by-reciprocal under XLA (constant-divisor
strength reduction) — 1 ulp vs numpy's true division.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hdrnet_tpu.ops.downsample import (nearest_lowres_cf, pallas_feasible,
                                       _plan, _gather_plan)
from hdrnet_tpu.ops.resize import _nearest_indices

SIZES = [(270, 480, 32), (135, 240, 64),
         pytest.param((256, 256, 64), marks=pytest.mark.slow),
         pytest.param((512, 512, 64), marks=pytest.mark.slow)]
VARIANTS = ['slab', 'gather']


@pytest.mark.parametrize('variant', VARIANTS)
@pytest.mark.parametrize('size', SIZES)
def test_f32_bit_exact(size, variant):
  h, w, s = size
  rng = np.random.RandomState(0)
  x = jnp.asarray(rng.rand(1, 3, h, w), np.float32)
  assert pallas_feasible(h, w, s), _plan(h, w, s)
  assert _gather_plan(1, 3, h, w, s) is not None
  got = nearest_lowres_cf(x, s, interpret=True, variant=variant)
  iy, ix = _nearest_indices(h, s), _nearest_indices(w, s)
  ref = np.asarray(x)[:, :, iy][:, :, :, ix]
  np.testing.assert_array_equal(np.asarray(got), ref)


@pytest.mark.parametrize('variant', VARIANTS)
@pytest.mark.parametrize('size', SIZES[:2])
def test_u8_within_one_ulp(size, variant):
  h, w, s = size
  rng = np.random.RandomState(1)
  x = jnp.asarray(rng.randint(0, 256, (1, 3, h, w)), jnp.uint8)
  got = nearest_lowres_cf(x, s, interpret=True, variant=variant)
  iy, ix = _nearest_indices(h, s), _nearest_indices(w, s)
  ref = np.asarray(x)[:, :, iy][:, :, :, ix].astype(np.float32) / 255.0
  np.testing.assert_allclose(np.asarray(got), ref, atol=1e-7)
  # The requantized preview is identical either way.
  np.testing.assert_array_equal(
      np.asarray(got * 255.0 + 0.5).astype(np.uint8),
      (ref * 255.0 + 0.5).astype(np.uint8))


def test_batched_gather():
  h, w, s = 135, 240, 64
  rng = np.random.RandomState(2)
  x = jnp.asarray(rng.rand(3, 3, h, w), np.float32)
  got = nearest_lowres_cf(x, s, interpret=True, variant='gather')
  iy, ix = _nearest_indices(h, s), _nearest_indices(w, s)
  ref = np.asarray(x)[:, :, iy][:, :, :, ix]
  np.testing.assert_array_equal(np.asarray(got), ref)


@pytest.mark.parametrize('dtype', ['f32', 'u8'])
def test_batched_slab_one_pass(dtype):
  """b=4 slab path: the batch is folded into the contraction's M dim
  (one MXU pass per row group serves every frame); outputs must stay
  exact per frame."""
  h, w, s = 270, 480, 32
  rng = np.random.RandomState(3)
  if dtype == 'u8':
    x = jnp.asarray(rng.randint(0, 256, (4, 3, h, w)), jnp.uint8)
  else:
    x = jnp.asarray(rng.rand(4, 3, h, w), np.float32)
  assert pallas_feasible(h, w, s, b=4, itemsize=x.dtype.itemsize)
  got = nearest_lowres_cf(x, s, interpret=True, variant='slab')
  iy, ix = _nearest_indices(h, s), _nearest_indices(w, s)
  ref = np.asarray(x)[:, :, iy][:, :, :, ix]
  if dtype == 'u8':
    np.testing.assert_allclose(np.asarray(got),
                               ref.astype(np.float32) / 255.0, atol=1e-7)
  else:
    np.testing.assert_array_equal(np.asarray(got), ref)


@pytest.mark.quick
def test_serving_plans_exist():
  for h, w in [(2160, 3840), (1080, 1920), (2048, 2048), (1024, 1024)]:
    assert pallas_feasible(h, w, 256), (h, w)
    assert _gather_plan(1, 3, h, w, 256) is not None, (h, w)
