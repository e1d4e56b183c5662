"""Golden tests against the reference's OWN JAX implementation.

The reference ships a pure-JAX bilateral_slice with custom VJPs
(jax/bilateral_slice.py) that its tests treat as ground truth vs the
TF2 C++ op (hdrnet_ops_jax_tf2_test.py:26-48). When the reference tree
is mounted (read-only) we import that module at runtime — via a
symlinked shim package, since its directory is named 'jax' — and gate
our ops against reference-authored code directly. Nothing is copied;
these tests skip when the mount is absent.
"""

import importlib
import os
import sys
import tempfile

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hdrnet_tpu.ops import bilateral_slice

_REF = '/root/reference/jax'


@pytest.fixture(scope='module')
def ref_slice():
  if not os.path.exists(os.path.join(_REF, 'bilateral_slice.py')):
    pytest.skip('reference tree not mounted')
  tmp = tempfile.mkdtemp(prefix='refjax_')
  pkg = os.path.join(tmp, 'reference_jax')
  os.makedirs(pkg)
  open(os.path.join(pkg, '__init__.py'), 'w').close()
  for name in ('bilateral_slice.py', 'numerics.py'):
    os.symlink(os.path.join(_REF, name), os.path.join(pkg, name))
  sys.path.insert(0, tmp)
  try:
    mod = importlib.import_module('reference_jax.bilateral_slice')
  finally:
    sys.path.remove(tmp)
  return mod


def _data(seed, gh=16, gw=12, gd=8, gc=2, h=64, w=48):
  rng = np.random.RandomState(seed)
  grid = jnp.asarray(rng.randn(gh, gw, gd, gc), jnp.float32)
  guide = jnp.asarray(rng.rand(h, w), jnp.float32)
  return grid, guide


def test_forward_matches_reference_authored_code(ref_slice):
  """Config mirrors the reference's own conformance test
  (grid (16,12,8,2), guide 640x480 scaled down for CPU)."""
  grid, guide = _data(0)
  want = np.asarray(ref_slice.bilateral_slice(grid, guide))
  for backend in ('reference', 'pallas_interpret'):
    got = bilateral_slice(grid[None], guide[None], backend=backend)[0]
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5,
                               err_msg=backend)


def test_vjps_match_reference_authored_code(ref_slice):
  grid, guide = _data(1)
  rng = np.random.RandomState(2)
  probe = jnp.asarray(rng.randn(*guide.shape, grid.shape[-1]), jnp.float32)

  def theirs(grid, guide):
    return jnp.vdot(ref_slice.bilateral_slice(grid, guide), probe)

  def ours(grid, guide):
    out = bilateral_slice(grid[None], guide[None], backend='reference')[0]
    return jnp.vdot(out, probe)

  dg_t, dgd_t = jax.grad(theirs, argnums=(0, 1))(grid, guide)
  dg_o, dgd_o = jax.grad(ours, argnums=(0, 1))(grid, guide)
  # Their grid VJP uses tap-splat with boundary overrides; ours is the
  # C++ direct-eval formulation — identical up to the eps smoothing.
  np.testing.assert_allclose(np.asarray(dg_o), np.asarray(dg_t),
                             atol=5e-5)
  np.testing.assert_allclose(np.asarray(dgd_o), np.asarray(dgd_t),
                             atol=5e-5)
