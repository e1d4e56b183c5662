"""Conformance tests for the pure-jnp oracle ops.

Mirrors the reference test strategy (SURVEY.md §4):
  * a literal per-pixel numpy loop (independent transcription of the C++
    kernel semantics, ops/bilateral_slice_apply.cc:24-82) cross-validates
    the vectorized oracle;
  * exact interpolation at bin centers (tol 5e-4, test/ops_test.py:86);
  * finite-difference gradient checks at the reference tolerances
    (hdrnet_ops_test.py:174-180: 3e-3 slice, 3e-4 apply grid/input,
    1e-2 guide);
  * tiny-optimization convergence ("fit a sine", test/ops_test.py:189-322).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hdrnet_tpu.ops import reference as ref
from hdrnet_tpu.ops import bilateral_slice, bilateral_slice_apply

EPS = 1e-8


# ---------------------------------------------------------------------------
# Literal numpy spec (slow loops, tiny shapes only)
# ---------------------------------------------------------------------------


def _lerp_w(x, xs):
  return max(1.0 - abs(x - xs), 0.0)


def _slerp_w(x, xs):
  return max(1.0 - np.sqrt((x - xs) ** 2 + EPS), 0.0)


def np_slice_apply(grid, guide, image, has_offset=True):
  """Per-pixel transcription of BilateralSliceApply (cc:24-82)."""
  gh, gw, gd, no, ni_tot = grid.shape
  h, w = guide.shape
  n_in = image.shape[-1]
  sy, sx = gh / h, gw / w
  out = np.zeros((h, w, no), np.float64)
  for y in range(h):
    for x in range(w):
      gyf, gxf = (y + 0.5) * sy, (x + 0.5) * sx
      gzf = guide[y, x] * gd
      gy0 = int(np.floor(gyf - 0.5))
      gx0 = int(np.floor(gxf - 0.5))
      gz0 = int(np.floor(gzf - 0.5))
      for i in range(no):
        val = 0.0
        for j in range(ni_tot):
          s = 0.0
          for gy in (gy0, gy0 + 1):
            wy = _lerp_w(gy + 0.5, gyf)
            for gx in (gx0, gx0 + 1):
              wx = _lerp_w(gx + 0.5, gxf)
              for gz in (gz0, gz0 + 1):
                wz = _slerp_w(gz + 0.5, gzf)
                s += wy * wx * wz * grid[np.clip(gy, 0, gh - 1),
                                         np.clip(gx, 0, gw - 1),
                                         np.clip(gz, 0, gd - 1), i, j]
          if j < n_in:
            val += s * image[y, x, j]
          else:
            val += s  # offset
        out[y, x, i] = val
  return out


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


@pytest.mark.parametrize('h,w,gh,gw,gd', [(24, 16, 4, 3, 8), (10, 11, 3, 5, 4)])
@pytest.mark.quick
def test_apply_forward_matches_loop_spec(h, w, gh, gw, gd):
  rng = np.random.RandomState(1234)
  no, ni = 3, 3
  grid = rng.randn(gh, gw, gd, no, ni + 1).astype(np.float32)
  guide = rng.rand(h, w).astype(np.float32)
  image = rng.rand(h, w, ni).astype(np.float32)
  want = np_slice_apply(grid, guide, image)
  got = ref.bilateral_slice_apply(jnp.asarray(grid), jnp.asarray(guide),
                                  jnp.asarray(image))
  np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_apply_no_offset():
  rng = np.random.RandomState(0)
  grid = rng.randn(3, 3, 4, 2, 3).astype(np.float32)
  guide = rng.rand(12, 8).astype(np.float32)
  image = rng.rand(12, 8, 3).astype(np.float32)
  want = np_slice_apply(grid, guide, image, has_offset=False)
  got = ref.bilateral_slice_apply(jnp.asarray(grid), jnp.asarray(guide),
                                  jnp.asarray(image), has_offset=False)
  np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


@pytest.mark.quick
def test_slice_exact_at_bin_centers():
  """Guide at bin centers + image aligned with grid cells returns exact
  grid values (cf. test/ops_test.py:61-86, tol 5e-4)."""
  gh, gw, gd, c = 4, 5, 8, 3
  # Image size = multiple of grid so pixel centers can hit cell centers.
  h, w = gh * 9, gw * 9
  rng = np.random.RandomState(7)
  grid = rng.randn(gh, gw, gd, c).astype(np.float32)
  # Choose pixels whose (x+0.5)*scale lands exactly on cell centers:
  # x = (a + 0.5) * (h/gh) - 0.5 must be integer -> h/gh odd (9). Good.
  k = 2  # depth bin
  guide = np.full((h, w), (k + 0.5) / gd, np.float32)
  sliced = np.asarray(ref.bilateral_slice(jnp.asarray(grid),
                                          jnp.asarray(guide)))
  for a in range(gh):
    y = int((a + 0.5) * (h / gh) - 0.5)
    for b in range(gw):
      x = int((b + 0.5) * (w / gw) - 0.5)
      np.testing.assert_allclose(sliced[y, x], grid[a, b, k], atol=5e-4)


@pytest.mark.quick
def test_batched_api_shapes():
  rng = np.random.RandomState(3)
  b, gh, gw, gd, no, ni = 2, 3, 4, 8, 3, 3
  h, w = 13, 17  # odd, non-divisible sizes (cf. ops_test.py:45-47)
  grid = jnp.asarray(rng.randn(b, gh, gw, gd, no, ni + 1), jnp.float32)
  guide = jnp.asarray(rng.rand(b, h, w), jnp.float32)
  image = jnp.asarray(rng.rand(b, h, w, ni), jnp.float32)
  out = bilateral_slice_apply(grid, guide, image, backend='reference')
  assert out.shape == (b, h, w, no)
  # Packed rank-5 layout agrees with rank-6.
  packed = grid.reshape(b, gh, gw, gd, no * (ni + 1))
  out2 = bilateral_slice_apply(packed, guide, image, backend='reference')
  np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-6)

  sl = bilateral_slice(grid.reshape(b, gh, gw, gd, -1), guide,
                       backend='reference')
  assert sl.shape == (b, h, w, no * (ni + 1))


# ---------------------------------------------------------------------------
# Gradients (finite differences against the custom VJP)
# ---------------------------------------------------------------------------


def _fd_check(f, args, wrt, tol, delta=1e-3, seed=0):
  """Directional derivative vs custom-VJP gradient, float64."""
  rng = np.random.RandomState(seed)
  args = [jnp.asarray(a, jnp.float64) for a in args]

  def scalar_f(x):
    new = list(args)
    new[wrt] = x
    out = f(*new)
    return jnp.vdot(out, probe)

  out0 = f(*args)
  probe = jnp.asarray(rng.randn(*out0.shape))
  v = jnp.asarray(rng.randn(*args[wrt].shape))
  g = jax.grad(scalar_f)(args[wrt])
  got = jnp.vdot(g, v)
  fp = scalar_f(args[wrt] + delta * v)
  fm = scalar_f(args[wrt] - delta * v)
  want = (fp - fm) / (2 * delta)
  np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=tol,
                             atol=tol * float(jnp.abs(want) + 1.0))


@pytest.fixture(scope='module')
def x64():
  with jax.enable_x64(True):
    yield


def _kink_safe_guide(rng, shape, gd, margin=0.1):
  """Random guide whose gzf = guide*gd stays `margin` away from the
  half-integer tent kinks, so central differences see a smooth function.
  (The reference instead used tiny deltas + loose tolerances,
  hdrnet_ops_test.py:175-180.)"""
  cell = rng.randint(0, gd, size=shape)
  frac = 0.5 + margin + rng.rand(*shape) * (0.5 - 2 * margin)  # in cell+.6..9
  return (cell + frac - 0.5) / gd  # gzf in cell + [margin+0.0.., 0.5-margin]


@pytest.fixture(scope='module')
def apply_args():
  rng = np.random.RandomState(42)
  b, gh, gw, gd, no, ni = 1, 3, 4, 5, 3, 3
  h, w = 15, 12
  grid = rng.randn(b, gh, gw, gd, no, ni + 1)
  guide = _kink_safe_guide(rng, (b, h, w), gd)
  image = rng.rand(b, h, w, ni)
  return grid, guide, image


def f_apply(grid, guide, image):
  return bilateral_slice_apply(grid, guide, image, backend='reference')


@pytest.mark.slow
def test_apply_grid_grad_fd(x64, apply_args):
  _fd_check(f_apply, apply_args, wrt=0, tol=3e-4)


@pytest.mark.slow
def test_apply_input_grad_fd(x64, apply_args):
  _fd_check(f_apply, apply_args, wrt=2, tol=3e-4)


@pytest.mark.slow
def test_apply_guide_grad_fd(x64, apply_args):
  # Guide gradient is intentionally smoothed (eps=1e-8) => loose tol 1e-2
  # (reference: hdrnet_ops_test.py:363).
  _fd_check(f_apply, apply_args, wrt=1, tol=1e-2)


@pytest.mark.slow
def test_slice_grads_fd(x64):
  rng = np.random.RandomState(11)
  grid = rng.randn(1, 3, 4, 6, 4)
  guide = _kink_safe_guide(rng, (1, 14, 10), gd=6)

  def f(grid, guide):
    return bilateral_slice(grid, guide, backend='reference')

  _fd_check(f, [grid, guide], wrt=0, tol=3e-3)
  _fd_check(f, [grid, guide], wrt=1, tol=1e-2, delta=1e-4)


def test_grid_vjp_boundary_rules():
  """z-extreme override: guide pinned at 0 and 1 sends all the gradient
  mass to the first/last depth cell with weight exactly 1
  (bilateral_slice_apply.cc:121-125)."""
  gh, gw, gd = 2, 2, 4
  h, w = 8, 8
  ct = np.ones((h, w, 1), np.float32)
  image = np.zeros((h, w, 0), np.float32)
  for gval, cell in [(0.0, 0), (1.0, gd - 1)]:
    guide = np.full((h, w), gval, np.float32)
    vjp = np.asarray(ref.bilateral_slice_apply_grid_vjp(
        jnp.asarray(guide), jnp.asarray(image), jnp.asarray(ct),
        (gh, gw, gd, 1, 1)))
    mass = vjp.sum(axis=(0, 1, 3, 4))  # per-depth total
    others = [k for k in range(gd) if k != cell]
    assert mass[cell] > 0
    np.testing.assert_allclose(mass[others], 0.0, atol=1e-6)
    # Weight is exactly 1 per contributing pixel: total mass = h*w
    # (x/y tent partitions unity over cells, mirror pad conserves mass).
    np.testing.assert_allclose(mass[cell], h * w, rtol=1e-5)


# ---------------------------------------------------------------------------
# Optimization ("fit a sine") — validates VJPs are usable for learning
# (cf. test/ops_test.py:189-322)
# ---------------------------------------------------------------------------


def test_optimize_grid_fits_target():
  rng = np.random.RandomState(5)
  gh, gw, gd, c = 8, 4, 4, 1
  h, w = 32, 32
  guide = jnp.asarray(rng.rand(h, w), jnp.float32)[None]
  yy = np.linspace(0, 2 * np.pi, h, dtype=np.float32)
  target = jnp.asarray(
      np.tile(0.5 + 0.5 * np.sin(yy)[:, None], (1, w))[..., None])[None]

  grid = jnp.asarray(rng.randn(1, gh, gw, gd, c) * 0.1, jnp.float32)

  def loss(grid):
    out = bilateral_slice(grid, guide, backend='reference')
    return jnp.mean((out - target) ** 2)

  lg = jax.jit(jax.value_and_grad(loss))
  lr = 1.0
  l0 = None
  for _ in range(400):
    l, g = lg(grid)
    if l0 is None:
      l0 = l
    grid = grid - lr * g
  assert float(l) < 0.0085, (float(l0), float(l))
