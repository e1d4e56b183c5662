"""Conformance gate: Pallas kernels vs the pure-jnp oracle.

Runs the kernels in interpreter mode on CPU (the driver/bench exercise
the compiled TPU path). Mirrors the reference's cross-implementation
golden tests (hdrnet_ops_jax_tf2_test.py:26-48) at <= 1e-5.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hdrnet_tpu.ops import bilateral_slice, bilateral_slice_apply
from hdrnet_tpu.ops import pallas as pk

ATOL = 1e-5


def _args(seed, b, gh, gw, gd, no, ni, h, w, offset=True):
  rng = np.random.RandomState(seed)
  ni1 = ni + (1 if offset else 0)
  grid = jnp.asarray(rng.randn(b, gh, gw, gd, no, ni1), jnp.float32)
  guide = jnp.asarray(rng.rand(b, h, w), jnp.float32)
  image = jnp.asarray(rng.rand(b, h, w, ni), jnp.float32)
  return grid, guide, image


CASES = [
    # (b, gh, gw, gd, no, ni, h, w) — odd sizes, non-divisible ratios
    (1, 4, 4, 8, 3, 3, 64, 130),
    (2, 3, 5, 4, 3, 3, 37, 129),
    (1, 16, 16, 8, 3, 3, 130, 257),
    # The reference's best quality config l16/s32 (compare_to_unet.py:46)
    (1, 32, 32, 16, 3, 3, 140, 160),
]


@pytest.mark.parametrize('case', CASES)
@pytest.mark.quick
def test_forward_matches_oracle(case):
  grid, guide, image = _args(0, *case)
  want = bilateral_slice_apply(grid, guide, image, backend='reference')
  got = bilateral_slice_apply(grid, guide, image,
                              backend='pallas_interpret')
  np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=ATOL)


def test_forward_no_offset():
  grid, guide, image = _args(1, 1, 4, 4, 5, 2, 3, 40, 129, offset=False)
  want = bilateral_slice_apply(grid, guide, image, has_offset=False,
                               backend='reference')
  got = bilateral_slice_apply(grid, guide, image, has_offset=False,
                              backend='pallas_interpret')
  np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=ATOL)


def test_plain_slice_matches_oracle():
  rng = np.random.RandomState(2)
  grid = jnp.asarray(rng.randn(1, 4, 4, 8, 6), jnp.float32)
  guide = jnp.asarray(rng.rand(1, 48, 130), jnp.float32)
  want = bilateral_slice(grid, guide, backend='reference')
  got = bilateral_slice(grid, guide, backend='pallas_interpret')
  np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=ATOL)


def test_guide_out_of_range_matches_oracle():
  """Clamp semantics for guide outside [0, 1]."""
  grid, guide, image = _args(3, 1, 4, 4, 4, 3, 3, 40, 129)
  guide = guide * 3.0 - 1.0
  want = bilateral_slice_apply(grid, guide, image, backend='reference')
  got = bilateral_slice_apply(grid, guide, image,
                              backend='pallas_interpret')
  np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=ATOL)


def test_vjps_match_oracle():
  grid, guide, image = _args(4, 1, 4, 4, 5, 3, 3, 48, 129)
  rng = np.random.RandomState(5)

  def run(backend):
    def loss(grid, guide, image):
      out = bilateral_slice_apply(grid, guide, image, backend=backend)
      return jnp.vdot(out, probe)
    out = bilateral_slice_apply(grid, guide, image, backend=backend)
    return out, jax.grad(loss, argnums=(0, 1, 2))(grid, guide, image)

  probe = jnp.asarray(rng.randn(1, 48, 129, 3), jnp.float32)
  _, (dg_r, dgd_r, di_r) = run('reference')
  _, (dg_p, dgd_p, di_p) = run('pallas_interpret')
  np.testing.assert_allclose(np.asarray(dg_p), np.asarray(dg_r), atol=1e-4)
  np.testing.assert_allclose(np.asarray(dgd_p), np.asarray(dgd_r), atol=1e-4)
  np.testing.assert_allclose(np.asarray(di_p), np.asarray(di_r), atol=1e-4)


def test_grid_bwd_kernel_matches_oracle():
  """The Pallas grid-cotangent splat kernel vs the einsum oracle,
  including the z-extreme override and mirror-boundary regions."""
  import functools
  from hdrnet_tpu.ops import reference as ref

  rng = np.random.RandomState(0)
  b, gh, gw, gd, no, ni = 2, 4, 4, 8, 3, 3
  h, w = 40, 130
  guide = rng.rand(b, h, w).astype(np.float32)
  guide[0, :5] = 0.0   # z-override low (cc:121-125)
  guide[0, 5:9] = 1.0  # z-override high
  image = rng.rand(b, h, w, ni).astype(np.float32)
  ct = rng.rand(b, h, w, no).astype(np.float32)
  want = jax.vmap(functools.partial(
      ref.bilateral_slice_apply_grid_vjp,
      grid_shape=(gh, gw, gd, no, ni + 1), has_offset=True))(
      jnp.asarray(guide), jnp.asarray(image), jnp.asarray(ct))
  got = pk.slice_apply_grid_bwd(
      (gh, gw, gd), jnp.asarray(guide),
      jnp.transpose(jnp.asarray(image), (0, 3, 1, 2)),
      jnp.transpose(jnp.asarray(ct), (0, 3, 1, 2)), no, ni, True,
      interpret=True).reshape(b, gh, gw, gd, no, ni + 1)
  scale = float(jnp.abs(want).max())
  np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                             atol=2e-4 * max(scale, 1.0))


@pytest.mark.quick
def test_infeasible_falls_back(caplog):
  """Image smaller than ~1 px/cell: wrapper uses the oracle and logs
  the downgrade (a serving deployment must leave a breadcrumb)."""
  import logging
  grid, guide, image = _args(6, 1, 16, 16, 4, 3, 3, 18, 20)
  with caplog.at_level(logging.WARNING, logger='hdrnet_tpu.ops'):
    out = bilateral_slice_apply(grid, guide, image,
                                backend='pallas_interpret')
  assert any('falling back' in r.message for r in caplog.records)
  want = bilateral_slice_apply(grid, guide, image, backend='reference')
  np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=ATOL)


def test_z_strategy_per_call():
  """'loop' and 'unroll' depth contractions are the same math; both are
  selectable per call (no env var / re-import needed)."""
  grid, guide, image = _args(7, 1, 4, 4, 4, 3, 3, 40, 129)
  base = bilateral_slice_apply(grid, guide, image, backend='reference')
  for z in ('unroll', 'loop'):
    got = bilateral_slice_apply(grid, guide, image,
                                backend='pallas_interpret', z_strategy=z)
    np.testing.assert_allclose(np.asarray(got), np.asarray(base),
                               atol=ATOL)
  got = bilateral_slice_apply(grid, guide, image,
                              backend='pallas_interpret:loop')
  np.testing.assert_allclose(np.asarray(got), np.asarray(base), atol=ATOL)


@pytest.mark.quick
def test_tile_planner_windows():
  for h, w, gh, gw in [(1080, 1920, 16, 16), (2160, 3840, 16, 16),
                       (512, 512, 16, 16), (2048, 2048, 32, 32),
                       (511, 1031, 16, 16)]:
    plans = pk.plan_tiles(h, w, gh, gw)
    assert plans is not None, (h, w)
    yp, xp = plans
    assert yp.n_cells <= pk._MAX_CELLS_Y and xp.n_cells <= pk._MAX_CELLS_X
    assert yp.tile * yp.n_tiles >= h and xp.tile * xp.n_tiles >= w


def test_strip_loop_matches_straightline(monkeypatch):
  """The strip-loop kernel path (vreg-resident row strips, default on
  TPU for 32-row-divisible tiles) is the same arithmetic as the
  straight-line kernel, for the forward and both pixelwise VJPs."""
  grid, guide, image = _args(8, 1, 8, 8, 8, 3, 3, 64, 132)
  # Quantize the guide so no z tap sits at the smoothed-tent cutoff
  # (|dx| = 1), where dwz is discontinuous and a 1-ulp reassociation
  # difference between the two compilations flips isolated pixels.
  guide = (jnp.round(guide * 64.0) + 0.5) / 64.0
  rng = np.random.RandomState(9)
  probe = jnp.asarray(rng.randn(1, 64, 132, 3), jnp.float32)

  def run():
    def loss(grid, guide, image):
      out = bilateral_slice_apply(grid, guide, image,
                                  backend='pallas_interpret')
      return jnp.vdot(out, probe)
    out = bilateral_slice_apply(grid, guide, image,
                                backend='pallas_interpret')
    return out, jax.grad(loss, argnums=(1, 2))(grid, guide, image)

  monkeypatch.setattr(pk, '_TILE_OVERRIDE', (32, 128))
  monkeypatch.setattr(pk, '_DEFAULT_STRIP', 7)  # 32 % 7 != 0: strip off
  base, (dgd_b, di_b) = run()
  monkeypatch.setattr(pk, '_DEFAULT_STRIP', 8)  # 4 strips per tile
  got, (dgd_s, di_s) = run()
  np.testing.assert_allclose(np.asarray(got), np.asarray(base), atol=1e-5)
  np.testing.assert_allclose(np.asarray(dgd_s), np.asarray(dgd_b),
                             atol=1e-4)
  np.testing.assert_allclose(np.asarray(di_s), np.asarray(di_b),
                             atol=1e-4)


def test_wide_x_window_small_image():
  """256-ish images with a 16-cell grid (the coarsest Gaussian-pyramid
  level) need an x-cell window of ~10 — admitted by the asymmetric
  _MAX_CELLS_X cap — and must match the oracle, fwd and all VJPs."""
  case = (1, 16, 16, 4, 3, 3, 96, 256)
  grid, guide, image = _args(11, *case)
  assert pk.feasible(96, 256, 16, 16)
  want = bilateral_slice_apply(grid, guide, image, backend='reference')
  got = bilateral_slice_apply(grid, guide, image,
                              backend='pallas_interpret')
  np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=ATOL)

  def loss(fn):
    def f(g, gu, im):
      return jnp.sum(jnp.sin(bilateral_slice_apply(g, gu, im, backend=fn)))
    return f
  want_g = jax.grad(loss('reference'), argnums=(0, 1, 2))(grid, guide, image)
  got_g = jax.grad(loss('pallas_interpret'), argnums=(0, 1, 2))(
      grid, guide, image)
  for a, b in zip(got_g, want_g):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)


def test_u8_io_matches_f32_path():
  """uint8 streaming IO: in-kernel dequantize (x/255) and epilogue
  requantize must reproduce the f32 path exactly (dequantize uses the
  same division; requantize is the round-half-up imwrite conversion).
  Size chosen so the tile plan is u8-capable (th % 32 == 0)."""
  rng = np.random.RandomState(13)
  grid5 = jnp.asarray(rng.randn(1, 16, 16, 8, 12) * 0.05, jnp.float32)
  img_u8 = jnp.asarray(rng.randint(0, 256, (1, 3, 576, 384)), jnp.uint8)
  ccm = jnp.asarray(rng.randn(4, 3) * 0.3, jnp.float32)
  curves = jnp.asarray(rng.rand(6, 16), jnp.float32)
  mix = jnp.asarray(rng.rand(4, 1), jnp.float32)
  gp = (ccm, curves, mix)

  plans = pk.plan_tiles(576, 384, 16, 16)
  assert plans is not None and plans[0].tile % 32 == 0, plans

  img_f32 = img_u8.astype(jnp.float32) / 255.0
  want = pk.enhance_fused(grid5, img_f32, gp, 'curves', 3, 3, True,
                          clip_output=True, interpret=True)
  want_u8 = (want * 255.0 + 0.5).astype(jnp.uint8)

  got = pk.enhance_fused(grid5, img_u8, gp, 'curves', 3, 3, True,
                         clip_output=True, u8_output=True,
                         interpret=True)
  assert got.dtype == jnp.uint8
  np.testing.assert_array_equal(np.asarray(got), np.asarray(want_u8))


def test_maxfma_curves_guide_matches_relu_form(monkeypatch):
  """The 'maxfma' curves-guide rewrite (slope*max(g-s,0) == slope*max(g,s)
  - slope*s, with mix and the constant terms folded at tile level) is
  algebraically identical to the reference form (models.py:163-175) —
  only f32 reassociation differs, so the fused output must agree to a
  few ULPs, far inside the 1e-4 serving gate. Both sides pin the env
  explicitly so an ambient HDRNET_TPU_CURVES_IMPL can't make the
  comparison vacuous (and monkeypatch restores the user's setting)."""
  rng = np.random.RandomState(19)
  grid5 = jnp.asarray(rng.randn(1, 16, 16, 8, 12) * 0.05, jnp.float32)
  img = jnp.asarray(rng.rand(1, 3, 192, 256), jnp.float32)
  ccm = jnp.asarray(rng.randn(4, 3) * 0.3, jnp.float32)
  curves = jnp.asarray(rng.rand(6, 16), jnp.float32)
  mix = jnp.asarray(rng.rand(4, 1), jnp.float32)
  gp = (ccm, curves, mix)
  monkeypatch.setenv('HDRNET_TPU_CURVES_IMPL', 'relu')
  want = pk.enhance_fused(grid5, img, gp, 'curves', 3, 3, True,
                          clip_output=True, interpret=True)
  monkeypatch.setenv('HDRNET_TPU_CURVES_IMPL', 'maxfma')
  got = pk.enhance_fused(grid5, img, gp, 'curves', 3, 3, True,
                         clip_output=True, interpret=True)
  np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_bf16_compute_within_serving_tolerance():
  """Opt-in bf16 contraction (serving fast path): clipped output must
  stay within 2/255 of the f32 path — below the uint8 quantization the
  reference's own fp16 GL deployment path already accepts
  (renderer.cc:227-253 uploads RGBA16F textures)."""
  rng = np.random.RandomState(17)
  grid5 = jnp.asarray(rng.randn(1, 16, 16, 8, 12) * 0.05, jnp.float32)
  img = jnp.asarray(rng.rand(1, 3, 192, 256), jnp.float32)
  ccm = jnp.asarray(rng.randn(4, 3) * 0.3, jnp.float32)
  curves = jnp.asarray(rng.rand(6, 16), jnp.float32)
  mix = jnp.asarray(rng.rand(4, 1), jnp.float32)
  gp = (ccm, curves, mix)
  want = pk.enhance_fused(grid5, img, gp, 'curves', 3, 3, True,
                          clip_output=True, interpret=True)
  got = pk.enhance_fused(grid5, img, gp, 'curves', 3, 3, True,
                         clip_output=True, interpret=True,
                         compute_dtype='bfloat16')
  np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                             atol=2.0 / 255.0)


@pytest.mark.slow
def test_vjps_match_oracle_l16_s32_geometry():
  """All three cotangents at the reference's best quality config
  (l16/s32, compare_to_unet.py:46) — gd=16 doubles the depth
  contraction; the queue trains this geometry for real."""
  grid, guide, image = _args(21, 1, 32, 32, 16, 3, 3, 140, 160)
  rng = np.random.RandomState(22)
  probe = jnp.asarray(rng.randn(1, 140, 160, 3), jnp.float32)

  def run(backend):
    def loss(grid, guide, image):
      out = bilateral_slice_apply(grid, guide, image, backend=backend)
      return jnp.vdot(out, probe)
    return jax.grad(loss, argnums=(0, 1, 2))(grid, guide, image)

  dg_r, dgd_r, di_r = run('reference')
  dg_p, dgd_p, di_p = run('pallas_interpret')
  np.testing.assert_allclose(np.asarray(dg_p), np.asarray(dg_r), atol=1e-4)
  np.testing.assert_allclose(np.asarray(dgd_p), np.asarray(dgd_r), atol=1e-4)
  np.testing.assert_allclose(np.asarray(di_p), np.asarray(di_r), atol=1e-4)
