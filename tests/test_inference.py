"""Fused serving path vs the composite model — must agree <= 1e-5."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hdrnet_tpu.config import ModelConfig
from hdrnet_tpu.inference import Enhancer
from hdrnet_tpu.models import make_model


def _setup(name, **kw):
  cfg = ModelConfig(model_name=name, net_input_size=64, spatial_bin=8,
                    luma_bins=4, guide_complexity=4, **kw)
  model = make_model(cfg)
  rng = np.random.RandomState(0)
  lowres = jnp.asarray(rng.rand(1, 64, 64, 3), jnp.float32)
  fullres = jnp.asarray(rng.rand(1, 96, 128, 3), jnp.float32)
  variables = model.init(jax.random.PRNGKey(0), lowres, fullres,
                         train=True)
  # Perturb BN stats so folding is actually exercised.
  if 'batch_stats' in variables:
    variables = jax.tree_util.tree_map(lambda x: x, variables)
  return cfg, model, variables, lowres, fullres


@pytest.mark.parametrize('name', ['HDRNetCurves', 'HDRNetPointwiseNNGuide',
                                  'HDRNetGaussianPyrNN'])
def test_fused_matches_composite(name):
  cfg, model, variables, lowres, fullres = _setup(name)
  want = model.apply(variables, lowres, fullres)
  enh = Enhancer(config=cfg, variables=variables, interpret=True)
  assert enh.use_fused, 'fused path should be active in interpret mode'
  got = enh(lowres, fullres, clip=False)
  np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_fused_clip_and_cache():
  cfg, model, variables, lowres, fullres = _setup('HDRNetCurves')
  enh = Enhancer(config=cfg, variables=variables, interpret=True)
  out = enh(lowres, fullres)  # clip=True default
  assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0
  # Second call at the same shape hits the jit cache.
  out2 = enh(lowres, fullres)
  np.testing.assert_allclose(np.asarray(out), np.asarray(out2))
  assert len(enh._jitted) == 1


def test_unfused_fallback_on_cpu():
  cfg, model, variables, lowres, fullres = _setup('HDRNetCurves')
  enh = Enhancer(config=cfg, variables=variables, interpret=False)
  # On the CPU test backend the fused kernel is off; composite fallback.
  assert not enh.use_fused
  out = enh(lowres, fullres, clip=False)
  want = model.apply(variables, lowres, fullres)
  np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=1e-6)


def test_in_kernel_clip_matches_external():
  """clip=True runs inside the kernel epilogue (free on TPU); it must
  equal clipping the unclipped fused output."""
  import jax.numpy as jnp
  cfg, model, variables, lowres, fullres = _setup('HDRNetCurves')
  enh = Enhancer(config=cfg, variables=variables, interpret=True)
  unclipped = enh(lowres, fullres, clip=False)
  clipped = enh(lowres, fullres, clip=True)
  np.testing.assert_allclose(np.asarray(clipped),
                             np.clip(np.asarray(unclipped), 0.0, 1.0),
                             atol=1e-7)


def _setup_big(name='HDRNetCurves'):
  """Full HDRNet-sized grid (16x16x8) so real buckets are feasible."""
  cfg = ModelConfig(model_name=name, net_input_size=64, spatial_bin=16,
                    luma_bins=8)
  model = make_model(cfg)
  rng = np.random.RandomState(0)
  lowres = jnp.asarray(rng.rand(1, 64, 64, 3), jnp.float32)
  fullres = jnp.asarray(rng.rand(1, 512, 512, 3), jnp.float32)
  variables = model.init(jax.random.PRNGKey(0), lowres, fullres,
                         train=True)
  return cfg, model, variables, lowres


def test_bucketed_serving_matches_exact():
  """enhance_any pads to a bucket and runs the kernel with the TRUE
  size traced — valid pixels must match the exact-shape fused path."""
  cfg, model, variables, lowres = _setup_big()
  enh = Enhancer(config=cfg, variables=variables, interpret=True)
  rng = np.random.RandomState(1)
  fullres = np.asarray(rng.rand(1, 450, 700, 3), np.float32)
  got = enh.enhance_any(lowres, fullres, clip=False)
  assert got.shape == (1, 450, 700, 3)
  want = enh(lowres, jnp.asarray(fullres), clip=False)
  np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                             atol=1e-6)


def test_bucketed_serving_compile_count():
  """A directory's worth of mixed sizes must NOT compile per shape:
  4 distinct sizes inside 2 buckets -> exactly 2 cache entries
  (the reference serves arbitrary HxW, bin/run.py:87-90; per-shape
  Mosaic compiles would be a compile storm)."""
  cfg, model, variables, lowres = _setup_big()
  enh = Enhancer(config=cfg, variables=variables, interpret=True)
  rng = np.random.RandomState(2)
  sizes = [(450, 700), (512, 768), (460, 712), (480, 680)]
  outs = {}
  for h, w in sizes:
    fullres = np.asarray(rng.rand(1, h, w, 3), np.float32)
    out = enh.enhance_any(lowres, fullres)
    assert out.shape == (1, h, w, 3)
    outs[(h, w)] = (fullres, out)
  assert len(enh._jitted) <= 2, list(enh._jitted)
  # Spot-check one size against the composite model output.
  fullres, out = outs[(512, 768)]
  want = jnp.clip(model.apply(variables, lowres, jnp.asarray(fullres)),
                  0.0, 1.0)
  np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                             atol=2e-5)


@pytest.mark.slow
def test_bucketed_serving_pyramid():
  """Pyramid-family bucketed serving (reference run.py serves arbitrary
  HxW for every model class, bin/run.py:87-90): one compile per bucket
  even though each level's resample depends on the true size. The
  traced-size resample computes tap positions in f32 while the static
  path uses f64 tables, so parity is tolerance- (not bit-) exact."""
  cfg, model, variables, lowres = _setup_big('HDRNetGaussianPyrNN')
  enh = Enhancer(config=cfg, variables=variables, interpret=True)
  rng = np.random.RandomState(3)
  h, w = 440, 680
  fullres = np.asarray(rng.rand(1, h, w, 3), np.float32)
  got = enh.enhance_any(lowres, fullres, clip=False)
  assert got.shape == (1, h, w, 3)
  want = enh(lowres, jnp.asarray(fullres), clip=False)
  # Tap-position flips where an f32 source coordinate lands on an
  # integer the f64 table rounds the other way perturb isolated pixels
  # (~0.006% here) by up to ~1e-3 — below the 1/255 uint8 serving
  # quantum; everything else matches to f32 roundoff.
  np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                             atol=2e-3)
  # Second size in the same bucket: no new kernel compile entries.
  n_entries = len(enh._jitted)
  fullres2 = np.asarray(rng.rand(1, 452, 692, 3), np.float32)
  out2 = enh.enhance_any(lowres, fullres2, clip=False)
  assert out2.shape == (1, 452, 692, 3)
  assert len(enh._jitted) == n_entries, list(enh._jitted)


@pytest.mark.quick
def test_bucket_ladder():
  from hdrnet_tpu.inference import bucket_extent
  assert bucket_extent(450) == (512, 401)
  assert bucket_extent(512) == (512, 401)
  assert bucket_extent(513) == (640, 513)
  assert bucket_extent(2160) == (2560, 2049)
  assert bucket_extent(9000) is None


def test_pyramid_feasibility_covers_all_levels(caplog):
  """GaussianPyrNN at a full-res whose COARSE levels are infeasible for
  the tile planner must fall back to the composite path (with a logged
  downgrade) rather than crash inside enhance_fused (each level halves
  the pixels per grid cell)."""
  import logging
  cfg, model, variables, lowres, _ = _setup('HDRNetGaussianPyrNN')
  enh = Enhancer(config=cfg, variables=variables, interpret=True)
  h = w = cfg.spatial_bin * 4  # level 3 has only one pixel per cell
  assert not enh._feasible_at(h, w)
  fullres = np.random.RandomState(0).rand(1, h, w, 3).astype(np.float32)
  with caplog.at_level(logging.WARNING, logger='hdrnet_tpu.inference'):
    out = enh(lowres, fullres, clip=False)  # composite fallback, no crash
  assert any('composite path' in r.message for r in caplog.records)
  want = model.apply(variables, lowres, fullres)
  np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=2e-5)


def test_stream_matches_per_frame():
  """stream(): uint8 in/out pipeline equals the per-frame path, keeps
  frame order, and reuses one jitted function across frames."""
  cfg, model, variables, lowres, fullres = _setup('HDRNetCurves')
  enh = Enhancer(config=cfg, variables=variables, interpret=False)
  rng = np.random.RandomState(3)
  frames = [(rng.rand(1, 96, 128, 3) * 255).astype(np.uint8)
            for _ in range(5)]
  # Tag each frame so ordering mistakes are detectable.
  for i, f in enumerate(frames):
    f[0, 0, 0, 0] = i * 40

  outs = list(enh.stream(iter(frames), depth=2))
  assert len(outs) == 5
  assert all(o.dtype == np.uint8 for o in outs)

  from hdrnet_tpu.ops.resize import resize_nearest
  for f, got in zip(frames, outs):
    full = jnp.asarray(f, jnp.float32) / 255.0
    low = resize_nearest(full, (64, 64))
    want = enh(low, full, clip=True)
    want_u8 = np.asarray(want * 255.0 + 0.5).astype(np.uint8)
    # +-1 codes: XLA may reassociate the normalize/requantize arithmetic
    # differently inside the single fused stream program, which can flip
    # a value sitting exactly on a rounding boundary.
    diff = got.astype(int) - want_u8.astype(int)
    assert np.abs(diff).max() <= 1
    assert (diff != 0).mean() < 0.01
  # One stream fn + one per-frame fn in the jit cache.
  assert ('stream', (1, 96, 128, 3)) in enh._jitted


def test_coeff_bf16_backbone_close():
  """Opt-in bf16 coefficient backbone: grid within bf16 tolerance of f32
  and the fused output within ~1 u8 quantum."""
  cfg, model, variables, lowres, fullres = _setup('HDRNetCurves')
  f32 = Enhancer(config=cfg, variables=variables, interpret=True)
  b16 = Enhancer(config=cfg, variables=variables, interpret=True,
                 coeff_bf16=True)
  assert not f32.coeff_bf16 and b16.coeff_bf16
  g_f32 = np.asarray(f32._backbone_grid(lowres))
  g_b16 = np.asarray(b16._backbone_grid(lowres))
  assert g_b16.dtype == np.float32
  scale = max(1.0, float(np.abs(g_f32).max()))
  assert np.abs(g_b16 - g_f32).max() / scale < 3e-2
  out_f32 = np.asarray(f32(lowres, fullres, clip=False))
  out_b16 = np.asarray(b16(lowres, fullres, clip=False))
  # Random-init outputs span ~[-2.3, 1]; gate on relative error (the
  # absolute effect on a trained [0,1]-range model is measured on-chip
  # by eval-PSNR A/B, scripts/bench_models.py --coeff_bf16).
  rel = np.abs(out_b16 - out_f32).max() / max(1.0,
                                              float(np.abs(out_f32).max()))
  assert rel < 2e-2, rel
