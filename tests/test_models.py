"""Model-family tests: shapes, init semantics, grad flow, intermediates.

Small shapes (net_input_size=64, spatial_bin=8) keep the CPU suite fast;
the backbone's depth is derived from log2(net_input_size/spatial_bin)
exactly like the reference (models.py:70), so the topology matches the
256/16 production config.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hdrnet_tpu.config import ModelConfig
from hdrnet_tpu.models import MODELS, make_model
from hdrnet_tpu.training.metrics import l2_loss, psnr


def small_cfg(name, **kw):
  if name.startswith('StyleTransfer'):
    kw.setdefault('n_in', 6)
  return ModelConfig(model_name=name, net_input_size=64, spatial_bin=8,
                     luma_bins=4, guide_complexity=4, depth=3, width=8,
                     **kw)


def _data(rng, b=2, low=64, h=96, w=112, c=3):
  lowres = jnp.asarray(rng.rand(b, low, low, c), jnp.float32)
  fullres = jnp.asarray(rng.rand(b, h, w, c), jnp.float32)
  return lowres, fullres


@pytest.mark.parametrize('name', sorted(MODELS))
def test_forward_shapes_and_grads(name):
  rng = np.random.RandomState(0)
  cfg = small_cfg(name)
  model = make_model(cfg)
  lowres, fullres = _data(rng, c=cfg.n_in)
  variables = model.init(jax.random.PRNGKey(0), lowres, fullres)
  out = model.apply(variables, lowres, fullres)
  assert out.shape == fullres.shape[:3] + (3,)
  assert bool(jnp.all(jnp.isfinite(out)))

  def loss(params):
    o = model.apply({'params': params, **{k: v for k, v in variables.items()
                                          if k != 'params'}},
                    lowres, fullres)
    # Style-transfer models map 6-channel inputs to 3-channel outputs.
    return l2_loss(fullres[..., :o.shape[-1]], o)

  g = jax.grad(loss)(variables['params'])
  leaves = jax.tree_util.tree_leaves(g)
  assert all(bool(jnp.all(jnp.isfinite(l))) for l in leaves)
  # Every parameter gets gradient signal somewhere.
  total = sum(float(jnp.abs(l).sum()) for l in leaves)
  assert total > 0


@pytest.mark.quick
def test_grid_shape_and_packing():
  cfg = small_cfg('HDRNetCurves')
  model = make_model(cfg)
  rng = np.random.RandomState(1)
  lowres, fullres = _data(rng)
  variables = model.init(jax.random.PRNGKey(0), lowres, fullres)
  _, inter = model.apply(variables, lowres, fullres,
                         mutable=['intermediates'])
  grid = inter['intermediates']['bilateral_coefficients'][0]
  # (b, spatial_bin, spatial_bin, luma_bins, n_out, n_in+1)
  assert grid.shape == (2, 8, 8, 4, 3, 4)
  guide = inter['intermediates']['guide_map'][0]
  assert guide.shape == fullres.shape[:3]
  assert float(guide.min()) >= 0 and float(guide.max()) <= 1


@pytest.mark.quick
def test_curve_guide_inits_near_luma():
  """At init the curves guide is ~the channel mean (identity ccm,
  identity ramp curve, 1/nchans mixing) — cf. models.py:152-185."""
  from hdrnet_tpu.models.guides import CurveGuide
  rng = np.random.RandomState(2)
  x = jnp.asarray(rng.rand(1, 8, 8, 3), jnp.float32)
  guide = CurveGuide()
  v = guide.init(jax.random.PRNGKey(0), x)
  g = guide.apply(v, x)
  np.testing.assert_allclose(np.asarray(g), np.asarray(x.mean(-1)),
                             atol=1e-3)


def test_batch_norm_variant_trains():
  cfg = small_cfg('HDRNetPointwiseNNGuide', batch_norm=True)
  model = make_model(cfg)
  rng = np.random.RandomState(3)
  lowres, fullres = _data(rng, b=2)
  variables = model.init(jax.random.PRNGKey(0), lowres, fullres,
                         train=True)
  assert 'batch_stats' in variables
  out, updates = model.apply(variables, lowres, fullres, train=True,
                             mutable=['batch_stats'])
  assert out.shape == fullres.shape
  # Running stats actually update.
  before = jax.tree_util.tree_leaves(variables['batch_stats'])
  after = jax.tree_util.tree_leaves(updates['batch_stats'])
  assert any(float(jnp.abs(a - b).max()) > 0 for a, b in zip(after, before))


def test_gaussian_pyr_output_is_sum_of_levels():
  cfg = small_cfg('HDRNetGaussianPyrNN')
  model = make_model(cfg)
  rng = np.random.RandomState(4)
  lowres, fullres = _data(rng, h=64, w=96)
  variables = model.init(jax.random.PRNGKey(0), lowres, fullres)
  _, inter = model.apply(variables, lowres, fullres,
                         mutable=['intermediates'])
  grid = inter['intermediates']['bilateral_coefficients'][0]
  assert grid.shape[-2] == 9  # 3 scales x 3 channels
  ms = inter['intermediates']['multiscale']
  assert [m.shape[1] for m in ms] == [64, 32, 16]


@pytest.mark.quick
def test_metrics():
  rng = np.random.RandomState(5)
  t = jnp.asarray(rng.rand(2, 8, 8, 3), jnp.float32)
  p = t + 0.1
  np.testing.assert_allclose(float(l2_loss(t, p)), 0.01, rtol=1e-4)
  np.testing.assert_allclose(float(psnr(t, p)), 20.0, rtol=1e-4)
