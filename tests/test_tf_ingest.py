"""End-to-end proof of reference TF checkpoint ingestion.

Runs the reference's OWN graph code (hdrnet/models.py `_coefficients`
and `_guide`) under a minimal tf.contrib compatibility shim, saves a
real TF checkpoint from the initialized graph, ingests it via
`hdrnet_tpu.utils.upgrade`, and asserts our Flax modules reproduce the
TF graph's outputs on the same inputs (<=1e-4 — BASELINE.md's parity
budget).

Nothing is copied from the reference: its package is imported at
runtime from the read-only mount (same pattern as
test_reference_golden.py) and skipped when absent. The shim exists
because this image ships TF 2.x while the reference is TF1/contrib
code; it reimplements only the contrib entry points the reference
calls (convolution2d / fully_connected / batch_norm with contrib's
'weights'/'biases'/'BatchNorm' variable naming and default
epsilon=0.001).
"""

import os
import sys
import types

import numpy as np
import pytest

_REF = '/root/reference'

tf = pytest.importorskip('tensorflow')


def _contrib_shim(tf1):
  """A tf.contrib lookalike covering hdrnet/layers.py's usage."""
  layers = types.SimpleNamespace()

  def variance_scaling_initializer():
    return tf1.keras.initializers.VarianceScaling(
        scale=2.0, mode='fan_in', distribution='truncated_normal')

  def batch_norm(inputs, center=True, scale=False, is_training=False,
                 epsilon=0.001, variables_collections=None, **kwargs):
    del center, variables_collections, kwargs
    nch = inputs.get_shape().as_list()[-1]
    with tf1.variable_scope('BatchNorm'):
      beta = tf1.get_variable('beta', shape=[nch], dtype=tf.float32,
                              initializer=tf1.zeros_initializer())
      mean = tf1.get_variable('moving_mean', shape=[nch],
                              dtype=tf.float32,
                              initializer=tf1.zeros_initializer(),
                              trainable=False)
      var = tf1.get_variable('moving_variance', shape=[nch],
                             dtype=tf.float32,
                             initializer=tf1.ones_initializer(),
                             trainable=False)
      gamma = tf1.ones_like(var) if scale else None
      del gamma
      assert not is_training, 'shim supports inference mode only'
      return tf.nn.batch_normalization(inputs, mean, var, beta, None,
                                       epsilon)

  def convolution2d(inputs, num_outputs, kernel_size, stride=1,
                    padding='SAME', rate=1, weights_initializer=None,
                    biases_initializer=None, normalizer_fn=None,
                    normalizer_params=None, activation_fn=tf.nn.relu,
                    variables_collections=None, outputs_collections=None,
                    scope=None, reuse=False):
    del variables_collections, outputs_collections
    nch = inputs.get_shape().as_list()[-1]
    k = kernel_size if isinstance(kernel_size, int) else kernel_size[0]
    with tf1.variable_scope(scope, default_name='Conv', reuse=reuse):
      w = tf1.get_variable(
          'weights', shape=[k, k, nch, num_outputs], dtype=tf.float32,
          initializer=weights_initializer or variance_scaling_initializer())
      y = tf.nn.conv2d(inputs, w, strides=[1, stride, stride, 1],
                       padding=padding,
                       dilations=[1, rate, rate, 1])
      if normalizer_fn is not None:
        y = normalizer_fn(y, **(normalizer_params or {}))
      elif biases_initializer is not None:
        b = tf1.get_variable('biases', shape=[num_outputs],
                             dtype=tf.float32,
                             initializer=biases_initializer)
        y = tf.nn.bias_add(y, b)
      if activation_fn is not None:
        y = activation_fn(y)
      return y

  def fully_connected(inputs, num_outputs, weights_initializer=None,
                      biases_initializer=None, normalizer_fn=None,
                      normalizer_params=None, activation_fn=tf.nn.relu,
                      variables_collections=None, scope=None):
    del variables_collections
    nch = inputs.get_shape().as_list()[-1]
    with tf1.variable_scope(scope, default_name='fc'):
      w = tf1.get_variable(
          'weights', shape=[nch, num_outputs], dtype=tf.float32,
          initializer=weights_initializer or variance_scaling_initializer())
      y = tf.matmul(inputs, w)
      if normalizer_fn is not None:
        y = normalizer_fn(y, **(normalizer_params or {}))
      elif biases_initializer is not None:
        b = tf1.get_variable('biases', shape=[num_outputs],
                             dtype=tf.float32,
                             initializer=biases_initializer)
        y = tf.nn.bias_add(y, b)
      if activation_fn is not None:
        y = activation_fn(y)
      return y

  layers.variance_scaling_initializer = variance_scaling_initializer
  layers.batch_norm = batch_norm
  layers.convolution2d = convolution2d
  layers.convolution = convolution2d
  layers.fully_connected = fully_connected
  contrib = types.SimpleNamespace(layers=layers)
  return contrib


@pytest.fixture(scope='module')
def ref_models():
  """Imports reference hdrnet.models with TF1 aliases + contrib shim."""
  if not os.path.exists(os.path.join(_REF, 'hdrnet', 'models.py')):
    pytest.skip('reference tree not mounted')
  tf1 = tf.compat.v1
  tf1.disable_eager_execution()
  # TF1 top-level aliases the reference modules touch.
  for name in ('variable_scope', 'get_variable', 'add_to_collection',
               'constant_initializer', 'name_scope'):
    setattr(tf, name, getattr(tf1, name))
  tf.squeeze = tf1.squeeze          # accepts squeeze_dims=
  tf.reduce_sum = tf1.reduce_sum    # accepts reduction_indices=
  tf.GraphKeys = tf1.GraphKeys
  tf.contrib = _contrib_shim(tf1)
  # The compiled custom-op binding is absent (and unneeded: we only run
  # _coefficients/_guide); give the package an empty stand-in.
  fake_ops = types.ModuleType('hdrnet.hdrnet_ops')
  sys.modules['hdrnet.hdrnet_ops'] = fake_ops
  sys.path.insert(0, _REF)
  try:
    import hdrnet.models as ref_models_mod
  finally:
    sys.path.remove(_REF)
  return ref_models_mod


def _params(model_name):
  return {
      'model_name': model_name,
      'net_input_size': 64,
      'output_resolution': [64, 64],
      'luma_bins': 4,
      'spatial_bin': 8,
      'channel_multiplier': 1,
      'guide_complexity': 8,
      'batch_norm': False,
  }


def _build_and_checkpoint(ref_models, model_name, tmp_path, seed):
  """Builds coeffs+guide in a TF1 graph, randomizes variables, saves a
  checkpoint, returns (ckpt_path, lowres, fullres, coeffs, guide)."""
  tf1 = tf.compat.v1
  params = _params(model_name)
  mdl = getattr(ref_models, model_name)
  rng = np.random.RandomState(seed)
  lowres = rng.rand(1, 64, 64, 3).astype(np.float32)
  fullres = rng.rand(1, 40, 56, 3).astype(np.float32)

  graph = tf1.Graph()
  with graph.as_default():
    tf1.set_random_seed(seed)
    low_ph = tf1.placeholder(tf.float32, (1, 64, 64, 3), 'lowres')
    full_ph = tf1.placeholder(tf.float32, (1, 40, 56, 3), 'fullres')
    with tf1.variable_scope('inference'):
      with tf1.variable_scope('coefficients'):
        coeffs_t = mdl._coefficients(low_ph, params, False)
      with tf1.variable_scope('guide'):
        guide_t = mdl._guide(full_ph, params, False)
    randomize = []
    for v in tf1.global_variables():
      # Non-degenerate values everywhere (incl. BN moving stats).
      val = rng.randn(*v.shape.as_list()).astype(np.float32) * 0.3
      if 'moving_variance' in v.name:
        val = np.abs(val) + 0.5
      randomize.append(tf1.assign(v, val))
    saver = tf1.train.Saver()
    with tf1.Session(graph=graph) as sess:
      sess.run(tf1.global_variables_initializer())
      sess.run(randomize)
      coeffs, guide = sess.run(
          [coeffs_t, guide_t], {low_ph: lowres, full_ph: fullres})
      ckpt = saver.save(sess, str(tmp_path / f'{model_name}.ckpt'))
  return ckpt, lowres, fullres, coeffs, guide


def _flax_outputs(model_name, variables, lowres, fullres):
  import jax.numpy as jnp
  from hdrnet_tpu.config import ModelConfig
  from hdrnet_tpu.models import make_model
  from hdrnet_tpu.models.hdrnet import CoefficientBackbone

  cfg = ModelConfig(model_name=model_name, net_input_size=64,
                    luma_bins=4, spatial_bin=8, guide_complexity=8,
                    output_resolution=[64, 64])
  model = make_model(cfg)
  bb = CoefficientBackbone(cfg, model.n_out, model.n_in_tot)
  bb_vars = {'params': variables['params']['coefficients']}
  if 'coefficients' in variables.get('batch_stats', {}):
    bb_vars['batch_stats'] = variables['batch_stats']['coefficients']
  grid = bb.apply(bb_vars, jnp.asarray(lowres))

  from hdrnet_tpu.models.guides import CurveGuide, PointwiseNNGuide
  guide_mod = (CurveGuide() if model_name == 'HDRNetCurves'
               else PointwiseNNGuide(cfg.guide_complexity))
  g_vars = {'params': variables['params']['guide']}
  if 'guide' in variables.get('batch_stats', {}):
    g_vars['batch_stats'] = variables['batch_stats']['guide']
  guide = guide_mod.apply(g_vars, jnp.asarray(fullres))
  return np.asarray(grid), np.asarray(guide)


@pytest.mark.parametrize('model_name',
                         ['HDRNetCurves', 'HDRNetPointwiseNNGuide'])
def test_ingest_reference_checkpoint(ref_models, model_name, tmp_path):
  from hdrnet_tpu.config import ModelConfig
  from hdrnet_tpu.utils.upgrade import load_tf_checkpoint, tf_vars_to_flax

  ckpt, lowres, fullres, tf_coeffs, tf_guide = _build_and_checkpoint(
      ref_models, model_name, tmp_path, seed=42)

  tf_vars = load_tf_checkpoint(ckpt)
  cfg = ModelConfig(model_name=model_name, net_input_size=64,
                    luma_bins=4, spatial_bin=8, guide_complexity=8,
                    output_resolution=[64, 64])
  variables = tf_vars_to_flax(tf_vars, cfg)

  grid, guide = _flax_outputs(model_name, variables, lowres, fullres)
  # Reference packs (b, gh, gw, gd, n_out, n_in+1) (models.py:134-138).
  assert grid.shape == tf_coeffs.shape
  np.testing.assert_allclose(grid, tf_coeffs, atol=1e-4, rtol=1e-4)
  np.testing.assert_allclose(guide, tf_guide, atol=1e-4, rtol=1e-4)
