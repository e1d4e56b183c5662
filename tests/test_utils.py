"""Utils tests: color/range conversions, dataset metadata, and TF
checkpoint migration (round-trip through the name map)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hdrnet_tpu.config import Config, ModelConfig
from hdrnet_tpu.models import make_model
from hdrnet_tpu.utils import image, metadata, upgrade


@pytest.mark.quick
def test_color_roundtrips():
  rng = np.random.RandomState(0)
  im = rng.rand(8, 9, 3).astype(np.float32)
  np.testing.assert_allclose(image.yuv_to_rgb(image.rgb_to_yuv(im)), im,
                             atol=1e-5)
  np.testing.assert_allclose(image.xyz_to_rgb(image.rgb_to_xyz(im)), im,
                             atol=1e-5)
  assert image.rgb_to_gray(im).shape == (8, 9)
  assert image.gray_to_rgb(im[:, :, 0]).shape == (8, 9, 3)


@pytest.mark.quick
def test_type_conversions():
  u8 = np.array([[0, 255]], np.uint8)
  np.testing.assert_allclose(image.uint8_to_float(u8), [[0.0, 1.0]])
  u16 = np.array([[32767]], np.uint16)
  np.testing.assert_allclose(image.uint16_to_float(u16), [[1.0]])
  i16 = np.array([[65535 // 2]], np.int16)
  assert image.int16_to_float(np.abs(i16)).max() < 1.0
  f = np.array([[0.5, 2.0, -1.0]])
  np.testing.assert_array_equal(image.float_to_uint8(f),
                                [[127, 255, 0]])
  assert image.normalize(np.array([2.0, 4.0])).tolist() == [0.0, 1.0]


@pytest.mark.quick
def test_metadata_roundtrip(tmp_path):
  metadata.write_dataset_meta(str(tmp_path), 42, {'a.png': 123})
  meta, ts = metadata.get_dataset_meta(str(tmp_path))
  assert meta['nsamples'] == 42
  assert ts == {'a.png': 123}


@pytest.mark.parametrize('name', ['HDRNetCurves', 'HDRNetPointwiseNNGuide',
                                  'HDRNetGaussianPyrNN'])
@pytest.mark.parametrize('bn', [False, True])
def test_tf_checkpoint_name_map_roundtrip(name, bn):
  """Inverse-map our own init through TF names and back: identity."""
  cfg = ModelConfig(model_name=name, net_input_size=64, spatial_bin=8,
                    luma_bins=4, guide_complexity=4, batch_norm=bn)
  model = make_model(cfg)
  rng = np.random.RandomState(0)
  low = jnp.asarray(rng.rand(1, 64, 64, 3), jnp.float32)
  full = jnp.asarray(rng.rand(1, 48, 48, 3), jnp.float32)
  variables = model.init(jax.random.PRNGKey(0), low, full, train=True)

  # Build the synthetic "TF checkpoint" from our variables via the map.
  name_map = upgrade.build_name_map(cfg)
  tf_vars = {}
  for tf_name, path, transform in name_map:
    node = variables
    ok = True
    for key in path:
      if key not in node:
        ok = False
        break
      node = node[key]
    assert ok, f'{path} missing from model variables (map is stale)'
    arr = np.asarray(node)
    if transform is not None:
      # invert known reshapes: TF shapes for shifts/slopes/mixing
      if 'shifts' in tf_name:
        arr = arr.reshape(1, 1, arr.shape[0], arr.shape[1])
      elif 'slopes' in tf_name:
        arr = arr.reshape(1, 1, 1, arr.shape[0], arr.shape[1])
      elif 'channel_mixing/weights' in tf_name:
        arr = arr.reshape(1, 1, arr.shape[0], 1)
    tf_vars[tf_name] = arr

  imported = upgrade.tf_vars_to_flax(tf_vars, cfg)

  flat_a = jax.tree_util.tree_leaves_with_path(imported['params'])
  for path, leaf in flat_a:
    node = variables['params']
    for k in path:
      node = node[k.key]
    np.testing.assert_array_equal(leaf, np.asarray(node))

  # Imported variables drive the model identically.
  vars2 = {'params': imported['params']}
  if 'batch_stats' in variables:
    vars2['batch_stats'] = imported['batch_stats']
  out1 = model.apply(variables, low, full)
  out2 = model.apply(vars2, low, full)
  np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-6)


def test_missing_variables_raise():
  cfg = ModelConfig(model_name='HDRNetCurves', net_input_size=64,
                    spatial_bin=8, luma_bins=4)
  with pytest.raises(KeyError):
    upgrade.tf_vars_to_flax({}, cfg)
  assert upgrade.tf_vars_to_flax({}, cfg, strict=False) == {}
