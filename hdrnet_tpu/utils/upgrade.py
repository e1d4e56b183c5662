"""Checkpoint migration: reference TF checkpoints -> hdrnet_tpu.

The reference shipped scripts/upgrade.py to transplant SIGGRAPH-2016-era
checkpoints into its current variable naming (name map + weight
transforms). The analogous capability here is one level up: ingest a
*reference-current* TF checkpoint (TF1 variable names, scopes from
models.py:46-196 / layers.py:25-93) into our Flax parameter tree, so
users of the reference can bring their trained models across.

Both conv kernels (HWIO) and dense kernels (in, out) share layouts
between TF and Flax, and the prediction head's grid packing is
reproduced bit-for-bit by CoefficientBackbone (channel (j*n_out+i)*gd+k
-> grid[..., k, i, j], models.py:134-138), so the mapping is pure
renaming — no transposes.

Use `load_tf_checkpoint` (requires tensorflow, present in this image)
or pass any {tf_name: ndarray} dict to `tf_vars_to_flax`.
"""

from __future__ import annotations

import numpy as np


def load_tf_checkpoint(path):
  """Reads a TF checkpoint into {variable_name: np.ndarray}."""
  import tensorflow as tf  # gated import
  reader = tf.train.load_checkpoint(path)
  return {name: reader.get_tensor(name)
          for name in reader.get_variable_to_shape_map()}


def _conv_entries(tf_scope, flax_name, batch_norm):
  """Mapping rows for one conv/fc layer (layers.py:25-93 naming)."""
  rows = [(f'{tf_scope}/weights', ('params', flax_name, 'conv', 'kernel'),
           None)]
  if batch_norm:
    rows += [
        (f'{tf_scope}/BatchNorm/beta',
         ('params', flax_name, 'bn', 'bias'), None),
        (f'{tf_scope}/BatchNorm/moving_mean',
         ('batch_stats', flax_name, 'bn', 'mean'), None),
        (f'{tf_scope}/BatchNorm/moving_variance',
         ('batch_stats', flax_name, 'bn', 'var'), None),
    ]
  else:
    rows.append((f'{tf_scope}/biases',
                 ('params', flax_name, 'conv', 'bias'), None))
  return rows


def _fc_entries(tf_scope, flax_name, batch_norm):
  rows = [(f'{tf_scope}/weights', ('params', flax_name, 'fc', 'kernel'),
           None)]
  if batch_norm:
    rows += [
        (f'{tf_scope}/BatchNorm/beta',
         ('params', flax_name, 'bn', 'bias'), None),
        (f'{tf_scope}/BatchNorm/moving_mean',
         ('batch_stats', flax_name, 'bn', 'mean'), None),
        (f'{tf_scope}/BatchNorm/moving_variance',
         ('batch_stats', flax_name, 'bn', 'var'), None),
    ]
  else:
    rows.append((f'{tf_scope}/biases',
                 ('params', flax_name, 'fc', 'bias'), None))
  return rows


def build_name_map(config):
  """[(tf_name, flax_path, transform)] for a ModelConfig.

  flax_path is rooted at the variables dict: ('params' | 'batch_stats',
  <module>, ...). transform is None or a callable(np.ndarray).
  """
  bn = config.batch_norm
  n_ds = int(np.log2(config.net_input_size / config.spatial_bin))
  p = 'inference/coefficients'
  rows = []
  for i in range(1, n_ds + 1):
    rows += _conv_entries(f'{p}/splat/conv{i}', f'splat_conv{i}',
                          bn and i > 1)
  for i in (1, 2):
    rows += _conv_entries(f'{p}/global/conv{i}', f'global_conv{i}', bn)
  rows += _fc_entries(f'{p}/global/fc1', 'global_fc1', bn)
  rows += _fc_entries(f'{p}/global/fc2', 'global_fc2', bn)
  rows += _fc_entries(f'{p}/global/fc3', 'global_fc3', False)
  rows += _conv_entries(f'{p}/local/conv1', 'local_conv1', bn)
  # local conv2 is linear and bias-free (models.py:116-117)
  rows.append((f'{p}/local/conv2/weights',
               ('params', 'local_conv2', 'conv', 'kernel'), None))
  rows += _conv_entries(f'{p}/prediction/conv1', 'prediction_conv', False)
  # Re-root the backbone under 'coefficients'.
  rows = [(tf, (path[0], 'coefficients') + path[1:], t)
          for tf, path, t in rows]

  g = 'inference/guide'
  if config.model_name == 'HDRNetCurves':
    nch = config.n_in
    npts = 16
    rows += [
        (f'{g}/ccm', ('params', 'guide', 'ccm'), None),
        (f'{g}/ccm_bias', ('params', 'guide', 'ccm_bias'), None),
        # TF stores shifts (1,1,nchans,npts) and slopes (1,1,1,nchans,
        # npts) (models.py:164-173); ours are (nchans, npts).
        (f'{g}/shifts', ('params', 'guide', 'shifts'),
         lambda a: a.reshape(nch, npts)),
        (f'{g}/slopes', ('params', 'guide', 'slopes'),
         lambda a: a.reshape(nch, npts)),
        (f'{g}/channel_mixing/weights',
         ('params', 'guide', 'channel_mixing_w'),
         lambda a: a.reshape(nch, 1)),
        (f'{g}/channel_mixing/biases',
         ('params', 'guide', 'channel_mixing_b'), None),
    ]
  elif config.model_name == 'HDRNetPointwiseNNGuide':
    for tf, path, t in _conv_entries(f'{g}/conv1', 'conv1', True) + \
        _conv_entries(f'{g}/conv2', 'conv2', False):
      rows.append((tf, (path[0], 'guide') + path[1:], t))
  elif config.model_name == 'HDRNetGaussianPyrNN':
    for lvl in range(3):
      for tf, path, t in \
          _conv_entries(f'{g}/level_{lvl}/conv1', 'conv1', True) + \
          _conv_entries(f'{g}/level_{lvl}/conv2', 'conv2', False):
        rows.append((tf, (path[0], f'guide_level_{lvl}') + path[1:], t))
  return rows


def tf_vars_to_flax(tf_vars, config, strict=True):
  """Converts {tf_name: array} into a Flax variables dict.

  Returns {'params': ..., 'batch_stats': ...} (batch_stats omitted when
  empty). Unknown reference names are ignored; missing expected names
  raise when strict.
  """
  out = {}
  missing = []
  for tf_name, path, transform in build_name_map(config):
    if tf_name not in tf_vars:
      missing.append(tf_name)
      continue
    arr = np.asarray(tf_vars[tf_name], np.float32)
    if transform is not None:
      arr = transform(arr)
    node = out.setdefault(path[0], {})
    for key in path[1:-1]:
      node = node.setdefault(key, {})
    node[path[-1]] = arr
  if strict and missing:
    raise KeyError(f'checkpoint is missing {len(missing)} variables, '
                   f'e.g. {missing[:4]}')
  if not out.get('batch_stats'):
    out.pop('batch_stats', None)
  return out


def import_tf_checkpoint(tf_ckpt_path, output_dir, config):
  """Full migration: TF checkpoint -> orbax checkpoint + config.json."""
  import jax
  import jax.numpy as jnp
  from hdrnet_tpu.config import Config
  from hdrnet_tpu.models import make_model
  from hdrnet_tpu.training.checkpoint import Checkpointer
  from hdrnet_tpu.training.loop import make_tx
  from hdrnet_tpu.training.step import create_state

  tf_vars = load_tf_checkpoint(tf_ckpt_path)
  variables = tf_vars_to_flax(tf_vars, config.model)

  model = make_model(config.model)
  s = config.model.net_input_size
  low = jnp.zeros((1, s, s, config.model.n_in), jnp.float32)
  full = jnp.zeros((1, 64, 64, config.model.n_in), jnp.float32)
  # The optimizer state must be built from the config's actual optimizer
  # (make_tx) — restore sites derive their template the same way, and a
  # bare adam tree would not match a cosine-schedule/guide-lr config.
  state = create_state(model, make_tx(config.train),
                       jax.random.PRNGKey(0), low, full)
  # Shape-check imported tree against the freshly-initialized one.
  ref_shapes = jax.tree_util.tree_map(jnp.shape, state.params)
  got_shapes = jax.tree_util.tree_map(np.shape, variables['params'])
  if ref_shapes != got_shapes:
    raise ValueError('imported parameter tree does not match the model: '
                     f'{got_shapes} vs {ref_shapes}')
  state = state.replace(params=variables['params'],
                        batch_stats=variables.get('batch_stats', {}))
  config.save(output_dir)
  ckpt = Checkpointer(output_dir)
  ckpt.save(0, state, force=True)
  ckpt.wait()
  return state


def main(argv=None):
  """CLI: upgrade <tf_ckpt_dir_or_prefix> <output_dir> [--model_name ...]

  Flag defaults match the reference training defaults; pass the same
  model flags the checkpoint was trained with (the reference embeds
  them in its metagraph, which we do not parse here).
  """
  import argparse
  import jax
  from hdrnet_tpu.config import Config, ModelConfig

  p = argparse.ArgumentParser(description=main.__doc__)
  p.add_argument('tf_checkpoint')
  p.add_argument('output_dir')
  p.add_argument('--model_name', default='HDRNetCurves')
  p.add_argument('--luma_bins', type=int, default=8)
  p.add_argument('--spatial_bin', type=int, default=16)
  p.add_argument('--channel_multiplier', type=int, default=1)
  p.add_argument('--guide_complexity', type=int, default=16)
  p.add_argument('--batch_norm', action='store_true')
  args = p.parse_args(argv)
  config = Config(model=ModelConfig(
      model_name=args.model_name, luma_bins=args.luma_bins,
      spatial_bin=args.spatial_bin,
      channel_multiplier=args.channel_multiplier,
      guide_complexity=args.guide_complexity,
      batch_norm=args.batch_norm))
  state = import_tf_checkpoint(args.tf_checkpoint, args.output_dir, config)
  n = sum(x.size for x in jax.tree_util.tree_leaves(state.params))
  print(f'imported {n} parameters -> {args.output_dir}')


if __name__ == '__main__':
  main()
