#!/usr/bin/env python
"""Visualize conv weights and activations (reference:
bin/viz_activations.py:63-111).

Runs one image through the model, captures every module's output via a
flax capture_intermediates sweep, tiles channels into PNG mosaics, and
tiles first-layer conv kernels.

  python -m hdrnet_tpu.bin.viz_activations ckpt/ image.png out_dir/
"""

from __future__ import annotations

import argparse
import logging
import os

import numpy as np

log = logging.getLogger('hdrnet_tpu.viz')
logging.basicConfig(level=logging.INFO)


def tile_channels(act):
  """(h, w, c) -> mosaic of c normalized panels."""
  h, w, c = act.shape
  cols = int(np.ceil(np.sqrt(c)))
  rows = int(np.ceil(c / cols))
  canvas = np.zeros((rows * h, cols * w), np.float32)
  for i in range(c):
    r, col = divmod(i, cols)
    panel = act[:, :, i]
    lo, hi = float(panel.min()), float(panel.max())
    if hi > lo:
      panel = (panel - lo) / (hi - lo)
    canvas[r * h:(r + 1) * h, col * w:(col + 1) * w] = panel
  return canvas


def main(argv=None):
  parser = argparse.ArgumentParser(description=__doc__)
  parser.add_argument('checkpoint_dir')
  parser.add_argument('input_image')
  parser.add_argument('output_dir')
  args = parser.parse_args(argv)

  import jax
  import jax.numpy as jnp
  from hdrnet_tpu import native
  from hdrnet_tpu.config import Config
  from hdrnet_tpu.data import images
  from hdrnet_tpu.models import make_model
  from hdrnet_tpu.training.checkpoint import Checkpointer
  from hdrnet_tpu.training.step import abstract_state

  config = Config.load(args.checkpoint_dir)
  model = make_model(config.model)
  s = config.model.net_input_size

  im = images.imread_float(args.input_image)
  lowres = jnp.asarray(native.resize_nearest(im, (s, s)))[None]
  fullres = jnp.asarray(im)[None]

  from hdrnet_tpu.training.loop import make_tx
  template = abstract_state(model, make_tx(config.train),
                            jax.random.PRNGKey(0), lowres, fullres)
  state = Checkpointer(args.checkpoint_dir).restore(template)
  assert state is not None, f'no checkpoint in {args.checkpoint_dir}'
  variables = {'params': state.params}
  if state.batch_stats:
    variables['batch_stats'] = state.batch_stats

  _, captured = model.apply(
      variables, lowres, fullres, mutable=['intermediates'],
      capture_intermediates=lambda mdl, _: mdl.name is not None)

  os.makedirs(args.output_dir, exist_ok=True)
  flat = jax.tree_util.tree_flatten_with_path(
      captured['intermediates'])[0]
  n = 0
  for path, act in flat:
    act = np.asarray(act)
    if act.ndim != 4:
      continue
    name = '_'.join(getattr(k, 'key', str(k)) for k in path)
    name = name.replace('__call__', 'out').strip('_')
    mosaic = tile_channels(act[0])
    images.imwrite(os.path.join(args.output_dir, f'{name}.png'), mosaic)
    n += 1
  log.info('wrote %d activation mosaics', n)

  # First splat conv kernels, one panel per (cin, cout) pair.
  kern = state.params
  if 'coefficients' in kern and 'splat_conv1' in kern['coefficients']:
    k = np.asarray(kern['coefficients']['splat_conv1']['conv']['kernel'])
    kh, kw, cin, cout = k.shape
    sheet = tile_channels(k.reshape(kh, kw, cin * cout))
    images.imwrite(os.path.join(args.output_dir, 'splat_conv1.png'),
                   sheet)
    log.info('wrote splat_conv1.png')


if __name__ == '__main__':
  main()
