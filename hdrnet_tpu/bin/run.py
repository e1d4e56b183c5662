#!/usr/bin/env python
"""Batch inference from a checkpoint (reference: bin/run.py:61-216).

Input may be a directory of images, a filelist.txt (resolved against its
sibling input/ dir), or a single image. The model architecture is
rebuilt from the config.json saved next to the checkpoint — no flags
needed (self-describing checkpoints, cf. utils.get_model_params).

  python -m hdrnet_tpu.bin.run ckpt/ photos/ out/ [--debug] [--limit N]
"""

from __future__ import annotations

import argparse
import logging
import os
import re

import numpy as np

log = logging.getLogger('hdrnet_tpu.run')
logging.basicConfig(
    format='%(asctime)s [%(process)d] %(levelname)s %(filename)s:%(lineno)s | '
           '%(message)s', level=logging.INFO)

_IMG_RE = re.compile(r'.*\.(png|jpeg|jpg|tif|tiff)$', re.IGNORECASE)


def get_input_list(path):
  """Directory / filelist.txt / single image (bin/run.py:42-58)."""
  if os.path.isdir(path):
    names = sorted(os.listdir(path))
    return [os.path.join(path, n) for n in names if _IMG_RE.match(n)]
  if path.endswith('.txt'):
    dirname = os.path.dirname(path)
    with open(path) as f:
      names = [l.strip() for l in f if l.strip()]
    return [os.path.join(dirname, 'input', n) for n in names]
  if _IMG_RE.match(path):
    return [path]
  raise ValueError(f'cannot interpret input path {path}')


def _normalize01(arr):
  m = float(np.abs(arr).max()) or 1.0
  return np.clip((arr + m) / (2 * m), 0, 1)


def main(argv=None):
  parser = argparse.ArgumentParser(description=__doc__)
  parser.add_argument('checkpoint_dir')
  parser.add_argument('input', help='image dir / filelist.txt / image')
  parser.add_argument('output', help='output directory')
  parser.add_argument('--limit', type=int, default=None)
  parser.add_argument('--hdrp', action='store_true',
                      help='16-bit linear HDR+ input handling')
  parser.add_argument('--debug', action='store_true',
                      help='dump coefficient/guide visualizations')
  parser.add_argument('--lowres_input', default=None,
                      help='directory of precomputed lowres inputs '
                           '(matched by basename) instead of nearest-'
                           'downsampling; the reference declares this '
                           'flag but leaves it NotImplemented '
                           '(bin/run.py:167-171)')
  args = parser.parse_args(argv)

  import jax
  import jax.numpy as jnp
  from hdrnet_tpu import native
  from hdrnet_tpu.config import Config
  from hdrnet_tpu.data import images
  from hdrnet_tpu.inference import Enhancer
  from hdrnet_tpu.models import make_model
  from hdrnet_tpu.training.checkpoint import Checkpointer
  from hdrnet_tpu.training.step import abstract_state

  config = Config.load(args.checkpoint_dir)
  model = make_model(config.model)
  net_size = config.model.net_input_size

  inputs = get_input_list(args.input)
  if args.limit:
    inputs = inputs[:args.limit]
  if not inputs:
    log.error('no inputs found under %s', args.input)
    return

  # Restore params via a template state built at tiny shapes; the
  # optimizer must match the one training saved (schedule state).
  from hdrnet_tpu.training.loop import make_tx
  tx = make_tx(config.train)
  dummy_low = jnp.zeros((1, net_size, net_size, config.model.n_in),
                        jnp.float32)
  dummy_full = jnp.zeros((1, 64, 64, config.model.n_in), jnp.float32)
  template = abstract_state(model, tx, jax.random.PRNGKey(0), dummy_low,
                          dummy_full)
  state = Checkpointer(args.checkpoint_dir).restore(template)
  if state is None:
    log.error('no checkpoint found in %s', args.checkpoint_dir)
    return
  log.info('restored step %d from %s', int(state.step),
           args.checkpoint_dir)
  variables = {'params': state.params}
  if state.batch_stats:
    variables['batch_stats'] = state.batch_stats

  # Serving path: bucketed dynamic-shape Enhancer — a directory of
  # mixed-size photos compiles one fused kernel per resolution bucket,
  # not one per exact shape.
  enh = Enhancer(config=config.model, variables=variables)

  @jax.jit
  def infer_debug(lowres, fullres):
    out, inter = model.apply(variables, lowres, fullres,
                             mutable=['intermediates'])
    return jnp.clip(out, 0.0, 1.0), inter['intermediates']

  os.makedirs(args.output, exist_ok=True)
  for idx, in_path in enumerate(inputs):
    log.info('processing %s (%d/%d)', in_path, idx + 1, len(inputs))
    im = images.imread(in_path)
    white = 65535.0 if im.dtype == np.uint16 else 255.0
    if args.hdrp and im.dtype == np.uint16:
      log.info('HDR+ 16-bit input, white level %s', white)
    im = native.to_float(im, white)
    fname = os.path.splitext(os.path.basename(in_path))[0]
    if args.lowres_input:
      low_path = os.path.join(args.lowres_input,
                              os.path.basename(in_path))
      # Normalized by the lowres file's OWN bit depth (an 8-bit preview
      # of a 16-bit HDR+ frame is the typical pairing).
      lowres = images.imread_float(low_path)
      if lowres.shape[:2] != (net_size, net_size):
        raise ValueError(
            f'{low_path}: lowres input is {lowres.shape[:2]}, model '
            f'expects {(net_size, net_size)}')
    else:
      lowres = native.resize_nearest(im, (net_size, net_size))

    if args.debug:
      out, inter = infer_debug(jnp.asarray(lowres)[None],
                               jnp.asarray(im)[None])
    else:
      out = enh.enhance_any(lowres[None], im[None])
    images.imwrite(os.path.join(args.output, fname + '.png'),
                   np.asarray(out[0]))

    if args.debug:
      images.imwrite(os.path.join(args.output, fname + '_input.png'), im)
      grid = np.asarray(inter['bilateral_coefficients'][0][0])
      gh, gw, gd, no, ni = grid.shape
      # Tile (gh*gd, gw*ni*no) like the reference's debug dump
      # (bin/run.py:100-106).
      tiled = grid.transpose(0, 2, 1, 4, 3).reshape(gh * gd, gw * ni * no)
      images.imwrite(os.path.join(args.output, fname + '_coeffs.png'),
                     _normalize01(tiled))
      for i, g in enumerate(inter.get('guide_map', [])):
        images.imwrite(
            os.path.join(args.output, f'{fname}_guide_{i}.png'),
            _normalize01(np.asarray(g[0])))
      for i, msname in enumerate(inter.get('multiscale', [])):
        images.imwrite(
            os.path.join(args.output, f'{fname}_ms_{i}.png'),
            np.clip(np.asarray(msname[0]), 0, 1))


if __name__ == '__main__':
  main()
