#!/usr/bin/env python
"""Per-image bilateral-grid ORACLE fit: the representability upper bound.

Directly optimizes one bilateral grid (and optionally the curve guide)
against a single (input, target) pair with Adam through the fused
slice-apply op — no coefficient network involved. The resulting PSNR is
the ceiling any HDRNet-class predictor can reach on that image with the
same grid geometry, which separates "the operator is not representable
by sliced local affine transforms" from "the network failed to predict
them" when judging a training run.

The reference validates its op gradients with exactly this kind of
fit-by-descent (test/ops_test.py:189-322, test_grid_optimize /
test_optimize_both); this tool is the production version over real
image pairs.

  python -m hdrnet_tpu.bin.fit_grid data/test --limit 4
  python -m hdrnet_tpu.bin.fit_grid data/test --guide curves --json r.json
"""

from __future__ import annotations

import argparse
import json
import logging

import numpy as np

log = logging.getLogger('hdrnet_tpu.fit_grid')
logging.basicConfig(
    format='%(asctime)s [%(process)d] %(levelname)s %(filename)s:%(lineno)s | '
           '%(message)s', level=logging.INFO)

_LUMA = (0.299, 0.587, 0.114)


def fit_pair(inp, tgt, *, gh=16, gw=16, gd=8, steps=400, lr=3e-3,
             guide='luma'):
  """Fits (grid[, curve-guide params]) to one pair; returns (psnr, grid).

  inp/tgt: float32 (H, W, 3) in [0, 1].
  """
  import jax
  import jax.numpy as jnp
  import optax
  from hdrnet_tpu.models.guides import CurveGuide
  from hdrnet_tpu.ops import bilateral_slice_apply

  inp = jnp.asarray(inp, jnp.float32)
  tgt = jnp.asarray(tgt, jnp.float32)
  grid0 = jnp.zeros((1, gh, gw, gd, 3, 4), jnp.float32)
  for i in range(3):
    grid0 = grid0.at[..., i, i].set(1.0)

  if guide == 'curves':
    gmod = CurveGuide()
    gvars = gmod.init(jax.random.PRNGKey(0), inp[None])
    params = {'grid': grid0, 'guide': gvars['params']}
    guide_of = lambda p: gmod.apply({'params': p['guide']}, inp[None])[0]
  else:
    luma = inp @ jnp.asarray(_LUMA, jnp.float32)
    params = {'grid': grid0}
    guide_of = lambda p: luma

  tx = optax.adam(lr)
  opt_state = tx.init(params)

  def loss_fn(p):
    out = bilateral_slice_apply(p['grid'], guide_of(p)[None], inp[None])
    return jnp.mean((out[0] - tgt) ** 2)

  @jax.jit
  def step(p, s):
    loss, grads = jax.value_and_grad(loss_fn)(p)
    updates, s = tx.update(grads, s)
    return optax.apply_updates(p, updates), s, loss

  for _ in range(steps):
    params, opt_state, _ = step(params, opt_state)
  mse = float(loss_fn(params))
  return -10.0 * float(np.log10(max(mse, 1e-12))), params


def main(argv=None):
  parser = argparse.ArgumentParser(description=__doc__)
  parser.add_argument('data_dir', help='dataset (filelist.txt layout)')
  parser.add_argument('--limit', type=int, default=4)
  parser.add_argument('--steps', type=int, default=400)
  parser.add_argument('--lr', type=float, default=3e-3)
  parser.add_argument('--luma_bins', type=int, default=8)
  parser.add_argument('--spatial_bin', type=int, default=16,
                      help='grid cells per axis (gh = gw = spatial_bin)')
  parser.add_argument('--guide', choices=['luma', 'curves'],
                      default='luma')
  parser.add_argument('--json', dest='json_out', default=None)
  args = parser.parse_args(argv)

  import os
  from hdrnet_tpu.data import images

  with open(os.path.join(args.data_dir, 'filelist.txt')) as f:
    names = [l.strip() for l in f if l.strip()][:args.limit]

  results = []
  for name in names:
    inp = images.imread_float(os.path.join(args.data_dir, 'input', name))
    tgt = images.imread_float(os.path.join(args.data_dir, 'output', name))
    identity = -10.0 * float(np.log10(max(float(((inp - tgt) ** 2).mean()),
                                          1e-12)))
    psnr, _ = fit_pair(inp, tgt, gh=args.spatial_bin, gw=args.spatial_bin,
                       gd=args.luma_bins, steps=args.steps, lr=args.lr,
                       guide=args.guide)
    log.info('%s: identity=%.2f dB  oracle=%.2f dB', name, identity, psnr)
    results.append({'name': name, 'identity_psnr': identity,
                    'oracle_psnr': psnr})

  summary = {
      'n_images': len(results),
      'mean_identity_psnr': float(np.mean([r['identity_psnr']
                                           for r in results])),
      'mean_oracle_psnr': float(np.mean([r['oracle_psnr']
                                         for r in results])),
      'images': results,
  }
  log.info('mean identity = %.2f dB | mean oracle upper bound = %.2f dB',
           summary['mean_identity_psnr'], summary['mean_oracle_psnr'])
  print(json.dumps(summary))
  if args.json_out:
    with open(args.json_out, 'w') as f:
      json.dump(summary, f, indent=2)


if __name__ == '__main__':
  main()
