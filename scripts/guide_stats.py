#!/usr/bin/env python
"""Guide dynamic-range statistics for any checkpoint (quality triage).

The guide is the z-coordinate into the bilateral grid: a guide that
only spans k of `luma_bins` bins throws away (luma_bins - k) of the
grid's luma adaptivity. This tool quantifies that collapse for any
model family by capturing the sowed `guide_map` intermediates on
held-out images.

  python scripts/guide_stats.py output/ll2048_l8s16_g05 data_ll2048/test \
      --limit 6 --json results/guide_stats_l8s16_g05.json
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
  p = argparse.ArgumentParser()
  p.add_argument('checkpoint_dir')
  p.add_argument('data_dir')
  p.add_argument('--limit', type=int, default=6)
  p.add_argument('--json', dest='json_out', default=None)
  args = p.parse_args()

  import jax
  jax.config.update('jax_platforms', 'cpu')
  import jax.numpy as jnp

  from hdrnet_tpu.config import Config
  from hdrnet_tpu.data import make_pipeline
  from hdrnet_tpu.models import make_model
  from hdrnet_tpu.training.checkpoint import Checkpointer
  from hdrnet_tpu.training.loop import make_tx
  from hdrnet_tpu.training.step import abstract_state, normalize_batch

  config = Config.load(args.checkpoint_dir)
  model = make_model(config.model)
  s = config.model.net_input_size
  luma_bins = config.model.luma_bins

  eval_cfg = Config.from_json(config.to_json()).data
  eval_cfg.batch_size = 1
  eval_cfg.shuffle = False
  eval_cfg.random_crop = False
  eval_cfg.fliplr = eval_cfg.flipud = eval_cfg.rotate = False
  pipeline = make_pipeline(args.data_dir, eval_cfg)

  dummy_low = jnp.zeros((1, s, s, config.model.n_in), jnp.float32)
  dummy_full = jnp.zeros((1, 64, 64, config.model.n_in), jnp.float32)
  template = abstract_state(model, make_tx(config.train),
                            jax.random.PRNGKey(0), dummy_low, dummy_full)
  state = Checkpointer(args.checkpoint_dir).restore(template)
  assert state is not None, args.checkpoint_dir
  variables = {'params': state.params}
  if state.batch_stats:
    variables['batch_stats'] = state.batch_stats

  @jax.jit
  def guides_of(batch):
    batch = normalize_batch(batch)
    _, inter = model.apply(variables, batch['lowres_input'],
                           batch['image_input'],
                           mutable=['intermediates'])
    return inter['intermediates']['guide_map']

  n = min(pipeline.nsamples, args.limit)
  it = pipeline.batches(seed=0)
  acc = None
  for i in range(n):
    gs = [np.asarray(g) for g in guides_of(next(it))]
    if acc is None:
      acc = [[] for _ in gs]
    for j, g in enumerate(gs):
      acc[j].append(g.ravel())

  report = {'checkpoint': args.checkpoint_dir, 'step': int(state.step),
            'luma_bins': luma_bins, 'model': config.model.model_name,
            'n_images': n, 'guides': []}
  for j, chunks in enumerate(acc):
    g = np.concatenate(chunks)
    p01, p99 = np.percentile(g, [1, 99])
    # Occupancy: fraction of luma bins that receive >=1% of pixels.
    hist, _ = np.histogram(g, bins=luma_bins, range=(0.0, 1.0))
    occ = int((hist / hist.sum() >= 0.01).sum())
    report['guides'].append({
        'p01': round(float(p01), 4), 'p99': round(float(p99), 4),
        'std': round(float(g.std()), 4),
        'bins_occupied': occ,
        'effective_range_bins': round(float((p99 - p01) * luma_bins), 2),
    })
    print(f"guide[{j}]: p01-p99 [{p01:.3f}, {p99:.3f}] std {g.std():.3f} "
          f"-> {occ}/{luma_bins} bins occupied "
          f"({(p99 - p01) * luma_bins:.1f} bins of range)", flush=True)
  if args.json_out:
    with open(args.json_out, 'w') as f:
      json.dump(report, f, indent=2)


if __name__ == '__main__':
  main()
