#!/usr/bin/env python
"""Standalone evaluation: mean PSNR / L2 of a checkpoint on a dataset.

The reference only evaluates inside the training loop
(bin/train.py:160-174, and due to a bug it actually measured training
batches); this is the correct standalone equivalent.

  python -m hdrnet_tpu.bin.evaluate ckpt/ data/ [--limit N]
"""

from __future__ import annotations

import argparse
import json
import logging

import numpy as np

log = logging.getLogger('hdrnet_tpu.evaluate')
logging.basicConfig(
    format='%(asctime)s [%(process)d] %(levelname)s %(filename)s:%(lineno)s | '
           '%(message)s', level=logging.INFO)


def main(argv=None):
  parser = argparse.ArgumentParser(description=__doc__)
  parser.add_argument('checkpoint_dir')
  parser.add_argument('data_dir', help='dataset (filelist.txt layout)')
  parser.add_argument('--limit', type=int, default=None)
  parser.add_argument('--json', dest='json_out', default=None,
                      help='write results to this JSON file')
  parser.add_argument('--serving', action='store_true',
                      help='evaluate through the serving path (fused '
                           'kernel where available) instead of the '
                           'training graph — proves serving quality '
                           'parity on a real checkpoint')
  parser.add_argument('--coeff_bf16', action='store_true',
                      help='with --serving: bfloat16 coefficient '
                           'backbone (A/B for the opt-in fast path)')
  args = parser.parse_args(argv)

  import jax
  import jax.numpy as jnp
  from hdrnet_tpu.config import Config
  from hdrnet_tpu.data import make_pipeline
  from hdrnet_tpu.models import make_model
  from hdrnet_tpu.training import metrics
  from hdrnet_tpu.training.checkpoint import Checkpointer
  from hdrnet_tpu.training.step import abstract_state, normalize_batch

  config = Config.load(args.checkpoint_dir)
  model = make_model(config.model)
  s = config.model.net_input_size

  eval_cfg = Config.from_json(config.to_json()).data
  eval_cfg.batch_size = 1
  eval_cfg.shuffle = False
  eval_cfg.random_crop = False
  eval_cfg.fliplr = eval_cfg.flipud = eval_cfg.rotate = False
  pipeline = make_pipeline(args.data_dir, eval_cfg)

  from hdrnet_tpu.training.loop import make_tx
  dummy_low = jnp.zeros((1, s, s, config.model.n_in), jnp.float32)
  dummy_full = jnp.zeros((1, 64, 64, config.model.n_in), jnp.float32)
  # The optimizer-state template must match what training saved (a
  # cosine run carries schedule state a bare adam template lacks).
  template = abstract_state(model, make_tx(config.train),
                            jax.random.PRNGKey(0), dummy_low, dummy_full)
  state = Checkpointer(args.checkpoint_dir).restore(template)
  assert state is not None, f'no checkpoint in {args.checkpoint_dir}'
  variables = {'params': state.params}
  if state.batch_stats:
    variables['batch_stats'] = state.batch_stats

  if args.serving:
    from hdrnet_tpu.inference import Enhancer
    enh = Enhancer(config=config.model, variables=variables,
                   coeff_bf16=args.coeff_bf16)
    log.info('serving-path eval: fused=%s coeff_bf16=%s', enh.use_fused,
             enh.coeff_bf16)
    fwd = lambda low, full: enh._forward(low, full, clip=False)
  else:
    fwd = lambda low, full: model.apply(variables, low, full)

  @jax.jit
  def ev(batch):
    # Raw-dtype batches (a checkpoint trained with --device_normalize
    # persists that pipeline setting) are normalized on device here.
    batch = normalize_batch(batch)
    out = fwd(batch['lowres_input'], batch['image_input'])
    return (metrics.psnr(batch['image_output'], out),
            metrics.l2_loss(batch['image_output'], out))

  n = min(pipeline.nsamples, args.limit or pipeline.nsamples)
  it = pipeline.batches(seed=0)
  psnrs, losses = [], []
  for i in range(n):
    p, l = ev(next(it))
    psnrs.append(float(p))
    losses.append(float(l))
    log.info('[%d/%d] psnr=%.2f dB  l2=%.5f', i + 1, n, psnrs[-1],
             losses[-1])

  result = {'step': int(state.step), 'n_images': n,
            'mean_psnr_db': float(np.mean(psnrs)),
            'mean_l2': float(np.mean(losses))}
  if args.serving:
    result['serving'] = {'fused': bool(enh.use_fused),
                         'coeff_bf16': bool(enh.coeff_bf16)}
  log.info('step %d | mean PSNR = %.2f dB | mean L2 = %.5f over %d images',
           result['step'], result['mean_psnr_db'], result['mean_l2'], n)
  print(json.dumps(result))
  if args.json_out:
    with open(args.json_out, 'w') as f:
      json.dump(result, f, indent=2)


if __name__ == '__main__':
  main()
