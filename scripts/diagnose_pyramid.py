#!/usr/bin/env python
"""Why does HDRNetGaussianPyrNN trail the plain model? (quality triage)

Loads a pyramid checkpoint and, per held-out image:
  * captures the sowed intermediates (grid, pyramid levels, per-level
    guide maps);
  * reports per-level guide dynamic range (the plain curves guide is
    known to collapse to ~2 of 8 luma bins — does the NN guide too?);
  * recomputes each level's slice-apply output and its RMS contribution
    to the final image;
  * ablation PSNR: reconstruct with each level's output zeroed — which
    level actually carries the enhancement?

  python scripts/diagnose_pyramid.py output/ll_gpyrnn_cos data_ll/test \
      --limit 6 --json results/pyramid_diagnosis.json

Runs on CPU (forces jax_platforms=cpu): eager/odd shapes + intermediates
would be tunnel-hostile on the chip, and this is diagnosis, not serving.
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
  from hdrnet_tpu.ops import bilateral_slice_apply
  from hdrnet_tpu.ops.resize import resize_bilinear
  from hdrnet_tpu.training import metrics
  from hdrnet_tpu.training.checkpoint import Checkpointer
  from hdrnet_tpu.training.loop import make_tx
  from hdrnet_tpu.training.step import abstract_state, normalize_batch

  config = Config.load(args.checkpoint_dir)
  assert config.model.model_name == 'HDRNetGaussianPyrNN', config.model
  model = make_model(config.model)
  s = config.model.net_input_size

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

  n_scales = 3

  @jax.jit
  def forward(batch):
    batch = normalize_batch(batch)
    out, inter = model.apply(variables, batch['lowres_input'],
                             batch['image_input'],
                             mutable=['intermediates'])
    return out, inter['intermediates'], batch

  def reconstruct(grid, levels, guides, keep):
    """Coarse-to-fine upsample-add, with levels outside `keep` zeroed.
    Mirrors HDRNetGaussianPyrNN.__call__ exactly."""
    current = None
    outs = []
    for il, (lvl, g) in enumerate(zip(levels[::-1], guides[::-1])):
      c = grid[:, :, :, :, il * 3:(il + 1) * 3, :]
      out_lvl = bilateral_slice_apply(c, g, lvl, has_offset=True)
      outs.append(out_lvl)
      if il not in keep:
        out_lvl = jnp.zeros_like(out_lvl)
      if current is None:
        current = out_lvl
      else:
        current = resize_bilinear(current, out_lvl.shape[1:3],
                                  align_corners=True) + out_lvl
    return current, outs

  per_image = []
  n = min(pipeline.nsamples, args.limit)
  it = pipeline.batches(seed=0)
  all_keep = set(range(n_scales))
  for i in range(n):
    out, inter, batch = forward(next(it))
    target = batch['image_output']
    grid = inter['bilateral_coefficients'][0]
    levels = list(inter['multiscale'])
    guides = list(inter['guide_map'])
    base = float(metrics.psnr(target, out))

    rec = {'psnr': base, 'levels': []}
    full, outs = reconstruct(grid, levels, guides, all_keep)
    np.testing.assert_allclose(np.asarray(full), np.asarray(out),
                               atol=1e-5)
    # outs[il] is the il-th COARSEST level's slice output.
    for il in range(n_scales):
      g = np.asarray(guides[::-1][il])
      o = np.asarray(outs[il])
      ab_out, _ = reconstruct(grid, levels, guides, all_keep - {il})
      rec['levels'].append({
          'scale_divisor': 2 ** (n_scales - 1 - il),
          'guide_p01': float(np.percentile(g, 1)),
          'guide_p99': float(np.percentile(g, 99)),
          'guide_std': float(g.std()),
          'out_rms': float(np.sqrt((o ** 2).mean())),
          'psnr_without': float(metrics.psnr(target, ab_out)),
      })
    per_image.append(rec)
    print(f'[{i+1}/{n}] psnr={base:.2f} ' + ' '.join(
        f"L/{r['scale_divisor']}: g=[{r['guide_p01']:.2f},"
        f"{r['guide_p99']:.2f}] rms={r['out_rms']:.3f} "
        f"-drop={base - r['psnr_without']:+.2f}dB"
        for r in rec['levels']), flush=True)

  summary = {
      'checkpoint': args.checkpoint_dir,
      'step': int(state.step),
      'mean_psnr': float(np.mean([r['psnr'] for r in per_image])),
      'levels': [],
  }
  for il in range(n_scales):
    rows = [r['levels'][il] for r in per_image]
    summary['levels'].append({
        'scale_divisor': rows[0]['scale_divisor'],
        'guide_p01': float(np.mean([r['guide_p01'] for r in rows])),
        'guide_p99': float(np.mean([r['guide_p99'] for r in rows])),
        'guide_std': float(np.mean([r['guide_std'] for r in rows])),
        'out_rms': float(np.mean([r['out_rms'] for r in rows])),
        'mean_psnr_drop_without': float(np.mean(
            [r['psnr'] for r in per_image]) - np.mean(
            [r['psnr_without'] for r in rows])),
    })
  print(json.dumps(summary, indent=2))
  if args.json_out:
    with open(args.json_out, 'w') as f:
      json.dump({'summary': summary, 'per_image': per_image}, f, indent=2)


if __name__ == '__main__':
  main()
