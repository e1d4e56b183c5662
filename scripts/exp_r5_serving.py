"""Round-5 serving probes on the real chip (one process, chained timing).

1. Batched-downsample validation + timing: the slab kernel now folds
   the batch into the one-hot contraction's M dim (ops/downsample.py);
   interpret mode can't catch Mosaic lowering rejections, so this
   checks compile + bit-exactness vs the XLA table path at b=1 and b=4
   on hardware, then times both (the round-4 batch-regression fix).
2. Curves-guide impl A/B (VERDICT r4 #5): HDRNET_TPU_CURVES_IMPL
   relu vs maxfma on the fused 4K serving path — the one identified
   VPU lever on the 1.6 ms kernel. The env var is read at trace time,
   so each arm builds a fresh Enhancer + fresh jitted chain.

Writes one JSON to --out and a human log to stderr.
"""

import argparse
import json
import os
import sys
import time

import numpy as np


def main(argv=None):
  p = argparse.ArgumentParser(description=__doc__)
  p.add_argument('--iters', type=int, default=100)
  p.add_argument('--repeats', type=int, default=3)
  p.add_argument('--res', type=int, nargs=2, default=(2160, 3840),
                 help='frame size (CPU smoke runs use a tiny one)')
  p.add_argument('--out', default='results/exp_r5_serving.json')
  args = p.parse_args(argv)

  import jax
  cache_dir = os.path.join(os.path.dirname(os.path.dirname(
      os.path.abspath(__file__))), 'output', 'jax_cache_bench')
  os.makedirs(cache_dir, exist_ok=True)
  jax.config.update('jax_compilation_cache_dir', cache_dir)
  import jax.numpy as jnp

  sys.path.insert(0, os.path.dirname(os.path.dirname(
      os.path.abspath(__file__))))
  from bench import _timed_feedback_chain, _timed_chain
  from hdrnet_tpu.config import ModelConfig
  from hdrnet_tpu.models import make_model
  from hdrnet_tpu.ops.downsample import nearest_lowres_cf

  err = lambda *a: print(*a, file=sys.stderr)
  rng = np.random.RandomState(0)
  (H, W), S = args.res, 256
  n = args.iters
  out = {}

  # ---- 1. batched downsample kernel: on-chip exactness + timing
  for b in (1, 4):
    x = jnp.asarray(rng.rand(b, 3, H, W), np.float32)
    try:
      got = jax.jit(lambda v: nearest_lowres_cf(v, S))(x)
      ref = jax.jit(lambda v: nearest_lowres_cf(v, S, variant='xla'))(x)
      diff = float(jnp.abs(got - ref).max())
      err(f'ds slab b{b} f32: max|diff| vs xla = {diff:.2e}')
      t = _timed_chain(
          lambda v, eps: nearest_lowres_cf(v + eps, S).sum(), n, x,
          repeats=args.repeats)
      err(f'ds slab b{b} f32: {t * 1e3:.3f} ms/chain-iter '
          f'({t * 1e3 / b:.3f} ms/frame)')
      out[f'ds_b{b}'] = {'max_diff_vs_xla': diff,
                         'ms_per_frame': round(t * 1e3 / b, 4)}
    except Exception as e:  # Mosaic rejection is the failure we probe
      err(f'ds slab b{b} FAILED: {type(e).__name__}: {str(e)[:300]}')
      out[f'ds_b{b}'] = {'error': str(e)[:300]}

  # ---- 2. curves-impl A/B on the fused serving path
  from hdrnet_tpu.inference import Enhancer
  cfg = ModelConfig(model_name='HDRNetCurves')
  model = make_model(cfg)
  full4k = jnp.asarray(rng.rand(1, H, W, 3), np.float32)
  lowres = jnp.asarray(rng.rand(1, 256, 256, 3), np.float32)
  variables = model.init(jax.random.PRNGKey(0), lowres, full4k)

  prev = os.environ.get('HDRNET_TPU_CURVES_IMPL')
  outs = {}
  try:
    for impl in ('relu', 'maxfma'):
      os.environ['HDRNET_TPU_CURVES_IMPL'] = impl
      enh = Enhancer(config=cfg, variables=variables)
      t_4k = _timed_feedback_chain(
          lambda f, l, e=enh: e._forward(l, f, clip=True), n, full4k,
          lowres, repeats=args.repeats)
      process = enh._process_fn()
      t_4k_full = _timed_feedback_chain(
          lambda f, pr=process: pr(f, clip=True), n, full4k,
          repeats=args.repeats)
      # Output-equivalence cross-check at a small static shape (cheap
      # compile; the full-size equivalence is unit-tested in interpret
      # mode at tests/test_pallas_ops.py).
      small = full4k[:, :min(216, H), :min(384, W)]
      outs[impl] = jax.jit(
          lambda f, l, e=enh: e._forward(l, f, clip=True))(small, lowres)
      err(f'curves={impl}: e2e w/o ds {t_4k * 1e3:.3f} ms '
          f'({1 / t_4k:.1f} fps) | incl ds {t_4k_full * 1e3:.3f} ms '
          f'({1 / t_4k_full:.1f} fps)')
      out[f'curves_{impl}'] = {
          'e2e_ms': round(t_4k * 1e3, 4),
          'e2e_incl_ds_ms': round(t_4k_full * 1e3, 4),
          'fps_incl_ds': round(1 / t_4k_full, 2),
      }
    d = float(jnp.abs(outs['relu'] - outs['maxfma']).max())
    err(f'maxfma vs relu output max|diff| = {d:.2e}')
    out['curves_ab_max_diff'] = d
    r, m = out['curves_relu']['e2e_ms'], out['curves_maxfma']['e2e_ms']
    out['maxfma_speedup_pct'] = round(100 * (r - m) / r, 2)
    err(f'maxfma speedup on e2e (w/o ds): {out["maxfma_speedup_pct"]}%')
  finally:
    if prev is None:
      os.environ.pop('HDRNET_TPU_CURVES_IMPL', None)
    else:
      os.environ['HDRNET_TPU_CURVES_IMPL'] = prev

  with open(args.out, 'w') as f:
    json.dump(out, f, indent=2)
  err(f'wrote {args.out}')
  return 0


if __name__ == '__main__':
  sys.exit(main())
