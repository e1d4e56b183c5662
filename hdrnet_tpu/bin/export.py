#!/usr/bin/env python
"""Export a trained model for deployment.

Replaces the reference's freeze/optimize pipeline
(bin/freeze_graph.py + bin/scripts/optimize_graph.sh): on TPU the
"frozen optimized graph" is a serialized StableHLO export of the jitted
function (weights inlined as constants — freezing), and XLA is the
graph optimizer.

Produces in <checkpoint_dir>:
  * coefficients_fn.stablehlo  — lowres (1, S, S, n_in) -> packed
    coefficients, transposed to the reference deployment layout
    (n_out*ni, gd, gh, gw, n_in?) — cf. freeze_graph.py:69-75;
  * enhance_fn.stablehlo       — full (lowres, fullres) -> output;
  * guide_*.bin                — raw little-endian f32 guide parameters,
    byte-compatible with the reference renderer's loader
    (benchmark/src/renderer.cc:197-224), incl. batch-norm constant
    folding for NN guides (freeze_graph.py:127-184).
"""

from __future__ import annotations

import argparse
import json
import logging
import os

import numpy as np

log = logging.getLogger('hdrnet_tpu.export')
logging.basicConfig(
    format='%(asctime)s [%(process)d] %(levelname)s %(filename)s:%(lineno)s | '
           '%(message)s', level=logging.INFO)


def _save_bin(arr, path):
  np.ascontiguousarray(arr, dtype='<f4').tofile(path)
  log.info('wrote %s %s', path, tuple(np.asarray(arr).shape))


def dump_guide_params(params, batch_stats, model_name, out_dir):
  """Raw .bin guide dumps, matching freeze_graph.py:106-184 layouts."""
  if model_name == 'HDRNetCurves':
    g = params['guide']
    ccm34 = np.vstack([np.asarray(g['ccm']),
                       np.asarray(g['ccm_bias'])[None, :]])
    _save_bin(ccm34.T, os.path.join(out_dir, 'guide_ccm_f32_3x4.bin'))
    # Reference stores (npts, nchans) transposed of its squeezed
    # (1,1,nchans,npts) variables; ours are (nchans, npts).
    _save_bin(np.asarray(g['shifts']),
              os.path.join(out_dir, 'guide_shifts_f32_16x3.bin'))
    _save_bin(np.asarray(g['slopes']),
              os.path.join(out_dir, 'guide_slopes_f32_16x3.bin'))
    mix = np.append(np.asarray(g['channel_mixing_w']).ravel(),
                    np.asarray(g['channel_mixing_b']).ravel())
    _save_bin(mix, os.path.join(out_dir, 'guide_mix_matrix_f32_1x4.bin'))
    return

  def dump_nn_guide(gp, gs, prefix):
    # Fold the center-only BN into conv1: w' = w / sqrt(var + eps),
    # b' = beta - mean / sqrt(var + eps) (freeze_graph.py:141-142;
    # eps = tf.contrib.layers.batch_norm default, matching training).
    eps = 1e-3
    w = np.squeeze(np.asarray(gp['conv1']['conv']['kernel']))
    beta = np.asarray(gp['conv1']['bn']['bias'])
    mean = np.asarray(gs['conv1']['bn']['mean'])
    var = np.asarray(gs['conv1']['bn']['var'])
    scale = 1.0 / np.sqrt(var + eps)
    w = w * scale
    b = beta - mean * scale
    conv1 = np.vstack([w, b[None, :]])
    _save_bin(conv1.T, os.path.join(out_dir, f'{prefix}conv1.bin'))
    w2 = np.squeeze(np.asarray(gp['conv2']['conv']['kernel']))
    b2 = np.asarray(gp['conv2']['conv']['bias']).ravel()
    _save_bin(np.append(w2, b2),
              os.path.join(out_dir, f'{prefix}conv2.bin'))

  if model_name == 'HDRNetPointwiseNNGuide':
    dump_nn_guide(params['guide'], batch_stats['guide'], 'guide_')
  elif model_name == 'HDRNetGaussianPyrNN':
    for lvl in range(3):
      key = f'guide_level_{lvl}'
      dump_nn_guide(params[key], batch_stats[key], f'guide_level{lvl}_')
  else:
    log.info('no guide dump defined for %s', model_name)


def main(argv=None):
  parser = argparse.ArgumentParser(description=__doc__)
  parser.add_argument('checkpoint_dir')
  parser.add_argument('--output_dir', default=None,
                      help='defaults to checkpoint_dir')
  parser.add_argument('--fullres', type=int, nargs=2, default=[1080, 1920],
                      help='static full resolution of enhance_fn')
  args = parser.parse_args(argv)
  out_dir = args.output_dir or args.checkpoint_dir
  os.makedirs(out_dir, exist_ok=True)

  import jax
  import jax.numpy as jnp
  from jax import export as jexport
  from hdrnet_tpu.config import Config
  from hdrnet_tpu.models import make_model
  from hdrnet_tpu.training.checkpoint import Checkpointer
  from hdrnet_tpu.training.step import abstract_state

  config = Config.load(args.checkpoint_dir)
  model = make_model(config.model)
  s = config.model.net_input_size
  n_in = config.model.n_in

  from hdrnet_tpu.training.loop import make_tx
  dummy_low = jnp.zeros((1, s, s, n_in), jnp.float32)
  dummy_full = jnp.zeros((1, 64, 64, n_in), jnp.float32)
  template = abstract_state(model, make_tx(config.train),
                            jax.random.PRNGKey(0), dummy_low, dummy_full)
  state = Checkpointer(args.checkpoint_dir).restore(template)
  assert state is not None, f'no checkpoint in {args.checkpoint_dir}'
  variables = {'params': state.params}
  if state.batch_stats:
    variables['batch_stats'] = state.batch_stats

  # --- coefficient-only function (weights baked in = frozen) ----------
  def coefficients_fn(lowres):
    _, inter = model.apply(variables, lowres, lowres[:, :s, :s],
                           mutable=['intermediates'])
    grid = inter['intermediates']['bilateral_coefficients'][0]
    b, gh, gw, gd, no, ni = grid.shape
    packed = grid.reshape(b, gh, gw, gd, no * ni)[0]
    # Deployment layout (freeze_graph.py:69-75): transpose
    # (gh, gw, gd, c) -> (c, gd, gh, gw).
    return jnp.transpose(packed, (3, 2, 0, 1))

  def write_artifacts(exported, name, in_avals):
    """jax.export envelope (.stablehlo, for Python reload) + raw StableHLO
    MLIR bytecode (.mlir, for the native PJRT driver) + shape manifest."""
    path = os.path.join(out_dir, f'{name}.stablehlo')
    with open(path, 'wb') as f:
      f.write(exported.serialize())
    with open(os.path.join(out_dir, f'{name}.mlir'), 'wb') as f:
      f.write(exported.mlir_module_serialized)
    manifest = {
        'name': name,
        'inputs': [{'shape': list(a.shape), 'dtype': str(a.dtype)}
                   for a in in_avals],
        'outputs': [{'shape': list(a.shape), 'dtype': str(a.dtype)}
                    for a in exported.out_avals],
    }
    mpath = os.path.join(out_dir, f'{name}.manifest.json')
    with open(mpath, 'w') as f:
      json.dump(manifest, f, indent=2)
    log.info('wrote %s{.stablehlo,.mlir,.manifest.json} (out %s)',
             os.path.join(out_dir, name), exported.out_avals)

  in1 = [jax.ShapeDtypeStruct((1, s, s, n_in), jnp.float32)]
  exported = jexport.export(jax.jit(coefficients_fn))(*in1)
  write_artifacts(exported, 'coefficients_fn', in1)

  # --- full enhancement function --------------------------------------
  h, w = args.fullres

  def enhance_fn(lowres, fullres):
    return jnp.clip(model.apply(variables, lowres, fullres), 0.0, 1.0)

  in2 = [jax.ShapeDtypeStruct((1, s, s, n_in), jnp.float32),
         jax.ShapeDtypeStruct((1, h, w, n_in), jnp.float32)]
  exported2 = jexport.export(jax.jit(enhance_fn))(*in2)
  write_artifacts(exported2, 'enhance_fn', in2)

  # --- fused serving function (guide computed inside the Pallas kernel,
  # the deployment-speed path — inference.py Enhancer) -----------------
  from hdrnet_tpu.inference import Enhancer
  enh = Enhancer(config=config.model, variables=variables)
  if enh.use_fused:
    def serve_fn(lowres, fullres):
      return enh._forward(lowres, fullres, clip=True)
    exported3 = jexport.export(jax.jit(serve_fn))(*in2)
    write_artifacts(exported3, 'serve_fn', in2)
  else:
    log.info('no fused serving kernel for this config; serve_fn skipped')

  # --- uint8 streaming function: raw frame in, raw frame out; the
  # downsample, normalize, enhancement, and requantize all run on
  # device (inference.Enhancer.make_stream_fn). 4x less host-link
  # traffic than the f32 functions — the native-driver analog of the
  # reference's GL texture streaming. ---------------------------------
  # (Exported unconditionally: make_stream_fn serves through the fused
  # kernel when available and the composite path otherwise.)
  stream_fn = enh.make_stream_fn((1, h, w, n_in))
  in5 = [jax.ShapeDtypeStruct((1, h, w, n_in), jnp.uint8)]
  exported5 = jexport.export(stream_fn)(*in5)
  write_artifacts(exported5, 'stream_fn', in5)

  # --- dynamic-size serving function (bucketed): the image is padded
  # to the bucket containing --fullres and the TRUE size is a traced
  # int32 (2,) operand — one native executable serves every resolution
  # inside the bucket (cf. inference.Enhancer.enhance_any). -----------
  buckets = enh._bucketable(h, w) if enh.use_fused else None
  if buckets is not None:
    (h_b, h_min), (w_b, w_min) = buckets

    def serve_any_fn(lowres, padded, hw):
      return enh._bucketed_forward(lowres, padded, hw, h_b=h_b, w_b=w_b,
                                   h_min=h_min, w_min=w_min, clip=True)

    in4 = [jax.ShapeDtypeStruct((1, s, s, n_in), jnp.float32),
           jax.ShapeDtypeStruct((1, h_b, w_b, n_in), jnp.float32),
           jax.ShapeDtypeStruct((2,), jnp.int32)]
    exported4 = jexport.export(jax.jit(serve_any_fn))(*in4)
    write_artifacts(exported4, 'serve_any_fn', in4)
    log.info('serve_any_fn bucket: %dx%d (serves true sizes down to '
             '%dx%d)', h_b, w_b, h_min, w_min)
  else:
    log.info('no dynamic-size bucket for this config; serve_any_fn '
             'skipped')

  # Serialized default xla::CompileOptions for the native PJRT driver
  # (PJRT_Client_Compile wants this proto; generating it here keeps the
  # C++ side protobuf-free).
  from jaxlib import xla_client as xc
  with open(os.path.join(out_dir, 'compile_options.pb'), 'wb') as f:
    f.write(xc.CompileOptions().SerializeAsString())

  # --- raw guide parameter dumps --------------------------------------
  dump_guide_params(state.params, state.batch_stats,
                    config.model.model_name, out_dir)


if __name__ == '__main__':
  main()
