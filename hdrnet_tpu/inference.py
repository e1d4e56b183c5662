"""High-throughput serving path.

The deployment-speed equivalent of the reference's C++/GL processor
stack (benchmark/src/processor.cc + renderer.cc): the coefficient net
runs at 256x256, and ONE fused Pallas kernel does guide + slice + apply
at full resolution — the guide never touches HBM, exactly like the
reference's in-fragment-shader guide (std.frag:32-53).

`Enhancer` extracts guide parameters from Flax variables (folding the
center-only BN into the first conv for NN guides, as
freeze_graph.py:141-142 does), jits one function per input shape, and
falls back to the composite model.apply for configurations without a
fused kernel.
"""

from __future__ import annotations

import functools
import logging
import os

import jax
import jax.numpy as jnp
import numpy as np

from hdrnet_tpu.config import Config, ModelConfig
from hdrnet_tpu.models import make_model
from hdrnet_tpu.models.hdrnet import (HDRNetCurves, HDRNetGaussianPyrNN,
                                      HDRNetPointwiseNNGuide)
from hdrnet_tpu.ops import pallas as pk
from hdrnet_tpu.ops.resize import resize_bilinear, resize_nearest

_BN_EPS = 1e-3  # tf.contrib.layers.batch_norm default (the reference's)

log = logging.getLogger('hdrnet_tpu.inference')


def _curves_guide_params(gp, n_in):
  ccm_ext = jnp.vstack([gp['ccm'], gp['ccm_bias'][None, :]])
  curves = jnp.vstack([gp['shifts'], gp['slopes']])
  mix = jnp.vstack([gp['channel_mixing_w'].reshape(n_in, 1),
                    gp['channel_mixing_b'].reshape(1, 1)])
  return (ccm_ext.astype(jnp.float32), curves.astype(jnp.float32),
          mix.astype(jnp.float32))


def _nn_guide_params(gp, gs, n_in):
  """Folds BN into conv1 (freeze_graph.py:141-142)."""
  w1 = gp['conv1']['conv']['kernel'].reshape(n_in, -1)
  beta = gp['conv1']['bn']['bias']
  mean = gs['conv1']['bn']['mean']
  var = gs['conv1']['bn']['var']
  scale = 1.0 / jnp.sqrt(var + _BN_EPS)
  w1 = w1 * scale
  b1 = beta - mean * scale
  w1_ext = jnp.vstack([w1, b1[None, :]])
  gc = w1.shape[1]
  w2 = gp['conv2']['conv']['kernel'].reshape(gc, 1)
  b2 = gp['conv2']['conv']['bias'].reshape(1, 1)
  w2_ext = jnp.vstack([w2, b2])
  return (w1_ext.astype(jnp.float32), w2_ext.astype(jnp.float32))


# Resolution buckets for dynamic-shape serving (ratio 1.25: worst-case
# padding waste 1.56x in area; each bucket is one kernel compile that
# serves every true size in (prev_rung, rung]).
BUCKET_LADDER = (256, 320, 400, 512, 640, 800, 1024, 1280, 1600, 2048,
                 2560, 3200, 4096, 5120)


def bucket_extent(x):
  """Smallest ladder rung >= x, with its lower bound (prev rung + 1).
  Returns (rung, min_extent) or None if x is beyond the ladder."""
  prev = 0
  for rung in BUCKET_LADDER:
    if x <= rung:
      return rung, prev + 1
    prev = rung
  return None


class Enhancer:
  """Loads a trained model and serves full-res enhancement."""

  def __init__(self, checkpoint_dir=None, *, config=None, variables=None,
               use_fused=True, interpret=False, coeff_bf16=None):
    if checkpoint_dir is not None:
      from hdrnet_tpu.training.checkpoint import Checkpointer
      from hdrnet_tpu.training.loop import make_tx
      from hdrnet_tpu.training.step import abstract_state
      full_cfg = Config.load(checkpoint_dir)
      config = full_cfg.model
      self.model_cfg = config
      model = make_model(config)
      s = config.net_input_size
      dummy_low = jnp.zeros((1, s, s, config.n_in), jnp.float32)
      dummy_full = jnp.zeros((1, 64, 64, config.n_in), jnp.float32)
      # Template optimizer must match the saved one (schedule state).
      template = abstract_state(model, make_tx(full_cfg.train),
                                jax.random.PRNGKey(0), dummy_low, dummy_full)
      state = Checkpointer(checkpoint_dir).restore(template)
      assert state is not None, f'no checkpoint in {checkpoint_dir}'
      variables = {'params': state.params}
      if state.batch_stats:
        variables['batch_stats'] = state.batch_stats
    else:
      assert config is not None and variables is not None
      self.model_cfg = config
    self.model = make_model(self.model_cfg)
    self.variables = variables
    self.interpret = interpret
    if coeff_bf16 is None:
      coeff_bf16 = os.environ.get('HDRNET_TPU_COEFF_BF16', '0') == '1'
    self.coeff_bf16 = coeff_bf16
    self.use_fused = use_fused and self._fusable()
    if self.coeff_bf16 and not self.use_fused:
      log.warning('Enhancer: coeff_bf16 only applies to the fused serving '
                  'path; the composite fallback stays f32')
    self._jitted = {}

  def _fusable(self):
    if jax.default_backend() != 'tpu' and not self.interpret:
      return False
    return isinstance(self.model, (HDRNetCurves, HDRNetPointwiseNNGuide,
                                   HDRNetGaussianPyrNN))

  # -- guide parameter extraction ------------------------------------

  def _guide_args(self):
    params = self.variables['params']
    stats = self.variables.get('batch_stats', {})
    n_in = self.model_cfg.n_in
    if isinstance(self.model, HDRNetGaussianPyrNN):
      return [('nn', _nn_guide_params(params[f'guide_level_{l}'],
                                      stats[f'guide_level_{l}'], n_in))
              for l in range(self.model.n_scales)]
    if isinstance(self.model, HDRNetPointwiseNNGuide):
      return [('nn', _nn_guide_params(params['guide'], stats['guide'],
                                      n_in))]
    return [('curves', _curves_guide_params(params['guide'], n_in))]

  # -- fused forward ----------------------------------------------------

  def _backbone_grid(self, lowres):
    """Coefficient-backbone forward: lowres -> rank-6 bilateral grid.

    With ``HDRNET_TPU_COEFF_BF16=1`` (or ``coeff_bf16=True``) the
    backbone's convs/FCs run in bfloat16 on the MXU and the grid is cast
    back to f32 for the slice kernel. bf16's ~0.4% relative error on the
    affine coefficients is about one u8 output quantum — opt-in for
    serving, never used in training.
    """
    from hdrnet_tpu.models.hdrnet import CoefficientBackbone
    bb_vars = {'params': self.variables['params']['coefficients']}
    if 'coefficients' in self.variables.get('batch_stats', {}):
      bb_vars['batch_stats'] = self.variables['batch_stats'][
          'coefficients']
    backbone = CoefficientBackbone(self.model_cfg, self.model.n_out,
                                   self.model.n_in_tot)
    if self.coeff_bf16:
      cast = lambda a: (a.astype(jnp.bfloat16)
                        if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating)
                        else a)
      bb_vars = jax.tree.map(cast, bb_vars)
      return backbone.apply(bb_vars, lowres.astype(jnp.bfloat16)).astype(
          jnp.float32)
    return backbone.apply(bb_vars, lowres)

  def _fused_forward_cf(self, lowres, img_cf, clip=False):
    """Single-grid fused forward on a channel-first (B, C, H, W) frame.
    Returns the enhanced frame channel-first (the kernel's layout)."""
    cfg = self.model_cfg
    grid = self._backbone_grid(lowres)
    b, gh, gw, gd, no, ni1 = grid.shape
    mode, gparams = self._guide_args()[0]
    packed = grid.reshape(b, gh, gw, gd, no * ni1)
    # Serving clamp done in the kernel epilogue (free; a separate XLA
    # clip is a full-image read+write pass, ~0.25 ms at 4K).
    return pk.enhance_fused(packed, img_cf, gparams, mode, no,
                            cfg.n_in, True, interpret=self.interpret,
                            clip_output=clip)

  def _fused_forward(self, lowres, fullres, clip=False):
    model, cfg = self.model, self.model_cfg
    if not isinstance(self.model, HDRNetGaussianPyrNN):
      img_cf = jnp.transpose(fullres, (0, 3, 1, 2))
      out_cf = self._fused_forward_cf(lowres, img_cf, clip=clip)
      return jnp.transpose(out_cf, (0, 2, 3, 1))

    grid = self._backbone_grid(lowres)
    b, gh, gw, gd, no, ni1 = grid.shape
    guide_args = self._guide_args()

    n_scales = self.model.n_scales
    levels = [fullres]
    for _ in range(n_scales - 1):
      h, w = levels[-1].shape[1:3]
      levels.append(resize_bilinear(levels[-1], (h // 2, w // 2),
                                    align_corners=True))
    current = None
    for il, lvl in enumerate(levels[::-1]):
      mode, gparams = guide_args[::-1][il]
      sub = grid[:, :, :, :, il * 3:(il + 1) * 3, :]
      packed = sub.reshape(b, gh, gw, gd, 3 * ni1)
      img_cf = jnp.transpose(lvl, (0, 3, 1, 2))
      out_cf = pk.enhance_fused(packed, img_cf, gparams, mode, 3,
                                cfg.n_in, True,
                                interpret=self.interpret)
      out = jnp.transpose(out_cf, (0, 2, 3, 1))
      if current is None:
        current = out
      else:
        current = resize_bilinear(current, out.shape[1:3],
                                  align_corners=True) + out
    # Levels are summed before clamping, so the clip cannot ride the
    # per-level kernels.
    return jnp.clip(current, 0.0, 1.0) if clip else current

  def _feasible_at(self, h, w):
    """Kernel feasibility for this model at full resolution (h, w) —
    for the pyramid model every level must fit the tile planner (the
    coarse levels are the tight ones: few pixels per grid cell)."""
    sb = self.model_cfg.spatial_bin
    n_levels = (self.model.n_scales
                if isinstance(self.model, HDRNetGaussianPyrNN) else 1)
    for _ in range(n_levels):
      if not pk.feasible(h, w, sb, sb):
        return False
      h, w = h // 2, w // 2
    return True

  def _forward(self, lowres, fullres, clip=False):
    if self.use_fused and self._feasible_at(fullres.shape[1],
                                            fullres.shape[2]):
      return self._fused_forward(lowres, fullres, clip=clip)
    if self.use_fused:
      log.warning(
          'Enhancer: %dx%d infeasible for the fused kernel (model %s); '
          'serving via the composite path (~1.5x slower at 4K)',
          fullres.shape[1], fullres.shape[2],
          type(self.model).__name__)
    out = self.model.apply(self.variables, lowres, fullres)
    return jnp.clip(out, 0.0, 1.0) if clip else out

  def __call__(self, lowres, fullres, clip=True):
    key = (lowres.shape, fullres.shape, bool(clip))
    if key not in self._jitted:
      def fn(lowres, fullres):
        return self._forward(lowres, fullres, clip=clip)
      self._jitted[key] = jax.jit(fn)
    return self._jitted[key](lowres, fullres)

  # -- whole-frame serving (downsample included) ------------------------

  def _process_fn(self, lowres=None):
    """The per-frame pipeline with the preview downsample inside — the
    equivalent of the reference processor's process() (processor.cc:
    103-137, whose measured iteration includes cv::resize). The frame
    is transposed to the kernel's channel-first layout ONCE and the
    256x256 preview is cut from it by the Pallas nearest-downsample
    kernel (ops/downsample.py) — bit-exact to resize_nearest but ~3x
    faster at 4K than XLA's gather lowering."""
    from hdrnet_tpu.ops.downsample import nearest_lowres_cf
    s = self.model_cfg.net_input_size

    def fn(frame, clip=True):
      if (self.use_fused
          and not isinstance(self.model, HDRNetGaussianPyrNN)
          and self._feasible_at(frame.shape[1], frame.shape[2])):
        cf = jnp.transpose(frame, (0, 3, 1, 2))
        low_cf = nearest_lowres_cf(cf, s, interpret=self.interpret)
        low = jnp.transpose(low_cf, (0, 2, 3, 1))
        out_cf = self._fused_forward_cf(low, cf, clip=clip)
        return jnp.transpose(out_cf, (0, 2, 3, 1))
      low = resize_nearest(frame, (s, s))
      return self._forward(low, frame, clip=clip)
    return fn

  def process(self, frame, clip=True):
    """Enhance one (B, H, W, C) float frame end-to-end (downsample +
    coefficients + guide + slice-apply), one jit per frame shape."""
    key = ('process', frame.shape, bool(clip))
    if key not in self._jitted:
      fn = self._process_fn()
      self._jitted[key] = jax.jit(lambda f: fn(f, clip=clip))
    return self._jitted[key](frame)

  # -- streaming (video / camera feed) serving --------------------------

  def make_stream_fn(self, full_shape):
    """One jitted uint8-in / uint8-out pipeline step for streaming.

    Everything between the raw frame and the raw output runs on device,
    and — on the fused path — the frame stays uint8 through HBM: the
    Pallas preview-downsample and the fused kernel dequantize (x/255)
    in-kernel, and the kernel's epilogue requantizes the clipped result
    (round-half-up, same conversion as utils/image imwrite). A 4K frame
    then moves ~72 MB of HBM traffic instead of ~460 MB, and 24 MB over
    the host link instead of 95 MB of f32. Equivalent of the
    reference's 8-bit GL texture path (renderer.cc:227-253) + per-frame
    cv::resize (processor.cc:110-122).
    """
    key = ('stream', tuple(full_shape))
    if key not in self._jitted:
      from hdrnet_tpu.ops.downsample import nearest_lowres_cf
      s = self.model_cfg.net_input_size
      b, h, w, _ = full_shape
      fused_ok = (self.use_fused
                  and not isinstance(self.model, HDRNetGaussianPyrNN)
                  and self._feasible_at(h, w))

      if fused_ok:
        @jax.jit
        def fn(frame_u8):
          cf_u8 = jnp.transpose(frame_u8, (0, 3, 1, 2))
          low = jnp.transpose(nearest_lowres_cf(cf_u8, s,
                                                interpret=self.interpret),
                              (0, 2, 3, 1))
          grid = self._backbone_grid(low)
          b_, gh, gw, gd, no, ni1 = grid.shape
          mode, gparams = self._guide_args()[0]
          packed = grid.reshape(b_, gh, gw, gd, no * ni1)
          out_cf = pk.enhance_fused(packed, cf_u8, gparams, mode, no,
                                    self.model_cfg.n_in, True,
                                    interpret=self.interpret,
                                    clip_output=True, u8_output=True)
          return jnp.transpose(out_cf, (0, 2, 3, 1))
      else:
        @jax.jit
        def fn(frame_u8):
          full = frame_u8.astype(jnp.float32) / 255.0
          low = resize_nearest(full, (s, s))
          out = self._forward(low, full, clip=True)
          return (out * 255.0 + 0.5).astype(jnp.uint8)

      self._jitted[key] = fn
    return self._jitted[key]

  def stream(self, frames, depth=2):
    """Enhance an iterable of uint8 frames with transfer/compute overlap.

    The TPU equivalent of the reference's async GL upload pipeline
    (processor.cc:103-137: texture upload of frame k+1 proceeds while
    the GPU renders frame k). Here `jax.device_put` and jit dispatch
    are asynchronous, so with a pipeline depth of `depth` the host->
    device DMA of frame k+1 and the host readback of frame k-depth
    overlap the fused kernel of frame k; the generator only blocks on
    the OLDEST in-flight frame. Yields uint8 numpy frames in order.
    """
    import collections
    pending = collections.deque()
    for f in frames:
      assert f.dtype == np.uint8, 'stream() takes raw uint8 frames'
      fn = self.make_stream_fn(f.shape)
      pending.append(fn(jax.device_put(f)))
      if len(pending) > depth:
        yield np.asarray(pending.popleft())
    while pending:
      yield np.asarray(pending.popleft())

  # -- bucketed dynamic-shape serving -----------------------------------

  def _bucketable(self, h, w):
    """One fused compile per bucket requires: a fused-capable model and
    a feasible offset-universal tile plan for the bucket — for pyramid
    models, at EVERY level (each level's bucket is the parent's halved;
    ladder rungs are all divisible by 4 so the halvings stay exact)."""
    if not self.use_fused:
      return None
    hb, wb = bucket_extent(h), bucket_extent(w)
    if hb is None or wb is None:
      return None
    sb = self.model_cfg.spatial_bin
    n_levels = (self.model.n_scales
                if isinstance(self.model, HDRNetGaussianPyrNN) else 1)
    for lvl in range(n_levels):
      if not pk.feasible_dynamic(hb[0] >> lvl, wb[0] >> lvl,
                                 max(1, hb[1] >> lvl),
                                 max(1, wb[1] >> lvl), sb, sb):
        return None
    return hb, wb

  def enhance_any(self, lowres, fullres, clip=True):
    """Arbitrary-resolution serving (the reference run.py use case,
    bin/run.py:87-90) without a compile per exact shape.

    The image is zero-padded up to a resolution bucket and the fused
    kernel runs with the TRUE size as a traced scalar (the pixel->grid
    scale uses the true size, so valid pixels are bit-identical to the
    unpadded exact-shape path); the padded border is cropped off. One
    kernel compile serves every size inside a bucket; out-of-ladder or
    infeasible shapes fall back to the exact-shape path. Uses the
    'loop' depth strategy (5 s compiles) unless the exact shape is
    already compiled.
    """
    key = (lowres.shape, fullres.shape, bool(clip))
    if key in self._jitted:  # steady-state shape already paid for
      return self._jitted[key](lowres, fullres)
    b, h, w, _ = fullres.shape
    buckets = self._bucketable(h, w)
    if buckets is None:
      log.warning(
          'enhance_any: %dx%d not bucketable (model %s); compiling the '
          'exact shape instead', h, w, type(self.model).__name__)
      return self(lowres, fullres, clip=clip)
    (h_b, h_min), (w_b, w_min) = buckets
    bkey = ('bucket', b, lowres.shape, h_b, w_b, bool(clip))
    if bkey not in self._jitted:
      self._jitted[bkey] = jax.jit(functools.partial(
          self._bucketed_forward, h_b=h_b, w_b=w_b, h_min=h_min,
          w_min=w_min, clip=clip))
    pads = ((0, 0), (0, h_b - h), (0, w_b - w), (0, 0))
    if isinstance(fullres, np.ndarray):
      padded = np.pad(fullres, pads)  # host-side: no eager device op
    else:
      padded = jnp.pad(fullres, pads)
    hw = jnp.asarray([h, w], jnp.int32)
    out = self._jitted[bkey](lowres, padded, hw)
    return out[:, :h, :w]

  def _bucketed_forward(self, lowres, padded, hw, *, h_b, w_b, h_min,
                        w_min, clip):
    model, cfg = self.model, self.model_cfg
    grid = self._backbone_grid(lowres)
    b, gh, gw, gd, no, ni1 = grid.shape
    guide_args = self._guide_args()

    if isinstance(model, HDRNetGaussianPyrNN):
      from hdrnet_tpu.ops.resize import resize_bilinear_traced
      n_scales = model.n_scales
      # Padded pyramid with traced true extents: level l is the exact
      # bilinear(align_corners) halving of level l-1's TRUE image
      # (models.py:252-265); pixels beyond the true extent are garbage
      # that nothing downstream reads (taps are clipped to true-1).
      levels = [(padded, hw)]
      for l in range(1, n_scales):
        prev, prev_hw = levels[-1]
        true_hw = prev_hw // 2
        nxt = resize_bilinear_traced(prev, (h_b >> l, w_b >> l),
                                     prev_hw, true_hw)
        levels.append((nxt, true_hw))
      current = None
      for il, (lvl, lvl_hw) in enumerate(levels[::-1]):
        l = n_scales - 1 - il
        mode, gparams = guide_args[l]
        sub = grid[:, :, :, :, il * 3:(il + 1) * 3, :]
        packed = sub.reshape(b, gh, gw, gd, 3 * ni1)
        img_cf = jnp.transpose(lvl, (0, 3, 1, 2))
        out_cf = pk.enhance_fused(
            packed, img_cf, gparams, mode, 3, cfg.n_in, True,
            interpret=self.interpret, z_strategy='loop',
            h_true=lvl_hw[0], w_true=lvl_hw[1],
            h_min=max(1, h_min >> l), w_min=max(1, w_min >> l))
        out = jnp.transpose(out_cf, (0, 2, 3, 1))
        if current is None:
          current = out
        else:
          up = resize_bilinear_traced(current, out.shape[1:3],
                                      lvl_hw // 2, lvl_hw)
          current = up + out
      return jnp.clip(current, 0.0, 1.0) if clip else current

    mode, gparams = guide_args[0]
    packed = grid.reshape(b, gh, gw, gd, no * ni1)
    img_cf = jnp.transpose(padded, (0, 3, 1, 2))
    out_cf = pk.enhance_fused(packed, img_cf, gparams, mode, no,
                              cfg.n_in, True, interpret=self.interpret,
                              clip_output=clip, z_strategy='loop',
                              h_true=hw[0], w_true=hw[1], h_min=h_min,
                              w_min=w_min)
    return jnp.transpose(out_cf, (0, 2, 3, 1))

  # -- spatially-sharded giant-image inference -------------------------

  def enhance_sharded(self, lowres, fullres, mesh, clip=True):
    """Full-res image sharded along H across every device of `mesh`.

    Zero-halo SPMD (SURVEY.md §5.7): the coefficient grid is tiny and
    replicated; the guide + slice-apply are pointwise, so each device
    runs the fused kernel on its own H-band with only a pixel-offset
    scalar distinguishing it — no collective in the full-res path at
    all. For 4K+/full-sensor frames that exceed one chip's latency
    budget, throughput scales linearly over ICI.

    Pyramid models (HDRNetGaussianPyrNN): every level's fused kernel
    runs H-sharded the same way (per-level traced offsets); the
    downsample and coarse-to-fine upsample-add happen between kernels
    on sharded arrays in jit-land, where XLA inserts the 1-row halo
    exchanges the bilinear resamplings need over ICI.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    cfg, model = self.model_cfg, self.model
    axes = mesh.axis_names
    n_dev = int(np.prod(list(mesh.shape.values())))
    b, h, w, _ = fullres.shape
    n_scales = (model.n_scales
                if isinstance(model, HDRNetGaussianPyrNN) else 1)
    assert h % (n_dev * 2 ** (n_scales - 1)) == 0, (h, n_dev, n_scales)

    guide_args = self._guide_args()
    interpret = self.interpret

    def make_shard_fn(mode, h_lvl, w_lvl):
      h_local = h_lvl // n_dev

      def shard_fn(packed, img_cf, *gp):
        idx = jax.lax.axis_index(axes[0])
        if len(axes) > 1:
          for ax in axes[1:]:
            idx = idx * jax.lax.axis_size(ax) + jax.lax.axis_index(ax)
        y_off = idx * h_local
        return pk.enhance_fused(packed, img_cf, gp, mode, 3 if
                                n_scales > 1 else model.n_out,
                                cfg.n_in, True, interpret=interpret,
                                y_offset=y_off, h_total=h_lvl,
                                w_total=w_lvl)
      return shard_fn

    img_spec = P(None, None, axes, None)  # (B, C, H/n, W)
    rep = P()

    def level_kernel(packed, img, mode, h_lvl, w_lvl, gparams):
      """One H-sharded fused kernel call (channels-last in/out)."""
      img_cf = jnp.transpose(img, (0, 3, 1, 2))
      # check_vma=False: pallas_call out_shapes don't carry varying-
      # mesh-axis metadata.
      out_cf = jax.shard_map(
          make_shard_fn(mode, h_lvl, w_lvl), mesh=mesh,
          in_specs=(rep, img_spec) + tuple(rep for _ in gparams),
          out_specs=img_spec, check_vma=False)(packed, img_cf, *gparams)
      return jnp.transpose(out_cf, (0, 2, 3, 1))

    img_sharding = NamedSharding(mesh, P(None, axes, None, None))

    @jax.jit
    def run(lowres, fullres, all_gparams):
      grid = self._backbone_grid(lowres)
      b_, gh, gw, gd, no, ni1 = grid.shape

      if n_scales == 1:
        packed = grid.reshape(b_, gh, gw, gd, no * ni1)
        mode, gparams = guide_args[0]
        out = level_kernel(packed, fullres, mode, h, w, all_gparams[0])
        return jnp.clip(out, 0.0, 1.0) if clip else out

      # Pyramid: build the sharded image pyramid (XLA halo-exchanges
      # the bilinear downsample), slice-apply each level sharded, then
      # upsample-add coarse-to-fine.
      levels = [fullres]
      for _ in range(n_scales - 1):
        hh, ww = levels[-1].shape[1:3]
        nxt = resize_bilinear(levels[-1], (hh // 2, ww // 2),
                              align_corners=True)
        levels.append(jax.lax.with_sharding_constraint(nxt, img_sharding))
      current = None
      for il, lvl in enumerate(levels[::-1]):
        # Grid channel blocks are ordered coarsest-first (same indexing
        # as _fused_forward); guide params are per-LEVEL (finest first).
        level = n_scales - 1 - il
        mode, _ = guide_args[level]
        sub = grid[:, :, :, :, il * 3:(il + 1) * 3, :]
        packed = sub.reshape(b_, gh, gw, gd, 3 * ni1)
        out = level_kernel(packed, lvl, mode, lvl.shape[1], lvl.shape[2],
                           all_gparams[level])
        if current is None:
          current = out
        else:
          up = resize_bilinear(current, out.shape[1:3],
                               align_corners=True)
          current = jax.lax.with_sharding_constraint(
              up, img_sharding) + out
      return jnp.clip(current, 0.0, 1.0) if clip else current

    all_gparams = [gp for _, gp in guide_args]
    return run(lowres, fullres, all_gparams)
