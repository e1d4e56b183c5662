"""Device-resident dataset: the whole training set lives in HBM.

HDRNet datasets are small (hundreds of photos — the reference's
local-laplacian set is ~2.5k 2048px images; sample_data/identity is
3), while the model's per-step compute is tiny. On a host with few
cores feeding a fast chip — or over a tunnel where every
host->device transfer is expensive — the input pipeline dominates the
step. This module uploads every decoded sample ONCE (raw uint8/uint16;
a 220-image 1024px set is ~1.3 GB of a v5e's 16 GB HBM) and performs
the reference's augmentation chain (random crop -> fliplr/flipud ->
rot90 -> nearest lowres, data_pipeline.py:126-171) inside the jitted
train step. The host's per-step work is drawing a handful of int32
augmentation parameters.

Requirements: every sample decodes to one common (H, W, C) shape, and
square crops when rotation is enabled (a rot90 of a non-square crop
would change the static output shape). Callers fall back to the host
pipeline otherwise.
"""

from __future__ import annotations

import logging

import jax
import jax.numpy as jnp
import numpy as np

log = logging.getLogger('hdrnet_tpu.data')


def _nearest_indices(src, dst):
  """Legacy-TF nearest indices: src_idx = floor(dst * src/dst_len)."""
  return np.minimum((np.arange(dst) * (src / dst)).astype(np.int32),
                    src - 1)


def make_device_augment(output_resolution, net_input_size, rotate):
  """Returns augment(inputs, outputs, params) -> batch dict, jittable.

  inputs/outputs: (B, H, W, C) raw-dtype device arrays (a gathered
  batch). params: dict of (B,) int32 arrays {y0, x0, fliplr, flipud,
  rot_k}. Output images keep the raw dtype — normalize-on-device
  (training.step.normalize_batch) divides by the dtype white level.
  """
  oh, ow = output_resolution
  if rotate and oh != ow:
    raise ValueError('device augmentation with rotation needs square '
                     f'output_resolution, got {output_resolution}')
  low_iy = jnp.asarray(_nearest_indices(oh, net_input_size))
  low_ix = jnp.asarray(_nearest_indices(ow, net_input_size))

  def one(inp, out, y0, x0, fl, fu, k):
    both = jnp.concatenate([inp, out], axis=-1)
    crop = jax.lax.dynamic_slice(
        both, (y0, x0, 0), (oh, ow, both.shape[-1]))
    # Flips then rot90(k), matching the host path (pipeline._augment
    # applies flips on the cropped frame, then rotation).
    crop = jnp.where(fl > 0, crop[:, ::-1], crop)
    crop = jnp.where(fu > 0, crop[::-1], crop)
    if rotate:
      crop = jax.lax.switch(k, [
          lambda c: c,
          lambda c: jnp.rot90(c, 1),
          lambda c: jnp.rot90(c, 2),
          lambda c: jnp.rot90(c, 3),
      ], crop)
    low = crop[low_iy][:, low_ix]
    return crop, low

  v = jax.vmap(one)

  def augment(inputs, outputs, params):
    n_in = inputs.shape[-1]
    full, low = v(inputs, outputs, params['y0'], params['x0'],
                  params['fliplr'], params['flipud'], params['rot_k'])
    return {
        'image_input': full[..., :n_in],
        'image_output': full[..., n_in:],
        'lowres_input': low[..., :n_in],
        'lowres_output': low[..., n_in:],
    }

  return augment


class DeviceDataset:
  """Uploads a decoded dataset once; draws per-step augmentation params.

  `pairs` is a list of (input_array, output_array) raw-dtype numpy
  samples of one common shape — or pass pairs=None and prebuilt
  (N, H, W, C) device arrays via `arrays=(inputs, outputs)` (the
  on-device synthetic pipelines construct outputs in HBM directly).
  """

  def __init__(self, pairs, cfg, sharding=None, arrays=None):
    put = (lambda x: jax.device_put(x, sharding)) if sharding is not None \
        else jax.device_put
    if arrays is not None:
      assert pairs is None
      ins, outs = arrays
      self.inputs = put(ins)
      self.outputs = put(outs)
    else:
      shapes = {(a.shape, b.shape) for a, b in pairs}
      if len(shapes) != 1:
        raise ValueError(f'device dataset needs uniform shapes, got '
                         f'{sorted(shapes)[:3]}...')
      ins = np.stack([a for a, _ in pairs])
      outs = np.stack([b for _, b in pairs])
      self.inputs = put(ins)
      self.outputs = put(outs)
    if self.inputs.dtype != self.outputs.dtype:
      # The augment concatenate would silently promote the narrower
      # side (e.g. uint8 targets -> uint16) and normalize_batch would
      # then divide it by the wrong white level. Refuse; callers use
      # the host pipeline (which normalizes each file independently)
      # for mixed-depth datasets.
      raise ValueError(
          f'device dataset needs matching input/output dtypes, got '
          f'{self.inputs.dtype} vs {self.outputs.dtype}; use the host '
          f'pipeline (--nodevice_data) for mixed-depth datasets')
    self.nsamples = int(self.inputs.shape[0])
    self.cfg = cfg
    h, w = self.inputs.shape[1:3]
    oh, ow = cfg.output_resolution
    if h < oh or w < ow:
      raise ValueError(f'images {h}x{w} smaller than crop {oh}x{ow}')
    self._max_y0 = h - oh
    self._max_x0 = w - ow
    if cfg.rotate and oh != ow:
      raise ValueError('rotation needs square output_resolution')
    log.info('device dataset: %d samples x %s resident (%.2f GB HBM)',
             self.nsamples, self.inputs.shape[1:],
             (self.inputs.nbytes + self.outputs.nbytes) / 1e9)

  def param_stream(self, seed, batch_size):
    """Infinite epochs of shuffled sample indices + augmentation draws.

    One shuffled permutation per epoch (exactly-once-per-epoch, same
    contract as pipeline.prefetching_batches)."""
    rng = np.random.RandomState(seed)
    cfg = self.cfg
    order = np.arange(self.nsamples)
    pending = []
    while True:
      if cfg.shuffle:
        rng.shuffle(order)
      pending.extend(order.tolist())
      while len(pending) >= batch_size:
        idx = np.asarray(pending[:batch_size], np.int32)
        del pending[:batch_size]
        bs = batch_size
        if cfg.random_crop:
          y0 = rng.randint(0, self._max_y0 + 1, bs)
          x0 = rng.randint(0, self._max_x0 + 1, bs)
        else:
          y0 = np.full(bs, self._max_y0 // 2)
          x0 = np.full(bs, self._max_x0 // 2)
        yield {
            'idx': idx,
            'y0': y0.astype(np.int32),
            'x0': x0.astype(np.int32),
            'fliplr': (cfg.fliplr * rng.randint(0, 2, bs)).astype(np.int32),
            'flipud': (cfg.flipud * rng.randint(0, 2, bs)).astype(np.int32),
            'rot_k': (rng.randint(0, 4, bs) if cfg.rotate
                      else np.zeros(bs)).astype(np.int32),
        }


def load_pairs(pipeline):
  """Decodes every sample of an ImageFilesDataPipeline raw (no crop /
  augment — that happens on device)."""
  pairs = []
  for in_path, out_path in pipeline.specs:
    pairs.append((pipeline._read_raw(in_path),
                  pipeline._read_raw(out_path)))
  return pairs


def _gauss_taps(sigma):
  """The exact taps of native gaussian_blur_f32 (hdrnet_io.cc:217-224):
  radius = int(3*sigma + 0.5) (min 1), normalized f32 gaussian."""
  radius = max(1, int(sigma * 3.0 + 0.5))
  d = np.arange(-radius, radius + 1, dtype=np.float32)
  kern = np.exp(-0.5 * d * d / np.float32(sigma * sigma),
                dtype=np.float32)
  return radius, kern / kern.sum()


def make_usm_synth(blur_sigma, sharpen):
  """Jittable (H, W, C) raw-dtype image -> same-dtype unsharp target.

  The TPU-side twin of UnsharpMaskDataPipeline._load + imwrite
  (scripts/make_usm_dataset.py): normalize by the dtype white level,
  separable gaussian blur with the native kernel's taps and symmetric
  boundary (hdrnet_io.cc reflect: -1 -> 0), target = clip(x + sharpen *
  (x - blur), 0, 1), requantized round-half-up at the INPUT's white
  level and dtype. Emitting the input dtype (not a fixed uint8) keeps
  the augment concatenate promotion-free, so normalize_batch divides
  input and target by the same white level for 16-bit datasets too.
  f32 summation order differs from the C++ loops, so an occasional
  1-quantum tie flip vs the file path is possible (gated in tests)."""
  radius, kern = _gauss_taps(blur_sigma)
  taps = jnp.asarray(kern)

  def synth(raw):
    white = {jnp.uint8: 255.0, jnp.uint16: 65535.0}.get(
        raw.dtype.type, 1.0)
    x = raw.astype(jnp.float32) / white if white != 1.0 else raw
    h, w = x.shape[0], x.shape[1]
    pad = jnp.pad(x, ((0, 0), (radius, radius), (0, 0)), mode='symmetric')
    tmp = sum(taps[i] * jax.lax.dynamic_slice_in_dim(pad, i, w, axis=1)
              for i in range(2 * radius + 1))
    pad = jnp.pad(tmp, ((radius, radius), (0, 0), (0, 0)),
                  mode='symmetric')
    blur = sum(taps[i] * jax.lax.dynamic_slice_in_dim(pad, i, h, axis=0)
               for i in range(2 * radius + 1))
    target = jnp.clip(x + sharpen * (x - blur), 0.0, 1.0)
    if white == 1.0:
      return target.astype(raw.dtype)
    return (target * white + 0.5).astype(raw.dtype)

  return synth


def load_st_dataset(pipeline, cfg, sharding=None):
  """Device-resident StyleTransferDataPipeline: each (input x style)
  spec becomes one resident sample whose 6 input channels are the u8
  photo + the u8-requantized bilinear-resized style exemplar (the host
  path keeps the exemplar float — resize_bilinear output — so the
  device copy differs by <= 1/510 per exemplar pixel; the exemplar is
  a conditioning signal, not a regression target). Outputs are the
  per-style target files."""
  from hdrnet_tpu.data import images
  from hdrnet_tpu import native
  ins, outs = [], []
  exemplars = {}
  for in_path, model_path, out_path in pipeline.specs:
    inp = images.imread(in_path)
    out = images.imread(out_path)
    if inp.dtype != np.uint8 or out.dtype != np.uint8:
      raise ValueError('device st dataset supports uint8 sources only; '
                       'use the host pipeline for 16-bit data')
    key = (model_path, inp.shape[:2])
    if key not in exemplars:
      mdl = images.imread_float(model_path)
      mdl = native.resize_bilinear(mdl, inp.shape[:2])
      exemplars[key] = (np.clip(mdl, 0.0, 1.0) * 255.0 + 0.5).astype(
          np.uint8)
    ins.append(np.concatenate([inp, exemplars[key]], axis=-1))
    outs.append(out)
  put = (lambda x: jax.device_put(x, sharding)) if sharding is not None \
      else jax.device_put
  shapes = {a.shape for a in ins}
  if len(shapes) != 1:
    raise ValueError(f'device dataset needs uniform shapes, got '
                     f'{sorted(shapes)[:3]}...')
  return DeviceDataset(None, cfg, sharding=sharding,
                       arrays=(put(np.stack(ins)), put(np.stack(outs))))


def load_usm_dataset(pipeline, cfg, sharding=None):
  """Device-resident UnsharpMaskDataPipeline: decode raw inputs once,
  synthesize every uint8 target ON DEVICE in one jitted batched pass
  (a few hundred ms for a 220-image set vs ~1 s/image/epoch of host
  blur on a 1-core box), then train from HBM like any file dataset."""
  from hdrnet_tpu.data import images
  raws = [images.imread(p) for p in pipeline._sample_paths()]
  shapes = {a.shape for a in raws}
  if len(shapes) != 1:
    raise ValueError(f'device dataset needs uniform shapes, got '
                     f'{sorted(shapes)[:3]}...')
  ins = np.stack(raws)
  put = (lambda x: jax.device_put(x, sharding)) if sharding is not None \
      else jax.device_put
  ins_dev = put(ins)
  synth = jax.jit(jax.vmap(make_usm_synth(cfg.blur_sigma, cfg.sharpen)))
  chunks = [synth(ins_dev[i:i + 16])
            for i in range(0, ins.shape[0], 16)]
  outs_dev = put(jnp.concatenate(chunks)) if len(chunks) > 1 \
      else put(chunks[0])
  return DeviceDataset(None, cfg, sharding=sharding,
                       arrays=(ins_dev, outs_dev))
