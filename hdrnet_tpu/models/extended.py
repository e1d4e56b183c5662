"""Extended model zoo.

The reference's workload scripts train a larger family than its
published models.py contains (SURVEY.md §2.4 — the classes were removed
from the snapshot but the capability surface is pinned by the scripts'
flags, the run.py debug hooks, and the deployment shaders). These are
fresh TPU-native reconstructions of that surface:

  HDRNetGaussianPyr            scripts/ll/train_gpyr.sh — pyramid model
                               with *curves* guides per level
  HDRNet3x3NNGuide             scripts/ll/train_3x3nn_guide.sh — NN
                               guide with a 3x3 (spatial) first conv
  HDRNetStack                  scripts/ll/train_stack.sh — two chained
                               enhancement stages
  HDRNetFullresFeatures        scripts/ll_strong/train_fullres_features
                               .sh — the affine transform is applied to
                               *learned full-res features* instead of
                               RGB (run.py:118-126 collects
                               'fullres_features')
  HDRNetFullresFeaturesMultiscale   ..._ms.sh — features from a 3-scale
                               pyramid, merged at full res
  HDRNetFullresFeaturesWithGuide    ..._w_guide.sh — guide computed from
                               the learned features
  HDRNetFeaturesPyrNN / NN2 / NN3   scripts/ll_strong/train_fpyrnn*.sh —
                               per-level learned features + NN guide,
                               suffix = feature-extractor depth
  HDRNetFeaturesPyrSimpleGuideNN    ..._fpyr_simple_guide.sh — single
                               sigmoid-conv guide per level
  StyleTransferNN / StyleTransferCurves  scripts/st/nst_*.sh — 6-channel
                               (image + style target) inputs

All share the CoefficientBackbone and the fused Pallas slice-apply.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from hdrnet_tpu.config import ModelConfig
from hdrnet_tpu.models.guides import CurveGuide, PointwiseNNGuide
from hdrnet_tpu.models.hdrnet import (CoefficientBackbone, HDRNetCurves,
                                      HDRNetPointwiseNNGuide)
from hdrnet_tpu.models.layers import ConvBlock
from hdrnet_tpu.ops import bilateral_slice_apply
from hdrnet_tpu.ops.resize import resize_bilinear


class Guide3x3NN(nn.Module):
  """NN guide whose first conv sees a 3x3 neighborhood."""
  guide_complexity: int = 16

  @nn.compact
  def __call__(self, x, train=False):
    g = ConvBlock(self.guide_complexity, kernel_size=3, batch_norm=True,
                  precision='highest', name='conv1')(x, train=train)
    g = ConvBlock(1, kernel_size=1, activation=nn.sigmoid,
                  precision='highest', name='conv2')(g, train=train)
    return g[..., 0]


class SimpleGuide(nn.Module):
  """Single 1x1 sigmoid conv (the 'simple guide' of
  train_fpyr_simple_guide.sh)."""

  @nn.compact
  def __call__(self, x, train=False):
    g = ConvBlock(1, kernel_size=1, activation=nn.sigmoid,
                  precision='highest', name='conv')(x, train=train)
    return g[..., 0]


class HDRNet3x3NNGuide(HDRNetCurves):
  def make_guide(self):
    return Guide3x3NN(self.cfg.guide_complexity, name='guide')


class HDRNetStack(nn.Module):
  """Two chained enhancement stages with independent coefficient nets
  and guides; stage 2 refines stage 1's output."""
  cfg: ModelConfig
  n_stages: int = 2

  @nn.compact
  def __call__(self, lowres, fullres, train=False):
    from hdrnet_tpu.ops.resize import resize_nearest
    current_full = fullres
    current_low = lowres
    n = self.cfg.net_input_size
    for s in range(self.n_stages):
      out = HDRNetPointwiseNNGuide(self.cfg, name=f'stage{s}')(
          current_low, current_full, train=train)
      current_full = out
      current_low = resize_nearest(out, (n, n))
    return current_full


class _FeatureExtractor(nn.Module):
  """Full-res feature tower: `depth` 3x3 convs, relu between, linear
  last layer."""
  n_features: int
  depth: int = 1
  width: int = 16

  @nn.compact
  def __call__(self, x, train=False):
    for i in range(self.depth - 1):
      x = ConvBlock(self.width, 3, name=f'conv{i + 1}')(x, train=train)
    return ConvBlock(self.n_features, 3, activation=None,
                     name=f'conv{self.depth}')(x, train=train)


class HDRNetFullresFeatures(nn.Module):
  """Affine transform applied to learned full-res features.

  n_features = 4 * channel_multiplier (the _cm2 script sweeps capacity
  via --channel_multiplier).
  """
  cfg: ModelConfig
  feature_depth: int = 2
  guide_from_features: bool = False
  multiscale_features: bool = False

  @property
  def n_features(self):
    return 4 * self.cfg.channel_multiplier

  @nn.compact
  def __call__(self, lowres, fullres, train=False):
    cfg = self.cfg
    nf = self.n_features
    grid = CoefficientBackbone(cfg, cfg.n_out, nf + 1,
                               name='coefficients')(lowres, train=train)
    self.sow('intermediates', 'bilateral_coefficients', grid)

    if self.multiscale_features:
      h, w = fullres.shape[1:3]
      feats = []
      lvl = fullres
      for i in range(3):
        f = _FeatureExtractor(nf, self.feature_depth,
                              name=f'features_{i}')(lvl, train=train)
        if i:
          f = resize_bilinear(f, (h, w), align_corners=True)
        feats.append(f)
        lvl = resize_bilinear(lvl, (lvl.shape[1] // 2, lvl.shape[2] // 2),
                              align_corners=True)
      features = sum(feats)
    else:
      features = _FeatureExtractor(nf, self.feature_depth,
                                   name='features')(fullres, train=train)
    self.sow('intermediates', 'fullres_features', features)

    guide_input = features if self.guide_from_features else fullres
    guide = PointwiseNNGuide(cfg.guide_complexity, name='guide')(
        guide_input, train=train)
    self.sow('intermediates', 'guide_map', guide)
    return bilateral_slice_apply(grid, guide, features, has_offset=True)


class HDRNetFullresFeaturesMultiscale(HDRNetFullresFeatures):
  multiscale_features: bool = True


class HDRNetFullresFeaturesWithGuide(HDRNetFullresFeatures):
  guide_from_features: bool = True


class HDRNetFeaturesPyrNN(nn.Module):
  """Pyramid model slicing onto per-level learned features
  (scripts/ll_strong/train_fpyrnn*.sh); `feature_depth` differentiates
  the NN2/NN3 variants, `simple_guide` the simple-guide one."""
  cfg: ModelConfig
  n_scales: int = 3
  feature_depth: int = 1
  simple_guide: bool = False

  @property
  def n_features(self):
    return 4 * self.cfg.channel_multiplier

  @nn.compact
  def __call__(self, lowres, fullres, train=False):
    cfg = self.cfg
    nf = self.n_features
    grid = CoefficientBackbone(cfg, 3 * self.n_scales, nf + 1,
                               name='coefficients')(lowres, train=train)
    self.sow('intermediates', 'bilateral_coefficients', grid)

    levels = [fullres]
    for _ in range(self.n_scales - 1):
      h, w = levels[-1].shape[1:3]
      levels.append(resize_bilinear(levels[-1], (h // 2, w // 2),
                                    align_corners=True))

    outs = []
    for il, lvl in enumerate(levels):
      feats = _FeatureExtractor(nf, self.feature_depth,
                                name=f'features_{il}')(lvl, train=train)
      self.sow('intermediates', 'fullres_features', feats)
      if self.simple_guide:
        g = SimpleGuide(name=f'guide_level_{il}')(lvl, train=train)
      else:
        g = PointwiseNNGuide(cfg.guide_complexity,
                             name=f'guide_level_{il}')(lvl, train=train)
      self.sow('intermediates', 'guide_map', g)
      outs.append((feats, g))

    current = None
    for il, (feats, g) in enumerate(outs[::-1]):
      c = grid[:, :, :, :, il * 3:(il + 1) * 3, :]
      out_lvl = bilateral_slice_apply(c, g, feats, has_offset=True)
      if current is None:
        current = out_lvl
      else:
        current = resize_bilinear(current, out_lvl.shape[1:3],
                                  align_corners=True) + out_lvl
    return current


class HDRNetFeaturesPyrNN2(HDRNetFeaturesPyrNN):
  feature_depth: int = 2


class HDRNetFeaturesPyrNN3(HDRNetFeaturesPyrNN):
  feature_depth: int = 3


class HDRNetFeaturesPyrSimpleGuideNN(HDRNetFeaturesPyrNN):
  simple_guide: bool = True


class StyleTransferNN(HDRNetPointwiseNNGuide):
  """6-channel (image + resized style target) input; the affine model
  maps the stacked channels to the stylized RGB output
  (data_pipeline.py:290-342 builds the 6-channel samples)."""


class StyleTransferCurves(HDRNetCurves):
  """Curves-guide variant of the style transfer model."""


EXTENDED_MODELS = {
    'HDRNetGaussianPyr': None,  # defined below (needs hdrnet import)
    'HDRNet3x3NNGuide': HDRNet3x3NNGuide,
    'HDRNetStack': HDRNetStack,
    'HDRNetFullresFeatures': HDRNetFullresFeatures,
    'HDRNetFullresFeaturesMultiscale': HDRNetFullresFeaturesMultiscale,
    'HDRNetFullresFeaturesWithGuide': HDRNetFullresFeaturesWithGuide,
    'HDRNetFeaturesPyrNN': HDRNetFeaturesPyrNN,
    'HDRNetFeaturesPyrNN2': HDRNetFeaturesPyrNN2,
    'HDRNetFeaturesPyrNN3': HDRNetFeaturesPyrNN3,
    'HDRNetFeaturesPyrSimpleGuideNN': HDRNetFeaturesPyrSimpleGuideNN,
    'StyleTransferNN': StyleTransferNN,
    'StyleTransferCurves': StyleTransferCurves,
}


class HDRNetGaussianPyr(nn.Module):
  """Pyramid model with *curves* guides per level
  (scripts/ll/train_gpyr.sh; the NN-guide variant is
  models.HDRNetGaussianPyrNN)."""
  cfg: ModelConfig
  n_scales: int = 3

  @nn.compact
  def __call__(self, lowres, fullres, train=False):
    cfg = self.cfg
    grid = CoefficientBackbone(cfg, 3 * self.n_scales, cfg.n_in + 1,
                               name='coefficients')(lowres, train=train)
    self.sow('intermediates', 'bilateral_coefficients', grid)
    levels = [fullres]
    for _ in range(self.n_scales - 1):
      h, w = levels[-1].shape[1:3]
      levels.append(resize_bilinear(levels[-1], (h // 2, w // 2),
                                    align_corners=True))
    guides = [CurveGuide(name=f'guide_level_{il}')(lvl, train=train)
              for il, lvl in enumerate(levels)]
    current = None
    for il, (lvl, g) in enumerate(zip(levels[::-1], guides[::-1])):
      c = grid[:, :, :, :, il * 3:(il + 1) * 3, :]
      out_lvl = bilateral_slice_apply(c, g, lvl, has_offset=True)
      if current is None:
        current = out_lvl
      else:
        current = resize_bilinear(current, out_lvl.shape[1:3],
                                  align_corners=True) + out_lvl
    return current


EXTENDED_MODELS['HDRNetGaussianPyr'] = HDRNetGaussianPyr
