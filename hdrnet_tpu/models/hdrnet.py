"""HDRNet model family in Flax.

The architecture (reference: hdrnet/models.py) in its TPU-native form:
a low-res coefficient CNN (all MXU-friendly strided 3x3 convs + FCs)
predicts a bilateral grid of affine color transforms; a pointwise
full-res guide indexes the grid; the fused Pallas slice-apply op does
all full-resolution compute.

Interface: ``model.apply(vars, lowres, fullres, train=...)`` returns the
enhanced full-res image. Intermediates are exposed via flax ``sow``
(collection 'intermediates': 'bilateral_coefficients', 'guide_map',
'multiscale'), mirroring the reference's graph collections
(models.py:46-57) consumed by run.py --debug.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from hdrnet_tpu.config import ModelConfig
from hdrnet_tpu.models.layers import ConvBlock, DenseBlock
from hdrnet_tpu.models.guides import CurveGuide, PointwiseNNGuide
from hdrnet_tpu.ops import bilateral_slice_apply
from hdrnet_tpu.ops.resize import resize_bilinear


class CoefficientBackbone(nn.Module):
  """Low-res splat/global/local/fusion/prediction stack.

  Reference: models.py:62-142. Emits the bilateral grid as
  (b, gh, gw, gd, n_out, n_in+1).
  """
  cfg: ModelConfig
  n_out: int
  n_in_tot: int  # including the affine offset column

  @nn.compact
  def __call__(self, lowres, train=False):
    cfg = self.cfg
    gd = cfg.luma_bins
    cm = cfg.channel_multiplier
    sb = cfg.spatial_bin
    bn = cfg.batch_norm
    n_ds = int(np.log2(cfg.net_input_size / sb))

    # Splat: stride-2 3x3 convs down to (sb, sb); no BN on the first
    # layer (models.py:69-82).
    x = lowres
    for i in range(n_ds):
      x = ConvBlock(cm * (2 ** i) * gd, 3, stride=2,
                    batch_norm=bn and i > 0,
                    name=f'splat_conv{i + 1}')(x, train=train)
    splat = x

    # Global path: 2 stride-2 convs to 4x4, then 3 FCs; the last FC is
    # linear with no BN (models.py:86-105).
    g = splat
    for i in range(2):
      g = ConvBlock(8 * cm * gd, 3, stride=2, batch_norm=bn,
                    name=f'global_conv{i + 1}')(g, train=train)
    g = g.reshape(g.shape[0], -1)
    g = DenseBlock(32 * cm * gd, batch_norm=bn, name='global_fc1')(
        g, train=train)
    g = DenseBlock(16 * cm * gd, batch_norm=bn, name='global_fc2')(
        g, train=train)
    g = DenseBlock(8 * cm * gd, activation=None, name='global_fc3')(
        g, train=train)

    # Local path: conv + linear bias-free conv (models.py:109-118).
    l = ConvBlock(8 * cm * gd, 3, batch_norm=bn, name='local_conv1')(
        splat, train=train)
    l = ConvBlock(8 * cm * gd, 3, activation=None, use_bias=False,
                  name='local_conv2')(l, train=train)

    # Fusion: relu(local + broadcast global) (models.py:122-126).
    fused = nn.relu(l + g[:, None, None, :])

    # Prediction: linear 1x1 conv to gd*n_out*n_in_tot channels, then
    # unpack to the rank-6 grid. The reference's unroll
    # (models.py:134-138) maps conv channel (j*n_out + i)*gd + k to grid
    # entry [..., k, i, j] — reproduced exactly so pretrained weights
    # stay layout-compatible.
    y = ConvBlock(gd * self.n_out * self.n_in_tot, 1, activation=None,
                  name='prediction_conv')(fused, train=train)
    b, gh, gw, _ = y.shape
    y = y.reshape(b, gh, gw, self.n_in_tot, self.n_out, gd)
    grid = jnp.transpose(y, (0, 1, 2, 5, 4, 3))
    return grid


class HDRNetCurves(nn.Module):
  """Main model (reference: models.py:30-196): curves guide."""
  cfg: ModelConfig

  @property
  def n_out(self):
    return self.cfg.n_out

  @property
  def n_in_tot(self):
    return self.cfg.n_in + 1  # affine offset

  def make_guide(self):
    return CurveGuide(name='guide')

  @nn.compact
  def __call__(self, lowres, fullres, train=False):
    grid = CoefficientBackbone(self.cfg, self.n_out, self.n_in_tot,
                               name='coefficients')(lowres, train=train)
    self.sow('intermediates', 'bilateral_coefficients', grid)
    guide = self.make_guide()(fullres, train=train)
    self.sow('intermediates', 'guide_map', guide)
    return bilateral_slice_apply(grid, guide, fullres, has_offset=True)


class HDRNetPointwiseNNGuide(HDRNetCurves):
  """Curves guide swapped for a pointwise NN (models.py:199-210)."""

  def make_guide(self):
    return PointwiseNNGuide(self.cfg.guide_complexity, name='guide')


class HDRNetGaussianPyrNN(nn.Module):
  """Multi-scale variant (models.py:213-289): a 3-level Gaussian
  pyramid of the full-res input, one NN guide + one 3-channel grid
  slice per level, coarse-to-fine upsample-and-add reconstruction."""
  cfg: ModelConfig
  n_scales: int = 3

  @property
  def n_out(self):
    return 3 * self.n_scales

  @property
  def n_in_tot(self):
    return self.cfg.n_in + 1

  @nn.compact
  def __call__(self, lowres, fullres, train=False):
    grid = CoefficientBackbone(self.cfg, self.n_out, self.n_in_tot,
                               name='coefficients')(lowres, train=train)
    self.sow('intermediates', 'bilateral_coefficients', grid)

    # Bilinear (align_corners) pyramid, fine -> coarse
    # (models.py:252-265).
    levels = [fullres]
    for _ in range(self.n_scales - 1):
      h, w = levels[-1].shape[1:3]
      levels.append(resize_bilinear(levels[-1], (h // 2, w // 2),
                                    align_corners=True))
    for lvl in levels:
      self.sow('intermediates', 'multiscale', lvl)

    guides = []
    for il, lvl in enumerate(levels):
      g = PointwiseNNGuide(self.cfg.guide_complexity,
                           name=f'guide_level_{il}')(lvl, train=train)
      self.sow('intermediates', 'guide_map', g)
      guides.append(g)

    # Coarse-to-fine: il enumerates reversed levels, coefficient
    # channels [3*il : 3*(il+1)] belong to the il-th coarsest level
    # (models.py:276-289).
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
