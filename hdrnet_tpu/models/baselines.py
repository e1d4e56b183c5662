"""Baseline models used in the reference's comparisons.

The reference repo's current models.py no longer contains these classes,
but its workload scripts and figure code use them
(scripts/ll/train_unet.sh, train_dilated.sh with --depth/--width;
PSNR tables in scripts/extra_figures/compare_to_unet.py:19-44). They
operate directly at full resolution — that is the point of the
comparison: HDRNet gets ~their quality at a tiny fraction of full-res
compute.

Both keep the (lowres, fullres) call signature of the HDRNet family so
the training loop is model-agnostic; they ignore the lowres input.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from hdrnet_tpu.config import ModelConfig
from hdrnet_tpu.models.layers import ConvBlock
from hdrnet_tpu.ops.resize import resize_nearest


class UNet(nn.Module):
  """Encoder/decoder with skip connections; `depth` total conv levels,
  `width` base channels (scripts/ll/train_unet.sh: depth 5-11, width
  16-64)."""
  cfg: ModelConfig

  @nn.compact
  def __call__(self, lowres, fullres, train=False):
    del lowres
    cfg = self.cfg
    n_levels = max(1, cfg.depth // 2)
    bn = cfg.batch_norm

    x = fullres
    skips = []
    for i in range(n_levels):
      x = ConvBlock(cfg.width * (2 ** i), 3, batch_norm=bn,
                    name=f'enc{i}_a')(x, train=train)
      skips.append(x)
      x = ConvBlock(cfg.width * (2 ** i), 3, stride=2, batch_norm=bn,
                    name=f'enc{i}_down')(x, train=train)

    x = ConvBlock(cfg.width * (2 ** n_levels), 3, batch_norm=bn,
                  name='bottleneck')(x, train=train)

    for i in reversed(range(n_levels)):
      _, h, w, _ = skips[i].shape
      x = resize_nearest(x, (h, w))
      x = jnp.concatenate([x, skips[i]], axis=-1)
      x = ConvBlock(cfg.width * (2 ** i), 3, batch_norm=bn,
                    name=f'dec{i}')(x, train=train)
    return ConvBlock(cfg.n_out, 1, activation=None,
                     name='out')(x, train=train)


class DilatedConvolutions(nn.Module):
  """Stack of `depth` dilated 3x3 convs, dilation doubling per layer
  (scripts/ll/train_dilated.sh: depth 3, width 16-64)."""
  cfg: ModelConfig

  @nn.compact
  def __call__(self, lowres, fullres, train=False):
    del lowres
    cfg = self.cfg
    x = fullres
    for i in range(cfg.depth):
      x = ConvBlock(cfg.width, 3, rate=2 ** i, batch_norm=cfg.batch_norm,
                    name=f'dilated{i}')(x, train=train)
    return ConvBlock(cfg.n_out, 1, activation=None,
                     name='out')(x, train=train)
