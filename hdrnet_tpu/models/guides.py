"""Full-resolution guide networks.

These are the only learned full-res components; everything is pointwise
(1x1) so they are pure VPU work and shard trivially along H/W.

  * CurveGuide   — learned color matrix + per-channel 16-knot piecewise
                   linear curve + channel mix, clipped to [0, 1]
                   (reference: models.py:144-190).
  * PointwiseNNGuide — tiny pointwise MLP with sigmoid output
                   (reference: models.py:199-210).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from hdrnet_tpu.models.layers import ConvBlock


class CurveGuide(nn.Module):
  """ccm -> per-channel PWL curve -> 1x1 channel mix -> clip.

  Parameter shapes and initializers mirror models.py:150-185 so frozen
  guide weights can be exchanged with the reference deployment format
  (bin/freeze_graph.py:106-125).
  """
  n_points: int = 16

  @nn.compact
  def __call__(self, x, train=False):
    del train
    nchans = x.shape[-1]
    npts = self.n_points

    # Color space change: learned matrix init'd near identity
    # (models.py:152-160 adds a single shared N(0,1)*1e-4 perturbation).
    # HIGHEST precision: TPU f32 matmuls default to bf16 passes, which
    # perturbs the guide by ~3e-3 and gets amplified ~gd-fold through
    # the depth-slicing coordinate. The reference computes the guide in
    # full f32 (models.py:157); a 3x3/pixel matmul at full precision is
    # free.
    ccm = self.param('ccm', _identity_plus_noise, (nchans, nchans))
    ccm_bias = self.param('ccm_bias', nn.initializers.zeros, (nchans,))
    g = jnp.einsum('...c,cd->...d', x, ccm,
                   precision=jax.lax.Precision.HIGHEST) + ccm_bias

    # Per-channel piecewise-linear curve: sum of shifted ReLUs with
    # learned knots (shifts) and slopes (models.py:163-175). Init:
    # shifts = linspace [0, 1), slopes = identity ramp (slope0 = 1).
    def shifts_init(key, shape, dtype=jnp.float32):
      del key
      s = np.linspace(0, 1, npts, endpoint=False, dtype=np.float32)
      return jnp.asarray(np.tile(s[None, :], (nchans, 1)), dtype)

    def slopes_init(key, shape, dtype=jnp.float32):
      del key
      s = np.zeros((nchans, npts), np.float32)
      s[:, 0] = 1.0
      return jnp.asarray(s, dtype)

    shifts = self.param('shifts', shifts_init, (nchans, npts))
    slopes = self.param('slopes', slopes_init, (nchans, npts))
    g = jnp.sum(slopes * nn.relu(g[..., None] - shifts), axis=-1)

    # 1x1 channel mixing, init = average (models.py:177-185).
    mix_w = self.param('channel_mixing_w',
                       nn.initializers.constant(1.0 / nchans), (nchans, 1))
    mix_b = self.param('channel_mixing_b', nn.initializers.zeros, (1,))
    g = jnp.einsum('...c,co->...o', g, mix_w,
                   precision=jax.lax.Precision.HIGHEST) + mix_b
    return jnp.clip(g[..., 0], 0.0, 1.0)


def _identity_plus_noise(key, shape, dtype=jnp.float32):
  import jax.random
  n = shape[0]
  return (jnp.eye(n, dtype=dtype) +
          1e-4 * jax.random.normal(key, (), dtype))


class PointwiseNNGuide(nn.Module):
  """1x1 conv (BN, relu) -> 1x1 conv -> sigmoid (models.py:199-210).

  NB: the reference always batch-norms the first guide conv regardless
  of the global batch_norm flag (models.py:205-207) — replicated.
  """
  guide_complexity: int = 16

  @nn.compact
  def __call__(self, x, train=False):
    g = ConvBlock(self.guide_complexity, kernel_size=1, batch_norm=True,
                  precision='highest', name='conv1')(x, train=train)
    g = ConvBlock(1, kernel_size=1, activation=nn.sigmoid,
                  precision='highest', name='conv2')(g, train=train)
    return g[..., 0]
