"""Flax building blocks with the reference's layer semantics.

Reference: hdrnet/layers.py:25-93 — conv/fc with He (variance-scaling
fan-in) init and an unusual batch-norm: *center-only* (learned beta, no
gamma), applied in place of the bias, before the activation
(layers.py:48-54).
"""

from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax.numpy as jnp

he_normal = nn.initializers.variance_scaling(2.0, 'fan_in',
                                             'truncated_normal')


class ConvBlock(nn.Module):
  """Conv2D + optional center-only BatchNorm + activation.

  Matches hdrnet/layers.py:25-59: SAME padding, variance-scaling init,
  bias replaced by BN beta when batch_norm is on.
  """
  features: int
  kernel_size: int = 3
  stride: int = 1
  rate: int = 1
  use_bias: bool = True
  batch_norm: bool = False
  activation: Optional[Callable] = nn.relu
  # Full-f32 matmuls by default: TPU 'default' runs f32 matmuls as bf16
  # passes (~1e-3 error); the reference computes everything in f32 and
  # the coefficient net is latency-bound, so HIGHEST is ~free here.
  precision: Optional[str] = 'highest'

  @nn.compact
  def __call__(self, x, train=False):
    x = nn.Conv(
        self.features,
        (self.kernel_size, self.kernel_size),
        strides=(self.stride, self.stride),
        kernel_dilation=(self.rate, self.rate),
        padding='SAME',
        use_bias=self.use_bias and not self.batch_norm,
        kernel_init=he_normal,
        precision=self.precision,
        name='conv')(x)
    if self.batch_norm:
      x = nn.BatchNorm(
          use_running_average=not train,
          use_scale=False,  # center-only: beta, no gamma (layers.py:48-50)
          use_bias=True,
          momentum=0.999,
          epsilon=1e-3,  # tf.contrib.layers.batch_norm default
          name='bn')(x)
    if self.activation is not None:
      x = self.activation(x)
    return x


class DenseBlock(nn.Module):
  """Fully connected + optional center-only BN + activation
  (hdrnet/layers.py:62-93)."""
  features: int
  use_bias: bool = True
  batch_norm: bool = False
  activation: Optional[Callable] = nn.relu
  precision: Optional[str] = 'highest'

  @nn.compact
  def __call__(self, x, train=False):
    x = nn.Dense(self.features,
                 use_bias=self.use_bias and not self.batch_norm,
                 kernel_init=he_normal, precision=self.precision,
                 name='fc')(x)
    if self.batch_norm:
      x = nn.BatchNorm(use_running_average=not train, use_scale=False,
                       use_bias=True, momentum=0.999, epsilon=1e-3,
                       name='bn')(x)
    if self.activation is not None:
      x = self.activation(x)
    return x
