"""Loss and quality metrics (reference: hdrnet/metrics.py:21-33)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def l2_loss(target, prediction):
  """Mean squared error over all elements."""
  return jnp.mean(jnp.square(target - prediction))


def psnr(target, prediction):
  """Batch-mean PSNR: mean over images of -10*log10(per-image MSE)."""
  sq = jnp.square(target - prediction)
  sq = sq.reshape(sq.shape[0], -1)
  per_image_mse = jnp.mean(sq, axis=1)
  return jnp.mean((-10.0 / np.log(10.0)) * jnp.log(per_image_mse))
