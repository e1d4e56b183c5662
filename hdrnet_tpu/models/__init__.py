"""Model registry.

Name-string registry replacing the reference's getattr-on-module pattern
(bin/train.py:58, models.__all__). The three HDRNet classes are the
required set (reference models.py:23-27); UNet/DilatedConvolutions are
the baselines its workload scripts train.
"""

from hdrnet_tpu.models.hdrnet import (
    CoefficientBackbone,
    HDRNetCurves,
    HDRNetGaussianPyrNN,
    HDRNetPointwiseNNGuide,
)
from hdrnet_tpu.models.baselines import DilatedConvolutions, UNet
from hdrnet_tpu.models.extended import EXTENDED_MODELS

MODELS = {
    'HDRNetCurves': HDRNetCurves,
    'HDRNetPointwiseNNGuide': HDRNetPointwiseNNGuide,
    'HDRNetGaussianPyrNN': HDRNetGaussianPyrNN,
    'UNet': UNet,
    'DilatedConvolutions': DilatedConvolutions,
    **EXTENDED_MODELS,
}

__all__ = list(MODELS) + ['MODELS', 'CoefficientBackbone', 'make_model']


def make_model(cfg):
  """Instantiates a model from a ModelConfig by its model_name."""
  try:
    cls = MODELS[cfg.model_name]
  except KeyError:
    raise ValueError(
        f'unknown model {cfg.model_name!r}; choices: {sorted(MODELS)}')
  return cls(cfg)


def register(name, cls):
  """Extension hook for new model families."""
  MODELS[name] = cls
