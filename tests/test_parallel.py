"""Multi-device tests on the virtual 8-CPU mesh: DP training sharding,
and zero-halo spatially-sharded giant-image inference."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hdrnet_tpu.config import ModelConfig
from hdrnet_tpu.inference import Enhancer
from hdrnet_tpu.models import make_model
from hdrnet_tpu.parallel import mesh as pm


def test_mesh_shapes(cpu_devices):
  mesh = pm.make_mesh((4, 2))
  assert dict(mesh.shape) == {'data': 4, 'spatial': 2}
  mesh = pm.make_mesh()
  assert dict(mesh.shape) == {'data': 8, 'spatial': 1}


def test_graft_dryrun(cpu_devices):
  import __graft_entry__ as ge
  ge.dryrun_multichip(8)


def test_spatially_sharded_inference_matches(cpu_devices):
  """H sharded over 8 devices == unsharded fused path == composite."""
  cfg = ModelConfig(model_name='HDRNetCurves', net_input_size=64,
                    spatial_bin=8, luma_bins=4)
  model = make_model(cfg)
  rng = np.random.RandomState(0)
  lowres = jnp.asarray(rng.rand(1, 64, 64, 3), jnp.float32)
  # H = 128 -> 16 rows per device on the 8-device mesh.
  fullres = jnp.asarray(rng.rand(1, 128, 192, 3), jnp.float32)
  variables = model.init(jax.random.PRNGKey(0), lowres, fullres)

  want = model.apply(variables, lowres, fullres)

  enh = Enhancer(config=cfg, variables=variables, interpret=True)
  mesh = pm.make_mesh((4, 2))
  got = enh.enhance_sharded(lowres, fullres, mesh, clip=False)
  np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)

  # Also against the unsharded fused path.
  got1 = enh(lowres, fullres, clip=False)
  np.testing.assert_allclose(np.asarray(got), np.asarray(got1), atol=2e-5)


def test_sharded_inference_1d_mesh(cpu_devices):
  cfg = ModelConfig(model_name='HDRNetPointwiseNNGuide', net_input_size=64,
                    spatial_bin=8, luma_bins=4, guide_complexity=4)
  model = make_model(cfg)
  rng = np.random.RandomState(1)
  lowres = jnp.asarray(rng.rand(1, 64, 64, 3), jnp.float32)
  fullres = jnp.asarray(rng.rand(1, 64, 160, 3), jnp.float32)
  variables = model.init(jax.random.PRNGKey(0), lowres, fullres,
                         train=True)
  want = model.apply(variables, lowres, fullres)
  enh = Enhancer(config=cfg, variables=variables, interpret=True)
  mesh = pm.make_mesh((8, 1))
  got = enh.enhance_sharded(lowres, fullres, mesh, clip=False)
  np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
