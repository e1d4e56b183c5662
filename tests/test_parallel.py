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


@pytest.mark.quick
def test_mesh_shapes(cpu_devices):
  mesh = pm.make_mesh((4, 2))
  assert dict(mesh.shape) == {'data': 4, 'spatial': 2}
  mesh = pm.make_mesh()
  assert dict(mesh.shape) == {'data': 8, 'spatial': 1}


@pytest.mark.slow
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


@pytest.mark.slow
def test_sharded_pyramid_inference_matches(cpu_devices):
  """GaussianPyrNN giant-image serving: every level's fused kernel runs
  H-sharded; the pyramid build and upsample-add run on sharded arrays
  in jit-land (XLA halo-exchanges the bilinear resamplings)."""
  cfg = ModelConfig(model_name='HDRNetGaussianPyrNN', net_input_size=64,
                    spatial_bin=4, luma_bins=4, guide_complexity=4)
  model = make_model(cfg)
  rng = np.random.RandomState(2)
  lowres = jnp.asarray(rng.rand(1, 64, 64, 3), jnp.float32)
  fullres = jnp.asarray(rng.rand(1, 256, 256, 3), jnp.float32)
  variables = model.init(jax.random.PRNGKey(0), lowres, fullres,
                         train=True)
  want = model.apply(variables, lowres, fullres)

  enh = Enhancer(config=cfg, variables=variables, interpret=True)
  mesh = pm.make_mesh((2, 1), jax.devices()[:2])
  got = enh.enhance_sharded(lowres, fullres, mesh, clip=False)
  np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_spatial_mesh_training_matches_pure_dp(cpu_devices, tmp_path):
  """The production train loop on a (4,2) ('data','spatial') mesh must
  produce the same params as pure DP (8,1): full-res H sharding is
  numerically a layout choice, not a different algorithm."""
  import os
  from PIL import Image
  from hdrnet_tpu.config import (Config, DataConfig, ModelConfig,
                                 TrainConfig)
  from hdrnet_tpu.training.loop import train

  rng = np.random.RandomState(0)
  data = tmp_path / 'data'
  os.makedirs(data / 'input')
  os.makedirs(data / 'output')
  names = []
  for i in range(8):
    im = (rng.rand(80, 96, 3) * 255).astype(np.uint8)
    out = np.clip(im.astype(np.float32) * 1.2, 0, 255).astype(np.uint8)
    Image.fromarray(im).save(data / 'input' / f'im{i}.png')
    Image.fromarray(out).save(data / 'output' / f'im{i}.png')
    names.append(f'im{i}.png')
  (data / 'filelist.txt').write_text('\n'.join(names))

  def run(mesh_shape, ckpt):
    cfg = Config(
        model=ModelConfig(model_name='HDRNetCurves', net_input_size=32,
                          spatial_bin=8, luma_bins=4,
                          output_resolution=[64, 64]),
        data=DataConfig(batch_size=8, output_resolution=[64, 64],
                        net_input_size=32, data_threads=1),
        train=TrainConfig(learning_rate=3e-3, max_steps=3,
                          mesh_shape=list(mesh_shape),
                          log_interval=9999, summary_interval=9999,
                          checkpoint_interval=9999))
    return train(cfg, str(tmp_path / ckpt), str(data))

  s_dp = run((8, 1), 'ckpt_dp')
  s_sp = run((4, 2), 'ckpt_sp')
  assert int(s_dp.step) == int(s_sp.step) == 3
  # Adam divides tiny grads by sqrt(v), amplifying layout-dependent
  # reassociation noise to ~1e-4 absolute after 3 steps of lr=3e-3
  # (~1% of the total parameter movement). A real algorithmic
  # difference between the shardings shows up at the step scale (3e-3+).
  jax.tree_util.tree_map(
      lambda a, b: np.testing.assert_allclose(
          np.asarray(a), np.asarray(b), rtol=1e-3, atol=2e-4),
      s_dp.params, s_sp.params)
  # The scalar loss trajectory is a mean over the batch and immune to
  # Adam's sign-like amplification of per-element grad noise, so it
  # pins the two shardings far more tightly than the params can: a
  # gradient-level sharding bug (e.g. a mis-summed shard) moves it.
  np.testing.assert_allclose(float(s_dp.ema_loss), float(s_sp.ema_loss),
                             rtol=1e-5)


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
