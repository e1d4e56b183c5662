"""End-to-end training-loop tests: convergence, checkpoint resume, CLI
config plumbing. Uses a tiny synthetic brighten-by-1.3x dataset."""

import os

import numpy as np
import pytest
from PIL import Image


@pytest.fixture()
def dataset(tmp_path):
  rng = np.random.RandomState(0)
  os.makedirs(tmp_path / 'input')
  os.makedirs(tmp_path / 'output')
  names = []
  for i in range(4):
    im = (rng.rand(80, 96, 3) * 255).astype(np.uint8)
    out = np.clip(im.astype(np.float32) * 1.3, 0, 255).astype(np.uint8)
    Image.fromarray(im).save(tmp_path / 'input' / f'im{i}.png')
    Image.fromarray(out).save(tmp_path / 'output' / f'im{i}.png')
    names.append(f'im{i}.png')
  (tmp_path / 'filelist.txt').write_text('\n'.join(names))
  return tmp_path


def _config(max_steps):
  from hdrnet_tpu.config import Config, DataConfig, ModelConfig, TrainConfig
  return Config(
      model=ModelConfig(model_name='HDRNetCurves', net_input_size=32,
                        spatial_bin=8, luma_bins=4,
                        output_resolution=[64, 64]),
      data=DataConfig(batch_size=2, output_resolution=[64, 64],
                      net_input_size=32, data_threads=1),
      train=TrainConfig(learning_rate=3e-3, max_steps=max_steps,
                        log_interval=9999, summary_interval=9999,
                        checkpoint_interval=9999))


def test_train_converges_and_resumes(dataset, tmp_path):
  from hdrnet_tpu.config import Config
  from hdrnet_tpu.training.loop import train

  ckpt = str(tmp_path / 'ckpt')
  state = train(_config(30), ckpt, str(dataset))
  assert int(state.step) == 30
  loss_30 = float(state.ema_loss)
  assert np.isfinite(loss_30)

  # Resume: picks up at step 30, trains to 45.
  state2 = train(_config(45), ckpt, str(dataset))
  assert int(state2.step) == 45
  # Loss trends down across the resume (EMA(0.99) moves slowly but
  # monotonically here).
  assert float(state2.ema_loss) < loss_30

  # config.json round-trips.
  cfg = Config.load(ckpt)
  assert cfg.model.model_name == 'HDRNetCurves'
  assert cfg.model.spatial_bin == 8
  # summaries written
  assert os.path.exists(os.path.join(ckpt, 'summaries.jsonl'))


@pytest.mark.quick
def test_cli_arg_plumbing():
  from hdrnet_tpu.bin.train import build_parser, config_from_args
  args = build_parser().parse_args(
      ['ckpt', 'data', '--luma_bins', '16', '--spatial_bin', '32',
       '--batch_norm', '--data_pipeline', 'StyleTransferDataPipeline',
       '--mesh_shape', '4', '2'])
  cfg = config_from_args(args)
  assert cfg.model.luma_bins == 16
  assert cfg.model.spatial_bin == 32
  assert cfg.model.batch_norm
  assert cfg.model.n_in == 6  # style transfer concatenates the target
  assert cfg.train.mesh_shape == [4, 2]


def test_run_cli_mixed_sizes(dataset, tmp_path):
  """run CLI end-to-end over a directory of MIXED image sizes, plus the
  --lowres_input flag (which the reference declares but leaves
  NotImplemented, bin/run.py:167-171)."""
  from PIL import Image
  from hdrnet_tpu.bin.run import main as run_main
  from hdrnet_tpu.training.loop import train

  ckpt = str(tmp_path / 'ckpt')
  train(_config(2), ckpt, str(dataset))

  rng = np.random.RandomState(3)
  photos = tmp_path / 'photos'
  lowdir = tmp_path / 'low'
  os.makedirs(photos)
  os.makedirs(lowdir)
  for i, (h, w) in enumerate([(70, 90), (90, 70), (80, 80)]):
    im = (rng.rand(h, w, 3) * 255).astype(np.uint8)
    Image.fromarray(im).save(photos / f'p{i}.png')
    low = (rng.rand(32, 32, 3) * 255).astype(np.uint8)
    Image.fromarray(low).save(lowdir / f'p{i}.png')

  out = tmp_path / 'out'
  run_main([ckpt, str(photos), str(out)])
  produced = sorted(os.listdir(out))
  assert produced == ['p0.png', 'p1.png', 'p2.png']
  assert np.asarray(Image.open(out / 'p1.png')).shape == (90, 70, 3)

  out2 = tmp_path / 'out2'
  run_main([ckpt, str(photos), str(out2), '--lowres_input', str(lowdir),
            '--limit', '1'])
  assert sorted(os.listdir(out2)) == ['p0.png']


def test_export_cli_roundtrip(dataset, tmp_path):
  """export CLI end-to-end on CPU: artifacts exist, the manifest
  matches, and the serialized enhance_fn replays through jax.export
  with outputs identical to the live model."""
  import json

  import jax
  import jax.numpy as jnp
  from jax import export as jexport

  from hdrnet_tpu.bin.export import main as export_main
  from hdrnet_tpu.config import Config
  from hdrnet_tpu.models import make_model
  from hdrnet_tpu.training.loop import train

  ckpt = str(tmp_path / 'ckpt')
  state = train(_config(2), ckpt, str(dataset))
  export_main([ckpt, '--fullres', '96', '128'])

  for name in ('coefficients_fn', 'enhance_fn', 'stream_fn'):
    for ext in ('.stablehlo', '.mlir', '.manifest.json'):
      assert os.path.exists(os.path.join(ckpt, name + ext)), name + ext
  assert os.path.exists(os.path.join(ckpt, 'compile_options.pb'))
  assert os.path.exists(os.path.join(ckpt, 'guide_ccm_f32_3x4.bin'))

  manifest = json.load(open(os.path.join(ckpt, 'enhance_fn.manifest.json')))
  assert manifest['inputs'][1]['shape'] == [1, 96, 128, 3]
  assert manifest['outputs'][0]['shape'] == [1, 96, 128, 3]

  with open(os.path.join(ckpt, 'enhance_fn.stablehlo'), 'rb') as f:
    reloaded = jexport.deserialize(f.read())
  rng = np.random.RandomState(0)
  lowres = jnp.asarray(rng.rand(1, 32, 32, 3), jnp.float32)
  fullres = jnp.asarray(rng.rand(1, 96, 128, 3), jnp.float32)
  got = reloaded.call(lowres, fullres)

  config = Config.load(ckpt)
  model = make_model(config.model)
  variables = {'params': state.params}
  want = jnp.clip(model.apply(variables, lowres, fullres), 0.0, 1.0)
  np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                             atol=1e-6)

  # stream_fn: uint8 in / uint8 out, manifest records the dtype, and
  # the replayed export matches the float path after requantization.
  sm = json.load(open(os.path.join(ckpt, 'stream_fn.manifest.json')))
  assert sm['inputs'][0]['dtype'] == 'uint8'
  assert sm['outputs'][0]['dtype'] == 'uint8'
  with open(os.path.join(ckpt, 'stream_fn.stablehlo'), 'rb') as f:
    stream_reloaded = jexport.deserialize(f.read())
  frame = (np.asarray(fullres) * 255).astype(np.uint8)
  out_u8 = np.asarray(stream_reloaded.call(jnp.asarray(frame)))
  assert out_u8.dtype == np.uint8 and out_u8.shape == (1, 96, 128, 3)


def test_evaluate_cli(dataset, tmp_path, capsys):
  """Standalone evaluate CLI: restores the checkpoint via the
  eval_shape template and reports mean PSNR / L2 as JSON."""
  import json

  from hdrnet_tpu.bin.evaluate import main as evaluate_main
  from hdrnet_tpu.training.loop import train

  ckpt = str(tmp_path / 'ckpt')
  train(_config(25), ckpt, str(dataset))
  evaluate_main([ckpt, str(dataset), '--limit', '2'])
  result = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
  assert result['step'] == 25
  assert result['n_images'] == 2
  assert np.isfinite(result['mean_psnr_db'])
  assert result['mean_l2'] >= 0.0

  # Serving-path eval on the same checkpoint must agree with the
  # training graph (composite fallback on CPU; bit-identical math).
  evaluate_main([ckpt, str(dataset), '--limit', '2', '--serving'])
  srv = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
  assert srv['serving'] == {'fused': False, 'coeff_bf16': False}
  np.testing.assert_allclose(srv['mean_psnr_db'], result['mean_psnr_db'],
                             rtol=1e-5)

  # bf16 backbone A/B: close, not identical.
  evaluate_main([ckpt, str(dataset), '--limit', '2', '--serving',
                 '--coeff_bf16'])
  b16 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
  assert b16['serving']['coeff_bf16'] is True
  assert abs(b16['mean_psnr_db'] - result['mean_psnr_db']) < 1.0


def test_train_device_data_converges(dataset, tmp_path):
  """The device-resident dataset path (data/device.py): whole dataset in
  device memory, augment + normalize inside the jitted step. Same
  brighten-operator convergence gate as the host-pipeline test."""
  from hdrnet_tpu.training.loop import train

  def cfg(steps):
    c = _config(steps)
    c.data.device_data = True
    c.data.device_normalize = True
    c.data.fliplr = True
    c.data.rotate = True
    return c

  state = train(cfg(30), str(tmp_path / 'ckpt_dd'), str(dataset),
                eval_data_dir=str(dataset))
  assert int(state.step) == 30
  loss_30 = float(state.ema_loss)
  assert np.isfinite(loss_30)
  # Resume across the device-data path too.
  state2 = train(cfg(45), str(tmp_path / 'ckpt_dd'), str(dataset))
  assert int(state2.step) == 45
  assert float(state2.ema_loss) < loss_30


def test_train_cosine_schedule(dataset, tmp_path):
  """lr_schedule='cosine': trains, resumes (schedule state is part of
  the optimizer tree), and the logged learning_rate decays."""
  from hdrnet_tpu.training.loop import _make_schedule, train

  def cfg(steps):
    c = _config(steps)
    c.train.lr_schedule = 'cosine'
    c.train.lr_end = 3e-5
    c.train.summary_interval = 0  # every step
    return c

  state = train(cfg(10), str(tmp_path / 'ckpt_cos'), str(dataset))
  assert int(state.step) == 10
  assert np.isfinite(float(state.ema_loss))
  state2 = train(cfg(14), str(tmp_path / 'ckpt_cos'), str(dataset))
  assert int(state2.step) == 14

  # Downstream restore templates must match the schedule-bearing
  # optimizer state (evaluate/run/export/Enhancer use make_tx).
  from hdrnet_tpu.bin.evaluate import main as eval_main
  eval_main([str(tmp_path / 'ckpt_cos'), str(dataset), '--limit', '1'])

  import json
  recs = [json.loads(l) for l in
          open(tmp_path / 'ckpt_cos' / 'summaries.jsonl')]
  lrs = [r['learning_rate'] for r in recs if 'learning_rate' in r]
  assert lrs[0] > lrs[-1] > 0
  # Warmup variant produces a ramp then decay.
  c = cfg(14).train
  c.lr_warmup_steps = 4
  sched = _make_schedule(c)
  assert float(sched(0)) < float(sched(4))
  assert float(sched(14)) < float(sched(4))


@pytest.mark.quick
def test_cli_lr_schedule_plumbing():
  from hdrnet_tpu.bin.train import build_parser, config_from_args
  args = build_parser().parse_args(
      ['ckpt', 'data', '--lr_schedule', 'cosine', '--lr_decay_steps',
       '1000', '--lr_end', '1e-6', '--lr_warmup_steps', '50'])
  cfg = config_from_args(args)
  assert cfg.train.lr_schedule == 'cosine'
  assert cfg.train.lr_decay_steps == 1000
  assert cfg.train.lr_end == 1e-6
  assert cfg.train.lr_warmup_steps == 50


def test_fit_grid_cli(dataset, capsys):
  """Oracle grid fit: on the brighten-by-1.3x operator (exactly
  representable by a diagonal affine) the fit must approach perfection
  and beat the identity baseline decisively."""
  import json
  from hdrnet_tpu.bin.fit_grid import main as fit_main
  fit_main([str(dataset), '--limit', '1', '--steps', '120', '--lr',
            '1e-2', '--spatial_bin', '4', '--luma_bins', '4'])
  res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
  assert res['n_images'] == 1
  assert res['mean_oracle_psnr'] > res['mean_identity_psnr'] + 5.0


def test_guide_lr_scale(dataset, tmp_path):
  """guide_lr_scale=0 freezes the guide modules while the rest trains;
  the scaled-optimizer checkpoint restores through the evaluate CLI
  (make_tx reproduces the multi_transform state tree)."""
  import jax
  from hdrnet_tpu.training.loop import train

  def cfg(steps, scale):
    c = _config(steps)
    c.train.guide_lr_scale = scale
    return c

  state = train(cfg(5, 0.0), str(tmp_path / 'ckpt_gls'), str(dataset))
  import jax.numpy as jnp
  from hdrnet_tpu.models import make_model
  from hdrnet_tpu.config import Config
  config = Config.load(str(tmp_path / 'ckpt_gls'))
  model = make_model(config.model)
  init = model.init(jax.random.PRNGKey(config.train.seed),
                    jnp.zeros((2, 32, 32, 3)), jnp.zeros((2, 64, 64, 3)))
  # Guide frozen at init; coefficients moved.
  jax.tree_util.tree_map(
      lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                 np.asarray(b)),
      state.params['guide'], init['params']['guide'])
  diffs = jax.tree_util.tree_map(
      lambda a, b: float(np.abs(np.asarray(a) - np.asarray(b)).max()),
      state.params['coefficients'], init['params']['coefficients'])
  assert max(jax.tree_util.tree_leaves(diffs)) > 0

  from hdrnet_tpu.bin.evaluate import main as eval_main
  eval_main([str(tmp_path / 'ckpt_gls'), str(dataset), '--limit', '1'])


def test_guide_reg(dataset, tmp_path):
  """guide_reg > 0 adds the range hinge to the loss: with a huge target
  std (unattainable) the regularized loss must exceed the plain loss on
  the SAME params/batch; with target 0 the hinge is inactive and the
  losses agree exactly. Also exercises the pyramid model's multi-level
  guide_map sow path."""
  import jax
  import jax.numpy as jnp
  from hdrnet_tpu.config import ModelConfig
  from hdrnet_tpu.models import make_model
  from hdrnet_tpu.training.step import make_train_step, create_state
  from hdrnet_tpu.training.loop import make_tx
  from hdrnet_tpu.config import TrainConfig

  rng = np.random.RandomState(0)
  batch = {
      'lowres_input': jnp.asarray(rng.rand(2, 32, 32, 3), jnp.float32),
      'lowres_output': jnp.asarray(rng.rand(2, 32, 32, 3), jnp.float32),
      'image_input': jnp.asarray(rng.rand(2, 64, 64, 3), jnp.float32),
      'image_output': jnp.asarray(rng.rand(2, 64, 64, 3), jnp.float32),
  }
  for model_name in ('HDRNetCurves', 'HDRNetGaussianPyrNN'):
    cfg = ModelConfig(model_name=model_name, net_input_size=32,
                      spatial_bin=8, luma_bins=4,
                      output_resolution=[64, 64])
    model = make_model(cfg)
    tx = make_tx(TrainConfig(learning_rate=1e-3))
    state = create_state(model, tx, jax.random.PRNGKey(0),
                         batch['lowres_input'], batch['image_input'])
    plain = make_train_step(model, tx)
    reg_hot = make_train_step(model, tx, guide_reg=1.0,
                              guide_reg_target=10.0)
    _, m0 = jax.jit(plain)(state, batch)
    _, mhot = jax.jit(reg_hot)(state, batch)
    assert float(mhot['loss']) > float(m0['loss']) + 1.0, model_name
    if model_name == 'HDRNetCurves':
      # Hinge-inactive identity is model-agnostic; check it once.
      reg_cold = make_train_step(model, tx, guide_reg=1.0,
                                 guide_reg_target=0.0)
      _, mcold = jax.jit(reg_cold)(state, batch)
      np.testing.assert_allclose(float(mcold['loss']), float(m0['loss']),
                                 rtol=1e-6)


@pytest.mark.quick
def test_guide_reg_cli_plumbing():
  from hdrnet_tpu.bin.train import build_parser, config_from_args
  args = build_parser().parse_args(['ckpt', 'data', '--guide_reg', '0.01',
                                    '--guide_reg_target', '0.15'])
  cfg = config_from_args(args)
  assert cfg.train.guide_reg == 0.01
  assert cfg.train.guide_reg_target == 0.15
