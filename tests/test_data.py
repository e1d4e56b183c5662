"""Data pipeline tests: layout validation, augmentation semantics,
white-level handling, records round-trip, prefetch."""

import os

import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from hdrnet_tpu import native
from hdrnet_tpu.config import DataConfig
from hdrnet_tpu.data import (HDRpDataPipeline, ImageFilesDataPipeline,
                             ShardReader, ShardWriter,
                             StyleTransferDataPipeline,
                             UnsharpMaskDataPipeline, make_pipeline)


def _write_dataset(root, n=3, size=(48, 64), bits=8):
  os.makedirs(root / 'input', exist_ok=True)
  os.makedirs(root / 'output', exist_ok=True)
  rng = np.random.RandomState(0)
  names = []
  for i in range(n):
    name = f'im{i}.png'
    names.append(name)
    for sub in ('input', 'output'):
      arr = rng.rand(*size, 3)
      if bits == 16:
        img = (arr * 65535).astype(np.uint16)
        # PIL 16-bit png: per-channel not supported for RGB; save as I;16
        # grayscale instead for the 16-bit test.
        Image.fromarray(img[:, :, 0]).save(root / sub / name)
      else:
        Image.fromarray((arr * 255).astype(np.uint8)).save(
            root / sub / name)
  with open(root / 'filelist.txt', 'w') as f:
    f.write('\n'.join(names) + '\n')
  return names


def _cfg(**kw):
  base = dict(batch_size=2, output_resolution=[32, 32], net_input_size=16,
              shuffle=False, random_crop=False, data_threads=1)
  base.update(kw)
  return DataConfig(**base)


@pytest.mark.quick
def test_image_files_pipeline(tmp_path):
  _write_dataset(tmp_path)
  pipe = ImageFilesDataPipeline(str(tmp_path), _cfg())
  assert pipe.nsamples == 3
  batch = next(pipe.batches())
  assert batch['image_input'].shape == (2, 32, 32, 3)
  assert batch['lowres_input'].shape == (2, 16, 16, 3)
  assert batch['image_output'].dtype == np.float32
  assert 0.0 <= batch['image_input'].min() <= batch['image_input'].max() <= 1.0
  # lowres is the nearest-resample of fullres (data_pipeline.py:165-169)
  want = native.resize_nearest(batch['image_input'][0], (16, 16))
  np.testing.assert_allclose(batch['lowres_input'][0], want, atol=1e-6)


def test_missing_layout_raises(tmp_path):
  with pytest.raises(ValueError):
    ImageFilesDataPipeline(str(tmp_path), _cfg())


def test_sixteen_bit_white_level(tmp_path):
  _write_dataset(tmp_path, bits=16)
  pipe = ImageFilesDataPipeline(str(tmp_path), _cfg())
  batch = next(pipe.batches())
  assert batch['image_input'].max() <= 1.0


def test_augmentations_change_output(tmp_path):
  _write_dataset(tmp_path, size=(50, 70))
  cfg = _cfg(fliplr=True, flipud=True, rotate=True, random_crop=True,
             shuffle=True)
  pipe = ImageFilesDataPipeline(str(tmp_path), cfg)
  b0 = next(pipe.batches(seed=0))
  b1 = next(pipe.batches(seed=1))
  assert b0['image_input'].shape == b1['image_input'].shape
  assert np.abs(b0['image_input'] - b1['image_input']).max() > 1e-3


def test_crop_too_small_raises(tmp_path):
  _write_dataset(tmp_path, size=(20, 20))
  pipe = ImageFilesDataPipeline(str(tmp_path), _cfg())
  with pytest.raises(ValueError):
    next(pipe.batches())


def test_records_roundtrip(tmp_path):
  rng = np.random.RandomState(1)
  samples = [{'image_input': (rng.rand(40, 40, 3) * 32767).astype(np.int16),
              'image_output': (rng.rand(40, 40, 3) * 255).astype(np.uint8)}
             for _ in range(5)]
  with ShardWriter(str(tmp_path / 'rec'), records_per_file=2) as w:
    for s in samples:
      w.write(s)
  reader = ShardReader(str(tmp_path / 'rec' / '*.npz'))
  got = list(reader)
  assert len(got) == 5
  np.testing.assert_array_equal(got[0]['image_input'],
                                samples[0]['image_input'])
  assert reader.dtypes['image_output'] == np.uint8


def test_hdrp_pipeline(tmp_path):
  rng = np.random.RandomState(2)
  with ShardWriter(str(tmp_path / 'rec')) as w:
    for _ in range(3):
      w.write({
          'image_input': (rng.rand(48, 48, 3) * 32767).astype(np.int16),
          'image_output': (rng.rand(48, 48, 3) * 255).astype(np.uint8)})
  pipe = HDRpDataPipeline(str(tmp_path / 'rec'), _cfg())
  batch = next(pipe.batches())
  assert batch['image_input'].shape == (2, 32, 32, 3)
  assert batch['image_input'].max() <= 1.0


def test_style_transfer_pipeline(tmp_path):
  _write_dataset(tmp_path, n=2)
  # two style targets; outputs under output/<target>/<name>
  rng = np.random.RandomState(3)
  targets = ['styleA', 'styleB']
  for t in targets:
    Image.fromarray((rng.rand(48, 64, 3) * 255).astype(np.uint8)).save(
        tmp_path / 'input' / f'{t}.png')
    os.makedirs(tmp_path / 'output' / t, exist_ok=True)
    for n in ('im0.png', 'im1.png'):
      Image.fromarray((rng.rand(48, 64, 3) * 255).astype(np.uint8)).save(
          tmp_path / 'output' / t / n)
  with open(tmp_path / 'targets.txt', 'w') as f:
    f.write('\n'.join(targets) + '\n')
  pipe = StyleTransferDataPipeline(str(tmp_path), _cfg())
  assert pipe.nsamples == 4  # 2 inputs x 2 targets
  batch = next(pipe.batches())
  assert batch['image_input'].shape == (2, 32, 32, 6)  # 6-channel input
  assert batch['image_output'].shape == (2, 32, 32, 3)


@pytest.mark.quick
def test_unsharp_mask_pipeline(tmp_path):
  _write_dataset(tmp_path)
  cfg = _cfg(blur_sigma=2.0, sharpen=1.5)
  pipe = UnsharpMaskDataPipeline(str(tmp_path), cfg)
  batch = next(pipe.batches())
  # target differs from input (it's sharpened) but is correlated
  d = np.abs(batch['image_output'] - batch['image_input']).mean()
  assert 0 < d < 0.5


@pytest.mark.quick
def test_usm_device_synthesis_matches_host(tmp_path):
  """The device-resident usm loader (data/device.py load_usm_dataset)
  must reproduce the host pipeline's file-materialized targets
  (UnsharpMaskDataPipeline._load + imwrite quantization,
  scripts/make_usm_dataset.py): same native-blur taps and symmetric
  boundary, same clip, same round-half-up uint8 storage. f32 summation
  order differs, so allow one uint8 quantum on ties."""
  from hdrnet_tpu.data import images
  from hdrnet_tpu.data.device import load_usm_dataset, make_usm_synth
  _write_dataset(tmp_path, n=2, size=(40, 56))
  cfg = _cfg(blur_sigma=2.0, sharpen=1.5, output_resolution=[32, 32])
  pipe = UnsharpMaskDataPipeline(str(tmp_path), cfg)

  # Host/file reference: _load's float target quantized as imwrite does.
  path = os.path.join(str(tmp_path), 'input', 'im0.png')
  inp, target_f = pipe._load(path, np.random.RandomState(0))
  want = (np.clip(target_f, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)

  synth = make_usm_synth(cfg.blur_sigma, cfg.sharpen)
  got = np.asarray(synth(jnp.asarray(images.imread(path))))
  assert got.dtype == np.uint8
  assert np.abs(got.astype(int) - want.astype(int)).max() <= 1

  # Full loader: resident arrays with the right shapes/dtypes.
  dds = load_usm_dataset(pipe, cfg)
  assert dds.nsamples == 2
  assert dds.inputs.shape == (2, 40, 56, 3)
  assert dds.outputs.dtype == jnp.uint8


def test_st_device_loader_matches_host(tmp_path):
  """The device-resident style-transfer loader (data/device.py
  load_st_dataset) must reproduce the host pipeline's 6-channel inputs
  (StyleTransferDataPipeline._load: photo + bilinear-resized exemplar)
  up to the documented 1/510 exemplar requantization, and the exact
  per-style targets."""
  from hdrnet_tpu.data.device import load_st_dataset
  from hdrnet_tpu.data.pipeline import StyleTransferDataPipeline
  names = _write_dataset(tmp_path, n=2, size=(40, 56))
  rng = np.random.RandomState(7)
  # exemplars (different size: exercises the resize) + targets.txt
  for t in ('s0', 's1'):
    Image.fromarray((rng.rand(24, 32, 3) * 255).astype(np.uint8)).save(
        tmp_path / 'input' / f'{t}.png')
    os.makedirs(tmp_path / 'output' / t, exist_ok=True)
    for n in names:
      Image.fromarray((rng.rand(40, 56, 3) * 255).astype(np.uint8)).save(
          tmp_path / 'output' / t / n)
  with open(tmp_path / 'targets.txt', 'w') as f:
    f.write('s0\ns1\n')

  cfg = _cfg(output_resolution=[32, 32], pipeline='StyleTransferDataPipeline')
  pipe = StyleTransferDataPipeline(str(tmp_path), cfg)
  assert len(pipe.specs) == 4  # 2 frames x 2 styles

  dds = load_st_dataset(pipe, cfg)
  assert dds.inputs.shape == (4, 40, 56, 6)
  assert dds.inputs.dtype == jnp.uint8
  for i, spec in enumerate(pipe.specs):
    host_in, host_out = pipe._load(spec, np.random.RandomState(0))
    dev_in = np.asarray(dds.inputs[i]).astype(np.float32) / 255.0
    dev_out = np.asarray(dds.outputs[i]).astype(np.float32) / 255.0
    np.testing.assert_allclose(dev_in[..., :3], host_in[..., :3],
                               atol=1e-7)
    np.testing.assert_allclose(dev_in[..., 3:], host_in[..., 3:],
                               atol=0.5 / 255.0 + 1e-7)
    np.testing.assert_allclose(dev_out, host_out, atol=1e-7)


def test_prefetching_batches(tmp_path):
  _write_dataset(tmp_path)
  pipe = ImageFilesDataPipeline(str(tmp_path), _cfg(data_threads=2))
  it = pipe.prefetching_batches()
  b = next(it)
  assert b['image_input'].shape == (2, 32, 32, 3)
  next(it)


class _ConstantPipeline(ImageFilesDataPipeline):
  """Each sample i is a constant image of value i/255 — identifiable
  after any crop/flip, so epoch semantics can be audited."""

  def _sample_paths(self):
    return list(range(12))

  def _load(self, spec, rng):
    im = np.full((48, 64, 3), spec / 255.0, np.float32)
    return im, im


def test_prefetch_epoch_semantics():
  """Each sample appears exactly once per epoch across ALL workers —
  sample-level parallelism (reference data_pipeline.py:107-124), not N
  duplicate shuffled streams."""
  pipe = _ConstantPipeline(
      '/unused', _cfg(batch_size=3, data_threads=4, shuffle=True,
                      random_crop=True))
  n = pipe.nsamples
  it = pipe.prefetching_batches(seed=7)
  ids = []
  for _ in range(2 * n // 3):  # two full epochs of batch-3 batches
    b = next(it)
    ids.extend(np.round(b['image_input'][:, 0, 0, 0] * 255).astype(int))
  epoch1, epoch2 = sorted(ids[:n]), sorted(ids[n:2 * n])
  assert epoch1 == list(range(n)), epoch1
  assert epoch2 == list(range(n)), epoch2
  # Shuffling really happened (astronomically unlikely to be identity).
  assert ids[:n] != list(range(n)) or ids[n:2 * n] != list(range(n))


def test_cache_images(tmp_path, monkeypatch):
  """cache_images=True decodes each file once and serves identical
  pixels afterwards (host decode is the bottleneck when one core feeds
  a fast chip)."""
  from hdrnet_tpu.data import images as img_mod
  _write_dataset(tmp_path)
  calls = []
  real = img_mod.imread
  monkeypatch.setattr(img_mod, 'imread',
                      lambda p, **kw: (calls.append(p), real(p, **kw))[1])
  pipe = ImageFilesDataPipeline(str(tmp_path), _cfg(cache_images=True))
  a = next(pipe.batches(seed=0))
  n_first = len(calls)
  b = next(pipe.batches(seed=0))
  assert len(calls) == n_first  # no further decodes
  np.testing.assert_allclose(a['image_input'], b['image_input'])


def test_ll_dataset_generator(tmp_path):
  """scripts/make_ll_dataset.py: layout is the canonical fixture, the
  operator is edge-aware (flat regions invariant, texture boosted), and
  the result trains through ImageFilesDataPipeline."""
  import sys
  sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..',
                                  'scripts'))
  import make_ll_dataset as gen

  # operator semantics
  flat = np.full((64, 64, 3), 0.5, np.float32)
  np.testing.assert_allclose(gen.enhance(flat, levels=3), flat, atol=1e-5)
  rng = np.random.RandomState(0)
  img = gen.synth_photo(rng, 128)
  tgt = gen.enhance(img, levels=4)
  assert 1e-3 < np.abs(tgt - img).mean() < 0.2  # detail boosted

  # laplacian pyramid round-trips (up/down are a consistent pair)
  y = img[:, :, 0]
  lp = gen.laplacian_pyramid(y, 3)
  rec = gen.gaussian_pyramid(y, 3)[3]
  for l in reversed(range(3)):
    rec = gen.pyr_up(rec, lp[l].shape) + lp[l]
  np.testing.assert_allclose(rec, y, atol=1e-6)

  # end-to-end: generate + load through the pipeline
  gen.main([str(tmp_path), '--n_train', '2', '--n_test', '1',
            '--size', '64'])
  pipe = ImageFilesDataPipeline(
      str(tmp_path / 'train'), _cfg(output_resolution=[48, 48],
                                    batch_size=2))
  batch = next(pipe.batches())
  assert batch['image_input'].shape == (2, 48, 48, 3)
  d = np.abs(batch['image_output'] - batch['image_input']).mean()
  assert 0 < d < 0.2


@pytest.mark.quick
def test_registry():
  with pytest.raises(ValueError):
    make_pipeline('/nonexistent', DataConfig(pipeline='Nope'))


def test_filelist_path_accepted(tmp_path):
  """Reference workloads pass .../filelist.txt (scripts/ll/train_std.sh);
  the pipeline accepts that as well as the dataset dir."""
  _write_dataset(tmp_path)
  pipe = ImageFilesDataPipeline(str(tmp_path / 'filelist.txt'), _cfg())
  assert pipe.nsamples == 3
  batch = next(pipe.batches())
  assert batch['image_input'].shape == (2, 32, 32, 3)


def test_device_normalize_pipeline(tmp_path):
  """device_normalize ships raw uint8 batches whose on-device
  normalization (training.step.normalize_batch) bitwise-matches the
  float pipeline — augmentation is index-only, so the two paths see
  identical pixels."""
  from hdrnet_tpu.training.step import normalize_batch
  _write_dataset(tmp_path, size=(50, 70))
  kw = dict(fliplr=True, flipud=True, rotate=True, random_crop=True)
  bf = next(ImageFilesDataPipeline(
      str(tmp_path), _cfg(**kw)).batches(seed=5))
  bu = next(ImageFilesDataPipeline(
      str(tmp_path), _cfg(device_normalize=True, **kw)).batches(seed=5))
  for k in bf:
    assert bu[k].dtype == np.uint8, (k, bu[k].dtype)
    np.testing.assert_array_equal(
        np.asarray(normalize_batch({k: jnp.asarray(bu[k])})[k]), bf[k])


def test_device_normalize_sixteen_bit(tmp_path):
  _write_dataset(tmp_path, bits=16)
  from hdrnet_tpu.training.step import normalize_batch
  bf = next(ImageFilesDataPipeline(str(tmp_path), _cfg()).batches(seed=1))
  bu = next(ImageFilesDataPipeline(
      str(tmp_path), _cfg(device_normalize=True)).batches(seed=1))
  assert bu['image_input'].dtype == np.uint16
  np.testing.assert_array_equal(
      np.asarray(normalize_batch(
          {'x': jnp.asarray(bu['image_input'])})['x']),
      bf['image_input'])


def test_device_dataset_augment_matches_host(tmp_path):
  """Device-resident augmentation (data/device.py) bitwise-matches the
  host native crop/flip/rot/lowres chain for the same draw."""
  import jax
  from hdrnet_tpu.data.device import (DeviceDataset, load_pairs,
                                      make_device_augment)
  _write_dataset(tmp_path, n=4, size=(50, 70))
  cfg = _cfg(output_resolution=[32, 32], net_input_size=16,
             random_crop=True, fliplr=True, flipud=True, rotate=True,
             device_normalize=True)
  pipe = ImageFilesDataPipeline(str(tmp_path), cfg)
  dds = DeviceDataset(load_pairs(pipe), cfg)
  aug = make_device_augment([32, 32], 16, True)
  params = {'idx': np.asarray([1, 3], np.int32),
            'y0': np.asarray([0, 18], np.int32),
            'x0': np.asarray([38, 5], np.int32),
            'fliplr': np.asarray([1, 0], np.int32),
            'flipud': np.asarray([0, 1], np.int32),
            'rot_k': np.asarray([3, 2], np.int32)}
  got = jax.jit(lambda i, o, p: aug(i[p['idx']], o[p['idx']], p))(
      dds.inputs, dds.outputs, params)
  for b in range(2):
    i = int(params['idx'][b])
    inp = pipe._read_raw(pipe.specs[i][0])
    out = pipe._read_raw(pipe.specs[i][1])
    both = np.concatenate([inp, out], -1)
    full = native.crop_flip_rot(
        both, int(params['y0'][b]), int(params['x0'][b]), 32, 32,
        bool(params['fliplr'][b]), bool(params['flipud'][b]),
        int(params['rot_k'][b]))
    low = native.resize_nearest(full, (16, 16))
    np.testing.assert_array_equal(np.asarray(got['image_input'][b]),
                                  full[:, :, :3])
    np.testing.assert_array_equal(np.asarray(got['image_output'][b]),
                                  full[:, :, 3:])
    np.testing.assert_array_equal(np.asarray(got['lowres_input'][b]),
                                  low[:, :, :3])


def test_device_dataset_epoch_semantics(tmp_path):
  """param_stream emits each sample exactly once per epoch."""
  from hdrnet_tpu.data.device import DeviceDataset, load_pairs
  _write_dataset(tmp_path, n=5, size=(40, 40))
  cfg = _cfg(output_resolution=[32, 32], batch_size=1, shuffle=True)
  pipe = ImageFilesDataPipeline(str(tmp_path), cfg)
  dds = DeviceDataset(load_pairs(pipe), cfg)
  it = dds.param_stream(seed=0, batch_size=1)
  seen = [int(next(it)['idx'][0]) for _ in range(10)]
  assert sorted(seen[:5]) == list(range(5))
  assert sorted(seen[5:]) == list(range(5))


def test_device_dataset_rejects_nonuniform(tmp_path):
  from hdrnet_tpu.data.device import DeviceDataset, load_pairs
  _write_dataset(tmp_path, n=2, size=(40, 40))
  from PIL import Image as PILImage
  PILImage.fromarray(np.zeros((30, 40, 3), np.uint8)).save(
      tmp_path / 'input' / 'odd.png')
  PILImage.fromarray(np.zeros((30, 40, 3), np.uint8)).save(
      tmp_path / 'output' / 'odd.png')
  with open(tmp_path / 'filelist.txt', 'a') as f:
    f.write('odd.png\n')
  cfg = _cfg(output_resolution=[16, 16])
  pipe = ImageFilesDataPipeline(str(tmp_path), cfg)
  with pytest.raises(ValueError, match='uniform'):
    DeviceDataset(load_pairs(pipe), cfg)


def test_mixed_bit_depth_batch_falls_back_to_float(tmp_path):
  """A batch mixing 8-bit and 16-bit samples with device_normalize must
  not be silently promoted by np.stack (a uint8 255 would become
  255/65535 after the on-device divide); mixed batches take the float
  path, normalized per-sample by each file's own white level."""
  os.makedirs(tmp_path / 'input'); os.makedirs(tmp_path / 'output')
  rng = np.random.RandomState(0)
  a8 = (rng.rand(48, 64, 3) * 255).astype(np.uint8)
  a16 = (rng.rand(48, 64) * 65535).astype(np.uint16)
  for sub in ('input', 'output'):
    Image.fromarray(a8).save(tmp_path / sub / 'a.png')
    Image.fromarray(a16).save(tmp_path / sub / 'b.png')
  (tmp_path / 'filelist.txt').write_text('a.png\nb.png\n')
  batch = next(ImageFilesDataPipeline(
      str(tmp_path), _cfg(device_normalize=True)).batches(seed=0))
  assert batch['image_input'].dtype == np.float32
  assert 0.5 < batch['image_input'].max() <= 1.0  # both samples in [0,1]


def test_prefetch_worker_failure_raises(tmp_path):
  """A corrupt file must raise in the consumer, not silently kill the
  worker thread and hang the epoch barrier."""
  import pytest
  _write_dataset(tmp_path)
  (tmp_path / 'input' / 'im1.png').write_bytes(b'not a png')
  pipe = ImageFilesDataPipeline(str(tmp_path), _cfg(data_threads=2))
  it = pipe.prefetching_batches(seed=0)
  with pytest.raises(RuntimeError, match='data worker failed'):
    for _ in range(4):
      next(it)
