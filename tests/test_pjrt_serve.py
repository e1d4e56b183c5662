"""Build, CLI-surface, and execute-loop tests for the native PJRT
serving driver.

The execute/readback loop — the part replacing the reference's TF C++
session loop (benchmark/src/processor.cc:103-137) — runs in CI against
a mock PJRT plugin (native/mock_pjrt.cc) whose executable increments
its input by 1 per execute, so the reported output statistics reveal
exactly how many executions happened and whether the output->input
chaining plus the deferred buffer graveyard are handle-correct. The
TPU execution path is additionally exercised on hardware (PARITY.md).
"""

import json
import os
import shutil
import subprocess

import numpy as np
import pytest

NATIVE = os.path.join(os.path.dirname(__file__), '..', 'hdrnet_tpu',
                      'native')
BIN = os.path.join(NATIVE, 'pjrt_serve')
MOCK = os.path.join(NATIVE, 'libmock_pjrt.so')


@pytest.fixture(scope='module')
def binary():
  if shutil.which('g++') is None:
    pytest.skip('no g++')
  r = subprocess.run(['make', 'pjrt_serve'], cwd=NATIVE,
                     capture_output=True, text=True)
  assert r.returncode == 0, r.stderr
  assert os.path.exists(BIN)
  return BIN


@pytest.fixture(scope='module')
def mock_plugin():
  if shutil.which('g++') is None:
    pytest.skip('no g++')
  r = subprocess.run(['make', 'libmock_pjrt.so'], cwd=NATIVE,
                     capture_output=True, text=True)
  if r.returncode != 0:
    pytest.skip(f'mock plugin build failed (no PJRT header?): {r.stderr}')
  return MOCK


def _write_module(tmp_path, shape=(2, 3, 4)):
  mod = tmp_path / 'm.mlir'
  mod.write_text('module {}')  # the mock compiles anything
  (tmp_path / 'compile_options.pb').write_bytes(b'')
  manifest = {
      'name': 'm',
      'inputs': [{'shape': list(shape), 'dtype': 'float32'}],
      'outputs': [{'shape': list(shape), 'dtype': 'float32'}],
  }
  (tmp_path / 'm.manifest.json').write_text(json.dumps(manifest))
  x = np.full(shape, 0.25, np.float32)
  x.tofile(tmp_path / 'in0.bin')
  return mod


def test_execute_readback_loop(binary, mock_plugin, tmp_path):
  """upload -> chained executes -> readback, audited by count: with the
  increment-executable, out == in + (burn + 9*iters) everywhere iff
  every execute ran, the chain rebound output->input each step, and no
  live buffer was destroyed early (the mock poisons freed buffers)."""
  mod = _write_module(tmp_path)
  burn, iters = 2, 5
  r = subprocess.run(
      [binary, str(mod), '--plugin', mock_plugin, '--burn', str(burn),
       '--iters', str(iters), '--inputs', str(tmp_path / 'in0.bin'),
       '--output', str(tmp_path / 'out.bin')],
      capture_output=True, text=True)
  assert r.returncode == 0, r.stderr
  report = json.loads(r.stdout.strip())
  expect = 0.25 + burn + 9 * iters  # 3x(iters) + 3x(2*iters) timed blocks
  assert report['out_mean'] == pytest.approx(expect, abs=1e-5)
  assert report['out_min'] == pytest.approx(expect, abs=1e-5)
  assert report['out_max'] == pytest.approx(expect, abs=1e-5)
  assert 'chaining output 0 -> input 0' in r.stderr
  out = np.fromfile(tmp_path / 'out.bin', np.float32)
  np.testing.assert_allclose(out, expect, atol=1e-5)


def test_int32_input_serve_any_convention(binary, mock_plugin, tmp_path):
  """serve_any_fn exports carry a (2,) int32 true-size operand; without
  --inputs the driver defaults it to the padded extent of the largest
  rank-4 float input, uploads it as S32, and never chains through it."""
  mod = tmp_path / 'm.mlir'
  mod.write_text('module {}')
  (tmp_path / 'compile_options.pb').write_bytes(b'')
  manifest = {
      'name': 'm',
      'inputs': [{'shape': [1, 8, 8, 3], 'dtype': 'float32'},
                 {'shape': [2], 'dtype': 'int32'}],
      'outputs': [{'shape': [1, 8, 8, 3], 'dtype': 'float32'}],
  }
  (tmp_path / 'm.manifest.json').write_text(json.dumps(manifest))
  r = subprocess.run(
      [binary, str(mod), '--plugin', mock_plugin, '--burn', '1',
       '--iters', '2'],
      capture_output=True, text=True)
  assert r.returncode == 0, r.stderr
  assert 'int32 input 1 defaulted to full padded extent (8, 8)' in r.stderr
  assert 'chaining output 0 -> input 0' in r.stderr
  report = json.loads(r.stdout.strip())
  assert report['iters'] == 2


def test_execute_explicit_input_and_no_chain(binary, mock_plugin,
                                             tmp_path):
  """--chain 0 re-runs pristine inputs every iteration: the output must
  be exactly ONE application of the executable (in + 1)."""
  mod = _write_module(tmp_path)
  x = np.arange(24, dtype=np.float32).reshape(2, 3, 4) / 24.0
  x.tofile(tmp_path / 'in0.bin')
  r = subprocess.run(
      [binary, str(mod), '--plugin', mock_plugin, '--chain', '0',
       '--burn', '1', '--iters', '2', '--inputs',
       str(tmp_path / 'in0.bin'), '--output', str(tmp_path / 'out.bin')],
      capture_output=True, text=True)
  assert r.returncode == 0, r.stderr
  out = np.fromfile(tmp_path / 'out.bin', np.float32).reshape(2, 3, 4)
  np.testing.assert_allclose(out, x + 1.0, atol=1e-6)


def test_usage_error(binary):
  r = subprocess.run([binary], capture_output=True, text=True)
  assert r.returncode == 1
  assert 'usage' in r.stderr


def test_unknown_flag(binary):
  r = subprocess.run([binary, 'x.mlir', '--frobnicate'],
                     capture_output=True, text=True)
  assert r.returncode == 1
  assert 'unknown flag' in r.stderr


def test_missing_manifest(binary, tmp_path):
  mod = tmp_path / 'm.mlir'
  mod.write_bytes(b'\0')
  r = subprocess.run([binary, str(mod)], capture_output=True, text=True)
  assert r.returncode == 1
  assert 'cannot read' in r.stderr and 'manifest' in r.stderr


def test_manifest_parse_then_plugin_load(binary, tmp_path):
  """With a valid manifest the next failure must be plugin/options,
  proving the manifest scanner accepted the export schema."""
  mod = tmp_path / 'm.mlir'
  mod.write_bytes(b'\0')
  manifest = {
      'name': 'm',
      'inputs': [{'shape': [1, 4, 4, 3], 'dtype': 'float32'}],
      'outputs': [{'shape': [1, 4, 4, 3], 'dtype': 'float32'}],
  }
  (tmp_path / 'm.manifest.json').write_text(json.dumps(manifest, indent=2))
  r = subprocess.run(
      [binary, str(mod), '--plugin', '/nonexistent/plugin.so'],
      capture_output=True, text=True)
  assert r.returncode == 1
  assert 'dlopen' in r.stderr


def test_uint8_stream_module(binary, mock_plugin, tmp_path):
  """uint8 manifests (stream_fn exports): byte-sized upload/readback,
  chaining on dtype+dims, countable increments mod 256."""
  mod = tmp_path / 'm.mlir'
  mod.write_text('module {}')
  (tmp_path / 'compile_options.pb').write_bytes(b'')
  manifest = {
      'name': 'm',
      'inputs': [{'shape': [1, 4, 6, 3], 'dtype': 'uint8'}],
      'outputs': [{'shape': [1, 4, 6, 3], 'dtype': 'uint8'}],
  }
  (tmp_path / 'm.manifest.json').write_text(json.dumps(manifest))
  x = np.full((1, 4, 6, 3), 10, np.uint8)
  x.tofile(tmp_path / 'in0.bin')
  burn, iters = 1, 3
  r = subprocess.run(
      [binary, str(mod), '--plugin', mock_plugin, '--burn', str(burn),
       '--iters', str(iters), '--inputs', str(tmp_path / 'in0.bin'),
       '--output', str(tmp_path / 'out.bin')],
      capture_output=True, text=True)
  assert r.returncode == 0, r.stderr
  assert 'chaining output 0 -> input 0' in r.stderr
  report = json.loads(r.stdout.strip())
  expect = 10 + burn + 9 * iters  # same execute count as the f32 test
  assert report['out_mean'] == pytest.approx(expect, abs=1e-5)
  out = np.fromfile(tmp_path / 'out.bin', np.uint8)
  assert out.shape == (72,)
  np.testing.assert_array_equal(out, expect)
