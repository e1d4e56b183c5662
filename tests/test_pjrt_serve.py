"""Build + CLI-surface tests for the native PJRT serving driver.

The driver's TPU execution path is exercised on hardware (see
PARITY.md perf table); under the CPU-only test env we verify that the
binary builds against the vendored PJRT C API header and that its
argument/manifest handling fails cleanly.
"""

import json
import os
import shutil
import subprocess

import pytest

NATIVE = os.path.join(os.path.dirname(__file__), '..', 'hdrnet_tpu',
                      'native')
BIN = os.path.join(NATIVE, 'pjrt_serve')


@pytest.fixture(scope='module')
def binary():
  if shutil.which('g++') is None:
    pytest.skip('no g++')
  r = subprocess.run(['make', 'pjrt_serve'], cwd=NATIVE,
                     capture_output=True, text=True)
  assert r.returncode == 0, r.stderr
  assert os.path.exists(BIN)
  return BIN


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
