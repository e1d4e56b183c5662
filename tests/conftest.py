"""Test harness config: run everything on a virtual 8-device CPU mesh.

The ambient environment registers the 'axon' TPU-tunnel PJRT plugin via a
sitecustomize hook and *forces* ``jax_platforms='axon,cpu'`` with
``jax.config.update`` (so plain JAX_PLATFORMS env vars are ignored). Tests
must run on the local CPU — every eager op on 'axon' round-trips the
tunnel. We re-update the config before any backend initializes.
"""

import os

_flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in _flags:
  os.environ['XLA_FLAGS'] = (
      _flags + ' --xla_force_host_platform_device_count=8').strip()
os.environ['JAX_PLATFORMS'] = 'cpu'

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

import pytest  # noqa: E402


@pytest.fixture(scope='session')
def cpu_devices():
  devs = jax.devices()
  assert all(d.platform == 'cpu' for d in devs), devs
  assert len(devs) == 8, devs
  return devs
