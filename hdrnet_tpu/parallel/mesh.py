"""Device mesh + sharding specs — the distributed layer.

This is new capability relative to the reference, which is strictly
single-process / single-GPU (bin/train.py:141-157; its only notion of
multi-device is CUDA_VISIBLE_DEVICES pinning in scripts/**/*.sh, see
SURVEY.md §2.5 / §5.8). The TPU-native design:

  * a 2-D logical mesh ('data', 'spatial');
  * training: batch sharded over 'data' (gradient all-reduce inserted by
    XLA over ICI), full-res images additionally sharded along H over
    'spatial';
  * giant-image inference: H sharded over the whole mesh — the guide and
    slice-apply are pointwise given the (tiny, replicated) bilateral
    grid, so spatial sharding needs **zero halo exchange**
    (SURVEY.md §5.7);
  * TP/PP/EP: not applicable — the coefficient net is <1M params
    (documented capability decision, not an omission).

Multi-host: call jax.distributed.initialize() before make_mesh(); the
mesh spans all global devices and DP rides DCN across slices while
spatial sharding stays inside a slice (ICI) by putting 'spatial' last
in the device order.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = 'data'
SPATIAL_AXIS = 'spatial'


def initialize_distributed(coordinator_address=None, num_processes=None,
                           process_id=None):
  """Multi-host bring-up: call once per host before make_mesh().

  Thin wrapper over jax.distributed.initialize (auto-detects on Cloud
  TPU when no args are given). After this, jax.devices() spans the full
  slice/pod and make_mesh() lays 'data' across hosts (DCN-friendly:
  gradient all-reduce) while 'spatial' stays within a host's chips
  (ICI). No-op if already initialized.
  """
  import jax
  try:
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
  except RuntimeError as e:  # already initialized
    if 'already' not in str(e).lower():
      raise
  return jax.devices()


def make_mesh(mesh_shape=None, devices=None):
  """Creates the ('data', 'spatial') mesh.

  mesh_shape: (n_data, n_spatial); default puts every device on 'data'
  (pure DP — the right default for training at HDRNet batch sizes).
  """
  devices = devices if devices is not None else jax.devices()
  n = len(devices)
  if mesh_shape is None:
    mesh_shape = (n, 1)
  assert mesh_shape[0] * mesh_shape[1] == n, (mesh_shape, n)
  dev_array = np.asarray(devices).reshape(mesh_shape)
  return Mesh(dev_array, (DATA_AXIS, SPATIAL_AXIS))


def replicated(mesh):
  return NamedSharding(mesh, P())


def batch_sharding(mesh):
  """Shard axis 0 (batch) over 'data'."""
  return NamedSharding(mesh, P(DATA_AXIS))


def spatial_batch_sharding(mesh, ndim):
  """Shard (batch, H, ...) over ('data', 'spatial') — full-res images."""
  spec = [DATA_AXIS, SPATIAL_AXIS] + [None] * (ndim - 2)
  return NamedSharding(mesh, P(*spec))


def spatial_only_sharding(mesh, ndim):
  """Shard H over the whole mesh — single giant-image inference."""
  spec = [None, (DATA_AXIS, SPATIAL_AXIS)] + [None] * (ndim - 2)
  return NamedSharding(mesh, P(*spec))


# Batch keys carrying full-resolution images (sharded over 'spatial').
FULLRES_KEYS = ('image_input', 'image_output')


def batch_shardings(mesh, batch):
  """Per-key shardings for a training batch dict.

  Full-res images shard (batch, H) over ('data', 'spatial') — legal
  with zero halo because the guide + slice-apply are pointwise given
  the replicated coefficient grid (SURVEY.md §5.7). Lowres inputs shard
  over 'data' only: their conv stack would need halo exchanges under H
  sharding, and at 256x256 they are cheap enough to replicate across
  'spatial'. This is the single source of truth for both the
  production train loop (training/loop.py) and the driver's multi-chip
  dryrun (__graft_entry__.py), so the dryrun certifies the real path.
  """
  dp = batch_sharding(mesh)
  out = {}
  for k, v in batch.items():
    if k in FULLRES_KEYS and getattr(v, 'ndim', 0) >= 3:
      out[k] = spatial_batch_sharding(mesh, v.ndim)
    else:
      out[k] = dp
  return out
