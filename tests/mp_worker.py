"""Worker process for the real multi-process distributed test.

Launched by tests/test_multiprocess.py as `python tests/mp_worker.py
<port> <process_id> <num_processes>`. Each process owns 4 virtual CPU
devices; together they form one global 8-device JAX runtime joined via
`hdrnet_tpu.parallel.mesh.initialize_distributed` — the same bring-up a
real multi-host TPU pod uses (jax.distributed + cross-process
collectives; gloo stands in for DCN on CPU). The worker then runs the
PRODUCTION train step (training/step.py) over the global
('data', 'spatial') mesh with the production per-key sharding tree
(parallel/mesh.batch_shardings) and asserts the result is numerically
identical to a single-device step on the same batch.

This certifies what a single-process virtual mesh cannot: device order
consistency across processes, global-array construction from
process-local shards, cross-process gradient all-reduce, and that
`initialize_distributed` actually composes with `make_mesh`.
"""

import os
import sys


def main():
  port, pid, nproc = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
  local_devices = 4
  flags = os.environ.get('XLA_FLAGS', '')
  os.environ['XLA_FLAGS'] = (
      flags + f' --xla_force_host_platform_device_count={local_devices}'
  ).strip()
  os.environ['JAX_PLATFORMS'] = 'cpu'
  import jax
  jax.config.update('jax_platforms', 'cpu')

  from hdrnet_tpu.parallel.mesh import initialize_distributed
  initialize_distributed(f'localhost:{port}', nproc, pid)

  assert jax.process_count() == nproc, jax.process_count()
  n_global = nproc * local_devices
  assert len(jax.devices()) == n_global, jax.devices()
  assert len(jax.local_devices()) == local_devices

  import numpy as np
  import jax.numpy as jnp
  import optax

  from hdrnet_tpu.config import ModelConfig
  from hdrnet_tpu.models import make_model
  from hdrnet_tpu.parallel import mesh as pm
  from hdrnet_tpu.training.step import create_state, make_train_step

  cfg = ModelConfig(model_name='HDRNetCurves', net_input_size=64,
                    spatial_bin=8, luma_bins=4,
                    output_resolution=[64, 64])
  model = make_model(cfg)
  tx = optax.adam(1e-3)

  # Deterministic global batch — every process holds the full array and
  # contributes only its local shards via make_array_from_callback.
  b = n_global
  rng = np.random.RandomState(0)
  low = rng.rand(b, 64, 64, 3).astype(np.float32)
  batch_np = {
      'lowres_input': low,
      'lowres_output': low,
      'image_input': rng.rand(b, 64, 64, 3).astype(np.float32),
      'image_output': rng.rand(b, 64, 64, 3).astype(np.float32),
  }

  # model.init is deterministic given the PRNGKey, so each process
  # materializes identical state locally (exactly how real multi-host
  # training bootstraps before the first checkpoint).
  state = create_state(model, tx, jax.random.PRNGKey(0),
                       jnp.asarray(low[:1]),
                       jnp.asarray(batch_np['image_input'][:1]))
  state_np = jax.tree.map(np.asarray, state)

  # Single-device reference step, before any global-mesh work.
  step_fn = make_train_step(model, tx)
  ref_state, ref_m = jax.jit(step_fn)(state, batch_np)
  ref_loss = float(ref_m['loss'])
  ref_params = jax.tree.map(np.asarray, ref_state.params)

  def globalize(np_val, sharding):
    return jax.make_array_from_callback(
        np.shape(np_val), sharding, lambda idx: np.asarray(np_val)[idx])

  results = {}
  for mesh_shape in [(n_global, 1), (n_global // 2, 2)]:
    mesh = pm.make_mesh(mesh_shape)
    rep = pm.replicated(mesh)
    shard_tree = pm.batch_shardings(mesh, batch_np)
    batch = {k: globalize(v, shard_tree[k]) for k, v in batch_np.items()}
    gstate = jax.tree.map(lambda x: globalize(x, rep), state_np)
    step = jax.jit(step_fn, in_shardings=(rep, shard_tree),
                   out_shardings=(rep, rep))
    new_state, m = step(gstate, batch)
    jax.block_until_ready(new_state)
    loss = float(np.asarray(m['loss'].addressable_data(0)))
    np.testing.assert_allclose(loss, ref_loss, rtol=1e-5, atol=1e-7)
    flat_new, _ = jax.tree_util.tree_flatten(
        jax.tree.map(lambda x: np.asarray(x.addressable_data(0)),
                     new_state.params))
    flat_ref, _ = jax.tree_util.tree_flatten(ref_params)
    for a, r in zip(flat_new, flat_ref):
      np.testing.assert_allclose(a, r, rtol=1e-4, atol=1e-5)
    results[mesh_shape] = loss

  print(f'MPOK pid={pid} loss={ref_loss:.6f} meshes={sorted(results)}',
        flush=True)


if __name__ == '__main__':
  main()
