"""The training loop (reference: bin/train.py:46-184, rebuilt).

Single function `train(config, checkpoint_dir, data_dir, ...)`:
  * builds the pipeline, model, Adam, and the ('data','spatial') mesh;
  * pjit-shards the step: state replicated, batch over 'data'
    (XLA emits the gradient all-reduce over ICI);
  * restores the latest checkpoint if one exists (Supervisor-style
    elastic resume), saves on a time interval and on interruption;
  * logs EMA(0.99) loss/psnr on a time interval, appends scalar
    summaries to summaries.jsonl, and runs periodic evaluation.

NB the reference's eval graph computes eval_psnr on the *training*
prediction (bin/train.py:86,105 — a known bug per SURVEY.md §2 P6);
here evaluation really uses the eval pipeline.
"""

from __future__ import annotations

import json
import logging
import os
import time

import jax
import numpy as np
import optax

from hdrnet_tpu.config import Config
from hdrnet_tpu.data import device_prefetch, make_pipeline
from hdrnet_tpu.models import make_model
from hdrnet_tpu.parallel import mesh as pm
from hdrnet_tpu.training.checkpoint import Checkpointer
from hdrnet_tpu.training.step import (abstract_state, create_state,
                                      make_eval_step,
                                      make_train_step)

log = logging.getLogger('hdrnet_tpu.train')


class SummaryWriter:
  """Scalar summaries as JSONL (tensorboard-free observability)."""

  def __init__(self, directory):
    os.makedirs(directory, exist_ok=True)
    self.path = os.path.join(directory, 'summaries.jsonl')

  def write(self, step, **scalars):
    rec = {'step': int(step), 'time': time.time()}
    rec.update({k: float(v) for k, v in scalars.items()})
    with open(self.path, 'a') as f:
      f.write(json.dumps(rec) + '\n')


def _chain_first(first, rest):
  yield first
  yield from rest


def _enable_compile_cache(checkpoint_dir):
  """Persistent XLA compilation cache: the fused kernels take minutes to
  compile per shape; cache hits make restarts/resumes instant."""
  try:
    cache_dir = os.path.join(os.path.abspath(checkpoint_dir), 'jax_cache')
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update('jax_compilation_cache_dir', cache_dir)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 5)
  except Exception:  # pragma: no cover - older jax or unsupported backend
    log.warning('persistent compilation cache unavailable')


def train(config: Config, checkpoint_dir, data_dir, eval_data_dir=None,
          max_steps=None):
  tc = config.train
  config.save(checkpoint_dir)
  _enable_compile_cache(checkpoint_dir)

  devices = jax.devices()
  if tc.mesh_shape:
    mesh_shape = tuple(tc.mesh_shape)
  else:
    # Default: pure DP with the largest degree that divides the batch.
    dp = len(devices)
    while config.data.batch_size % dp:
      dp -= 1
    mesh_shape = (dp, 1)
  mesh = pm.make_mesh(mesh_shape, devices[:mesh_shape[0] * mesh_shape[1]])
  n_dev = mesh_shape[0] * mesh_shape[1]
  if config.data.batch_size % mesh_shape[0]:
    raise ValueError(f'batch_size {config.data.batch_size} not divisible '
                     f'by data-parallel degree {mesh_shape[0]}')

  model = make_model(config.model)
  tx = optax.adam(tc.learning_rate)

  pipeline = make_pipeline(data_dir, config.data)
  log.info('training on %d samples from %s over %d device(s) mesh=%s',
           pipeline.nsamples, data_dir, n_dev, dict(mesh.shape))

  rep = pm.replicated(mesh)
  raw_batches = pipeline.prefetching_batches(seed=tc.seed)
  peek = next(raw_batches)
  if mesh_shape[1] > 1:
    h = peek['image_input'].shape[1]
    if h % mesh_shape[1]:
      raise ValueError(
          f'full-res height {h} not divisible by spatial mesh degree '
          f'{mesh_shape[1]}')
  # Full-res images shard (batch, H) over ('data', 'spatial'); lowres
  # over 'data' only — same tree as the driver's multi-chip dryrun.
  batch_shard = pm.batch_shardings(mesh, peek)
  batches = device_prefetch(_chain_first(peek, raw_batches), batch_shard)
  first = next(batches)

  ckpt = Checkpointer(checkpoint_dir)
  if ckpt.latest_step() is not None:
    template = abstract_state(model, tx, jax.random.PRNGKey(tc.seed),
                              first['lowres_input'], first['image_input'])
    state = ckpt.restore(template)
    log.info('restored checkpoint at step %d', int(state.step))
  else:
    state = create_state(model, tx, jax.random.PRNGKey(tc.seed),
                         first['lowres_input'], first['image_input'])
  state = jax.device_put(state, rep)

  train_step = jax.jit(make_train_step(model, tx),
                       in_shardings=(rep, batch_shard),
                       out_shardings=(rep, rep),
                       donate_argnums=(0,))
  eval_step = jax.jit(make_eval_step(model))

  eval_pipeline = None
  if eval_data_dir:
    eval_cfg = Config.from_json(config.to_json()).data
    eval_cfg.batch_size = 1
    eval_cfg.shuffle = False
    eval_cfg.random_crop = False
    eval_cfg.fliplr = eval_cfg.flipud = eval_cfg.rotate = False
    eval_pipeline = make_pipeline(eval_data_dir, eval_cfg)

  summaries = SummaryWriter(checkpoint_dir)
  last_log = last_summary = last_eval = time.time()
  m = {}
  step_no = int(state.step)
  limit = max_steps if max_steps is not None else tc.max_steps

  def run_eval(step_no):
    it = eval_pipeline.batches(seed=0)
    psnrs = []
    for _ in range(eval_pipeline.nsamples):
      em = eval_step(state, next(it))
      psnrs.append(float(em['psnr']))
    p = float(np.mean(psnrs))
    summaries.write(step_no, eval_psnr=p)
    log.info('  Evaluation PSNR = %.1f dB (%d images)', p, len(psnrs))
    return p

  profiling = False
  try:
    for batch in batches:
      if limit is not None and step_no >= limit:
        break
      if tc.profile_dir and step_no == 10 and not profiling:
        jax.profiler.start_trace(tc.profile_dir)
        profiling = True
      state, m = train_step(state, batch)
      step_no += 1
      if profiling and step_no >= 15:
        jax.block_until_ready(m)
        jax.profiler.stop_trace()
        profiling = False
        log.info('wrote profiler trace to %s', tc.profile_dir)

      now = time.time()
      if now - last_log >= tc.log_interval:
        jax.block_until_ready(m)
        log.info('Step %d | loss = %.4f | psnr = %.1f dB', step_no,
                 float(m['ema_loss']), float(m['ema_psnr']))
        last_log = now
      if now - last_summary >= tc.summary_interval:
        summaries.write(step_no, loss=m['ema_loss'], psnr=m['ema_psnr'],
                        learning_rate=tc.learning_rate,
                        batch_size=config.data.batch_size)
        last_summary = now
      ckpt.maybe_save(step_no, state, tc.checkpoint_interval)
      if eval_pipeline and now - last_eval >= tc.eval_interval:
        run_eval(step_no)
        last_eval = now
  except KeyboardInterrupt:
    log.info('interrupted')
  finally:
    if profiling:
      jax.profiler.stop_trace()
    log.info('training done at step %d, saving final checkpoint', step_no)
    ckpt.save(step_no, state, force=True)
    ckpt.wait()
  if m:
    jax.block_until_ready(m)
    summaries.write(step_no, loss=m['ema_loss'], psnr=m['ema_psnr'])
  return state
