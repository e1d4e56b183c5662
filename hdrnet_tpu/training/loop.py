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
  compile per shape; cache hits make restarts/resumes instant. Set
  HDRNET_TPU_CACHE_DIR to share one cache across runs (e.g. a queue of
  experiments at the same geometry)."""
  try:
    cache_dir = os.environ.get('HDRNET_TPU_CACHE_DIR') or os.path.join(
        os.path.abspath(checkpoint_dir), 'jax_cache')
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update('jax_compilation_cache_dir', cache_dir)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 5)
  except Exception:  # pragma: no cover - older jax or unsupported backend
    log.warning('persistent compilation cache unavailable')


def _make_schedule(tc):
  """None for the reference's constant lr, else an optax schedule.

  Kept None (plain float lr) in the constant case so the optimizer
  state tree stays identical to round-1 checkpoints (a schedule adds a
  ScaleByScheduleState count that older checkpoints don't carry).
  """
  if tc.lr_schedule == 'constant':
    return None
  if tc.lr_schedule != 'cosine':
    raise ValueError(f'unknown lr_schedule {tc.lr_schedule!r}')
  decay = tc.lr_decay_steps or tc.max_steps
  if not decay:
    raise ValueError("lr_schedule='cosine' needs lr_decay_steps or "
                     'max_steps')
  if tc.lr_warmup_steps:
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0, peak_value=tc.learning_rate,
        warmup_steps=tc.lr_warmup_steps, decay_steps=decay,
        end_value=tc.lr_end)
  return optax.cosine_decay_schedule(
      tc.learning_rate, decay, alpha=tc.lr_end / tc.learning_rate)


def make_tx(tc):
  """The optimizer a TrainConfig describes. Restore templates must use
  this (not a bare optax.adam): a cosine-schedule checkpoint carries a
  ScaleByScheduleState count, and guide_lr_scale != 1 a multi_transform
  tree, that a plain adam template lacks."""
  schedule = _make_schedule(tc)
  lr = tc.learning_rate if schedule is None else schedule
  base = optax.adam(lr)
  if tc.guide_lr_scale == 1.0:
    return base
  guide_tx = optax.chain(optax.adam(lr), optax.scale(tc.guide_lr_scale))

  def labels(params):
    # Top-level Flax modules: 'guide' / 'guide_level_{i}' vs the rest.
    return {k: 'guide' if str(k).startswith('guide') else 'rest'
            for k in params}

  return optax.multi_transform({'guide': guide_tx, 'rest': base}, labels)


def _try_device_dataset(pipeline, data_cfg, sharding=None):
  """(DeviceDataset, augment_fn) when the dataset qualifies for device
  residency (data/device.py), else (None, None) with a logged reason.

  `sharding` places the resident arrays at upload time. On a multi-
  device mesh this MUST be the step's expected sharding (replicated):
  uncommitted single-device arrays would otherwise be re-resharded from
  device 0 on every jitted step — for the whole resident dataset."""
  from hdrnet_tpu.data.device import (DeviceDataset, load_pairs,
                                      load_st_dataset, load_usm_dataset,
                                      make_device_augment)
  from hdrnet_tpu.data.pipeline import (ImageFilesDataPipeline,
                                        StyleTransferDataPipeline,
                                        UnsharpMaskDataPipeline)
  try:
    if type(pipeline) is ImageFilesDataPipeline:
      dds = DeviceDataset(load_pairs(pipeline), data_cfg,
                          sharding=sharding)
    elif type(pipeline) is UnsharpMaskDataPipeline:
      # Synthetic-target pipeline: raw inputs resident, uint8 targets
      # synthesized on device once at upload (data/device.py
      # load_usm_dataset) — the host path re-blurs every sample every
      # epoch, ~1 s/image on a 1-core box.
      dds = load_usm_dataset(pipeline, data_cfg, sharding=sharding)
    elif type(pipeline) is StyleTransferDataPipeline:
      # 6-channel (photo + style exemplar) residency; the exemplar is
      # resized/requantized once at upload (data/device.py).
      dds = load_st_dataset(pipeline, data_cfg, sharding=sharding)
    else:
      log.warning('device_data: %s has no device-resident loader; using '
                  'the host pipeline', type(pipeline).__name__)
      return None, None
    augment = make_device_augment(data_cfg.output_resolution,
                                  data_cfg.net_input_size,
                                  data_cfg.rotate)
    return dds, augment
  except ValueError as e:
    log.warning('device_data unavailable (%s); using the host pipeline',
                e)
    return None, None


def augment_batch(augment, ins, outs, params):
  """Gather + on-device augment for one param-dict batch."""
  return augment(ins[params['idx']], outs[params['idx']], params)


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
  schedule = _make_schedule(tc)
  tx = make_tx(tc)

  pipeline = make_pipeline(data_dir, config.data)
  log.info('training on %d samples from %s over %d device(s) mesh=%s',
           pipeline.nsamples, data_dir, n_dev, dict(mesh.shape))

  import jax.numpy as jnp
  rep = pm.replicated(mesh)
  bs = config.data.batch_size
  dds = None
  if config.data.device_data:
    if mesh_shape[1] > 1 and config.data.output_resolution[0] % mesh_shape[1]:
      raise ValueError(
          f'full-res height {config.data.output_resolution[0]} not '
          f'divisible by spatial mesh degree {mesh_shape[1]}')
    dds, augment = _try_device_dataset(pipeline, config.data, sharding=rep)

  if dds is not None:
    # Device-resident dataset: batches are tiny param dicts; the jitted
    # step gathers + augments + normalizes on device (data/device.py).
    batches = dds.param_stream(tc.seed, bs)
    oh, ow = config.data.output_resolution
    s = config.data.net_input_size
    n_in = config.model.n_in
    low_shape = (bs, s, s, n_in)
    full_shape = (bs, oh, ow, n_in)
    batch_shard = pm.batch_shardings(mesh, {
        'lowres_input': np.zeros(low_shape, np.float32),
        'lowres_output': np.zeros(low_shape, np.float32),
        'image_input': np.zeros(full_shape, np.float32),
        'image_output': np.zeros(full_shape, np.float32),
    })
    base_step = make_train_step(model, tx, guide_reg=tc.guide_reg,
                                guide_reg_target=tc.guide_reg_target)

    def dd_step(state, ins, outs, params):
      gathered = augment_batch(augment, ins, outs, params)
      batch = {k: jax.lax.with_sharding_constraint(v, batch_shard[k])
               for k, v in gathered.items()}
      return base_step(state, batch)

    _jit_step = jax.jit(dd_step, in_shardings=(rep, rep, rep, rep),
                        out_shardings=(rep, rep), donate_argnums=(0,))

    def train_step(state, params):
      return _jit_step(state, dds.inputs, dds.outputs, params)
  else:
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
    low_shape = peek['lowres_input'].shape
    full_shape = peek['image_input'].shape
    train_step = jax.jit(make_train_step(model, tx, guide_reg=tc.guide_reg,
                                         guide_reg_target=tc.guide_reg_target),
                         in_shardings=(rep, batch_shard),
                         out_shardings=(rep, rep),
                         donate_argnums=(0,))

  ckpt = Checkpointer(checkpoint_dir)
  # Init inputs are f32 zeros of the batch shapes: with the
  # device-normalize/device-data pipelines the batch itself is
  # uint8/uint16 (the jitted step converts on-chip), but model.init
  # sees floats.
  init_low = jnp.zeros(low_shape, jnp.float32)
  init_full = jnp.zeros(full_shape, jnp.float32)
  if ckpt.latest_step() is not None:
    template = abstract_state(model, tx, jax.random.PRNGKey(tc.seed),
                              init_low, init_full)
    state = ckpt.restore(template)
    log.info('restored checkpoint at step %d', int(state.step))
  else:
    state = create_state(model, tx, jax.random.PRNGKey(tc.seed),
                         init_low, init_full)
  state = jax.device_put(state, rep)

  eval_call = eval_nsamples = eval_batches = None
  if eval_data_dir:
    eval_cfg = Config.from_json(config.to_json()).data
    eval_cfg.batch_size = 1
    eval_cfg.shuffle = False
    eval_cfg.random_crop = False
    eval_cfg.fliplr = eval_cfg.flipud = eval_cfg.rotate = False
    eval_pipeline = make_pipeline(eval_data_dir, eval_cfg)
    eval_dds = None
    if eval_cfg.device_data:
      eval_dds, eval_augment = _try_device_dataset(eval_pipeline, eval_cfg,
                                                   sharding=rep)
    if eval_dds is not None:
      base_eval = make_eval_step(model)

      def dd_eval(state, ins, outs, params):
        return base_eval(state, augment_batch(eval_augment, ins, outs,
                                              params))
      _jit_eval = jax.jit(dd_eval)
      eval_call = lambda state, p: _jit_eval(state, eval_dds.inputs,
                                             eval_dds.outputs, p)
      eval_nsamples = eval_dds.nsamples
      eval_batches = lambda: eval_dds.param_stream(0, 1)
    else:
      eval_call = jax.jit(make_eval_step(model))
      eval_nsamples = eval_pipeline.nsamples
      eval_batches = lambda: eval_pipeline.batches(seed=0)

  summaries = SummaryWriter(checkpoint_dir)
  last_log = last_summary = last_eval = time.time()
  m = {}
  step_no = int(state.step)
  limit = max_steps if max_steps is not None else tc.max_steps

  def run_eval(step_no):
    it = eval_batches()
    psnrs = []
    for _ in range(eval_nsamples):
      em = eval_call(state, next(it))
      psnrs.append(float(em['psnr']))
    p = float(np.mean(psnrs))
    summaries.write(step_no, eval_psnr=p)
    log.info('  Evaluation PSNR = %.1f dB (%d images)', p, len(psnrs))
    return p

  # Dispatch-runahead bound. jit dispatch returns in ~ms while a step
  # can take 100+ ms on device, so an unthrottled loop queues thousands
  # of steps ahead; the first synchronizing fetch (log/checkpoint) then
  # stalls for the whole backlog — observed as an apparent hang with
  # the pyramid model (161 ms steps, ~3 ms dispatch). Fetching one
  # scalar of the (step - K)'th metrics caps in-flight work at K steps
  # while amortizing the per-fetch sync latency (~24 ms through a
  # remote-tunnel backend) to ~1 ms/step.
  import collections
  runahead = collections.deque()
  _RUNAHEAD = 32

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
      runahead.append(m['loss'])
      if len(runahead) >= _RUNAHEAD:
        float(runahead.popleft())
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
                        learning_rate=(tc.learning_rate if schedule is None
                                       else float(schedule(step_no))),
                        batch_size=config.data.batch_size)
        last_summary = now
      ckpt.maybe_save(step_no, state, tc.checkpoint_interval)
      if eval_call and now - last_eval >= tc.eval_interval:
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
