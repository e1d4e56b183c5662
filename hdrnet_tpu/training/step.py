"""Train state + jittable train/eval steps.

Replaces the reference's TF1 Supervisor training graph
(bin/train.py:89-125): Adam on an l2 loss with batch-norm running-stat
updates folded into the step (the reference's UPDATE_OPS control
dependency, bin/train.py:110-115) and EMA(0.99)-smoothed loss/psnr for
display (bin/train.py:118-122).

Steps are pure functions of (state, batch) — jit/pjit them with whatever
shardings the caller picks (see hdrnet_tpu.parallel.mesh).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax
import jax
import jax.numpy as jnp
import optax

from hdrnet_tpu.training import metrics


@flax.struct.dataclass
class TrainState:
  step: jnp.ndarray
  params: Any
  opt_state: Any
  batch_stats: Any          # {} for models without BN
  ema_loss: jnp.ndarray     # EMA(0.99) display metrics
  ema_psnr: jnp.ndarray


def create_state(model, tx, rng, lowres, fullres):
  variables = model.init(rng, lowres, fullres, train=True)
  params = variables['params']
  return TrainState(
      step=jnp.zeros((), jnp.int32),
      params=params,
      opt_state=tx.init(params),
      batch_stats=variables.get('batch_stats', {}),
      ema_loss=jnp.zeros(()),
      ema_psnr=jnp.zeros(()),
  )


def abstract_state(model, tx, rng, lowres, fullres):
  """ShapeDtypeStruct tree of `create_state`'s result, computed without
  compiling or running anything (jax.eval_shape). Used as the restore
  template when a checkpoint exists — skips the model.init compile,
  which costs ~a minute through a remote-tunnel backend."""
  return jax.eval_shape(
      lambda r, lo, fu: create_state(model, tx, r, lo, fu),
      rng, lowres, fullres)


def normalize_batch(batch):
  """Device-side [0, 1] normalization of raw-dtype batches.

  The device-normalize pipeline ships samples in their storage dtype
  (uint8/uint16 — 4x/2x less host memcpy + host->device transfer than
  f32) and the jitted step divides by the dtype white level on-chip,
  matching imread_float's convention (utils/image.py). Float batches
  pass through untouched.
  """
  def norm(x):
    if x.dtype == jnp.uint8:
      return x.astype(jnp.float32) * (1.0 / 255.0)
    if x.dtype == jnp.uint16:
      return x.astype(jnp.float32) * (1.0 / 65535.0)
    return x
  return jax.tree_util.tree_map(norm, batch)


def make_train_step(model, tx, ema_decay=0.99, guide_reg=0.0,
                    guide_reg_target=0.2):
  """Returns step(state, batch) -> (state, metrics_dict).

  batch keys: lowres_input, lowres_output (unused by the loss — parity
  note: the reference also trains only on the full-res target,
  bin/train.py:95), image_input, image_output. Integer-dtype batches
  are normalized on device (see normalize_batch).

  guide_reg > 0 adds a guide-range regularizer: a smooth hinge on the
  per-image pixel std of every sown 'guide_map' intermediate (one for
  the plain models, one per pyramid level for GaussianPyrNN), pushing
  back on the diagnosed collapse-to-one-luma-bin local optimum
  (results/QUALITY.md). Off by default = reference loss exactly.
  """

  def loss_fn(params, batch_stats, batch):
    variables = {'params': params}
    mutable = []
    if batch_stats:
      variables['batch_stats'] = batch_stats
      mutable.append('batch_stats')
    if guide_reg > 0.0:
      mutable.append('intermediates')
    if mutable:
      out, updates = model.apply(variables, batch['lowres_input'],
                                 batch['image_input'], train=True,
                                 mutable=mutable)
      new_stats = updates.get('batch_stats', batch_stats)
    else:
      out = model.apply(variables, batch['lowres_input'],
                        batch['image_input'], train=True)
      new_stats = batch_stats
    loss = metrics.l2_loss(batch['image_output'], out)
    if guide_reg > 0.0:
      gmaps = updates['intermediates']['guide_map']
      hinge = [
          jnp.mean(jax.nn.relu(
              guide_reg_target - g.std(axis=tuple(range(1, g.ndim)))) ** 2)
          for g in gmaps]
      loss = loss + guide_reg * sum(hinge) / len(hinge)
    p = metrics.psnr(batch['image_output'], out)
    return loss, (p, new_stats)

  def step(state, batch):
    batch = normalize_batch(batch)
    (loss, (p, new_stats)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(state.params, state.batch_stats, batch)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    d = ema_decay
    warm = state.step > 0
    ema_loss = jnp.where(warm, d * state.ema_loss + (1 - d) * loss, loss)
    ema_psnr = jnp.where(warm, d * state.ema_psnr + (1 - d) * p, p)
    new_state = TrainState(step=state.step + 1, params=params,
                           opt_state=opt_state, batch_stats=new_stats,
                           ema_loss=ema_loss, ema_psnr=ema_psnr)
    return new_state, {'loss': loss, 'psnr': p,
                       'ema_loss': ema_loss, 'ema_psnr': ema_psnr}

  return step


def make_eval_step(model):
  def step(state, batch):
    batch = normalize_batch(batch)
    variables = {'params': state.params}
    if state.batch_stats:
      variables['batch_stats'] = state.batch_stats
    out = model.apply(variables, batch['lowres_input'],
                      batch['image_input'], train=False)
    return {'loss': metrics.l2_loss(batch['image_output'], out),
            'psnr': metrics.psnr(batch['image_output'], out)}
  return step
