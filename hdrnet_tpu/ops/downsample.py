"""Fast nearest-neighbor preview downsample (serving hot path).

The reference computes the 256x256 coefficient-net input with a
per-frame ``cv::resize(..., INTER_NEAREST)`` inside the measured
benchmark iteration (benchmark/src/processor.cc:110-122). The TF1
convention it trains with (data_pipeline.py:165-169) is
``src = floor(dst * in/out)`` — the same table `ops/resize.py` uses.

XLA lowers the straightforward gather/strided-slice formulations of
that subsample poorly on TPU (measured ~0.9 ms for a 4K frame — ~7x
the HBM-read roofline), so this module provides a Pallas kernel:

  * the row pattern repeats every ``span = H/gcd(H, s)`` input rows
    (``per = s/gcd`` output rows per period), so after an outside
    reshape to ``(B, C*g, span, W)`` every program sees its row
    group as a full-minor-dims slab with a *static* in-slab pattern;
  * the column subsample is a one-hot matmul on the MXU
    (``P[w, x] = 1.0`` iff column w is the nearest source of output
    column x) — exact (each output is 1.0 * source + zeros, and 1.0
    is exact in every MXU pass), overlapping the next slab's DMA.

Operates channel-first (B, C, H, W) — the serving frame layout — and
returns (B, C, s, s). ``nearest_lowres_cf`` falls back to the XLA
gather path off-TPU or for shapes outside the kernel's envelope.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hdrnet_tpu.ops.resize import _nearest_indices

# Per-program VMEM budget for the input slabs + one-hot (f32 bytes).
_VMEM_BUDGET = 8 * 2 ** 20


def _plan(h, w, s, b=1, itemsize=4):
  """(g, span, per, q) or None. q = row groups per program.

  The batch dim is folded into every program's block (the one-hot
  contraction's M dimension becomes b*q*per — at b=4 serving shapes
  that fills the MXU's 128 rows instead of running 32-row dots and
  re-iterating the grid per frame, the round-4 batch-regression fix),
  so the plan budgets b slabs per program."""
  g = int(np.gcd(h, s))
  span, per = h // g, s // g
  slab = b * span * w * itemsize
  onehot = w * s * 2  # stored bf16 (exact for one-hot weights)
  if onehot > _VMEM_BUDGET // 2:
    return None
  # Batch q groups per program: enough to amortize grid overhead,
  # bounded by VMEM and by dividing the 3*g group count evenly.
  budget = max(1, (_VMEM_BUDGET - onehot) // max(slab, 1))
  q = int(min(budget, 3 * g))
  while (3 * g) % q:
    q -= 1
  # Hard VMEM cap (double-buffered by the pipeline): large-batch f32
  # frames fall back to the XLA path rather than overcommitting VMEM.
  if slab * q + onehot > 6 * _VMEM_BUDGET:
    return None
  return g, span, per, q


def pallas_feasible(h, w, s, b=1, itemsize=4):
  return _plan(h, w, s, b, itemsize) is not None


def _make_kernel(b, per, q, offsets, white):
  u8 = white is not None

  # px arrives bf16 from the host (one-hot weights are exact in bf16,
  # so the dot operands — and results — are bit-identical to an
  # in-kernel f32->bf16 cast). Converting in-kernel cost a full
  # (W, s) VPU conversion pass per dot per PROGRAM (3 dots x 24
  # programs at 4K f32 = ~70M element converts/frame) — measured as a
  # large share of the kernel's time (results/exp_downsample_batch.txt).
  def dot(a_bf16, px_ref):
    return jax.lax.dot_general(
        a_bf16, px_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

  def kern(img_ref, px_ref, out_ref):
    rows = []
    for bb in range(b):
      for qq in range(q):
        for j in offsets:
          rows.append(img_ref[bb, qq, int(j), :])
    sel = jnp.stack(rows, axis=0)  # (b*q*per, W)
    if u8:
      # uint8 values are integers <= 255 — exactly representable in
      # bf16, so a single DEFAULT-precision MXU pass is exact; the
      # normalize happens after the selection (commutes exactly).
      # (Mosaic has no direct u8->float cast; u8 -> i32 -> f32 -> bf16
      # are all natively lowered and exact for integers <= 255.)
      res = dot(sel.astype(jnp.int32).astype(jnp.float32)
                .astype(jnp.bfloat16), px_ref)
    else:
      # One-hot x f32, bit-exact on the MXU: Mosaic only lowers
      # DEFAULT-precision (single-pass bf16) dots, so split the f32
      # operand into three bf16-exact parts (8 mantissa bits each
      # covers f32's 24) and select each part separately — the one-hot
      # weight is 1.0, so hi+mid+lo reassembles x exactly. This is the
      # HIGH-precision algorithm written in supported ops.
      x = sel.astype(jnp.float32)
      hi = x.astype(jnp.bfloat16)
      rem = x - hi.astype(jnp.float32)
      mid = rem.astype(jnp.bfloat16)
      lo = (rem - mid.astype(jnp.float32)).astype(jnp.bfloat16)
      res = dot(hi, px_ref) + dot(mid, px_ref) + dot(lo, px_ref)
    if u8:
      res = res / white
    for bb in range(b):
      for qq in range(q):
        base = (bb * q + qq) * per
        out_ref[bb, qq] = res[base:base + per, :]
  return kern


@functools.lru_cache(maxsize=None)
def _col_onehot(w, s):
  ix = _nearest_indices(w, s)
  p = np.zeros((w, s), np.float32)
  p[ix, np.arange(s)] = 1.0
  return p


# ---------------------------------------------------------------------------
# Row-gather variant: DMA only the s needed source rows.
#
# The slab kernel above streams the FULL frame HBM->VMEM (95 MB for a
# 4K f32 frame) although a nearest 4K->256 preview reads only 256 of
# 2160 rows (~12 MB).  This variant keeps the frame in HBM (`ANY`),
# prefetches the static source-row table into SMEM, and per program
# issues one strided async copy per needed row — a (C, 1, W) slice, so
# a single DMA fetches the row for every channel — into a VMEM scratch
# that then feeds the same exact one-hot column contraction.
#
# MEASURED INFEASIBLE on real v5e Mosaic (round 3,
# results/exp_downsample_r3.txt): a dynamic single-row slice of an
# (8,128)-tiled f32 HBM memref is rejected at compile time — "Slice
# shape along dimension 2 must be aligned to tiling (8), but is 1" —
# and widening each copy to the 8-row aligned block containing the row
# would DMA 256*8 rows ~= the whole frame, erasing the point of the
# variant.  The kernel is kept for interpret-mode CI coverage and for
# a future libtpu that supports sub-tile row DMA; production serving
# uses the slab kernel (validated bit-exact vs the XLA table path —
# f32 0.00e+00, u8 1.19e-07 — and vs the full serving pipeline,
# results/exp_downsample_r4.txt).
# ---------------------------------------------------------------------------

_GATHER_VMEM = 12 * 2 ** 20


def _gather_plan(b, c, h, w, s):
  """Rows-per-program K, or None if outside the kernel envelope."""
  if h <= s or w < s:
    return None
  k = min(64, s)
  while k > 1 and s % k:
    k -= 1
  if k < 8:
    return None
  scratch = c * k * w * 4
  onehot = w * s * 2  # stored bf16
  if scratch + onehot + c * k * s * 4 > _GATHER_VMEM:
    return None
  return k


def _make_gather_kernel(c, k, white):
  u8 = white is not None

  # px arrives bf16 (see the slab kernel note).
  def dot(a_bf16, px_ref):
    return jax.lax.dot_general(
        a_bf16, px_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

  def kern(iy_ref, img_ref, px_ref, out_ref, scr_ref, sem):
    bi = pl.program_id(0)
    kb = pl.program_id(1)
    dmas = []
    for t in range(k):
      src = iy_ref[kb * k + t]
      dma = pltpu.make_async_copy(
          img_ref.at[bi, :, pl.ds(src, 1), :],
          scr_ref.at[:, pl.ds(t, 1), :],
          sem.at[t])
      dma.start()
      dmas.append(dma)
    for dma in dmas:
      dma.wait()
    for cc in range(c):
      sel = scr_ref[cc]  # (k, w)
      if u8:
        res = dot(sel.astype(jnp.int32).astype(jnp.float32)
                  .astype(jnp.bfloat16), px_ref) / white
      else:
        # f32-exact 3-way bf16 split (see the slab kernel above).
        x = sel.astype(jnp.float32)
        hi = x.astype(jnp.bfloat16)
        rem = x - hi.astype(jnp.float32)
        mid = rem.astype(jnp.bfloat16)
        lo = (rem - mid.astype(jnp.float32)).astype(jnp.bfloat16)
        res = dot(hi, px_ref) + dot(mid, px_ref) + dot(lo, px_ref)
      out_ref[0, cc] = res
  return kern


def _gather_lowres(image_cf, s, k, white, interpret):
  b, c, h, w = image_cf.shape
  iy = jnp.asarray(_nearest_indices(h, s), jnp.int32)
  px = jnp.asarray(_col_onehot(w, s), jnp.bfloat16)
  kern = _make_gather_kernel(c, k, white)
  grid_spec = pltpu.PrefetchScalarGridSpec(
      num_scalar_prefetch=1,
      grid=(b, s // k),
      in_specs=[
          pl.BlockSpec(memory_space=pltpu.ANY),
          pl.BlockSpec((w, s), lambda bi, kb, iy_ref: (0, 0),
                       memory_space=pltpu.VMEM),
      ],
      out_specs=pl.BlockSpec((1, c, k, s),
                             lambda bi, kb, iy_ref: (bi, 0, kb, 0),
                             memory_space=pltpu.VMEM),
      scratch_shapes=[
          pltpu.VMEM((c, k, w), image_cf.dtype),
          pltpu.SemaphoreType.DMA((k,)),
      ],
  )
  out = pl.pallas_call(
      kern,
      grid_spec=grid_spec,
      out_shape=jax.ShapeDtypeStruct((b, c, s, s), jnp.float32),
      interpret=interpret,
  )(iy, image_cf, px)
  return out


def nearest_lowres_cf(image_cf, s, interpret=False, variant=None):
  """(B, C, H, W) float32 or uint8 -> (B, C, s, s) float32 preview.

  Bit-exact to resize_nearest (ops/resize.py) on the same frame; a
  uint8 frame is normalized in-kernel (x/255, exactly matching
  normalize-then-downsample, since one-hot selection commutes with the
  scalar multiply) so the full-res frame never exists in f32.

  `variant` forces a path for benchmarking: 'gather' (row-DMA kernel),
  'slab' (full-frame streaming kernel), 'xla' (double take). Default is
  'slab' (env-overridable via HDRNET_TPU_DS_VARIANT): the gather
  variant currently fails Mosaic compilation on real v5e (sub-tile row
  DMA rejected, see the gather-kernel comment above) and is kept for
  interpret-mode coverage only.
  """
  b, c, h, w = image_cf.shape
  u8 = image_cf.dtype == jnp.uint8
  white = 255.0 if u8 else None
  if (h, w) == (s, s):
    return image_cf.astype(jnp.float32) / white if u8 else image_cf
  on_tpu = jax.default_backend() == 'tpu' or interpret
  if variant is None:
    # Default 'slab' until the gather kernel is revalidated on real
    # hardware after any change (flip via env or here once measured).
    variant = os.environ.get('HDRNET_TPU_DS_VARIANT', 'slab')
  if variant != 'xla' and on_tpu:
    k = _gather_plan(b, c, h, w, s)
    if k is not None and variant in (None, 'gather'):
      return _gather_lowres(image_cf, s, k, white, interpret)
    if variant == 'gather':
      raise ValueError(f'gather downsample infeasible for {image_cf.shape}')
  plan = _plan(h, w, s, b, image_cf.dtype.itemsize) if c == 3 else None
  if plan is None or not on_tpu or variant == 'xla':
    iy = jnp.asarray(_nearest_indices(h, s))
    ix = jnp.asarray(_nearest_indices(w, s))
    out = jnp.take(jnp.take(image_cf, iy, axis=2), ix, axis=3)
    return out.astype(jnp.float32) / white if u8 else out

  g, span, per, q = plan
  iy = _nearest_indices(h, s)
  offsets = tuple(int(v) for v in iy[:per])  # group-local row pattern
  px = jnp.asarray(_col_onehot(w, s), jnp.bfloat16)

  slabs = image_cf.reshape(b, c * g, span, w)
  kern = _make_kernel(b, per, q, offsets, white)
  # One batch-free grid: each program contracts the same row group of
  # EVERY frame in one MXU pass (M = b*q*per), so per-frame downsample
  # cost amortizes with batch instead of re-running the b=1 grid.
  out = pl.pallas_call(
      kern,
      grid=((c * g) // q,),
      in_specs=[
          pl.BlockSpec((b, q, span, w), lambda k: (0, k, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((w, s), lambda k: (0, 0),
                       memory_space=pltpu.VMEM),
      ],
      out_specs=pl.BlockSpec((b, q, per, s), lambda k: (0, k, 0, 0),
                             memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((b, c * g, per, s), jnp.float32),
      interpret=interpret,
  )(slabs, px)
  return out.reshape(b, c, s, s)
