"""Fused Pallas TPU kernels for bilateral slice-apply.

TPU-native design (NOT a CUDA translation — the reference kernels
ops/bilateral_slice_apply.cu.cc:36-364 use per-thread scalar gathers,
which do not exist on the TPU VPU):

  * The image is tiled over a (batch, h-tiles, w-tiles) Pallas grid; all
    per-pixel math is dense (8, 128)-lane vector arithmetic.
  * Per-pixel trilinear gathers are replaced by a *branch-free one-hot
    contraction*: each tile touches a small static window of grid cells
    (NCY x NCX spatial cells x all gd depth bins, precomputed on the
    host), and each cell's contribution is weighted by
    ``tap_weight * (tap_index == cell_index)``. Out-of-range taps clamp
    by construction (weights evaluated at unclamped positions, matched
    against the unclamped cell id for x/y and the clamped tap id for z),
    reproducing exactly the clamped 8-corner semantics of the reference
    forward (ops/bilateral_slice_apply.cc:40-81).
  * The per-tile grid-cell window (tiny: <= 6*6*gd*C floats) is gathered
    on the host side of the pallas_call by XLA and streamed per tile, so
    every in-kernel grid read is a static-index scalar load.
  * Full-res tensors are laid out channel-first (B, C, H, W) inside the
    kernel so every channel plane is a (TH, TW) = (sublane, lane) tile.

Backward:
  * guide + input cotangents: one fused pixelwise kernel (same tiling),
    semantics of ops/bilateral_slice_apply.cc:140-259.
  * grid cotangent: a Pallas splat kernel (`_grid_bwd_kernel`) — per
    tile, separable weighted reductions accumulated into a
    VMEM-resident grid block, with mirror padding and the z-extreme
    overrides (ops/bilateral_slice_apply.cc:84-138); the XLA einsum
    oracle formulation remains as the fallback for shapes the tile
    planner rejects.

Numerics are f32 end-to-end; conformance vs the oracle is gated at
<= 1e-5 in tests/test_pallas_ops.py.
"""

from __future__ import annotations

import dataclasses
import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hdrnet_tpu.numerics import EPS
from hdrnet_tpu.ops import reference as ref

# Hard caps on the per-tile spatial cell window; shapes that exceed them
# (image barely larger than the grid) fall back to the XLA reference
# implementation. Asymmetric on purpose: the kernel's expensive plane
# FMAs scale with the Y window (one contraction pass per y-cell), while
# the X window only sizes the cheap per-row x-interpolation, so a wider
# X window is nearly free. X=24 admits a full 17-cell window (16-cell
# grid + the +1 tap) at ANY extent — the 128-lane minimum tile then
# covers even the ~128px coarsest Gaussian-pyramid levels, which
# previously fell back to the composite path.
_MAX_CELLS_Y = 8
_MAX_CELLS_X = 24


def _max_cells(lane_dim):
  return _MAX_CELLS_X if lane_dim else _MAX_CELLS_Y

def _round_up(x, m):
  return -(-x // m) * m


@dataclasses.dataclass(frozen=True)
class _AxisPlan:
  tile: int          # pixels per tile along this axis
  n_tiles: int
  n_cells: int       # grid-cell window per tile
  starts: np.ndarray  # (n_tiles,) int32: first cell index (may be < 0)


def _plan_axis(extent, n_cells_total, tile):
  """Tile one spatial axis and bound the per-tile grid-cell window.

  The window [starts[t], starts[t] + n_cells) covers every (unclamped)
  tap index floor(gf - 0.5) and +1 for pixels in tile t, where
  gf = (pix + 0.5) * n_cells_total / extent.
  """
  n_tiles = _round_up(extent, tile) // tile
  scale = n_cells_total / extent
  t = np.arange(n_tiles)
  first = t * tile
  last = np.minimum(first + tile, extent) - 1
  lo = np.floor((first + 0.5) * scale - 0.5).astype(np.int64)
  hi = np.floor((last + 0.5) * scale - 0.5).astype(np.int64) + 1
  n_cells = int((hi - lo).max()) + 1
  return _AxisPlan(tile, n_tiles, n_cells, lo.astype(np.int32))


# Experimental override: (tile_y, tile_x) forced tile sizes, or None.
_TILE_OVERRIDE = None


def _choose_tile(extent, n_cells_total, lane_dim, wide_pref=False):
  """Pick a tile size: hardware-aligned, window within the per-axis
  cap, and a small window preferred (the inner loops scale with NCY)."""
  if _TILE_OVERRIDE is not None:
    forced = _TILE_OVERRIDE[1 if lane_dim else 0]
    return _plan_axis(extent, n_cells_total, forced)
  if lane_dim:
    candidates = [512, 256, 128] if extent > 1536 else [256, 128]
  else:
    candidates = [256, 128, 64, 32, 16, 8]
  plans = [p for p in (_plan_axis(extent, n_cells_total, t)
                       for t in candidates)
           if p.n_cells <= _max_cells(lane_dim)]
  if not plans:
    return None
  min_cells = min(p.n_cells for p in plans)
  if lane_dim and wide_pref:
    # Serving forward: the x window only sizes the cheap per-column
    # interpolation, while wider lane tiles mean fewer tiles and better
    # pipelining — treat windows within +1 of minimal as ties and take
    # the widest tile (measured at 4K: (128,256)/nc4 beats
    # (128,128)/nc3 by ~9%). Training kernels keep the narrow plan:
    # their backward variants carry 2x the register pressure.
    plans = [p for p in plans if p.n_cells <= min_cells + 1]
    return max(plans, key=lambda p: p.tile)
  # Smallest window wins; ties toward bigger tiles (candidate order).
  return next(p for p in plans if p.n_cells == min_cells)


# Conservative per-tile VMEM budget: ~24 live f32 planes (accumulators,
# depth one-hots, in/out double buffering). Tiles above this OOM the
# 16MB VMEM (observed at (256, 512)).
_MAX_TILE_PIXELS = 128 * 1024


def plan_tiles(h, w, gh, gw, wide_pref=False):
  """Returns (y_plan, x_plan) or None if the pallas path is infeasible."""
  yp = _choose_tile(h, gh, lane_dim=False)
  xp = _choose_tile(w, gw, lane_dim=True, wide_pref=wide_pref)
  if yp is None or xp is None:
    return None
  if yp.tile * xp.tile > _MAX_TILE_PIXELS:
    smaller = _plan_axis(h, gh, max(8, _MAX_TILE_PIXELS // xp.tile))
    if smaller.n_cells <= _MAX_CELLS_Y:
      yp = smaller
    else:
      return None
  return yp, xp


def feasible(h, w, gh, gw):
  return plan_tiles(h, w, gh, gw) is not None


@dataclasses.dataclass(frozen=True)
class _Cfg:
  """Static kernel configuration (hashable; closed over by the kernel)."""
  th: int
  tw: int
  ncy: int
  ncx: int
  gh: int
  gw: int
  gd: int
  n_out: int
  n_in: int
  has_offset: bool
  sy: float  # gh / logical H
  sx: float  # gw / logical W
  # In-kernel guide computation (inference fast path): 'external' uses a
  # guide input; 'curves'/'nn' compute the guide from the image tile +
  # tiny parameter arrays — the TPU analog of the reference's in-shader
  # guide (benchmark/assets/std.frag:32-53).
  guide_mode: str = 'external'
  n_pts: int = 16          # curve knots (models.py:146)
  guide_complexity: int = 16  # NN guide hidden width (models.py:204)
  # Clamp outputs to [0, 1] in the epilogue (serving). Free here; as a
  # separate XLA op it costs a full-image read+write pass (~0.25 ms at
  # 4K). The GL path clamps in-shader the same way (std.frag:52).
  clip_output: bool = False
  # Depth-contraction strategy ('unroll' | 'loop'); see default_z_strategy.
  z_strategy: str = 'unroll'
  # Curves-guide evaluation ('relu' | 'maxfma'); see _CURVES_IMPLS.
  curves_impl: str = 'relu'
  # Row-strip inner loop (0 = off): the kernel fori_loops over
  # `strip`-row horizontal strips of the tile, with the x-contraction
  # rows hoisted to tile level. Working set per strip is a handful of
  # vregs, so operands stay register-resident instead of sweeping
  # full-tile planes through VMEM between ops; the loop body also
  # compiles once instead of TH/8 times.
  strip: int = 0
  # Bucketed dynamic-size serving: the physical arrays are padded to a
  # static bucket shape, while the TRUE logical (H, W) arrives as traced
  # scalars in off_ref[2:4] and the pixel->grid scale is computed
  # in-kernel. One compile serves every true size within the bucket.
  dynamic_size: bool = False
  # uint8 streaming path: dequantize the image in-kernel (x/255) and/or
  # requantize the clipped output (x*255 + 0.5) — the frame then moves
  # through HBM at 1/4 the f32 traffic, like the reference's GL path
  # keeps frames in 8-bit textures (renderer.cc:227-253).
  u8_in: bool = False
  u8_out: bool = False
  # Opt-in bf16 arithmetic for the slicing contraction (weights, rows,
  # accumulation planes); the epilogue's affine apply stays f32. bf16
  # vregs pack 2 elements/lane, doubling VPU FMA throughput where the
  # contraction is ALU-bound. Error budget: ~1e-3 relative (8-bit
  # mantissa) — outside the reference's f32 1e-4 conformance gate, but
  # below one uint8 quantum for [0,1] serving outputs; gated separately
  # in tests at 2/255. The reference's own deployment path is lower
  # precision still (RGBA16F textures + fp16 GL sampling,
  # renderer.cc:227-253).
  compute_dtype: str = 'float32'

  @property
  def ni_tot(self):
    return self.n_in + (1 if self.has_offset else 0)

  @property
  def channels(self):
    return self.n_out * self.ni_tot


def _f32(x):
  return x.astype(jnp.float32)


def _spatial_onehot_weights(tile_start, tile, scale, start_cell, n_cells,
                            shape, axis):
  """One-hot tap weights for every cell in the tile's window.

  Returns a list of `n_cells` planes of `shape` ((TH,1) or (1,TW)):
  weights[d] = w0 * (tap0 == start_cell + d) + w1 * (tap1 == start_cell + d)
  with taps/weights at unclamped positions (forward clamp semantics come
  from the window gather clamping the *cell*, not the tap).
  """
  pix = jax.lax.broadcasted_iota(jnp.int32, shape, axis)
  gf = (_f32(pix) + (_f32(tile_start) + 0.5)) * scale
  tap0 = jnp.floor(gf - 0.5)
  w0 = jnp.maximum(1.0 - jnp.abs(tap0 + 0.5 - gf), 0.0)
  w1 = jnp.maximum(1.0 - jnp.abs(tap0 + 1.5 - gf), 0.0)
  tap0 = tap0.astype(jnp.int32)
  out = []
  for d in range(n_cells):
    cell = start_cell + d
    out.append(jnp.where(tap0 == cell, w0, 0.0) +
               jnp.where(tap0 + 1 == cell, w1, 0.0))
  return out


def _depth_onehot_weights(guide, gd, *, derivative=False):
  """One-hot depth weights (planes) for all gd bins.

  Forward: smoothed tent weights (numerics.h:108-113) at the two
  unclamped taps, accumulated into their *clamped* bin (matching
  the clamped gather of the reference forward).
  Derivative mode: gd * SmoothedLerpWeightGrad (numerics.h:116-126),
  for the guide VJP (bilateral_slice_apply.cc:183-189).
  """
  gzf = guide * gd
  tap0 = jnp.floor(gzf - 0.5)
  if derivative:
    def weight(tap):
      dx = tap + 0.5 - gzf
      sab = jnp.sqrt(dx * dx + EPS)
      return gd * jnp.where(sab > 1.0, 0.0, dx / sab)
  else:
    def weight(tap):
      dx = tap + 0.5 - gzf
      return jnp.maximum(1.0 - jnp.sqrt(dx * dx + EPS), 0.0)
  w0 = weight(tap0)
  w1 = weight(tap0 + 1.0)
  c0 = jnp.clip(tap0.astype(jnp.int32), 0, gd - 1)
  c1 = jnp.clip(tap0.astype(jnp.int32) + 1, 0, gd - 1)
  return [jnp.where(c0 == k, w0, 0.0) + jnp.where(c1 == k, w1, 0.0)
          for k in range(gd)]


def _x_rows(cfg, lg_ref, wx, da):
  """x-contraction for one y-cell: rows[k*C + c] = sum_db wx[db] * grid.

  lg_ref block layout: (1, NCY, gd*C, NCX). Returns a (gd*C, TW) array —
  the grid window x-interpolated at every pixel column, all (k, c) at
  once, via NCX broadcast-FMAs (cheap: gd*C sublanes, not TH).
  """
  rows = lg_ref[0, da, :, 0:1] * wx[0]
  for db in range(1, cfg.ncx):
    rows = rows + lg_ref[0, da, :, db:db + 1] * wx[db]
  return rows


# Depth contraction strategy, measured at b16@512 fwd+all-grads on one
# v5e: 'unroll' emits NCY*gd*C plane FMAs as straight-line code —
# fastest (best ILP) but ~144 s Mosaic compile per new shape; 'loop'
# runs a fori_loop over the gd depth bins slicing the VMEM grid block
# per bin — compiles in ~5 s (31x) at ~2x device time. Default unroll:
# training reuses one shape and the persistent compilation cache
# absorbs the one-time cost; pick loop (HDRNET_TPU_Z_STRATEGY=loop or
# the per-call z_strategy argument) for many-shape workloads like
# unbucketed variable-size inference.
_Z_STRATEGIES = ('unroll', 'loop')


def default_z_strategy():
  s = os.environ.get('HDRNET_TPU_Z_STRATEGY', 'unroll')
  if s not in _Z_STRATEGIES:
    raise ValueError(
        f'HDRNET_TPU_Z_STRATEGY={s!r}: must be one of {_Z_STRATEGIES}')
  return s


def _resolve_z_strategy(z_strategy):
  if z_strategy is None:
    return default_z_strategy()
  if z_strategy not in _Z_STRATEGIES:
    raise ValueError(
        f'z_strategy={z_strategy!r}: must be one of {_Z_STRATEGIES}')
  return z_strategy


# Accumulation-order variant for the unroll strategy, picked by
# measurement (scripts/kernel_tuning.py --variants): 'chain' = one
# serial FMA chain over the gd bins per (da, c); 'split2' = two
# half-length chains combined at the end (shorter dependence chains,
# one extra add per (da, c)).
_ACCUM_VARIANT = 'chain'


def _accumulate_sliced(cfg, lg_ref, wy, wx, guide, *, derivative=False,
                       rows_list=None):
  """Separable one-hot trilinear contraction.

    sliced[c] = sum_da wy[da] * ( sum_k wz[k] * rows_da[k*C + c] )

  Identical real-arithmetic to the direct 8-corner form; factored so the
  expensive full-plane FMAs are O(NCY * C * gd) instead of
  O(NCY * NCX * gd * C). If `derivative`, a second set of planes
  (z-derivative slicing, for the guide VJP) is accumulated sharing the
  same rows. `rows_list` optionally supplies the per-y-cell
  x-contractions precomputed at tile level (the strip loop hoists them).
  """
  if cfg.z_strategy == 'loop':
    return _accumulate_sliced_loop(cfg, lg_ref, wy, wx, guide,
                                   derivative=derivative)
  wz_list = _depth_onehot_weights(guide, cfg.gd)
  dwz_list = (_depth_onehot_weights(guide, cfg.gd, derivative=True)
              if derivative else None)
  c_n = cfg.channels
  if cfg.compute_dtype == 'bfloat16':
    assert not derivative, 'bf16 contraction is a forward-only fast path'
    dt = jnp.bfloat16
    wz_list = [w.astype(dt) for w in wz_list]
    wy = [w.astype(dt) for w in wy]
    if rows_list is not None:
      rows_list = [r.astype(dt) for r in rows_list]

  def contract(ws, rows, c):
    """sum_k ws[k] * rows[k*C + c] with the configured chain shape."""
    terms = [(ws[k], rows[k * c_n + c:k * c_n + c + 1, :])
             for k in range(cfg.gd)]
    if _ACCUM_VARIANT == 'split2':
      half = cfg.gd // 2
      def chain(ts):
        u = ts[0][0] * ts[0][1]
        for w, r in ts[1:]:
          u = u + w * r
        return u
      return chain(terms[:half]) + chain(terms[half:])
    u = terms[0][0] * terms[0][1]
    for w, r in terms[1:]:
      u = u + w * r
    return u

  acc_dt = (jnp.bfloat16 if cfg.compute_dtype == 'bfloat16'
            else jnp.float32)
  sliced = [jnp.zeros((cfg.th, cfg.tw), acc_dt) for _ in range(c_n)]
  sliced_dz = ([jnp.zeros((cfg.th, cfg.tw), jnp.float32)
                for _ in range(c_n)] if dwz_list is not None else None)
  for da in range(cfg.ncy):
    rows = (rows_list[da] if rows_list is not None
            else _x_rows(cfg, lg_ref, wx, da))
    if rows.dtype != acc_dt:
      rows = rows.astype(acc_dt)
    for c in range(c_n):
      sliced[c] = sliced[c] + wy[da] * contract(wz_list, rows, c)
      if dwz_list is not None:
        sliced_dz[c] = sliced_dz[c] + wy[da] * contract(dwz_list, rows, c)
  if acc_dt != jnp.float32:
    sliced = [s.astype(jnp.float32) for s in sliced]
  if dwz_list is not None:
    return sliced, sliced_dz
  return sliced


def _accumulate_sliced_loop(cfg, lg_ref, wy, wx, guide, *,
                            derivative=False):
  """fori_loop-over-depth variant of `_accumulate_sliced` (same math)."""
  c_n, gd = cfg.channels, cfg.gd
  gzf = guide * gd
  tap0f = jnp.floor(gzf - 0.5)
  w0 = jnp.maximum(1.0 - jnp.sqrt((tap0f + 0.5 - gzf) ** 2 + EPS), 0.0)
  w1 = jnp.maximum(1.0 - jnp.sqrt((tap0f + 1.5 - gzf) ** 2 + EPS), 0.0)
  tap0 = tap0f.astype(jnp.int32)
  c0 = jnp.clip(tap0, 0, gd - 1)
  c1 = jnp.clip(tap0 + 1, 0, gd - 1)
  if derivative:
    def dweight(tap):
      dx = tap + 0.5 - gzf
      sab = jnp.sqrt(dx * dx + EPS)
      return gd * jnp.where(sab > 1.0, 0.0, dx / sab)
    d0, d1 = dweight(tap0f), dweight(tap0f + 1.0)

  zero = jnp.zeros((cfg.th, cfg.tw), jnp.float32)
  sliced = [zero] * c_n
  sliced_dz = [zero] * c_n if derivative else None
  for da in range(cfg.ncy):

    def body(k, acc):
      u, v = acc
      # x-contraction restricted to depth bin k, sliced straight from
      # the VMEM grid block (dynamic ref slicing lowers in Mosaic;
      # dynamic_slice on a *value* does not).
      rows_k = lg_ref[0, da, pl.ds(k * c_n, c_n), 0:1] * wx[0]
      for db in range(1, cfg.ncx):
        rows_k = rows_k + lg_ref[0, da, pl.ds(k * c_n, c_n),
                                 db:db + 1] * wx[db]
      wz_k = (jnp.where(c0 == k, w0, 0.0) + jnp.where(c1 == k, w1, 0.0))
      u = tuple(u[c] + wz_k * rows_k[c:c + 1, :] for c in range(c_n))
      if derivative:
        dz_k = (jnp.where(c0 == k, d0, 0.0) +
                jnp.where(c1 == k, d1, 0.0))
        v = tuple(v[c] + dz_k * rows_k[c:c + 1, :] for c in range(c_n))
      return (u, v)

    init = (tuple([zero] * c_n), tuple([zero] * c_n))
    u, v = jax.lax.fori_loop(0, gd, body, init)
    sliced = [sliced[c] + wy[da] * u[c] for c in range(c_n)]
    if derivative:
      sliced_dz = [sliced_dz[c] + wy[da] * v[c] for c in range(c_n)]
  if derivative:
    return sliced, sliced_dz
  return sliced


def _make_wy_wx(cfg, a0, b0, off_ref, ty, tx):
  """Spatial one-hot weights; off_ref[0:2] holds the shard's (y, x)
  pixel offset in the *global* image (zero when unsharded), so the same
  kernel serves spatially-sharded giant-image inference with zero halo
  (SURVEY.md §5.7). In dynamic-size mode off_ref[2:4] carries the true
  logical (H, W) and the scale is computed here (identical f32 ops to
  the host-side _traced_starts, so floors agree bitwise)."""
  if cfg.dynamic_size:
    sy = cfg.gh / _f32(off_ref[2])
    sx = cfg.gw / _f32(off_ref[3])
  else:
    sy, sx = cfg.sy, cfg.sx
  wy = _spatial_onehot_weights(ty * cfg.th + off_ref[0], cfg.th, sy,
                               a0, cfg.ncy, (cfg.th, 1), 0)
  wx = _spatial_onehot_weights(tx * cfg.tw + off_ref[1], cfg.tw, sx,
                               b0, cfg.ncx, (1, cfg.tw), 1)
  return wy, wx


# Curves-guide evaluation variant. 'relu' is the literal reference form
# (models.py:163-175): per knot, slope*max(g - shift, 0) — a sub, a max
# and a mul-add of full (TH, TW) planes, 4 VPU plane-ops per knot.
# 'maxfma' rewrites each knot via slope*max(g-s,0) == slope*max(g,s) -
# slope*s: the mix weight is folded into the slopes and every constant
# slope*s*mix term into a single scalar bias at TILE level (n*n_pts
# scalar FMAs per ~32k-pixel tile — free), so the per-pixel cost drops
# to max + mul-add: 2-3 plane-ops per knot, ~40% off the guide's share
# of the serving kernel's VPU work. Numerics: identical knot math up to
# f32 reassociation (measured <=2e-6 vs the oracle guide; the serving
# gate is 1e-4 and a u8 quantum is 4e-3). Select with
# HDRNET_TPU_CURVES_IMPL=maxfma (default stays 'relu' until a measured
# on-chip win flips it).
_CURVES_IMPLS = ('relu', 'maxfma')


def default_curves_impl():
  s = os.environ.get('HDRNET_TPU_CURVES_IMPL', 'relu')
  if s not in _CURVES_IMPLS:
    raise ValueError(
        f'HDRNET_TPU_CURVES_IMPL={s!r}: must be one of {_CURVES_IMPLS}')
  return s


def _curves_guide(cfg, img, ccm_ref, curves_ref, mix_ref):
  """In-kernel curves guide (models.py:144-190): learned color matrix ->
  per-channel 16-knot PWL curve -> channel mix -> clip [0, 1].

  img: list of n_in channel planes. ccm_ref: (n_in+1, n_in) matrix+bias.
  curves_ref: (2*n_in, n_pts) = shifts rows then slopes rows.
  mix_ref: (n_in+1, 1) mixing weights + bias.
  """
  n = cfg.n_in
  if cfg.curves_impl == 'maxfma':
    # acc = sum_{c,p} (mix_c*slope_cp)*max(g_c, s_cp)
    #       + (mix_bias - sum_{c,p} mix_c*slope_cp*s_cp)
    bias = mix_ref[n, 0]
    acc = None
    for c in range(n):
      g = ccm_ref[n, c] * jnp.ones((cfg.th, cfg.tw), jnp.float32)
      for j in range(n):
        g = g + img[j] * ccm_ref[j, c]
      for p in range(cfg.n_pts):
        shift = curves_ref[c, p]
        premix = curves_ref[n + c, p] * mix_ref[c, 0]
        bias = bias - premix * shift
        term = premix * jnp.maximum(g, shift)
        acc = term if acc is None else acc + term
    return jnp.clip(acc + bias, 0.0, 1.0)
  acc = None
  for c in range(n):
    g = ccm_ref[n, c] * jnp.ones((cfg.th, cfg.tw), jnp.float32)
    for j in range(n):
      g = g + img[j] * ccm_ref[j, c]
    cur = jnp.zeros((cfg.th, cfg.tw), jnp.float32)
    for p in range(cfg.n_pts):
      cur = cur + curves_ref[n + c, p] * jnp.maximum(
          g - curves_ref[c, p], 0.0)
    term = cur * mix_ref[c, 0]
    acc = term if acc is None else acc + term
  acc = acc + mix_ref[n, 0]
  return jnp.clip(acc, 0.0, 1.0)


def _nn_guide(cfg, img, w1_ref, w2_ref):
  """In-kernel pointwise NN guide (models.py:199-210) with the BN
  pre-folded into conv1 (as the reference's deployment dump does,
  freeze_graph.py:141-142).

  w1_ref: (n_in+1, gc) conv1 weights + folded bias row.
  w2_ref: (gc+1, 1) conv2 weights + bias.
  """
  n, gc = cfg.n_in, cfg.guide_complexity
  acc = w2_ref[gc, 0] * jnp.ones((cfg.th, cfg.tw), jnp.float32)
  for k in range(gc):
    h = w1_ref[n, k] * jnp.ones((cfg.th, cfg.tw), jnp.float32)
    for j in range(n):
      h = h + img[j] * w1_ref[j, k]
    acc = acc + jnp.maximum(h, 0.0) * w2_ref[k, 0]
  return jax.nn.sigmoid(acc)


def _strip_setup(cfg, a0_ref, b0_ref, off_ref, lg_ref, ty, tx):
  """Tile-level prelude for the strip-loop kernels: the x one-hot
  weights and x-contraction rows are shared by every strip of the tile
  and hoisted here; the loop body only builds its own (strip, 1) y
  weights and (strip, TW) depth weights."""
  if cfg.dynamic_size:
    sy = cfg.gh / _f32(off_ref[2])
    sx = cfg.gw / _f32(off_ref[3])
  else:
    sy, sx = cfg.sy, cfg.sx
  wx = _spatial_onehot_weights(tx * cfg.tw + off_ref[1], cfg.tw, sx,
                               b0_ref[tx], cfg.ncx, (1, cfg.tw), 1)
  rows_list = [_x_rows(cfg, lg_ref, wx, da) for da in range(cfg.ncy)]
  scfg = dataclasses.replace(cfg, th=cfg.strip)
  y_base = ty * cfg.th + off_ref[0]
  return scfg, wx, rows_list, a0_ref[ty], y_base, sy


def _strip_wy(cfg, sy, y_base, y0, a0):
  return _spatial_onehot_weights(y_base + y0, cfg.th, sy, a0, cfg.ncy,
                                 (cfg.th, 1), 0)


def _fwd_kernel(cfg, a0_ref, b0_ref, off_ref, lg_ref, guide_ref, *rest):
  if cfg.n_in:
    img_ref, out_ref = rest
  else:
    (out_ref,) = rest
  ty = pl.program_id(1)
  tx = pl.program_id(2)

  if not cfg.strip:
    wy, wx = _make_wy_wx(cfg, a0_ref[ty], b0_ref[tx], off_ref, ty, tx)
    sliced = _accumulate_sliced(cfg, lg_ref, wy, wx, guide_ref[0])
    if cfg.n_in:
      img = [img_ref[0, j] for j in range(cfg.n_in)]
      _apply_epilogue(cfg, sliced, img, out_ref)
    else:
      for c in range(cfg.channels):
        out_ref[0, c] = sliced[c]
    return

  scfg, _, rows_list, a0, y_base, sy = _strip_setup(
      cfg, a0_ref, b0_ref, off_ref, lg_ref, ty, tx)

  def body(s, carry):
    y0 = s * cfg.strip
    wy = _strip_wy(scfg, sy, y_base, y0, a0)
    guide = guide_ref[0, pl.ds(y0, cfg.strip), :]
    sliced = _accumulate_sliced(scfg, lg_ref, wy, None, guide,
                                rows_list=rows_list)
    if cfg.n_in:
      img = [img_ref[0, j, pl.ds(y0, cfg.strip), :]
             for j in range(cfg.n_in)]
      _apply_epilogue(scfg, sliced, img, out_ref, row_start=y0)
    else:
      for c in range(cfg.channels):
        out_ref[0, c, pl.ds(y0, cfg.strip), :] = sliced[c]
    return carry

  jax.lax.fori_loop(0, cfg.th // cfg.strip, body, 0)


def _apply_epilogue(cfg, sliced, img, out_ref, row_start=None):
  """out[i] = sum_j sliced[i, j] * img[j] + offset
  (bilateral_slice_apply.cc:72-77). `row_start` writes a `cfg.th`-row
  horizontal strip of the output tile (the strip-loop path)."""
  ni1 = cfg.ni_tot
  for i in range(cfg.n_out):
    acc = (sliced[i * ni1 + cfg.n_in] if cfg.has_offset
           else jnp.zeros((cfg.th, cfg.tw), jnp.float32))
    for j in range(cfg.n_in):
      acc = acc + sliced[i * ni1 + j] * img[j]
    if cfg.clip_output:
      acc = jnp.clip(acc, 0.0, 1.0)
    if cfg.u8_out:
      # Round-half-up requantize (same conversion as utils/image
      # imwrite); clip_output is enforced by the wrapper. Mosaic has no
      # direct f32->u8 cast; f32 -(fptosi)-> i32 -(trunci)-> u8 are
      # natively lowered and truncation toward zero on [0.5, 255.5)
      # keeps the round-half-up semantics.
      acc = (acc * 255.0 + 0.5).astype(jnp.int32).astype(jnp.uint8)
    if row_start is None:
      out_ref[0, i] = acc
    else:
      out_ref[0, i, pl.ds(row_start, cfg.th), :] = acc


def _fused_fwd_kernel(cfg, a0_ref, b0_ref, off_ref, lg_ref, img_ref, *rest):
  """Forward with the guide computed in-kernel from the image tile.

  Eliminates the full-res guide's HBM round trip and XLA overhead —
  the TPU analog of the reference's free in-shader guide
  (std.frag:32-53). Inference fast path (no VJP).

  With cfg.strip set, the tile is processed in `strip`-row horizontal
  strips by a fori_loop: the x-contraction rows (shared by every strip)
  are hoisted to tile level, and all per-strip operands fit in vector
  registers instead of sweeping full-tile planes through VMEM between
  ops. Same arithmetic, one loop-body compile instead of straight-line
  code over the whole tile.
  """
  out_ref = rest[-1]
  params = rest[:-1]
  ty = pl.program_id(1)
  tx = pl.program_id(2)

  def load(x):
    # uint8 streaming intake: dequantize as the plane leaves VMEM
    # (exact division — bitwise equal to the f32 path's frame/255).
    # Mosaic has no direct u8->f32 cast; u8 -(extui)-> i32 -(sitofp)->
    # f32 are both natively lowered.
    if cfg.u8_in:
      return _f32(x.astype(jnp.int32)) / 255.0
    return x

  def guide_of(c, img):
    if c.guide_mode == 'curves':
      return _curves_guide(c, img, *params)
    elif c.guide_mode == 'nn':
      return _nn_guide(c, img, *params)
    raise ValueError(c.guide_mode)

  if not cfg.strip:
    img = [load(img_ref[0, j]) for j in range(cfg.n_in)]
    guide = guide_of(cfg, img)
    wy, wx = _make_wy_wx(cfg, a0_ref[ty], b0_ref[tx], off_ref, ty, tx)
    sliced = _accumulate_sliced(cfg, lg_ref, wy, wx, guide)
    _apply_epilogue(cfg, sliced, img, out_ref)
    return

  scfg, _, rows_list, a0, y_base, sy = _strip_setup(
      cfg, a0_ref, b0_ref, off_ref, lg_ref, ty, tx)

  def body(s, carry):
    y0 = s * cfg.strip
    img = [load(img_ref[0, j, pl.ds(y0, cfg.strip), :])
           for j in range(cfg.n_in)]
    wy = _strip_wy(scfg, sy, y_base, y0, a0)
    sliced = _accumulate_sliced(scfg, lg_ref, wy, None,
                                guide_of(scfg, img), rows_list=rows_list)
    _apply_epilogue(scfg, sliced, img, out_ref, row_start=y0)
    return carry

  jax.lax.fori_loop(0, cfg.th // cfg.strip, body, 0)


def _pix_bwd_kernel(cfg, a0_ref, b0_ref, off_ref, lg_ref, guide_ref, *rest):
  """Fused guide + input cotangents (bilateral_slice_apply.cc:140-259)."""
  if cfg.n_in:
    img_ref, ct_ref, dguide_ref, dimg_ref = rest
  else:
    ct_ref, dguide_ref = rest
  ty = pl.program_id(1)
  tx = pl.program_id(2)
  ni1 = cfg.ni_tot

  def emit(c, sliced, sliced_dz, img, ct, y0):
    """Shared epilogue on (c.th, c.tw) planes (whole tile or a strip)."""
    dguide = jnp.zeros((c.th, c.tw), jnp.float32)
    for i in range(c.n_out):
      # d/d(guide): sum_j sliced_dz[i, j] * in_ext[j]
      gacc = (sliced_dz[i * ni1 + c.n_in] if c.has_offset
              else jnp.zeros((c.th, c.tw), jnp.float32))
      for j in range(c.n_in):
        gacc = gacc + sliced_dz[i * ni1 + j] * img[j]
      dguide = dguide + gacc * ct[i]
    if y0 is None:
      dguide_ref[0] = dguide
    else:
      dguide_ref[0, pl.ds(y0, c.th), :] = dguide
    if c.n_in:
      for j in range(c.n_in):
        acc = jnp.zeros((c.th, c.tw), jnp.float32)
        for i in range(c.n_out):
          acc = acc + sliced[i * ni1 + j] * ct[i]
        if y0 is None:
          dimg_ref[0, j] = acc
        else:
          dimg_ref[0, j, pl.ds(y0, c.th), :] = acc

  if not cfg.strip:
    wy, wx = _make_wy_wx(cfg, a0_ref[ty], b0_ref[tx], off_ref, ty, tx)
    sliced, sliced_dz = _accumulate_sliced(cfg, lg_ref, wy, wx,
                                           guide_ref[0], derivative=True)
    img = ([img_ref[0, j] for j in range(cfg.n_in)] if cfg.n_in else [])
    ct = [ct_ref[0, i] for i in range(cfg.n_out)]
    emit(cfg, sliced, sliced_dz, img, ct, None)
    return

  scfg, _, rows_list, a0, y_base, sy = _strip_setup(
      cfg, a0_ref, b0_ref, off_ref, lg_ref, ty, tx)

  def body(s, carry):
    y0 = s * cfg.strip
    wy = _strip_wy(scfg, sy, y_base, y0, a0)
    guide = guide_ref[0, pl.ds(y0, cfg.strip), :]
    sliced, sliced_dz = _accumulate_sliced(scfg, lg_ref, wy, None, guide,
                                           derivative=True,
                                           rows_list=rows_list)
    img = ([img_ref[0, j, pl.ds(y0, cfg.strip), :]
            for j in range(cfg.n_in)] if cfg.n_in else [])
    ct = [ct_ref[0, i, pl.ds(y0, cfg.strip), :]
          for i in range(cfg.n_out)]
    emit(scfg, sliced, sliced_dz, img, ct, y0)
    return carry

  jax.lax.fori_loop(0, cfg.th // cfg.strip, body, 0)


def _grid_bwd_kernel(cfg, a0_ref, b0_ref, off_ref, guide_ref, *rest):
  """Grid cotangent (ops/bilateral_slice_apply.cc:84-138), splat form.

  Operates on mirror-padded inputs (zero-padded to tiles; zero-F rows
  contribute nothing). Per tile, for each window cell: a separable
  weighted reduction sum_pixels wy*wx*wz*F accumulated into the
  VMEM-resident (gh*gw, gd*C) output block (revisited across all tiles
  of one batch element). Spatial weights are the reference's *direct*
  tent evaluation; depth weights carry the z-extreme override-to-1
  (cc:121-125). Gather-free, scatter-free (within a tile the reduction
  is dense; across tiles it is the sequential grid), race-free like the
  reference CUDA (SURVEY.md §5.2).
  """
  if cfg.n_in:
    img_ref, ct_ref, out_ref = rest
  else:
    ct_ref, out_ref = rest
  ty = pl.program_id(1)
  tx = pl.program_id(2)

  @pl.when(jnp.logical_and(ty == 0, tx == 0))
  def _():
    out_ref[...] = jnp.zeros_like(out_ref)

  a0 = a0_ref[ty]
  b0 = b0_ref[tx]
  # Direct tent weights per window cell; zero for cells outside the
  # grid so the clamped accumulation index adds nothing.
  ypix = jax.lax.broadcasted_iota(jnp.int32, (cfg.th, 1), 0)
  gyf = (_f32(ypix) + (_f32(ty * cfg.th + off_ref[0]) + 0.5)) * cfg.sy
  xpix = jax.lax.broadcasted_iota(jnp.int32, (1, cfg.tw), 1)
  gxf = (_f32(xpix) + (_f32(tx * cfg.tw + off_ref[1]) + 0.5)) * cfg.sx

  def cell_weight(cell, gf, extent):
    w = jnp.maximum(1.0 - jnp.abs(_f32(cell) + 0.5 - gf), 0.0)
    valid = jnp.logical_and(cell >= 0, cell < extent)
    return jnp.where(valid, w, 0.0)

  wy = [cell_weight(a0 + da, gyf, cfg.gh) for da in range(cfg.ncy)]
  wx = [cell_weight(b0 + db, gxf, cfg.gw) for db in range(cfg.ncx)]

  # Depth weights: direct smoothed tent + override-to-1 at the extremes.
  gzf = guide_ref[0] * cfg.gd
  wz = []
  for k in range(cfg.gd):
    dx = (k + 0.5) - gzf
    w = jnp.maximum(1.0 - jnp.sqrt(dx * dx + EPS), 0.0)
    if k == 0:
      w = jnp.where(gzf < 0.5, 1.0, w)
    if k == cfg.gd - 1:
      w = jnp.where(gzf > cfg.gd - 0.5, 1.0, w)
    wz.append(w)

  # F planes: ct[i] * in_ext[j] (offset column = ct[i] alone, cc:127-129)
  ni1 = cfg.ni_tot
  f_planes = []
  for i in range(cfg.n_out):
    ct_i = ct_ref[0, i]
    for j in range(ni1):
      if j < cfg.n_in:
        f_planes.append(ct_i * img_ref[0, j])
      else:
        f_planes.append(ct_i)

  # rows[da][k*C + c] = sum_y wy_da[y] * (wz_k * F_c)[y, :] — the
  # wz*F product is hoisted across the da loop (one live plane).
  c_n = cfg.channels
  rows = [[None] * (cfg.gd * c_n) for _ in range(cfg.ncy)]
  for k in range(cfg.gd):
    for c in range(c_n):
      p = wz[k] * f_planes[c]
      for da in range(cfg.ncy):
        rows[da][k * c_n + c] = jnp.sum(wy[da] * p, axis=0,
                                        keepdims=True)
  for da in range(cfg.ncy):
    rows_da = jnp.concatenate(rows[da], axis=0)  # (gd*C, TW)
    for db in range(cfg.ncx):
      v = jnp.sum(rows_da * wx[db], axis=1)  # (gd*C,)
      ay = jnp.clip(a0 + da, 0, cfg.gh - 1)
      bx = jnp.clip(b0 + db, 0, cfg.gw - 1)
      idx = ay * cfg.gw + bx
      out_ref[0, pl.ds(idx, 1), :] += v[None, :]


# ---------------------------------------------------------------------------
# Host-side wrappers
# ---------------------------------------------------------------------------


def _extract_cell_windows(grid5, yp, xp):
  """Gathers each tile's grid-cell window: (B*nty*ntx, NCY, gd*C, NCX).

  Cell indices are clamped here — combined with unclamped one-hot
  matching in-kernel this reproduces the reference's clamp boundary.
  The (gd*C, NCX) inner layout lets the kernel do its x-contraction as
  NCX broadcast-FMAs over all (k, c) at once.
  """
  b, gh, gw, gd, c = grid5.shape
  iy = np.clip(yp.starts[:, None] + np.arange(yp.n_cells)[None, :], 0, gh - 1)
  ix = np.clip(xp.starts[:, None] + np.arange(xp.n_cells)[None, :], 0, gw - 1)
  lg = grid5[:, iy][:, :, :, ix]  # (B, nty, NCY, ntx, NCX, gd, C)
  lg = lg.transpose(0, 1, 3, 2, 5, 6, 4)  # (B, nty, ntx, NCY, gd, C, NCX)
  return lg.reshape(b * yp.n_tiles * xp.n_tiles,
                    yp.n_cells, gd * c, xp.n_cells)


def _pad_hw(x, h_pad, w_pad):
  """Zero-pads the trailing (H, W) axes of a (..., H, W) array."""
  pads = [(0, 0)] * (x.ndim - 2)
  pads += [(0, h_pad - x.shape[-2]), (0, w_pad - x.shape[-1])]
  if all(p == (0, 0) for p in pads):
    return x
  return jnp.pad(x, pads)


def _common_setup(grid5, guide, h, w, wide_pref=False):
  b, gh, gw, gd, _ = grid5.shape
  plans = plan_tiles(h, w, gh, gw, wide_pref=wide_pref)
  assert plans is not None, 'caller must check feasible()'
  yp, xp = plans
  lg = _extract_cell_windows(grid5, yp, xp)
  a0 = jnp.asarray(yp.starts)
  b0 = jnp.asarray(xp.starts)
  h_pad, w_pad = yp.tile * yp.n_tiles, xp.tile * xp.n_tiles
  return yp, xp, lg, a0, b0, h_pad, w_pad


# --- spatially-sharded (traced-offset) planning -----------------------------


def _sharded_axis_plan(extent_local, extent_total, cells, lane_dim):
  """Axis plan valid for a shard at ANY pixel offset.

  The tap span across a tile is D = (tile-1) * scale, so the universal
  cell-window bound is max_a(floor(a+D) - floor(a)) + 2 = ceil(D) + 2
  (first tap's floor cell, every boundary crossing, plus the +1 tap).
  """
  base = _choose_tile(extent_total, cells, lane_dim)
  if base is None:
    return None
  # cells + 1 bounds any window: the whole image only spans taps
  # -1 .. cells-1+1.
  n_cells = min(int(np.ceil((base.tile - 1) * cells / extent_total)) + 2,
                cells + 1)
  if n_cells > _max_cells(lane_dim):
    return None
  n_tiles = _round_up(extent_local, base.tile) // base.tile
  return _AxisPlan(base.tile, n_tiles, n_cells, None)


def _traced_starts(plan, offset, scale):
  t = jnp.arange(plan.n_tiles, dtype=jnp.float32) * plan.tile
  first = offset.astype(jnp.float32) + t
  return jnp.floor((first + 0.5) * scale - 0.5).astype(jnp.int32)


def _extract_cell_windows_traced(grid5, yp, xp, a0, b0):
  """Traced-index variant of _extract_cell_windows (same layout)."""
  b, gh, gw, gd, c = grid5.shape
  iy = jnp.clip(a0[:, None] + jnp.arange(yp.n_cells)[None, :], 0, gh - 1)
  ix = jnp.clip(b0[:, None] + jnp.arange(xp.n_cells)[None, :], 0, gw - 1)
  lg = jnp.take(grid5, iy.reshape(-1), axis=1)
  lg = lg.reshape(b, yp.n_tiles, yp.n_cells, gw, gd, c)
  lg = jnp.take(lg, ix.reshape(-1), axis=3)
  lg = lg.reshape(b, yp.n_tiles, yp.n_cells, xp.n_tiles, xp.n_cells, gd, c)
  lg = lg.transpose(0, 1, 3, 2, 5, 6, 4)
  return lg.reshape(b * yp.n_tiles * xp.n_tiles,
                    yp.n_cells, gd * c, xp.n_cells)


def _sharded_setup(grid5, h_local, w_local, h_total, w_total, y_offset,
                   x_offset):
  """Plan for a shard of a larger image. An axis with offset None is
  unsharded: it gets the exact static plan; a sharded axis gets the
  offset-universal window and traced cell starts."""
  b, gh, gw, gd, _ = grid5.shape
  if y_offset is None:
    yp = _choose_tile(h_total, gh, lane_dim=False)
    assert yp is not None and h_local == h_total
    a0 = jnp.asarray(yp.starts)
    y_off = jnp.zeros((), jnp.int32)
  else:
    yp = _sharded_axis_plan(h_local, h_total, gh, lane_dim=False)
    assert yp is not None, 'sharded y plan infeasible'
    y_off = jnp.asarray(y_offset, jnp.int32)
    a0 = _traced_starts(yp, y_off, gh / h_total)
  if x_offset is None:
    xp = _choose_tile(w_total, gw, lane_dim=True)
    assert xp is not None and w_local == w_total
    b0 = jnp.asarray(xp.starts)
    x_off = jnp.zeros((), jnp.int32)
  else:
    xp = _sharded_axis_plan(w_local, w_total, gw, lane_dim=True)
    assert xp is not None, 'sharded x plan infeasible'
    x_off = jnp.asarray(x_offset, jnp.int32)
    b0 = _traced_starts(xp, x_off, gw / w_total)
  lg = _extract_cell_windows_traced(grid5, yp, xp, a0, b0)
  zero = jnp.zeros((), jnp.int32)
  offs = jnp.stack([y_off, x_off, zero, zero])
  h_pad, w_pad = yp.tile * yp.n_tiles, xp.tile * xp.n_tiles
  return yp, xp, lg, a0, b0, offs, h_pad, w_pad


# --- bucketed dynamic-size planning -----------------------------------------


def _dynamic_axis_plan(extent_padded, extent_min, cells, lane_dim):
  """Axis plan valid for ANY true extent in [extent_min, extent_padded].

  The physical array is padded to `extent_padded`; the per-tile cell
  window must cover the taps of every pixel at the worst-case scale
  cells/extent_min: the tap span across a tile is (tile-1)*scale, so
  n_cells = ceil((tile-1)*cells/extent_min) + 2 (first tap's floor
  cell, every boundary crossing, plus the +1 tap) — same universal
  bound as the sharded planner (_sharded_axis_plan)."""
  if lane_dim:
    candidates = [512, 256, 128] if extent_padded > 1536 else [256, 128]
  else:
    candidates = [256, 128, 64, 32, 16, 8]
  best = None
  for tile in candidates:
    # cells + 1 bounds any window (whole image spans taps -1..cells).
    n_cells = min(int(np.ceil((tile - 1) * cells / extent_min)) + 2,
                  cells + 1)
    if n_cells > _max_cells(lane_dim):
      continue
    n_tiles = _round_up(extent_padded, tile) // tile
    plan = _AxisPlan(tile, n_tiles, n_cells, None)
    if best is None or plan.n_cells < best.n_cells:
      best = plan
  return best


def plan_tiles_dynamic(h_pad, w_pad, h_min, w_min, gh, gw):
  """Bucket tile plan, or None if infeasible for this (bucket, min)."""
  yp = _dynamic_axis_plan(h_pad, h_min, gh, lane_dim=False)
  xp = _dynamic_axis_plan(w_pad, w_min, gw, lane_dim=True)
  if yp is None or xp is None:
    return None
  if yp.tile * xp.tile > _MAX_TILE_PIXELS:
    tile = max(8, _MAX_TILE_PIXELS // xp.tile)
    n_cells = min(int(np.ceil((tile - 1) * gh / h_min)) + 2, gh + 1)
    if n_cells > _MAX_CELLS_Y:
      return None
    yp = _AxisPlan(tile, _round_up(h_pad, tile) // tile, n_cells, None)
  return yp, xp


def feasible_dynamic(h_pad, w_pad, h_min, w_min, gh, gw):
  return plan_tiles_dynamic(h_pad, w_pad, h_min, w_min, gh, gw) is not None


def _dynamic_setup(grid5, h_pad, w_pad, h_min, w_min, h_true, w_true):
  """Traced-size setup: tile plan for the padded bucket, cell-window
  starts computed from the traced true extents (the same f32 ops the
  kernel uses for its in-kernel scale, so floors agree)."""
  _, gh, gw, _, _ = grid5.shape
  plans = plan_tiles_dynamic(h_pad, w_pad, h_min, w_min, gh, gw)
  assert plans is not None, 'caller must check feasible_dynamic()'
  yp, xp = plans
  h_t = jnp.asarray(h_true, jnp.int32)
  w_t = jnp.asarray(w_true, jnp.int32)
  a0 = _traced_starts(yp, jnp.zeros((), jnp.int32), gh / _f32(h_t))
  b0 = _traced_starts(xp, jnp.zeros((), jnp.int32), gw / _f32(w_t))
  lg = _extract_cell_windows_traced(grid5, yp, xp, a0, b0)
  zero = jnp.zeros((), jnp.int32)
  offs = jnp.stack([zero, zero, h_t, w_t])
  return yp, xp, lg, a0, b0, offs


def _cfg_from(grid5, yp, xp, h, w, n_out, n_in, has_offset,
              z_strategy=None):
  _, gh, gw, gd, _ = grid5.shape
  return _Cfg(th=yp.tile, tw=xp.tile, ncy=yp.n_cells, ncx=xp.n_cells,
              gh=gh, gw=gw, gd=gd, n_out=n_out, n_in=n_in,
              has_offset=has_offset, sy=gh / h, sx=gw / w,
              z_strategy=_resolve_z_strategy(z_strategy))


# Default strip height, picked by measurement (scripts/kernel_tuning.py
# on one v5e at 4K, 100-iter chains): 64-row strips beat 32 (2.00 ms vs
# 2.38 at (128,256)) — operands stay vreg-resident within a strip and
# the loop body is compiled once. 32 remains the fallback for tiles not
# divisible by 64.
_DEFAULT_STRIP = 64


def _auto_strip(cfg, default=None):
  """Applies the measured strip default (unroll contraction only; the
  'loop' z-strategy already bounds its code size and VMEM pressure).
  Training wrappers pass default=32: the backward kernels carry 2x the
  live planes, and 64-row strips were only measured ahead on the
  serving forward."""
  if cfg.z_strategy != 'unroll':
    return cfg
  for strip in (default or _DEFAULT_STRIP, 32):
    if strip <= cfg.th and cfg.th % strip == 0:
      return dataclasses.replace(cfg, strip=strip)
  return cfg


def _make_specs(cfg, nty, ntx):
  # NB: with PrefetchScalarGridSpec, index_map receives the scalar-prefetch
  # refs appended after the grid indices — swallow them with *_.
  lg_spec = pl.BlockSpec(
      (1, cfg.ncy, cfg.gd * cfg.channels, cfg.ncx),
      lambda b, ty, tx, *_: (b * nty * ntx + ty * ntx + tx, 0, 0, 0),
      memory_space=pltpu.VMEM)
  guide_spec = pl.BlockSpec((1, cfg.th, cfg.tw),
                            lambda b, ty, tx, *_: (b, ty, tx),
                            memory_space=pltpu.VMEM)

  def chan_spec(ch):
    return pl.BlockSpec((1, ch, cfg.th, cfg.tw),
                        lambda b, ty, tx, *_: (b, 0, ty, tx),
                        memory_space=pltpu.VMEM)
  return lg_spec, guide_spec, chan_spec


def slice_apply_fwd(grid5, guide, image_cf, n_out, n_in, has_offset,
                    interpret=False, z_strategy=None):
  """Forward pass. grid5 (B,gh,gw,gd,C) packed; guide (B,H,W);
  image_cf (B,n_in,H,W) channel-first. Returns (B,n_out,H,W)."""
  b, h, w = guide.shape
  # Forward-only kernel: gets the serving-tuned plan (wide lane tiles,
  # 64-row strips); the backward kernels keep the narrow/32 plan.
  yp, xp, lg, a0, b0, h_pad, w_pad = _common_setup(grid5, guide, h, w,
                                                   wide_pref=True)
  offs = jnp.zeros((4,), jnp.int32)
  cfg = _auto_strip(_cfg_from(grid5, yp, xp, h, w, n_out, n_in,
                              has_offset, z_strategy))
  lg_spec, guide_spec, chan_spec = _make_specs(cfg, yp.n_tiles, xp.n_tiles)

  guide_p = _pad_hw(guide, h_pad, w_pad)
  operands = [lg, guide_p]
  in_specs = [lg_spec, guide_spec]
  if n_in:
    operands.append(_pad_hw(image_cf, h_pad, w_pad))
    in_specs.append(chan_spec(n_in))

  out = pl.pallas_call(
      functools.partial(_fwd_kernel, cfg),
      grid_spec=pltpu.PrefetchScalarGridSpec(
          num_scalar_prefetch=3,
          grid=(b, yp.n_tiles, xp.n_tiles),
          in_specs=in_specs,
          out_specs=chan_spec(n_out),
      ),
      out_shape=jax.ShapeDtypeStruct((b, n_out, h_pad, w_pad), jnp.float32),
      interpret=interpret,
  )(a0, b0, offs, *operands)
  return out[:, :, :h, :w]


def enhance_fused(grid5, image_cf, guide_params, guide_mode, n_out, n_in,
                  has_offset=True, interpret=False, y_offset=None,
                  x_offset=None, h_total=None, w_total=None,
                  clip_output=False, z_strategy=None, h_true=None,
                  w_true=None, h_min=None, w_min=None, strip=None,
                  u8_output=False, compute_dtype=None):
  """Fused guide + slice + apply forward (inference fast path).

  grid5 (B,gh,gw,gd,C) packed; image_cf (B,n_in,H,W) channel-first;
  guide_params: tuple of small 2-D f32 arrays —
    'curves': (ccm_ext (n_in+1, n_in), curves (2*n_in, n_pts),
               mix (n_in+1, 1))
    'nn':     (w1_ext (n_in+1, gc), w2_ext (gc+1, 1))  [BN pre-folded]
  Bucketed dynamic-size serving (reference run.py accepts arbitrary
  HxW, bin/run.py:87-90): pass the image zero-padded to a static bucket
  (H, W) plus the TRUE logical size as traced scalars h_true/w_true and
  static lower bounds h_min/w_min (the smallest true size this compile
  must serve). One compile then serves every size in the bucket; rows
  and columns beyond (h_true, w_true) are garbage for the caller to
  crop.
  uint8 streaming: a uint8 image_cf is dequantized in-kernel (x/255);
  u8_output=True (requires clip) requantizes the clipped result to
  uint8 in the epilogue — each saves 3/4 of the frame's HBM traffic.
  Returns (B, n_out, H, W), float32 or uint8.
  """
  b, _, h, w = image_cf.shape
  _, gh, gw, gd, _ = grid5.shape
  h_total = h_total or h
  w_total = w_total or w
  dynamic = h_true is not None
  u8_in = image_cf.dtype == jnp.uint8
  if u8_output:
    assert clip_output, 'u8 output requires the in-kernel clip'
  if dynamic:
    assert y_offset is None and x_offset is None, (
        'dynamic size and spatial sharding are separate paths')
    yp, xp, lg, a0, b0, offs = _dynamic_setup(
        grid5, h, w, h_min or h, w_min or w, h_true, w_true)
    h_pad, w_pad = yp.tile * yp.n_tiles, xp.tile * xp.n_tiles
  elif y_offset is not None or x_offset is not None:
    # Spatially-sharded path: this call sees a (local) band of a
    # h_total x w_total image starting at the traced (y, x) offset.
    yp, xp, lg, a0, b0, offs, h_pad, w_pad = _sharded_setup(
        grid5, h, w, h_total, w_total, y_offset, x_offset)
  else:
    plans = plan_tiles(h, w, gh, gw, wide_pref=True)
    assert plans is not None, 'caller must check feasible()'
    yp, xp = plans
    lg = _extract_cell_windows(grid5, yp, xp)
    a0 = jnp.asarray(yp.starts)
    b0 = jnp.asarray(xp.starts)
    offs = jnp.zeros((4,), jnp.int32)
    h_pad, w_pad = yp.tile * yp.n_tiles, xp.tile * xp.n_tiles

  cfg = _cfg_from(grid5, yp, xp, h_total, w_total, n_out, n_in,
                  has_offset, z_strategy)
  if dynamic:
    cfg = dataclasses.replace(cfg, dynamic_size=True)
  if clip_output:
    cfg = dataclasses.replace(cfg, clip_output=True)
  # uint8 tiles need (32, 128)-divisible block minor dims; fall back to
  # f32 IO when the tile plan doesn't provide them.
  if u8_in and cfg.th % 32 == 0:
    cfg = dataclasses.replace(cfg, u8_in=True)
  elif u8_in:
    image_cf = image_cf.astype(jnp.float32) / 255.0
    u8_in = False
  u8_out = u8_output and cfg.th % 32 == 0
  if u8_out:
    cfg = dataclasses.replace(cfg, u8_out=True)
  if compute_dtype is not None:
    assert compute_dtype in ('float32', 'bfloat16'), compute_dtype
    cfg = dataclasses.replace(cfg, compute_dtype=compute_dtype)
  if cfg.z_strategy != 'loop':
    if strip is None:  # auto: the measured default
      cfg = _auto_strip(cfg)
    elif strip:
      assert cfg.th % strip == 0, (cfg.th, strip)
      cfg = dataclasses.replace(cfg, strip=strip)
    if (cfg.u8_in or cfg.u8_out) and cfg.strip % 32:
      cfg = dataclasses.replace(cfg, strip=0)
  if guide_mode == 'curves':
    n_pts = guide_params[1].shape[1]
    cfg = dataclasses.replace(cfg, guide_mode='curves', n_pts=n_pts,
                              curves_impl=default_curves_impl())
  elif guide_mode == 'nn':
    gc = guide_params[0].shape[1]
    cfg = dataclasses.replace(cfg, guide_mode='nn', guide_complexity=gc)
  else:
    raise ValueError(guide_mode)
  lg_spec, _, chan_spec = _make_specs(cfg, yp.n_tiles, xp.n_tiles)

  def param_spec(arr):
    shape = arr.shape
    return pl.BlockSpec(shape, lambda b_, ty, tx, *_: (0,) * len(shape),
                        memory_space=pltpu.VMEM)

  operands = [lg, _pad_hw(image_cf, h_pad, w_pad)]
  in_specs = [lg_spec, chan_spec(n_in)]
  for arr in guide_params:
    arr = jnp.asarray(arr, jnp.float32)
    operands.append(arr)
    in_specs.append(param_spec(arr))

  out_dtype = jnp.uint8 if cfg.u8_out else jnp.float32
  out = pl.pallas_call(
      functools.partial(_fused_fwd_kernel, cfg),
      grid_spec=pltpu.PrefetchScalarGridSpec(
          num_scalar_prefetch=3,
          grid=(b, yp.n_tiles, xp.n_tiles),
          in_specs=in_specs,
          out_specs=chan_spec(n_out),
      ),
      out_shape=jax.ShapeDtypeStruct((b, n_out, h_pad, w_pad),
                                     out_dtype),
      interpret=interpret,
  )(a0, b0, offs, *operands)
  out = out[:, :, :h, :w]
  if u8_output and not cfg.u8_out:  # tile plan forced the f32 path
    out = (out * 255.0 + 0.5).astype(jnp.uint8)
  return out


def _plan_axis_offset(extent_padded, scale, tile, offset):
  """Exact per-tile cell windows for pixels y = t*tile + i + offset
  (offset < 0 = mirror padding). Rows beyond extent_padded (tile
  zero-padding) carry F = 0 and need no window coverage, so the window
  only spans real padded rows."""
  n_tiles = _round_up(extent_padded, tile) // tile
  t = np.arange(n_tiles)
  first = t * tile + offset
  last = np.minimum(first + tile, extent_padded + offset) - 1
  lo = np.floor((first + 0.5) * scale - 0.5).astype(np.int64)
  hi = np.floor((last + 0.5) * scale - 0.5).astype(np.int64) + 1
  n_cells = int((hi - lo).max()) + 1
  return _AxisPlan(tile, n_tiles, n_cells, lo.astype(np.int32))


def grid_bwd_feasible(h, w, gh, gw):
  plans = plan_tiles(h, w, gh, gw)
  if plans is None:
    return False
  yp, xp = plans
  pad_y = -(-h // gh) // 2 + 1
  pad_x = -(-w // gw) // 2 + 1
  ypo = _plan_axis_offset(h + 2 * pad_y, gh / h, yp.tile, -pad_y)
  xpo = _plan_axis_offset(w + 2 * pad_x, gw / w, xp.tile, -pad_x)
  return ypo.n_cells <= _MAX_CELLS_Y and xpo.n_cells <= _MAX_CELLS_X


def slice_apply_grid_bwd(grid_shape, guide, image_cf, ct_cf, n_out, n_in,
                         has_offset, interpret=False):
  """Grid cotangent via the Pallas splat kernel.

  grid_shape: (gh, gw, gd). guide (B,H,W); image_cf (B,n_in,H,W);
  ct_cf (B,n_out,H,W). Returns (B, gh, gw, gd, n_out*ni_tot) packed.

  Mirror padding (the reference's image-side boundary,
  bilateral_slice_apply.cc:108-115 / jax ref _symmetric_pad_ij) happens
  here in XLA; the kernel sees plain padded arrays plus a negative
  pixel offset.
  """
  gh, gw, gd = grid_shape
  b, h, w = guide.shape
  pad_y = int(np.ceil(0.5 * h / gh))
  pad_x = int(np.ceil(0.5 * w / gw))

  def sympad(x):
    pads = [(0, 0)] * (x.ndim - 2) + [(pad_y, pad_y), (pad_x, pad_x)]
    return jnp.pad(x, pads, mode='symmetric')

  guide_p = sympad(guide)
  ct_p = sympad(ct_cf)
  image_p = sympad(image_cf) if n_in else None
  hp, wp = h + 2 * pad_y, w + 2 * pad_x

  base = plan_tiles(h, w, gh, gw)
  assert base is not None, 'caller must check feasibility'
  yp = _plan_axis_offset(hp, gh / h, base[0].tile, -pad_y)
  xp = _plan_axis_offset(wp, gw / w, base[1].tile, -pad_x)
  assert yp.n_cells <= _MAX_CELLS_Y and xp.n_cells <= _MAX_CELLS_X

  a0 = jnp.asarray(yp.starts)
  b0 = jnp.asarray(xp.starts)
  offs = jnp.asarray([-pad_y, -pad_x, 0, 0], jnp.int32)
  h_pad, w_pad = yp.tile * yp.n_tiles, xp.tile * xp.n_tiles

  cfg = _Cfg(th=yp.tile, tw=xp.tile, ncy=yp.n_cells, ncx=xp.n_cells,
             gh=gh, gw=gw, gd=gd, n_out=n_out, n_in=n_in,
             has_offset=has_offset, sy=gh / h, sx=gw / w)
  _, guide_spec, chan_spec = _make_specs(cfg, yp.n_tiles, xp.n_tiles)

  operands = [_pad_hw(guide_p, h_pad, w_pad)]
  in_specs = [guide_spec]
  if n_in:
    operands.append(_pad_hw(image_p, h_pad, w_pad))
    in_specs.append(chan_spec(n_in))
  operands.append(_pad_hw(ct_p, h_pad, w_pad))
  in_specs.append(chan_spec(n_out))

  c_n = cfg.channels
  out_spec = pl.BlockSpec((1, gh * gw, gd * c_n),
                          lambda b_, ty, tx, *_: (b_, 0, 0),
                          memory_space=pltpu.VMEM)
  out = pl.pallas_call(
      functools.partial(_grid_bwd_kernel, cfg),
      grid_spec=pltpu.PrefetchScalarGridSpec(
          num_scalar_prefetch=3,
          grid=(b, yp.n_tiles, xp.n_tiles),
          in_specs=in_specs,
          out_specs=out_spec,
      ),
      out_shape=jax.ShapeDtypeStruct((b, gh * gw, gd * c_n), jnp.float32),
      interpret=interpret,
  )(a0, b0, offs, *operands)
  # (b, gh*gw, gd*C) -> (b, gh, gw, gd, C)
  return out.reshape(b, gh, gw, gd, c_n)


def slice_apply_pix_bwd(grid5, guide, image_cf, ct_cf, n_out, n_in,
                        has_offset, interpret=False, z_strategy=None):
  """Fused guide + input cotangents. ct_cf (B,n_out,H,W) channel-first.
  Returns (d_guide (B,H,W), d_image_cf (B,n_in,H,W) or None)."""
  b, h, w = guide.shape
  yp, xp, lg, a0, b0, h_pad, w_pad = _common_setup(grid5, guide, h, w)
  offs = jnp.zeros((4,), jnp.int32)
  cfg = _auto_strip(_cfg_from(grid5, yp, xp, h, w, n_out, n_in,
                              has_offset, z_strategy), default=32)
  lg_spec, guide_spec, chan_spec = _make_specs(cfg, yp.n_tiles, xp.n_tiles)

  guide_p = _pad_hw(guide, h_pad, w_pad)
  operands = [lg, guide_p]
  in_specs = [lg_spec, guide_spec]
  if n_in:
    operands.append(_pad_hw(image_cf, h_pad, w_pad))
    in_specs.append(chan_spec(n_in))
  operands.append(_pad_hw(ct_cf, h_pad, w_pad))
  in_specs.append(chan_spec(n_out))

  out_shapes = [jax.ShapeDtypeStruct((b, h_pad, w_pad), jnp.float32)]
  out_specs = [guide_spec]
  if n_in:
    out_shapes.append(
        jax.ShapeDtypeStruct((b, n_in, h_pad, w_pad), jnp.float32))
    out_specs.append(chan_spec(n_in))

  outs = pl.pallas_call(
      functools.partial(_pix_bwd_kernel, cfg),
      grid_spec=pltpu.PrefetchScalarGridSpec(
          num_scalar_prefetch=3,
          grid=(b, yp.n_tiles, xp.n_tiles),
          in_specs=in_specs,
          out_specs=out_specs,
      ),
      out_shape=out_shapes,
      interpret=interpret,
  )(a0, b0, offs, *operands)
  d_guide = outs[0][:, :h, :w]
  d_image = outs[1][:, :, :h, :w] if n_in else None
  return d_guide, d_image


# ---------------------------------------------------------------------------
# Impl object consumed by hdrnet_tpu.ops.slice_ops
# ---------------------------------------------------------------------------


def _to_cf(x):
  return jnp.transpose(x, (0, 3, 1, 2))


def _to_cl(x):
  return jnp.transpose(x, (0, 2, 3, 1))


class _PallasImpl:
  def __init__(self, interpret, z_strategy=None):
    self.interpret = interpret
    self.z_strategy = z_strategy

  @staticmethod
  def _dims(grid, image, has_offset):
    n_out, ni_tot = grid.shape[-2:]
    n_in = image.shape[-1]
    assert ni_tot == n_in + (1 if has_offset else 0), (grid.shape,
                                                       image.shape)
    return n_out, n_in

  @staticmethod
  def _pack(grid):
    b, gh, gw, gd, no, ni1 = grid.shape
    return grid.reshape(b, gh, gw, gd, no * ni1)

  def forward(self, grid, guide, image, has_offset):
    n_out, n_in = self._dims(grid, image, has_offset)
    out_cf = slice_apply_fwd(
        self._pack(grid).astype(jnp.float32), guide.astype(jnp.float32),
        _to_cf(image).astype(jnp.float32), n_out, n_in, has_offset,
        interpret=self.interpret, z_strategy=self.z_strategy)
    return _to_cl(out_cf)

  def vjps(self, grid, guide, image, ct, has_offset):
    n_out, n_in = self._dims(grid, image, has_offset)
    d_guide, d_img_cf = slice_apply_pix_bwd(
        self._pack(grid).astype(jnp.float32), guide.astype(jnp.float32),
        _to_cf(image).astype(jnp.float32), _to_cf(ct).astype(jnp.float32),
        n_out, n_in, has_offset, interpret=self.interpret,
        z_strategy=self.z_strategy)
    if n_in:
      d_image = _to_cl(d_img_cf)
    else:
      d_image = jnp.zeros_like(image)
    b, gh, gw, gd, no, ni1 = grid.shape
    h, w = guide.shape[1:]
    if grid_bwd_feasible(h, w, gh, gw):
      d_grid = slice_apply_grid_bwd(
          (gh, gw, gd), guide.astype(jnp.float32),
          _to_cf(image).astype(jnp.float32),
          _to_cf(ct).astype(jnp.float32), n_out, n_in, has_offset,
          interpret=self.interpret)
      d_grid = d_grid.reshape(b, gh, gw, gd, no, ni1)
    else:
      # XLA einsum splat fallback (same math, oracle formulation).
      d_grid = jax.vmap(functools.partial(
          ref.bilateral_slice_apply_grid_vjp,
          grid_shape=grid.shape[1:], has_offset=has_offset))(guide, image,
                                                             ct)
    return d_grid, d_guide, d_image


_IMPLS = {}


def get_impl(interpret=False, z_strategy=None):
  key = (interpret, z_strategy)
  if key not in _IMPLS:
    _IMPLS[key] = _PallasImpl(interpret, z_strategy)
  return _IMPLS[key]
