#!/usr/bin/env python
"""Procedural local-laplacian dataset generator (quality-parity workload).

The reference's headline PSNR anchor (31.8 dB for HDRNetCurves l8/s16,
scripts/extra_figures/compare_to_unet.py:51) was measured on a
local-laplacian detail-enhancement dataset
(data/local_laplacian_hl_2048 in scripts/ll/train_std.sh) that is not
in the tree. This script synthesizes an equivalent workload:

  * photo-like images: smooth gradient background + soft/hard-edged
    ellipse regions + multi-octave value-noise texture — step edges and
    fine texture are exactly the two structures an edge-aware operator
    treats differently;
  * targets: the FAST LOCAL LAPLACIAN filter (Paris et al. 2011 /
    Aubry et al. 2014) in detail-enhancement mode (alpha < 1) applied
    to luminance, with additive luma transfer back to RGB.

Layout matches the canonical fixture (filelist.txt + input/ + output/,
reference data_pipeline.py:174-241) under <out>/train and <out>/test.

  python scripts/make_ll_dataset.py data/ll --n_train 220 --n_test 24
"""

from __future__ import annotations

import argparse
import os

import numpy as np

_K5 = np.array([1.0, 4.0, 6.0, 4.0, 1.0]) / 16.0


def _blur1d(x, axis):
  """Separable 5-tap Burt-Adelson blur with reflect boundary."""
  xp = np.moveaxis(x, axis, 0)
  pad = np.concatenate([xp[2:0:-1], xp, xp[-2:-4:-1]], axis=0)
  out = sum(w * pad[i:i + xp.shape[0]] for i, w in enumerate(_K5))
  return np.moveaxis(out, 0, axis)


def blur(x):
  return _blur1d(_blur1d(x, 0), 1)


def pyr_down(x):
  return blur(x)[::2, ::2]


def pyr_up(x, shape):
  z = np.zeros(shape, x.dtype)
  z[::2, ::2] = x
  return 4.0 * blur(z)


def gaussian_pyramid(x, levels):
  gp = [x]
  for _ in range(levels):
    gp.append(pyr_down(gp[-1]))
  return gp


def laplacian_pyramid(x, levels):
  gp = gaussian_pyramid(x, levels)
  return [gp[l] - pyr_up(gp[l + 1], gp[l].shape) for l in range(levels)]


def _remap(i, g, sigma, alpha, beta):
  """Paris et al. pointwise remap: |d|<=sigma band = detail (boosted
  for alpha<1), beyond = edge (preserved for beta=1)."""
  d = i - g
  ad = np.abs(d)
  detail = sigma * (ad / sigma) ** alpha
  edge = beta * (ad - sigma) + sigma
  return g + np.sign(d) * np.where(ad <= sigma, detail, edge)


def local_laplacian(y, n_gammas=8, sigma=0.3, alpha=0.5, beta=1.0,
                    levels=5):
  """Fast local laplacian (Aubry et al. 2014): build laplacian pyramids
  of n_gammas remapped copies, per-pixel interpolate coefficients at
  the gaussian-pyramid intensity."""
  gp = gaussian_pyramid(y, levels)
  gs = np.linspace(0.0, 1.0, n_gammas)
  lps = [laplacian_pyramid(_remap(y, g, sigma, alpha, beta), levels)
         for g in gs]
  out = gp[levels]
  for l in reversed(range(levels)):
    t = np.clip(gp[l], 0.0, 1.0) * (n_gammas - 1)
    k0 = np.clip(np.floor(t).astype(np.int64), 0, n_gammas - 2)
    f = t - k0
    stack = np.stack([lp[l] for lp in lps])
    a = np.take_along_axis(stack, k0[None], 0)[0]
    b = np.take_along_axis(stack, (k0 + 1)[None], 0)[0]
    out = pyr_up(out, gp[l].shape) + a * (1.0 - f) + b * f
  return out


_LUMA = np.array([0.299, 0.587, 0.114])


def enhance(rgb, **kw):
  """Detail-enhance RGB: operator on luminance, additive luma transfer."""
  y = rgb @ _LUMA
  y2 = local_laplacian(y, **kw)
  return np.clip(rgb + (y2 - y)[:, :, None], 0.0, 1.0)


def value_noise(rng, size, octaves=5, persistence=0.55):
  """Multi-octave bilinear value noise in [0, 1]."""
  acc = np.zeros((size, size))
  amp, total = 1.0, 0.0
  for o in range(octaves):
    cells = min(size, 4 * 2 ** o)
    coarse = rng.rand(cells + 1, cells + 1)
    idx = np.linspace(0, cells, size)
    i0 = np.minimum(idx.astype(np.int64), cells - 1)
    f = idx - i0
    top = (coarse[i0][:, i0] * (1 - f)[None, :] +
           coarse[i0][:, i0 + 1] * f[None, :])
    bot = (coarse[i0 + 1][:, i0] * (1 - f)[None, :] +
           coarse[i0 + 1][:, i0 + 1] * f[None, :])
    acc += amp * (top * (1 - f)[:, None] + bot * f[:, None])
    total += amp
    amp *= persistence
  return acc / total


def synth_photo(rng, size):
  """Photo-like RGB in [0, 1]: gradient sky + colored regions with
  mixed-sharpness edges + value-noise texture."""
  yy, xx = np.mgrid[0:size, 0:size] / size
  ang = rng.rand() * 2 * np.pi
  ramp = (np.cos(ang) * xx + np.sin(ang) * yy)
  ramp = (ramp - ramp.min()) / (np.ptp(ramp) + 1e-8)
  c0, c1 = rng.rand(3) * 0.6 + 0.2, rng.rand(3) * 0.6 + 0.2
  img = ramp[:, :, None] * c0 + (1 - ramp[:, :, None]) * c1

  for _ in range(int(rng.randint(6, 14))):
    cy, cx = rng.rand(2) * size
    ry, rx = (0.05 + 0.25 * rng.rand(2)) * size
    th = rng.rand() * np.pi
    dy, dx = yy * size - cy, xx * size - cx
    u = (np.cos(th) * dx + np.sin(th) * dy) / rx
    v = (-np.sin(th) * dx + np.cos(th) * dy) / ry
    d = np.sqrt(u * u + v * v)
    sharp = 10 ** rng.uniform(0.3, 2.5)  # soft shading .. hard edges
    mask = 1.0 / (1.0 + np.exp(np.clip((d - 1.0) * sharp, -30, 30)))
    color = rng.rand(3) * 0.8 + 0.1
    img = img * (1 - mask[:, :, None]) + mask[:, :, None] * color

  tex_amp = 0.1 + 0.2 * rng.rand()
  tex = value_noise(rng, size) - 0.5
  region = value_noise(rng, size, octaves=2)  # texture varies by region
  img = img + (tex_amp * tex * region)[:, :, None] * (
      0.5 + 0.5 * rng.rand(3))
  img = np.clip(img, 0.0, 1.0) ** rng.uniform(0.8, 1.2)
  return img.astype(np.float32)


_N_ELL_MAX = 14


def make_jax_synth(size):
  """jit-compiled equivalent of `synth_photo`: the numpy RandomState
  still draws every random number (so a (seed, size) pair keeps naming
  one dataset), but the full-resolution assembly runs jitted on the
  default jax device. Ellipses are padded to _N_ELL_MAX with an active
  mask so every image shares one compile."""
  import jax
  import jax.numpy as jnp

  octave_cells = [min(size, 4 * 2 ** o) for o in range(5)]

  def jvalue_noise(coarse_list, octaves, persistence=0.55):
    acc = jnp.zeros((size, size))
    amp, total = 1.0, 0.0
    for o in range(octaves):
      cells = octave_cells[o]
      coarse = coarse_list[o]
      idx = jnp.linspace(0, cells, size)
      i0 = jnp.minimum(idx.astype(jnp.int32), cells - 1)
      f = idx - i0
      rows0 = jnp.take(coarse, i0, axis=0)
      top = (jnp.take(rows0, i0, axis=1) * (1 - f)[None, :] +
             jnp.take(rows0, i0 + 1, axis=1) * f[None, :])
      rows1 = jnp.take(coarse, i0 + 1, axis=0)
      bot = (jnp.take(rows1, i0, axis=1) * (1 - f)[None, :] +
             jnp.take(rows1, i0 + 1, axis=1) * f[None, :])
      acc += amp * (top * (1 - f)[:, None] + bot * f[:, None])
      total += amp
      amp *= persistence
    return acc / total

  @jax.jit
  def assemble(ang, c0, c1, ell, active, tex_amp, tex_coarse,
               region_coarse, chan_amp, gamma):
    yy, xx = jnp.mgrid[0:size, 0:size] / size
    ramp = jnp.cos(ang) * xx + jnp.sin(ang) * yy
    ramp = (ramp - ramp.min()) / (jnp.ptp(ramp) + 1e-8)
    img = ramp[:, :, None] * c0 + (1 - ramp[:, :, None]) * c1

    for e in range(_N_ELL_MAX):
      cy, cx, ry, rx, th, sharp = ell[e, :6]
      color = ell[e, 6:9]
      dy, dx = yy * size - cy, xx * size - cx
      u = (jnp.cos(th) * dx + jnp.sin(th) * dy) / rx
      v = (-jnp.sin(th) * dx + jnp.cos(th) * dy) / ry
      d = jnp.sqrt(u * u + v * v)
      mask = jax.nn.sigmoid(-jnp.clip((d - 1.0) * sharp, -30, 30))
      mask = jnp.where(active[e], mask, 0.0)
      img = img * (1 - mask[:, :, None]) + mask[:, :, None] * color

    tex = jvalue_noise(tex_coarse, 5) - 0.5
    region = jvalue_noise(region_coarse, 2)
    img = img + (tex_amp * tex * region)[:, :, None] * chan_amp
    return jnp.clip(img, 0.0, 1.0) ** gamma

  def synth(rng):
    ang = rng.rand() * 2 * np.pi
    c0, c1 = rng.rand(3) * 0.6 + 0.2, rng.rand(3) * 0.6 + 0.2
    n_ell = int(rng.randint(6, 14))
    ell = np.zeros((_N_ELL_MAX, 9))
    active = np.zeros((_N_ELL_MAX,), bool)
    for e in range(n_ell):
      cy, cx = rng.rand(2) * size
      ry, rx = (0.05 + 0.25 * rng.rand(2)) * size
      th = rng.rand() * np.pi
      sharp = 10 ** rng.uniform(0.3, 2.5)
      color = rng.rand(3) * 0.8 + 0.1
      ell[e] = [cy, cx, ry, rx, th, sharp, *color]
      active[e] = True
    tex_amp = 0.1 + 0.2 * rng.rand()
    tex_coarse = tuple(rng.rand(c + 1, c + 1) for c in octave_cells)
    region_coarse = tuple(rng.rand(c + 1, c + 1) for c in octave_cells[:2])
    chan_amp = 0.5 + 0.5 * rng.rand(3)
    gamma = rng.uniform(0.8, 1.2)
    out = assemble(ang, c0, c1, ell, active, tex_amp, tex_coarse,
                   region_coarse, chan_amp, gamma)
    return np.asarray(out, np.float32)

  return synth


def make_jax_enhance(size, n_gammas=8, sigma=0.3, alpha=0.5, beta=1.0,
                     levels=5):
  """jit-compiled equivalent of `enhance` (same math as the numpy path,
  vmapped over the remap gammas). On an accelerator this turns the
  ~30 s/image numpy operator into milliseconds; used automatically when
  jax is importable, numpy remains the no-deps fallback."""
  import jax
  import jax.numpy as jnp

  def blur1d(x, axis):
    xp = jnp.moveaxis(x, axis, 0)
    pad = jnp.concatenate([xp[2:0:-1], xp, xp[-2:-4:-1]], axis=0)
    out = sum(w * jax.lax.slice_in_dim(pad, i, i + xp.shape[0], axis=0)
              for i, w in enumerate(_K5))
    return jnp.moveaxis(out, 0, axis)

  def jblur(x):
    return blur1d(blur1d(x, 0), 1)

  def jpyr_down(x):
    return jblur(x)[::2, ::2]

  def jpyr_up(x, shape):
    z = jnp.zeros(shape, x.dtype)
    z = z.at[::2, ::2].set(x)
    return 4.0 * jblur(z)

  def jgauss(x):
    gp = [x]
    for _ in range(levels):
      gp.append(jpyr_down(gp[-1]))
    return gp

  def jlap(x):
    gp = jgauss(x)
    return [gp[l] - jpyr_up(gp[l + 1], gp[l].shape) for l in range(levels)]

  def jremap(i, g):
    d = i - g
    ad = jnp.abs(d)
    detail = sigma * (jnp.maximum(ad, 1e-12) / sigma) ** alpha
    edge = beta * (ad - sigma) + sigma
    return g + jnp.sign(d) * jnp.where(ad <= sigma, detail, edge)

  gs = jnp.linspace(0.0, 1.0, n_gammas)

  @jax.jit
  def run(rgb):
    y = rgb @ jnp.asarray(_LUMA, jnp.float32)
    gp = jgauss(y)
    lps = jax.vmap(lambda g: tuple(jlap(jremap(y, g))))(gs)
    out = gp[levels]
    for l in reversed(range(levels)):
      t = jnp.clip(gp[l], 0.0, 1.0) * (n_gammas - 1)
      k0 = jnp.clip(jnp.floor(t).astype(jnp.int32), 0, n_gammas - 2)
      f = t - k0
      stack = lps[l]
      a = jnp.take_along_axis(stack, k0[None], 0)[0]
      b = jnp.take_along_axis(stack, (k0 + 1)[None], 0)[0]
      out = jpyr_up(out, gp[l].shape) + a * (1.0 - f) + b * f
    y2 = out
    return jnp.clip(rgb + (y2 - y)[:, :, None], 0.0, 1.0)

  return lambda rgb: np.asarray(run(jnp.asarray(rgb, jnp.float32)))


def write_split(root, n, size, seed, op_kwargs):
  from PIL import Image
  os.makedirs(os.path.join(root, 'input'), exist_ok=True)
  os.makedirs(os.path.join(root, 'output'), exist_ok=True)
  rng = np.random.RandomState(seed)
  try:
    op = make_jax_enhance(size, **op_kwargs)
    synth = make_jax_synth(size)
  except ImportError:
    op = lambda img: enhance(img, **op_kwargs)
    synth = lambda r: synth_photo(r, size)
  names = []
  for i in range(n):
    name = f'im{i:04d}.png'
    img = synth(rng)
    tgt = op(img)
    Image.fromarray((img * 255 + 0.5).astype(np.uint8)).save(
        os.path.join(root, 'input', name))
    Image.fromarray((tgt * 255 + 0.5).astype(np.uint8)).save(
        os.path.join(root, 'output', name))
    names.append(name)
    if (i + 1) % 20 == 0:
      print(f'{root}: {i + 1}/{n}')
  with open(os.path.join(root, 'filelist.txt'), 'w') as f:
    f.write('\n'.join(names) + '\n')


def main(argv=None):
  p = argparse.ArgumentParser(description=__doc__)
  p.add_argument('out')
  p.add_argument('--n_train', type=int, default=220)
  p.add_argument('--n_test', type=int, default=24)
  p.add_argument('--size', type=int, default=1024)
  p.add_argument('--seed', type=int, default=0)
  p.add_argument('--sigma', type=float, default=0.35)
  p.add_argument('--alpha', type=float, default=0.2)
  p.add_argument('--levels', type=int, default=5)
  args = p.parse_args(argv)
  op = dict(sigma=args.sigma, alpha=args.alpha, levels=args.levels)
  write_split(os.path.join(args.out, 'train'), args.n_train, args.size,
              args.seed, op)
  write_split(os.path.join(args.out, 'test'), args.n_test, args.size,
              args.seed + 10007, op)
  print('done')


if __name__ == '__main__':
  main()
