"""ctypes binding for the native data-plane library (libhdrnet_io.so).

Builds on first import via make (cached by mtime); every entry point has
a pure-numpy fallback so the framework works without a toolchain.
`AVAILABLE` tells you which path you got.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, 'libhdrnet_io.so')
_SRC = os.path.join(_DIR, 'hdrnet_io.cc')

_lib = None


def _build():
  subprocess.run(['make', '-s'], cwd=_DIR, check=True,
                 capture_output=True, text=True)


def _load():
  global _lib
  if _lib is not None:
    return _lib
  try:
    if (not os.path.exists(_SO)
        or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
      _build()
    lib = ctypes.CDLL(_SO)
  except Exception:
    return None

  i64 = ctypes.c_int64
  i32 = ctypes.c_int
  f32 = ctypes.c_float
  pf = ctypes.POINTER(ctypes.c_float)
  pu8 = ctypes.POINTER(ctypes.c_uint8)
  pu16 = ctypes.POINTER(ctypes.c_uint16)

  lib.to_float_u8.argtypes = [pu8, i64, f32, pf]
  lib.to_float_u16.argtypes = [pu16, i64, f32, pf]
  lib.resize_nearest_f32.argtypes = [pf, i32, i32, i32, pf, i32, i32]
  lib.resize_nearest_u8.argtypes = [pu8, i32, i32, i32, pu8, i32, i32]
  lib.resize_bilinear_f32.argtypes = [pf, i32, i32, i32, pf, i32, i32]
  lib.crop_flip_rot_f32.argtypes = [pf, i32, i32, i32, i32, i32, i32, i32,
                                    i32, i32, i32, pf]
  lib.crop_flip_rot_u8.argtypes = [pu8, i32, i32, i32, i32, i32, i32, i32,
                                   i32, i32, i32, pu8]
  lib.gaussian_blur_f32.argtypes = [pf, i32, i32, i32, f32, pf, pf]
  _lib = lib
  return lib


AVAILABLE = _load() is not None


def _ptr(a, ctype):
  return a.ctypes.data_as(ctypes.POINTER(ctype))


def to_float(img, white_level):
  """uint8/uint16/float HWC image -> float32 in [0, 1]."""
  lib = _load()
  if img.dtype == np.float32 or img.dtype == np.float64:
    return np.ascontiguousarray(img, np.float32)
  img = np.ascontiguousarray(img)
  out = np.empty(img.shape, np.float32)
  if lib is not None and img.dtype == np.uint8:
    lib.to_float_u8(_ptr(img, ctypes.c_uint8), img.size,
                    float(white_level), _ptr(out, ctypes.c_float))
  elif lib is not None and img.dtype == np.uint16:
    lib.to_float_u16(_ptr(img, ctypes.c_uint16), img.size,
                     float(white_level), _ptr(out, ctypes.c_float))
  else:
    out = img.astype(np.float32) / float(white_level)
  return out


def _as_bytes_hwc(img):
  """Views an integer HWC image as uint8 with c*itemsize 'channels' —
  index-permutation ops (crop/flip/rot/nearest) are dtype-blind."""
  h, w, c = img.shape
  return img.view(np.uint8).reshape(h, w, c * img.dtype.itemsize)


def resize_nearest(img, size):
  """Legacy-TF nearest resize of an HWC image (float32, uint8, or
  uint16 — nearest sampling is a pure index permutation)."""
  oh, ow = size
  ih, iw, c = img.shape
  if (ih, iw) == (oh, ow):
    return img
  lib = _load()
  if lib is None:
    iy = np.minimum((np.arange(oh) * (ih / oh)).astype(np.int64), ih - 1)
    ix = np.minimum((np.arange(ow) * (iw / ow)).astype(np.int64), iw - 1)
    return np.ascontiguousarray(img[iy][:, ix])
  if img.dtype in (np.uint8, np.uint16):
    dtype = img.dtype
    b = _as_bytes_hwc(np.ascontiguousarray(img))
    bc = b.shape[-1]
    out = np.empty((oh, ow, bc), np.uint8)
    lib.resize_nearest_u8(_ptr(b, ctypes.c_uint8), ih, iw, bc,
                          _ptr(out, ctypes.c_uint8), oh, ow)
    return out.view(dtype).reshape(oh, ow, c)
  img = np.ascontiguousarray(img, np.float32)
  out = np.empty((oh, ow, c), np.float32)
  lib.resize_nearest_f32(_ptr(img, ctypes.c_float), ih, iw, c,
                         _ptr(out, ctypes.c_float), oh, ow)
  return out


def resize_bilinear(img, size):
  """Legacy-TF bilinear resize of a float32 HWC image."""
  oh, ow = size
  ih, iw, c = img.shape
  if (ih, iw) == (oh, ow):
    return img
  lib = _load()
  img = np.ascontiguousarray(img, np.float32)
  out = np.empty((oh, ow, c), np.float32)
  if lib is None:
    fy = np.arange(oh) * (ih / oh)
    fx = np.arange(ow) * (iw / ow)
    y0 = np.minimum(fy.astype(np.int64), ih - 1)
    x0 = np.minimum(fx.astype(np.int64), iw - 1)
    y1 = np.minimum(y0 + 1, ih - 1)
    x1 = np.minimum(x0 + 1, iw - 1)
    wy = (fy - fy.astype(np.int64)).astype(np.float32)[:, None, None]
    wx = (fx - fx.astype(np.int64)).astype(np.float32)[None, :, None]
    top = img[y0][:, x0] * (1 - wx) + img[y0][:, x1] * wx
    bot = img[y1][:, x0] * (1 - wx) + img[y1][:, x1] * wx
    return top * (1 - wy) + bot * wy
  lib.resize_bilinear_f32(_ptr(img, ctypes.c_float), ih, iw, c,
                          _ptr(out, ctypes.c_float), oh, ow)
  return out


def crop_flip_rot(img, y0, x0, ch, cw, fliplr=False, flipud=False,
                  rot_k=0):
  """Fused crop + flips + rot90(k) of an HWC image (float32, uint8, or
  uint16 — the op is a pure index permutation)."""
  ih, iw, c = img.shape
  k = rot_k % 4
  oh, ow = (cw, ch) if k % 2 else (ch, cw)
  lib = _load()
  if lib is None:
    x = img[y0:y0 + ch, x0:x0 + cw]
    if fliplr:
      x = x[:, ::-1]
    if flipud:
      x = x[::-1]
    return np.ascontiguousarray(np.rot90(x, k))
  if img.dtype in (np.uint8, np.uint16):
    dtype = img.dtype
    b = _as_bytes_hwc(np.ascontiguousarray(img))
    bc = b.shape[-1]
    out = np.empty((oh, ow, bc), np.uint8)
    lib.crop_flip_rot_u8(_ptr(b, ctypes.c_uint8), ih, iw, bc,
                         int(y0), int(x0), int(ch), int(cw),
                         int(bool(fliplr)), int(bool(flipud)), int(k),
                         _ptr(out, ctypes.c_uint8))
    return out.view(dtype).reshape(oh, ow, c)
  img = np.ascontiguousarray(img, np.float32)
  out = np.empty((oh, ow, c), np.float32)
  lib.crop_flip_rot_f32(_ptr(img, ctypes.c_float), ih, iw, c,
                        int(y0), int(x0), int(ch), int(cw),
                        int(bool(fliplr)), int(bool(flipud)), int(k),
                        _ptr(out, ctypes.c_float))
  return out


def gaussian_blur(img, sigma):
  """Separable Gaussian blur (symmetric boundary) of a float32 HWC image."""
  ih, iw, c = img.shape
  lib = _load()
  img = np.ascontiguousarray(img, np.float32)
  if lib is None:
    radius = max(1, int(sigma * 3.0 + 0.5))
    d = np.arange(-radius, radius + 1, dtype=np.float32)
    kern = np.exp(-0.5 * d * d / (sigma * sigma))
    kern /= kern.sum()
    pad = np.pad(img, ((radius, radius), (0, 0), (0, 0)), mode='symmetric')
    tmp = sum(kern[i] * pad[i:i + ih] for i in range(2 * radius + 1))
    pad = np.pad(tmp, ((0, 0), (radius, radius), (0, 0)), mode='symmetric')
    return sum(kern[i] * pad[:, i:i + iw] for i in range(2 * radius + 1))
  tmp = np.empty_like(img)
  out = np.empty_like(img)
  lib.gaussian_blur_f32(_ptr(img, ctypes.c_float), ih, iw, c,
                        float(sigma), _ptr(tmp, ctypes.c_float),
                        _ptr(out, ctypes.c_float))
  return out
