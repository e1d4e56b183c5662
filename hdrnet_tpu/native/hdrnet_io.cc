// Native data-plane kernels for the hdrnet_tpu input pipeline.
//
// TPU-native counterpart of the reference's native data plane (its
// queue-runner decode/augment graph ops, data_pipeline.py:107-171, ran
// as C++ TF kernels; its deployment preprocessing used OpenCV,
// benchmark/src/processor.cc:110-122). The TPU does the learning; the
// host does decode -> normalize -> geometric augment -> downsample, and
// those inner loops live here rather than in Python.
//
// Build: make (produces libhdrnet_io.so); bound via ctypes with a
// pure-numpy fallback (hdrnet_tpu/native/__init__.py).
//
// All images are HWC, C-contiguous. Output buffers are caller-allocated.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>

extern "C" {

// ---------------------------------------------------------------------
// Normalize: integer image -> float32 in [0, 1] by white level.
// ---------------------------------------------------------------------

void to_float_u8(const uint8_t* src, int64_t n, float white, float* dst) {
  const float inv = 1.0f / white;
  // Hoist a 256-entry LUT: decode is bandwidth-bound, the LUT removes
  // the int->float convert from the loop.
  float lut[256];
  for (int i = 0; i < 256; ++i) lut[i] = i * inv;
  for (int64_t i = 0; i < n; ++i) dst[i] = lut[src[i]];
}

void to_float_u16(const uint16_t* src, int64_t n, float white, float* dst) {
  const float inv = 1.0f / white;
  for (int64_t i = 0; i < n; ++i) dst[i] = src[i] * inv;
}

// ---------------------------------------------------------------------
// Nearest resize, legacy TF1 convention: src_idx = floor(dst * in/out)
// (data_pipeline.py:165-169 downsamples the lowres input this way).
// ---------------------------------------------------------------------

void resize_nearest_f32(const float* src, int ih, int iw, int c,
                        float* dst, int oh, int ow) {
  const double sy = static_cast<double>(ih) / oh;
  const double sx = static_cast<double>(iw) / ow;
  // Precompute x index table (row-invariant).
  int* xs = new int[ow];
  for (int x = 0; x < ow; ++x) {
    int v = static_cast<int>(x * sx);
    xs[x] = std::min(v, iw - 1);
  }
  for (int y = 0; y < oh; ++y) {
    const int ys = std::min(static_cast<int>(y * sy), ih - 1);
    const float* srow = src + static_cast<int64_t>(ys) * iw * c;
    float* drow = dst + static_cast<int64_t>(y) * ow * c;
    if (c == 3) {
      for (int x = 0; x < ow; ++x) {
        const float* p = srow + xs[x] * 3;
        drow[3 * x] = p[0];
        drow[3 * x + 1] = p[1];
        drow[3 * x + 2] = p[2];
      }
    } else {
      for (int x = 0; x < ow; ++x) {
        std::memcpy(drow + static_cast<int64_t>(x) * c,
                    srow + static_cast<int64_t>(xs[x]) * c,
                    sizeof(float) * c);
      }
    }
  }
  delete[] xs;
}

// ---------------------------------------------------------------------
// Bilinear resize, legacy TF1 convention (align_corners=false,
// src = dst * in/out) — used by the augmentation resize
// (data_pipeline.py:161-162).
// ---------------------------------------------------------------------

void resize_bilinear_f32(const float* src, int ih, int iw, int c,
                         float* dst, int oh, int ow) {
  const double sy = static_cast<double>(ih) / oh;
  const double sx = static_cast<double>(iw) / ow;
  int* x0s = new int[ow];
  int* x1s = new int[ow];
  float* fxs = new float[ow];
  for (int x = 0; x < ow; ++x) {
    const double fx = x * sx;
    int x0 = static_cast<int>(fx);
    x0s[x] = std::min(x0, iw - 1);
    x1s[x] = std::min(x0 + 1, iw - 1);
    fxs[x] = static_cast<float>(fx - x0);
  }
  for (int y = 0; y < oh; ++y) {
    const double fy = y * sy;
    int y0 = std::min(static_cast<int>(fy), ih - 1);
    int y1 = std::min(y0 + 1, ih - 1);
    const float wy = static_cast<float>(fy - static_cast<int>(fy));
    const float* r0 = src + static_cast<int64_t>(y0) * iw * c;
    const float* r1 = src + static_cast<int64_t>(y1) * iw * c;
    float* drow = dst + static_cast<int64_t>(y) * ow * c;
    for (int x = 0; x < ow; ++x) {
      const float* a0 = r0 + static_cast<int64_t>(x0s[x]) * c;
      const float* b0 = r0 + static_cast<int64_t>(x1s[x]) * c;
      const float* a1 = r1 + static_cast<int64_t>(x0s[x]) * c;
      const float* b1 = r1 + static_cast<int64_t>(x1s[x]) * c;
      const float wx = fxs[x];
      for (int k = 0; k < c; ++k) {
        const float top = a0[k] + (b0[k] - a0[k]) * wx;
        const float bot = a1[k] + (b1[k] - a1[k]) * wx;
        drow[static_cast<int64_t>(x) * c + k] = top + (bot - top) * wy;
      }
    }
  }
  delete[] x0s;
  delete[] x1s;
  delete[] fxs;
}

// ---------------------------------------------------------------------
// Fused geometric augment: crop (y0, x0, ch, cw) from the source, then
// optional fliplr/flipud/rot90(k). One pass, no intermediates.
// Output is (oh, ow, c) where (oh, ow) = (cw, ch) for odd k else
// (ch, cw).
// ---------------------------------------------------------------------

void crop_flip_rot_f32(const float* src, int ih, int iw, int c,
                       int y0, int x0, int ch, int cw,
                       int fliplr, int flipud, int rot_k,
                       float* dst) {
  const int k = ((rot_k % 4) + 4) % 4;
  const int oh = (k % 2) ? cw : ch;
  const int ow = (k % 2) ? ch : cw;
  (void)ih;
  for (int oy = 0; oy < oh; ++oy) {
    for (int ox = 0; ox < ow; ++ox) {
      // Invert rot90 (numpy convention: rot90 k=1 maps (y,x)->(x, H-1-y),
      // i.e. out[y, x] = in[x, W_in-1-y] for k=1).
      int cy, cx;
      switch (k) {
        case 0: cy = oy; cx = ox; break;
        case 1: cy = ox; cx = cw - 1 - oy; break;
        case 2: cy = ch - 1 - oy; cx = cw - 1 - ox; break;
        default: cy = ch - 1 - ox; cx = oy; break;
      }
      // Invert flips (applied before rotation, on the cropped frame).
      if (fliplr) cx = cw - 1 - cx;
      if (flipud) cy = ch - 1 - cy;
      const float* p =
          src + (static_cast<int64_t>(y0 + cy) * iw + (x0 + cx)) * c;
      float* q = dst + (static_cast<int64_t>(oy) * ow + ox) * c;
      for (int j = 0; j < c; ++j) q[j] = p[j];
    }
  }
}

// Byte variant (device-normalize pipelines keep samples in their raw
// dtype end-to-end; crop/flips/rot90 are pure index permutations, so
// they run on bytes and the TPU does the [0,1] normalize in-step).
void crop_flip_rot_u8(const uint8_t* src, int ih, int iw, int c,
                      int y0, int x0, int ch, int cw,
                      int fliplr, int flipud, int rot_k,
                      uint8_t* dst) {
  const int k = ((rot_k % 4) + 4) % 4;
  const int oh = (k % 2) ? cw : ch;
  const int ow = (k % 2) ? ch : cw;
  (void)ih;
  for (int oy = 0; oy < oh; ++oy) {
    for (int ox = 0; ox < ow; ++ox) {
      int cy, cx;
      switch (k) {
        case 0: cy = oy; cx = ox; break;
        case 1: cy = ox; cx = cw - 1 - oy; break;
        case 2: cy = ch - 1 - oy; cx = cw - 1 - ox; break;
        default: cy = ch - 1 - ox; cx = oy; break;
      }
      if (fliplr) cx = cw - 1 - cx;
      if (flipud) cy = ch - 1 - cy;
      const uint8_t* p =
          src + (static_cast<int64_t>(y0 + cy) * iw + (x0 + cx)) * c;
      uint8_t* q = dst + (static_cast<int64_t>(oy) * ow + ox) * c;
      for (int j = 0; j < c; ++j) q[j] = p[j];
    }
  }
}

// Byte variant of the nearest resize (same TF1 index convention).
void resize_nearest_u8(const uint8_t* src, int ih, int iw, int c,
                       uint8_t* dst, int oh, int ow) {
  const double sy = static_cast<double>(ih) / oh;
  const double sx = static_cast<double>(iw) / ow;
  int* xs = new int[ow];
  for (int x = 0; x < ow; ++x) {
    int v = static_cast<int>(x * sx);
    xs[x] = std::min(v, iw - 1);
  }
  for (int y = 0; y < oh; ++y) {
    const int ys = std::min(static_cast<int>(y * sy), ih - 1);
    const uint8_t* srow = src + static_cast<int64_t>(ys) * iw * c;
    uint8_t* drow = dst + static_cast<int64_t>(y) * ow * c;
    for (int x = 0; x < ow; ++x) {
      std::memcpy(drow + static_cast<int64_t>(x) * c,
                  srow + static_cast<int64_t>(xs[x]) * c, c);
    }
  }
  delete[] xs;
}

// ---------------------------------------------------------------------
// Separable Gaussian blur (reflect boundary) — the unsharp-mask
// synthetic pipeline's kernel (scripts/usm/*.sh --blur_sigma).
// ---------------------------------------------------------------------

void gaussian_blur_f32(const float* src, int h, int w, int c,
                       float sigma, float* tmp, float* dst) {
  int radius = static_cast<int>(sigma * 3.0f + 0.5f);
  if (radius < 1) radius = 1;
  const int ksz = 2 * radius + 1;
  float* kern = new float[ksz];
  float sum = 0.f;
  for (int i = 0; i < ksz; ++i) {
    const float d = static_cast<float>(i - radius);
    kern[i] = std::exp(-0.5f * d * d / (sigma * sigma));
    sum += kern[i];
  }
  for (int i = 0; i < ksz; ++i) kern[i] /= sum;

  auto reflect = [](int i, int n) {
    while (i < 0 || i >= n) {
      if (i < 0) i = -i - 1;
      if (i >= n) i = 2 * n - 1 - i;
    }
    return i;
  };

  // Horizontal pass: src -> tmp
  for (int y = 0; y < h; ++y) {
    const float* srow = src + static_cast<int64_t>(y) * w * c;
    float* trow = tmp + static_cast<int64_t>(y) * w * c;
    for (int x = 0; x < w; ++x) {
      for (int j = 0; j < c; ++j) {
        float acc = 0.f;
        for (int i = 0; i < ksz; ++i) {
          const int xx = reflect(x + i - radius, w);
          acc += kern[i] * srow[static_cast<int64_t>(xx) * c + j];
        }
        trow[static_cast<int64_t>(x) * c + j] = acc;
      }
    }
  }
  // Vertical pass: tmp -> dst
  for (int y = 0; y < h; ++y) {
    float* drow = dst + static_cast<int64_t>(y) * w * c;
    for (int i = 0; i < ksz; ++i) {
      const int yy = reflect(y + i - radius, h);
      const float* trow = tmp + static_cast<int64_t>(yy) * w * c;
      const float kv = kern[i];
      if (i == 0) {
        for (int64_t t = 0; t < static_cast<int64_t>(w) * c; ++t)
          drow[t] = kv * trow[t];
      } else {
        for (int64_t t = 0; t < static_cast<int64_t>(w) * c; ++t)
          drow[t] += kv * trow[t];
      }
    }
  }
  delete[] kern;
}

}  // extern "C"
