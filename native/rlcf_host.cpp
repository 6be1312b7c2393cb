// rlcf_host: native host-side image pipeline for rlcf-tpu.
//
// Replaces the reference's PIL/DataLoader-worker augmentation path
// (TPT/data/datautils.py + augmix_ops.py) with a C++ implementation of the
// same operations for hosts where Python-side preprocessing is the
// bottleneck: bilinear/bicubic resize, center crop, RandomResizedCrop +
// horizontal flip, the 9 AugMix ops, Dirichlet/Beta mixing, and CLIP
// normalization. A std::thread pool fans work across images.
//
// Exposed as a C ABI consumed via ctypes (rlcf_tpu/data/native.py).

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <random>
#include <thread>
#include <vector>

// Optional image-codec section (JPEG via libjpeg, PNG via libpng): decode +
// canonicalize in one native call so the host data loader never touches PIL
// on the hot path. Compiled in when the build has the codec headers
// (-DRLCF_WITH_CODECS -ljpeg -lpng); the Python side probes the symbols and
// falls back to PIL per image otherwise.
#if defined(RLCF_WITH_CODECS)
#include <csetjmp>
#include <cstdio>
#include <jpeglib.h>
#include <png.h>
#endif

namespace {

constexpr float kClipMean[3] = {0.48145466f, 0.4578275f, 0.40821073f};
constexpr float kClipStd[3] = {0.26862954f, 0.26130258f, 0.27577711f};

struct ImageU8 {
  std::vector<uint8_t> data;
  int h = 0, w = 0;
  uint8_t* px(int y, int x) { return data.data() + (static_cast<size_t>(y) * w + x) * 3; }
  const uint8_t* px(int y, int x) const {
    return data.data() + (static_cast<size_t>(y) * w + x) * 3;
  }
};

inline uint8_t clamp_u8(float v) {
  return static_cast<uint8_t>(std::min(255.0f, std::max(0.0f, v + 0.5f)));
}

// --- resampling -----------------------------------------------------------

inline float cubic_weight(float x) {
  // Catmull-Rom style kernel with a = -0.5 (PIL's bicubic).
  const float a = -0.5f;
  x = std::fabs(x);
  if (x < 1.0f) return ((a + 2.0f) * x - (a + 3.0f)) * x * x + 1.0f;
  if (x < 2.0f) return (((x - 5.0f) * x + 8.0f) * x - 4.0f) * a;
  return 0.0f;
}

// General separable resize of the box [bx0,by0,bx1,by1] to (out_w,out_h).
// kernel_radius: 1 = bilinear, 2 = bicubic. Antialiases on downscale by
// stretching the kernel (PIL semantics).
void resize_box(const ImageU8& src, ImageU8& dst, float bx0, float by0, float bx1, float by1,
                int out_w, int out_h, int kernel_radius) {
  dst.h = out_h;
  dst.w = out_w;
  dst.data.assign(static_cast<size_t>(out_w) * out_h * 3, 0);
  const float scale_x = (bx1 - bx0) / out_w;
  const float scale_y = (by1 - by0) / out_h;
  const float support_x = kernel_radius * std::max(1.0f, scale_x);
  const float support_y = kernel_radius * std::max(1.0f, scale_y);
  const float inv_sx = 1.0f / std::max(1.0f, scale_x);
  const float inv_sy = 1.0f / std::max(1.0f, scale_y);

  // Precompute per-output-coordinate taps with NORMALIZED weights (folds the
  // 1/total divide into the weights) for both axes.
  auto build_taps = [&](float b0, float scale, float support, float inv_s, int src_n, int out_n,
                        std::vector<int>& mins, std::vector<int>& counts, std::vector<float>& ws,
                        int& max_count) {
    mins.resize(out_n);
    counts.resize(out_n);
    max_count = 0;
    for (int o = 0; o < out_n; ++o) {
      const float center = b0 + (o + 0.5f) * scale;
      const int lo = std::max(0, static_cast<int>(std::floor(center - support)));
      const int hi = std::min(src_n - 1, static_cast<int>(std::ceil(center + support)));
      mins[o] = lo;
      counts[o] = hi - lo + 1;
      max_count = std::max(max_count, counts[o]);
    }
    ws.assign(static_cast<size_t>(out_n) * max_count, 0.0f);
    for (int o = 0; o < out_n; ++o) {
      const float center = b0 + (o + 0.5f) * scale;
      float total = 0.0f;
      float* row = ws.data() + static_cast<size_t>(o) * max_count;
      for (int i = 0; i < counts[o]; ++i) {
        const int s = mins[o] + i;
        const float w = (kernel_radius == 1)
                            ? std::max(0.0f, 1.0f - std::fabs((s + 0.5f - center) * inv_s))
                            : cubic_weight((s + 0.5f - center) * inv_s);
        row[i] = w;
        total += w;
      }
      if (total <= 0.0f) total = 1.0f;
      for (int i = 0; i < counts[o]; ++i) row[i] /= total;
    }
  };

  std::vector<int> xmin, xcnt, ymin, ycnt;
  std::vector<float> xw, yw;
  int xmax_c = 0, ymax_c = 0;
  build_taps(bx0, scale_x, support_x, inv_sx, src.w, out_w, xmin, xcnt, xw, xmax_c);
  build_taps(by0, scale_y, support_y, inv_sy, src.h, out_h, ymin, ycnt, yw, ymax_c);

  // horizontal pass, row-major (source row stays in cache)
  std::vector<float> tmp(static_cast<size_t>(src.h) * out_w * 3, 0.0f);
  for (int y = 0; y < src.h; ++y) {
    const uint8_t* srow = src.px(y, 0);
    float* trow = tmp.data() + static_cast<size_t>(y) * out_w * 3;
    for (int ox = 0; ox < out_w; ++ox) {
      const float* w = xw.data() + static_cast<size_t>(ox) * xmax_c;
      const uint8_t* p = srow + 3 * xmin[ox];
      float a0 = 0, a1 = 0, a2 = 0;
      for (int i = 0; i < xcnt[ox]; ++i) {
        a0 += w[i] * p[3 * i + 0];
        a1 += w[i] * p[3 * i + 1];
        a2 += w[i] * p[3 * i + 2];
      }
      trow[3 * ox + 0] = a0;
      trow[3 * ox + 1] = a1;
      trow[3 * ox + 2] = a2;
    }
  }
  // vertical pass as row SAXPYs over the float intermediate (vectorizes)
  std::vector<float> accrow(static_cast<size_t>(out_w) * 3);
  const int row_n = out_w * 3;
  for (int oy = 0; oy < out_h; ++oy) {
    std::fill(accrow.begin(), accrow.end(), 0.0f);
    const float* w = yw.data() + static_cast<size_t>(oy) * ymax_c;
    for (int i = 0; i < ycnt[oy]; ++i) {
      const float wi = w[i];
      const float* trow = tmp.data() + (static_cast<size_t>(ymin[oy]) + i) * out_w * 3;
      for (int j = 0; j < row_n; ++j) accrow[j] += wi * trow[j];
    }
    uint8_t* drow = dst.px(oy, 0);
    for (int j = 0; j < row_n; ++j) drow[j] = clamp_u8(accrow[j]);
  }
}

// --- affine (PIL AFFINE semantics: out(x,y) <- in(a x + b y + c, ...)) -----

// x-only resample: in_y == y exactly (AugMix shear-x / translate-x), so only
// the dy==0 taps of the general path contribute. in_x uses the general path's
// f32 summation order; compiler FMA contraction can still flip the final
// rounding by +-1 gray level on ~1e-5 of pixels (well inside the PIL-parity
// tolerance). The win is 2 taps instead of 4 and one combined bounds check.
void affine_x_only(const ImageU8& src, ImageU8& dst, float b, float c) {
  dst.h = src.h;
  dst.w = src.w;
  dst.data.assign(src.data.size(), 0);
  for (int y = 0; y < src.h; ++y) {
    // in_x = x + t with t CONSTANT along the row (a == 1): the whole row is
    // one two-tap blend with fixed weights — a contiguous fixed-point (16.16)
    // pass the compiler vectorizes, or a straight memcpy when t is integral.
    const float t = b * (y + 0.5f) + c;
    const int k = static_cast<int>(std::floor(t));
    const float fr = t - k;
    const int w1 = static_cast<int>(fr * 65536.0f + 0.5f);
    const int w0 = 65536 - w1;
    const uint8_t* srow = src.px(y, 0);
    uint8_t* drow = dst.px(y, 0);
    // interior: both taps x+k and x+k+1 in bounds
    const int x_lo = std::max(0, -k);
    const int x_hi = std::min(src.w - 1, src.w - 2 - k);  // inclusive
    if (x_hi >= x_lo) {
      const uint8_t* s = srow + 3 * (static_cast<size_t>(x_lo) + k);
      uint8_t* d = drow + 3 * static_cast<size_t>(x_lo);
      const int n = (x_hi - x_lo + 1) * 3;
      if (w1 == 0) {
        std::memcpy(d, s, n);
      } else {
        for (int i = 0; i < n; ++i)
          d[i] = static_cast<uint8_t>((w0 * s[i] + w1 * s[i + 3]) >> 16);
      }
    }
    auto edge = [&](int x) {
      const int x0 = x + k;
      float acc[3] = {0, 0, 0};
      if (x0 >= 0 && x0 < src.w) {
        const uint8_t* p = srow + 3 * x0;
        acc[0] += (1.0f - fr) * p[0];
        acc[1] += (1.0f - fr) * p[1];
        acc[2] += (1.0f - fr) * p[2];
      }
      if (x0 + 1 >= 0 && x0 + 1 < src.w) {
        const uint8_t* p = srow + 3 * (x0 + 1);
        acc[0] += fr * p[0];
        acc[1] += fr * p[1];
        acc[2] += fr * p[2];
      }
      uint8_t* o = drow + 3 * x;
      o[0] = clamp_u8(acc[0] - 0.5f);
      o[1] = clamp_u8(acc[1] - 0.5f);
      o[2] = clamp_u8(acc[2] - 0.5f);
    };
    for (int x = 0; x < std::min(x_lo, src.w); ++x) edge(x);
    for (int x = std::max(x_lo, x_hi + 1); x < src.w; ++x) edge(x);
  }
}

// y-only resample: in_x == x exactly (AugMix shear-y / translate-y).
void affine_y_only(const ImageU8& src, ImageU8& dst, float d, float f) {
  dst.h = src.h;
  dst.w = src.w;
  dst.data.assign(src.data.size(), 0);
  if (d == 0.0f) {
    // translate-y: in_y = y + f with f constant — each output row is a
    // two-row blend with fixed weights (contiguous fixed-point pass), or a
    // row memcpy when f is integral (AugMix translate uses integer offsets).
    const int k = static_cast<int>(std::floor(f));
    const float fr = f - k;
    const int w1 = static_cast<int>(fr * 65536.0f + 0.5f);
    const int w0 = 65536 - w1;
    const int row_n = src.w * 3;
    for (int y = 0; y < src.h; ++y) {
      const int y0 = y + k;
      uint8_t* drow = dst.px(y, 0);
      const bool a_ok = y0 >= 0 && y0 < src.h;
      const bool b_ok = y0 + 1 >= 0 && y0 + 1 < src.h;
      if (a_ok && (w1 == 0 || b_ok)) {
        const uint8_t* ra = src.px(y0, 0);
        if (w1 == 0) {
          std::memcpy(drow, ra, row_n);
        } else {
          const uint8_t* rb = src.px(y0 + 1, 0);
          for (int i = 0; i < row_n; ++i)
            drow[i] = static_cast<uint8_t>((w0 * ra[i] + w1 * rb[i]) >> 16);
        }
      } else {  // boundary rows: scalar with bounds handling
        for (int i = 0; i < row_n; ++i) {
          float acc = 0;
          if (a_ok) acc += (1.0f - fr) * src.px(y0, 0)[i];
          if (b_ok) acc += fr * src.px(y0 + 1, 0)[i];
          drow[i] = clamp_u8(acc - 0.5f);
        }
      }
    }
    return;
  }
  // shear-y: per-column offset/weights are row-invariant — precompute them
  // once (fixed point) instead of floor/frac per pixel.
  std::vector<int> ky(src.w);
  std::vector<int> w1v(src.w);
  for (int x = 0; x < src.w; ++x) {
    const float t = d * (x + 0.5f) + f;
    const int k = static_cast<int>(std::floor(t));
    ky[x] = k;
    w1v[x] = static_cast<int>((t - k) * 65536.0f + 0.5f);
  }
  for (int y = 0; y < src.h; ++y) {
    uint8_t* drow = dst.px(y, 0);
    for (int x = 0; x < src.w; ++x) {
      const int y0 = y + ky[x];
      const int w1 = w1v[x];
      const int w0 = 65536 - w1;
      uint8_t* o = drow + 3 * x;
      if (y0 >= 0 && y0 + 1 < src.h) {
        const uint8_t* pa = src.px(y0, x);
        const uint8_t* pb = src.px(y0 + 1, x);
        o[0] = static_cast<uint8_t>((w0 * pa[0] + w1 * pb[0]) >> 16);
        o[1] = static_cast<uint8_t>((w0 * pa[1] + w1 * pb[1]) >> 16);
        o[2] = static_cast<uint8_t>((w0 * pa[2] + w1 * pb[2]) >> 16);
      } else {
        const float fr = w1 / 65536.0f;
        float acc[3] = {0, 0, 0};
        if (y0 >= 0 && y0 < src.h) {
          const uint8_t* p = src.px(y0, x);
          acc[0] += (1.0f - fr) * p[0];
          acc[1] += (1.0f - fr) * p[1];
          acc[2] += (1.0f - fr) * p[2];
        }
        if (y0 + 1 >= 0 && y0 + 1 < src.h) {
          const uint8_t* p = src.px(y0 + 1, x);
          acc[0] += fr * p[0];
          acc[1] += fr * p[1];
          acc[2] += fr * p[2];
        }
        o[0] = clamp_u8(acc[0] - 0.5f);
        o[1] = clamp_u8(acc[1] - 0.5f);
        o[2] = clamp_u8(acc[2] - 0.5f);
      }
    }
  }
}

void affine_bilinear(const ImageU8& src, ImageU8& dst, float a, float b, float c, float d,
                     float e, float f) {
  // axis-aligned fast paths (shear/translate, 4 of AugMix's 5 warp ops)
  if (a == 1.0f && e == 1.0f && d == 0.0f && f == 0.0f) return affine_x_only(src, dst, b, c);
  if (a == 1.0f && e == 1.0f && b == 0.0f && c == 0.0f) return affine_y_only(src, dst, d, f);
  dst.h = src.h;
  dst.w = src.w;
  dst.data.assign(src.data.size(), 0);
  // General path (rotate): fixed-point 16.16 incremental stepping — source
  // coords advance by constant (a, d) per output x, so the inner loop is
  // integer adds + an 8-bit-weight 4-tap blend (no per-pixel floor/float
  // math). Interior pixels (all 4 taps in bounds) take the branch-light
  // loop; boundary pixels fall back to the checked scalar blend.
  const int64_t Ax = llroundf(a * 65536.0f);
  const int64_t Dx = llroundf(d * 65536.0f);
  for (int y = 0; y < src.h; ++y) {
    int64_t fx = llroundf((a * 0.5f + b * (y + 0.5f) + c - 0.5f) * 65536.0f);
    int64_t fy = llroundf((d * 0.5f + e * (y + 0.5f) + f - 0.5f) * 65536.0f);
    uint8_t* drow = dst.px(y, 0);
    const size_t stride = static_cast<size_t>(src.w) * 3;
    for (int x = 0; x < src.w; ++x, fx += Ax, fy += Dx) {
      const int x0 = static_cast<int>(fx >> 16);
      const int y0 = static_cast<int>(fy >> 16);
      uint8_t* o = drow + 3 * x;
      if (x0 >= 0 && x0 + 1 < src.w && y0 >= 0 && y0 + 1 < src.h) {
        const int wx = static_cast<int>((fx >> 8) & 0xFF);  // 8-bit fractions
        const int wy = static_cast<int>((fy >> 8) & 0xFF);
        const int w00 = (256 - wx) * (256 - wy);
        const int w01 = wx * (256 - wy);
        const int w10 = (256 - wx) * wy;
        const int w11 = wx * wy;
        const uint8_t* p0 = src.px(y0, x0);
        const uint8_t* p1 = p0 + stride;
        o[0] = static_cast<uint8_t>((w00 * p0[0] + w01 * p0[3] + w10 * p1[0] + w11 * p1[3]) >> 16);
        o[1] = static_cast<uint8_t>((w00 * p0[1] + w01 * p0[4] + w10 * p1[1] + w11 * p1[4]) >> 16);
        o[2] = static_cast<uint8_t>((w00 * p0[2] + w01 * p0[5] + w10 * p1[2] + w11 * p1[5]) >> 16);
        continue;
      }
      const float wxf = static_cast<float>(fx & 0xFFFF) / 65536.0f;
      const float wyf = static_cast<float>(fy & 0xFFFF) / 65536.0f;
      float acc[3] = {0, 0, 0};
      for (int dy = 0; dy < 2; ++dy) {
        for (int dx2 = 0; dx2 < 2; ++dx2) {
          const int sx = x0 + dx2;
          const int sy = y0 + dy;
          if (sx < 0 || sx >= src.w || sy < 0 || sy >= src.h) continue;
          const float w = (dx2 ? wxf : 1 - wxf) * (dy ? wyf : 1 - wyf);
          const uint8_t* p = src.px(sy, sx);
          acc[0] += w * p[0];
          acc[1] += w * p[1];
          acc[2] += w * p[2];
        }
      }
      o[0] = clamp_u8(acc[0] - 0.5f);
      o[1] = clamp_u8(acc[1] - 0.5f);
      o[2] = clamp_u8(acc[2] - 0.5f);
    }
  }
}

// --- AugMix base ops (augmix_ops.py semantics, severity-parameterized) -----

void op_autocontrast(ImageU8& img) {
  for (int ch = 0; ch < 3; ++ch) {
    int lo = 255, hi = 0;
    for (size_t i = ch; i < img.data.size(); i += 3) {
      lo = std::min<int>(lo, img.data[i]);
      hi = std::max<int>(hi, img.data[i]);
    }
    if (hi <= lo) continue;
    uint8_t lut[256];
    for (int v = 0; v < 256; ++v) {
      const float scaled = (v - lo) * 255.0f / (hi - lo);
      lut[v] = static_cast<uint8_t>(std::min(255.0f, std::max(0.0f, std::floor(scaled + 1e-3f))));
    }
    for (size_t i = ch; i < img.data.size(); i += 3) img.data[i] = lut[img.data[i]];
  }
}

void op_equalize(ImageU8& img) {
  for (int ch = 0; ch < 3; ++ch) {
    int hist[256] = {0};
    for (size_t i = ch; i < img.data.size(); i += 3) hist[img.data[i]]++;
    int last_nz = 0;
    long total = 0;
    for (int v = 0; v < 256; ++v) {
      total += hist[v];
      if (hist[v]) last_nz = v;
    }
    const long step = (total - hist[last_nz]) / 255;
    if (step == 0) continue;
    uint8_t lut[256];
    long n = step / 2;
    for (int v = 0; v < 256; ++v) {
      lut[v] = static_cast<uint8_t>(std::min<long>(255, std::max<long>(0, n / step)));
      n += hist[v];
    }
    for (size_t i = ch; i < img.data.size(); i += 3) img.data[i] = lut[img.data[i]];
  }
}

void op_posterize(ImageU8& img, int bits) {
  const uint8_t mask = static_cast<uint8_t>((0xFF00 >> bits) & 0xFF);
  for (auto& v : img.data) v &= mask;
}

void op_solarize(ImageU8& img, int threshold) {
  for (auto& v : img.data)
    if (v >= threshold) v = static_cast<uint8_t>(255 - v);
}

// --- RNG matching numpy-ish distributions ---------------------------------

struct Rng {
  std::mt19937_64 gen;
  explicit Rng(uint64_t seed) : gen(seed) {}
  float uniform(float lo = 0.0f, float hi = 1.0f) {
    return std::uniform_real_distribution<float>(lo, hi)(gen);
  }
  int randint(int lo, int hi) {  // [lo, hi)
    return std::uniform_int_distribution<int>(lo, hi - 1)(gen);
  }
  float gamma1() { return std::gamma_distribution<float>(1.0f, 1.0f)(gen); }
};

float sample_level(Rng& rng, float severity) { return rng.uniform(0.1f, severity); }

void apply_random_op(ImageU8& img, Rng& rng, float severity, int image_size) {
  const int op = rng.randint(0, 9);
  const float level = sample_level(rng, severity);
  const float sign = rng.uniform() > 0.5f ? 1.0f : -1.0f;
  ImageU8 out;
  switch (op) {
    case 0: op_autocontrast(img); return;
    case 1: op_equalize(img); return;
    case 2: op_posterize(img, 4 - static_cast<int>(level * 4 / 10)); return;
    case 3: {
      const float deg = sign * static_cast<int>(level * 30 / 10);
      const float rad = -deg * 3.14159265358979323846f / 180.0f;
      const float cx = img.w / 2.0f, cy = img.h / 2.0f;
      const float ca = std::cos(rad), sa = std::sin(rad);
      affine_bilinear(img, out, ca, sa, cx - cx * ca - cy * sa, -sa, ca, cy + cx * sa - cy * ca);
      img = std::move(out);
      return;
    }
    case 4: op_solarize(img, 256 - static_cast<int>(level * 256 / 10)); return;
    case 5: {
      const float lv = sign * (level * 0.3f / 10.0f);
      affine_bilinear(img, out, 1, lv, 0, 0, 1, 0);
      img = std::move(out);
      return;
    }
    case 6: {
      const float lv = sign * (level * 0.3f / 10.0f);
      affine_bilinear(img, out, 1, 0, 0, lv, 1, 0);
      img = std::move(out);
      return;
    }
    case 7: {
      const float lv = sign * static_cast<int>(level * (image_size / 3.0f) / 10.0f);
      affine_bilinear(img, out, 1, 0, lv, 0, 1, 0);
      img = std::move(out);
      return;
    }
    default: {
      const float lv = sign * static_cast<int>(level * (image_size / 3.0f) / 10.0f);
      affine_bilinear(img, out, 1, 0, 0, 0, 1, lv);
      img = std::move(out);
      return;
    }
  }
}

void random_resized_crop(const ImageU8& src, ImageU8& dst, Rng& rng, int size, float scale_min,
                         float scale_max) {
  const float area = static_cast<float>(src.w) * src.h;
  for (int attempt = 0; attempt < 10; ++attempt) {
    const float target = rng.uniform(scale_min, scale_max) * area;
    const float log_r = rng.uniform(std::log(3.0f / 4.0f), std::log(4.0f / 3.0f));
    const float aspect = std::exp(log_r);
    const int w = static_cast<int>(std::sqrt(target * aspect));
    const int h = static_cast<int>(std::sqrt(target / aspect));
    if (w > 0 && h > 0 && w <= src.w && h <= src.h) {
      const int left = rng.randint(0, src.w - w + 1);
      const int top = rng.randint(0, src.h - h + 1);
      resize_box(src, dst, left, top, left + w, top + h, size, size, 1);
      return;
    }
  }
  const int side = std::min(src.w, src.h);
  const int left = (src.w - side) / 2, top = (src.h - side) / 2;
  resize_box(src, dst, left, top, left + side, top + side, size, size, 1);
}

void hflip(ImageU8& img) {
  for (int y = 0; y < img.h; ++y)
    for (int x = 0; x < img.w / 2; ++x)
      for (int ch = 0; ch < 3; ++ch) std::swap(img.px(y, x)[ch], img.px(y, img.w - 1 - x)[ch]);
}

void normalize_into(const ImageU8& img, float* out) {
  const size_t n = static_cast<size_t>(img.h) * img.w;
  for (size_t i = 0; i < n; ++i)
    for (int ch = 0; ch < 3; ++ch)
      out[i * 3 + ch] = (img.data[i * 3 + ch] / 255.0f - kClipMean[ch]) / kClipStd[ch];
}

// Patch-major emitter: view pixels regrouped as [n_tokens, p*p*3] with each
// patch flattened (row, col, channel) — the contraction order of the ViT
// patchify conv. Shipping views in this layout makes the device-side patch
// embedding a single matmul on a [., p*p*3]-minor tensor that tiles
// perfectly; the [., 3]-minor image layout tile-pads 42x on TPU.
void write_patch_major(const ImageU8& img, int p, uint8_t* out) {
  const int g = img.h / p;  // tokens per side
  const size_t tok_stride = static_cast<size_t>(p) * p * 3;
  for (int th = 0; th < g; ++th)
    for (int tw = 0; tw < g; ++tw) {
      uint8_t* tok = out + (static_cast<size_t>(th) * g + tw) * tok_stride;
      for (int hi = 0; hi < p; ++hi)
        std::memcpy(tok + static_cast<size_t>(hi) * p * 3, img.px(th * p + hi, tw * p), p * 3);
    }
}

// out_f32 != nullptr: write CLIP-normalized float32 views.
// out_u8  != nullptr: write raw uint8 views (device normalizes; the AugMix
//   mix is rounded to the nearest gray level — a <=0.5/255 quantization, below
//   the bf16 input precision the towers consume, and it cuts host->device
//   transfer 4x, which matters on bandwidth-constrained links).
// p1/out_p1, p2/out_p2: optional patch-major u8 outputs at patch sizes p1/p2
//   (policy and reward towers), [n_views, (R/p)^2, p*p*3] each.
void generate_views_one(const uint8_t* image, int h, int w, int n_views, int resolution,
                        int augmix, float severity, float crop_min, uint64_t seed, float* out_f32,
                        uint8_t* out_u8, int p1 = 0, uint8_t* out_p1 = nullptr, int p2 = 0,
                        uint8_t* out_p2 = nullptr) {
  ImageU8 src;
  src.h = h;
  src.w = w;
  src.data.assign(image, image + static_cast<size_t>(h) * w * 3);
  const size_t view_stride = static_cast<size_t>(resolution) * resolution * 3;
  Rng rng(seed);

  const size_t p1_stride = p1 ? static_cast<size_t>(resolution / p1) * (resolution / p1) * p1 * p1 * 3 : 0;
  const size_t p2_stride = p2 ? static_cast<size_t>(resolution / p2) * (resolution / p2) * p2 * p2 * 3 : 0;
  auto emit = [&](const ImageU8& img, int v) {
    if (out_f32) normalize_into(img, out_f32 + v * view_stride);
    if (out_u8) std::memcpy(out_u8 + v * view_stride, img.data.data(), view_stride);
    if (out_p1) write_patch_major(img, p1, out_p1 + v * p1_stride);
    if (out_p2) write_patch_major(img, p2, out_p2 + v * p2_stride);
  };

  // view 0: bicubic short-side resize + center crop
  ImageU8 base;
  {
    float bx0 = 0, by0 = 0, bx1 = w, by1 = h;
    const float side = std::min(w, h);
    bx0 = (w - side) / 2.0f;
    by0 = (h - side) / 2.0f;
    resize_box(src, base, bx0, by0, bx0 + side, by0 + side, resolution, resolution, 2);
  }
  emit(base, 0);

  for (int v = 1; v < n_views; ++v) {
    ImageU8 x_orig;
    random_resized_crop(src, x_orig, rng, resolution, crop_min, 1.0f);
    if (rng.uniform() < 0.5f) hflip(x_orig);
    if (!augmix) {
      emit(x_orig, v);
      continue;
    }
    // Dirichlet(1,1,1) weights + Beta(1,1) mix. Normalization is affine, so
    // mixing happens on raw uint8 values with ONE normalize pass at the end
    // (saves ~4 full-image float passes per view; identical math).
    float g[3] = {rng.gamma1(), rng.gamma1(), rng.gamma1()};
    const float gsum = g[0] + g[1] + g[2];
    const float m = rng.uniform();
    ImageU8 chains[3];
    float wc[3];
    for (int chain = 0; chain < 3; ++chain) {
      chains[chain] = x_orig;
      const int depth = rng.randint(1, 4);
      for (int step = 0; step < depth; ++step)
        apply_random_op(chains[chain], rng, severity, resolution);
      wc[chain] = (1 - m) * g[chain] / gsum;
    }
    const size_t n_px = static_cast<size_t>(resolution) * resolution;
    float* dst = out_f32 ? out_f32 + v * view_stride : nullptr;
    uint8_t* du = out_u8 ? out_u8 + v * view_stride : nullptr;
    // patch outputs need the mixed u8 image materialized; reuse a chain
    // buffer as scratch when no direct u8 output was requested
    uint8_t* mix_u8 = du;
    if (!mix_u8 && (out_p1 || out_p2)) mix_u8 = chains[0].data.data();
    for (size_t i = 0; i < n_px; ++i) {
      for (int ch = 0; ch < 3; ++ch) {
        const size_t k = i * 3 + ch;
        const float mixed = m * x_orig.data[k] + wc[0] * chains[0].data[k] +
                            wc[1] * chains[1].data[k] + wc[2] * chains[2].data[k];
        if (dst) dst[k] = (mixed / 255.0f - kClipMean[ch]) / kClipStd[ch];
        if (mix_u8) mix_u8[k] = clamp_u8(mixed);
      }
    }
    if (out_p1 || out_p2) {
      ImageU8 mixed_img;
      if (mix_u8 == chains[0].data.data()) {
        mixed_img = std::move(chains[0]);
      } else {
        mixed_img.h = resolution;
        mixed_img.w = resolution;
        mixed_img.data.assign(mix_u8, mix_u8 + view_stride);
      }
      if (out_p1) write_patch_major(mixed_img, p1, out_p1 + v * p1_stride);
      if (out_p2) write_patch_major(mixed_img, p2, out_p2 + v * p2_stride);
    }
  }
}

}  // namespace

#if defined(RLCF_WITH_CODECS)
namespace {

// Pixel cap for header-declared dimensions (PIL's DecompressionBomb limit is
// ~89 Mpx; anything bigger goes through the PIL fallback and its policy).
constexpr size_t kMaxDecodePixels = 100u * 1000 * 1000;

// libjpeg aborts via error_exit; route it through longjmp so a corrupt file
// returns an error code instead of killing the process.
struct JpegErrMgr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

void jpeg_error_longjmp(j_common_ptr cinfo) {
  longjmp(reinterpret_cast<JpegErrMgr*>(cinfo->err)->jb, 1);
}

// Corrupt-data warnings: counted (the default emit_message's job), not printed.
void jpeg_emit_silent(j_common_ptr cinfo, int msg_level) {
  if (msg_level < 0) cinfo->err->num_warnings++;
}

// Decode JPEG bytes to interleaved u8 RGB (libjpeg converts grayscale/YCbCr;
// exotic colorspaces error out and the caller falls back to PIL).
int decode_jpeg_rgb(const uint8_t* data, unsigned long nbytes, ImageU8& out, bool dims_only,
                    int* oh, int* ow) {
  jpeg_decompress_struct cinfo;
  JpegErrMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_error_longjmp;
  jerr.mgr.emit_message = jpeg_emit_silent;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<unsigned char*>(data), nbytes);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  *oh = static_cast<int>(cinfo.image_height);
  *ow = static_cast<int>(cinfo.image_width);
  if (cinfo.image_width == 0 || cinfo.image_height == 0 ||
      static_cast<size_t>(cinfo.image_width) * cinfo.image_height > kMaxDecodePixels) {
    // header-declared bomb: refuse in BOTH modes, so callers that size
    // buffers from rlcf_decode_dims never allocate for one
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  if (dims_only) {
    jpeg_destroy_decompress(&cinfo);
    return 0;
  }
  jpeg_start_decompress(&cinfo);
  out.h = static_cast<int>(cinfo.output_height);
  out.w = static_cast<int>(cinfo.output_width);
  if (cinfo.output_components != 3) {  // JCS_RGB guarantees 3; belt and braces
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  out.data.resize(static_cast<size_t>(out.h) * out.w * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW row = out.px(static_cast<int>(cinfo.output_scanline), 0);
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  // libjpeg "recovers" from truncated/corrupt streams by gray-padding and
  // counting a warning; PIL raises instead. Treat any warning as a decode
  // failure so the caller falls back to PIL's (loud) behavior.
  const bool corrupt = jerr.mgr.num_warnings > 0;
  jpeg_destroy_decompress(&cinfo);
  return corrupt ? 1 : 0;
}

struct PngMemReader {
  const uint8_t* data;
  size_t size;
  size_t pos;
};

void png_mem_read(png_structp png, png_bytep dst, png_size_t n) {
  PngMemReader* r = static_cast<PngMemReader*>(png_get_io_ptr(png));
  if (r->pos + n > r->size) png_error(png, "read past end");
  std::memcpy(dst, r->data + r->pos, n);
  r->pos += n;
}

void png_silent_err(png_structp png, png_const_charp) { longjmp(png_jmpbuf(png), 1); }
void png_silent_warn(png_structp, png_const_charp) {}

// Decode PNG bytes to interleaved u8 RGB with the FULL libpng API and no
// gamma handling — the simplified png_image API gamma-converts gAMA-tagged
// files to sRGB, which PIL does not, and parity with PIL is the contract
// here. Palette/gray expand to RGB; 16-bit strips to 8; alpha is dropped
// (what PIL's convert("RGB") does — drop, not composite).
int decode_png_rgb(const uint8_t* data, size_t nbytes, ImageU8& out, bool dims_only, int* oh,
                   int* ow) {
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, png_silent_err,
                                           png_silent_warn);
  if (!png) return 1;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return 1;
  }
  std::vector<png_bytep> rows;
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return 1;
  }
  PngMemReader reader{data, nbytes, 0};
  png_set_read_fn(png, &reader, png_mem_read);
  png_read_info(png, info);
  const png_uint_32 w = png_get_image_width(png, info);
  const png_uint_32 h = png_get_image_height(png, info);
  *oh = static_cast<int>(h);
  *ow = static_cast<int>(w);
  if (w == 0 || h == 0 || static_cast<size_t>(w) * h > kMaxDecodePixels) {
    // refuse bombs in BOTH modes — rlcf_decode_dims callers allocate from it
    png_destroy_read_struct(&png, &info, nullptr);
    return 1;
  }
  if (dims_only) {
    png_destroy_read_struct(&png, &info, nullptr);
    return 0;
  }
  // Normalize every input layout to 8-bit RGB; no gamma transform.
  png_set_expand(png);         // palette -> RGB, gray<8 -> 8, tRNS -> alpha
  png_set_strip_16(png);       // 16-bit -> 8-bit
  png_set_gray_to_rgb(png);    // gray -> RGB
  png_set_strip_alpha(png);    // drop alpha (PIL convert("RGB") semantics)
  png_read_update_info(png, info);
  if (png_get_channels(png, info) != 3) {
    png_destroy_read_struct(&png, &info, nullptr);
    return 1;
  }
  out.h = static_cast<int>(h);
  out.w = static_cast<int>(w);
  out.data.resize(static_cast<size_t>(h) * w * 3);
  rows.resize(h);
  for (png_uint_32 y = 0; y < h; ++y) rows[y] = out.px(static_cast<int>(y), 0);
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  return 0;
}

// Container sniff by magic bytes. Returns 2 for "not a JPEG/PNG" so the
// Python caller can distinguish unsupported-container from decode failure.
int decode_any(const uint8_t* data, unsigned long nbytes, ImageU8& out, bool dims_only, int* h,
               int* w) {
  if (nbytes >= 3 && data[0] == 0xFF && data[1] == 0xD8 && data[2] == 0xFF)
    return decode_jpeg_rgb(data, nbytes, out, dims_only, h, w);
  if (nbytes >= 8 && data[0] == 0x89 && data[1] == 'P' && data[2] == 'N' && data[3] == 'G')
    return decode_png_rgb(data, nbytes, out, dims_only, h, w);
  return 2;
}

}  // namespace
#endif  // RLCF_WITH_CODECS

extern "C" {

// Batch API: images [N, H, W, 3] u8 -> out [N, n_views, R, R, 3] f32.
void rlcf_generate_views_batch(const uint8_t* images, int n, int h, int w, int n_views,
                               int resolution, int augmix, float severity, float crop_min,
                               uint64_t seed, float* out, int n_threads) {
  const size_t in_stride = static_cast<size_t>(h) * w * 3;
  const size_t out_stride = static_cast<size_t>(n_views) * resolution * resolution * 3;
  if (n_threads <= 0) n_threads = std::max(1u, std::thread::hardware_concurrency());
  std::atomic<int> next(0);
  auto worker = [&]() {
    while (true) {
      const int i = next.fetch_add(1);
      if (i >= n) break;
      generate_views_one(images + i * in_stride, h, w, n_views, resolution, augmix, severity,
                         crop_min, seed * 0x9E3779B97F4A7C15ull + i, out + i * out_stride,
                         nullptr);
    }
  };
  std::vector<std::thread> threads;
  for (int t = 0; t < std::min(n_threads, n); ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
}

// Same, but emits raw uint8 views (normalize on device). Identical RNG
// stream, so view geometry/ops match the f32 API bit-for-bit pre-normalize.
void rlcf_generate_views_batch_u8(const uint8_t* images, int n, int h, int w, int n_views,
                                  int resolution, int augmix, float severity, float crop_min,
                                  uint64_t seed, uint8_t* out, int n_threads) {
  const size_t in_stride = static_cast<size_t>(h) * w * 3;
  const size_t out_stride = static_cast<size_t>(n_views) * resolution * resolution * 3;
  if (n_threads <= 0) n_threads = std::max(1u, std::thread::hardware_concurrency());
  std::atomic<int> next(0);
  auto worker = [&]() {
    while (true) {
      const int i = next.fetch_add(1);
      if (i >= n) break;
      generate_views_one(images + i * in_stride, h, w, n_views, resolution, augmix, severity,
                         crop_min, seed * 0x9E3779B97F4A7C15ull + i, nullptr,
                         out + i * out_stride);
    }
  };
  std::vector<std::thread> threads;
  for (int t = 0; t < std::min(n_threads, n); ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
}

// Patch-major batch API: emits the SAME views as the u8 API (identical RNG
// stream) pre-patchified for two ViT patch sizes — out_p1/out_p2 are
// [N, n_views, (R/p)^2, p*p*3] u8. Either may be null.
int rlcf_generate_views_batch_patch_u8(const uint8_t* images, int n, int h, int w, int n_views,
                                       int resolution, int augmix, float severity, float crop_min,
                                       uint64_t seed, int p1, uint8_t* out_p1, int p2,
                                       uint8_t* out_p2, int n_threads) {
  // Patch buffers only tile the image exactly when resolution % p == 0; a
  // remainder would make the Python-allocated buffer ((R/p)^2 tokens)
  // smaller than the image-size stride — refuse instead of corrupting heap.
  if ((p1 > 0 && resolution % p1 != 0) || (p2 > 0 && resolution % p2 != 0)) return -1;
  const size_t in_stride = static_cast<size_t>(h) * w * 3;
  // per-image stride of each patch buffer: n_views * (R/p)^2 * p*p*3
  const size_t p1_img_stride =
      p1 > 0 ? static_cast<size_t>(n_views) * (resolution / p1) * (resolution / p1) * p1 * p1 * 3 : 0;
  const size_t p2_img_stride =
      p2 > 0 ? static_cast<size_t>(n_views) * (resolution / p2) * (resolution / p2) * p2 * p2 * 3 : 0;
  if (n_threads <= 0) n_threads = std::max(1u, std::thread::hardware_concurrency());
  std::atomic<int> next(0);
  auto worker = [&]() {
    while (true) {
      const int i = next.fetch_add(1);
      if (i >= n) break;
      generate_views_one(images + i * in_stride, h, w, n_views, resolution, augmix, severity,
                         crop_min, seed * 0x9E3779B97F4A7C15ull + i, nullptr, nullptr, p1,
                         (p1 > 0 && out_p1) ? out_p1 + i * p1_img_stride : nullptr, p2,
                         (p2 > 0 && out_p2) ? out_p2 + i * p2_img_stride : nullptr);
    }
  };
  std::vector<std::thread> threads;
  for (int t = 0; t < std::min(n_threads, n); ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return 0;
}

// Eval transform: bicubic short-side resize + center crop + normalize.
void rlcf_preprocess_batch(const uint8_t* images, int n, int h, int w, int resolution,
                           float* out, int n_threads) {
  const size_t in_stride = static_cast<size_t>(h) * w * 3;
  const size_t out_stride = static_cast<size_t>(resolution) * resolution * 3;
  if (n_threads <= 0) n_threads = std::max(1u, std::thread::hardware_concurrency());
  std::atomic<int> next(0);
  auto worker = [&]() {
    while (true) {
      const int i = next.fetch_add(1);
      if (i >= n) break;
      ImageU8 src;
      src.h = h;
      src.w = w;
      src.data.assign(images + i * in_stride, images + (i + 1) * in_stride);
      ImageU8 dst;
      const float side = std::min(w, h);
      resize_box(src, dst, (w - side) / 2.0f, (h - side) / 2.0f, (w + side) / 2.0f,
                 (h + side) / 2.0f, resolution, resolution, 2);
      normalize_into(dst, out + i * out_stride);
    }
  };
  std::vector<std::thread> threads;
  for (int t = 0; t < std::min(n_threads, n); ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
}

#if defined(RLCF_WITH_CODECS)

// Report decoded dimensions without decoding pixels (caller sizes buffers).
// Returns 0 ok, 1 decode error, 2 unsupported container, 3 internal error.
// try/catch: an exception (e.g. bad_alloc on a crafted header) must never
// cross the ctypes boundary — that would std::terminate the process.
int rlcf_decode_dims(const uint8_t* data, long nbytes, int* h, int* w) {
  try {
    ImageU8 dummy;
    return decode_any(data, static_cast<unsigned long>(nbytes), dummy, true, h, w);
  } catch (...) {
    return 3;
  }
}

// Full-size decode to interleaved u8 RGB ([h, w, 3], buffer from
// rlcf_decode_dims). Same return codes as rlcf_decode_dims.
int rlcf_decode_rgb(const uint8_t* data, long nbytes, uint8_t* out) {
  try {
    ImageU8 img;
    int h = 0, w = 0;
    const int rc = decode_any(data, static_cast<unsigned long>(nbytes), img, false, &h, &w);
    if (rc) return rc;
    std::memcpy(out, img.data.data(), img.data.size());
    return 0;
  } catch (...) {
    return 3;
  }
}

// Decode + bicubic short-side resize + center crop -> [size, size, 3] u8:
// the episode stream's canonical source, produced in one native call (the
// composition of transforms.load_image + resize_short_side_pil + center_crop
// — same kernel as PIL bicubic incl. antialias, half-to-even dim rounding
// matching Python round()).
int rlcf_load_canonical(const uint8_t* data, long nbytes, int size, uint8_t* out) try {
  ImageU8 img;
  int h = 0, w = 0;
  const int rc = decode_any(data, static_cast<unsigned long>(nbytes), img, false, &h, &w);
  if (rc) return rc;
  int new_h, new_w;
  if (h < w) {
    new_h = size;
    new_w = std::max(size, static_cast<int>(std::nearbyint(static_cast<double>(w) * size / h)));
  } else {
    new_w = size;
    new_h = std::max(size, static_cast<int>(std::nearbyint(static_cast<double>(h) * size / w)));
  }
  ImageU8 resized;
  resize_box(img, resized, 0.0f, 0.0f, static_cast<float>(w), static_cast<float>(h), new_w,
             new_h, 2);
  const int top = (new_h - size) / 2;
  const int left = (new_w - size) / 2;
  for (int y = 0; y < size; ++y)
    std::memcpy(out + static_cast<size_t>(y) * size * 3, resized.px(top + y, left),
                static_cast<size_t>(size) * 3);
  return 0;
} catch (...) {
  return 3;
}

#endif  // RLCF_WITH_CODECS

int rlcf_native_version() { return 1; }
}
