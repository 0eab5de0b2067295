// Native fused train augmentation: decode -> one inverse-affine bilinear
// resample (rotation o resized-crop o hflip) -> color jitter -> u8.
//
// This is the host-side twin of the on-device kernel in
// data/transforms.py (`_one_affine` / `_affine_sample` / `_color_jitter`):
// the same single composed affine map and the same jitter formulas, executed
// in C++ with the GIL released so the BatchLoader thread pool scales on
// multi-core hosts.  It replaces the reference's per-sample torchvision CPU
// stack (t_cls_train.py:81-102: RandomRotation(10) -> RandomResizedCrop |
// Resize -> RandomHorizontalFlip -> ColorJitter) with one resample pass
// instead of three, and fuses the JPEG decode into the same call.
//
// Randomness stays in Python: the caller samples per-image uniforms (for the
// affine) and jitter factors and passes them in, so runs are deterministic
// and the affine construction can be pinned against the JAX implementation
// in tests (tests/test_native_augment.py).
//
// C ABI (see runtime/__init__.py ctypes binding):
//   wut_make_affine(h, w, u6, cfg..., out_size, mat6)  — affine from uniforms
//   wut_augment_u8(src, h, w, mat6, jitter3, out_size, out)
//   wut_decode_augment_file(path, u6, jitter3, cfg..., out_size, out)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

#include "runtime_internal.h"

namespace {

constexpr float kPi = 3.14159265358979323846f;

// Mirror of data/transforms.py::affine_from_uniforms — the inverse map
// out-pixel -> source-pixel as a 2x3 row-major matrix [[a11 a12 a13],
// [a21 a22 a23]] applied to (x_out, y_out, 1).
void MakeAffine(int in_h, int in_w, const float* u, float degrees,
                int resized_crop, float scale_lo, float scale_hi,
                float ratio_lo, float ratio_hi, int hflip, int out_size,
                float* mat) {
  const float u_rot = u[0], u_scale = u[1], u_ratio = u[2];
  const float u_posx = u[3], u_posy = u[4], u_flip = u[5];

  float cw, ch, cx0, cy0;
  if (resized_crop) {
    const float area = static_cast<float>(in_h) * static_cast<float>(in_w);
    const float scale = scale_lo + u_scale * (scale_hi - scale_lo);
    const float log_ratio = std::log(ratio_lo) +
                            u_ratio * (std::log(ratio_hi) - std::log(ratio_lo));
    const float ratio = std::exp(log_ratio);
    cw = std::min(std::max(std::sqrt(area * scale * ratio), 1.0f),
                  static_cast<float>(in_w));
    ch = std::min(std::max(std::sqrt(area * scale / ratio), 1.0f),
                  static_cast<float>(in_h));
    cx0 = u_posx * (in_w - cw);
    cy0 = u_posy * (in_h - ch);
  } else {
    cw = static_cast<float>(in_w);
    ch = static_cast<float>(in_h);
    cx0 = cy0 = 0.0f;
  }

  const float sx = cw / out_size;
  const float sy = ch / out_size;

  const float theta = (-degrees + u_rot * 2.0f * degrees) * (kPi / 180.0f);
  const float c = std::cos(theta), s = std::sin(theta);
  const float cx = (in_w - 1) / 2.0f;
  const float cy = (in_h - 1) / 2.0f;

  const bool flip = hflip && (u_flip < 0.5f);
  const float fsign = flip ? -1.0f : 1.0f;
  const float foff = flip ? out_size - 1.0f : 0.0f;

  mat[0] = c * fsign * sx;
  mat[1] = -s * sy;
  mat[2] = c * (foff * sx + cx0 - cx) - s * (cy0 - cy) + cx;
  mat[3] = s * fsign * sx;
  mat[4] = c * sy;
  mat[5] = s * (foff * sx + cx0 - cx) + c * (cy0 - cy) + cy;
}

// Mirror of data/transforms.py::_affine_sample (4-tap bilinear, per-tap
// zero outside the source) + _color_jitter (fixed brightness -> contrast ->
// saturation order on the [0, 1] scale, ITU-R 601 luma).  Jitter factors
// < 0 are disabled.
void AugmentU8(const uint8_t* src, int h, int w, const float* mat,
               const float* jitter, int out_size, uint8_t* out,
               std::vector<float>* scratch) {
  const float fb = jitter[0], fc = jitter[1], fs = jitter[2];
  scratch->resize(static_cast<size_t>(out_size) * out_size * 3);
  float* buf = scratch->data();

  double gray_sum = 0.0;  // mean luma for the contrast formula
  for (int oy = 0; oy < out_size; ++oy) {
    for (int ox = 0; ox < out_size; ++ox) {
      const float sxf = mat[0] * ox + mat[1] * oy + mat[2];
      const float syf = mat[3] * ox + mat[4] * oy + mat[5];
      const float x0f = std::floor(sxf), y0f = std::floor(syf);
      const float fx = sxf - x0f, fy = syf - y0f;
      const int x0 = static_cast<int>(x0f), y0 = static_cast<int>(y0f);

      float rgb[3] = {0.0f, 0.0f, 0.0f};
      const float tw[4] = {(1 - fx) * (1 - fy), fx * (1 - fy), (1 - fx) * fy,
                           fx * fy};
      const int tx[4] = {x0, x0 + 1, x0, x0 + 1};
      const int ty[4] = {y0, y0, y0 + 1, y0 + 1};
      for (int t = 0; t < 4; ++t) {
        if (ty[t] < 0 || ty[t] >= h || tx[t] < 0 || tx[t] >= w) continue;
        const uint8_t* p = src + (static_cast<size_t>(ty[t]) * w + tx[t]) * 3;
        rgb[0] += tw[t] * p[0];
        rgb[1] += tw[t] * p[1];
        rgb[2] += tw[t] * p[2];
      }
      float* o = buf + (static_cast<size_t>(oy) * out_size + ox) * 3;
      o[0] = rgb[0] * (1.0f / 255.0f);
      o[1] = rgb[1] * (1.0f / 255.0f);
      o[2] = rgb[2] * (1.0f / 255.0f);
      gray_sum += 0.299f * o[0] + 0.587f * o[1] + 0.114f * o[2];
    }
  }
  const float gray_mean =
      static_cast<float>(gray_sum / (static_cast<double>(out_size) * out_size));
  // _color_jitter computes the contrast gray mean AFTER brightness; the
  // brightness factor folds into the pre-jitter mean (pure scale, no
  // intermediate clipping).
  const float gray_mean_c = (fb >= 0.0f) ? fb * gray_mean : gray_mean;

  const size_t n_px = static_cast<size_t>(out_size) * out_size;
  for (size_t i = 0; i < n_px; ++i) {
    float r = buf[i * 3], g = buf[i * 3 + 1], b = buf[i * 3 + 2];
    if (fb >= 0.0f) {
      r *= fb;
      g *= fb;
      b *= fb;
    }
    if (fc >= 0.0f) {
      const float add = (1.0f - fc) * gray_mean_c;
      r = fc * r + add;
      g = fc * g + add;
      b = fc * b + add;
    }
    if (fs >= 0.0f) {
      const float gray = 0.299f * r + 0.587f * g + 0.114f * b;
      const float add = (1.0f - fs) * gray;
      r = fs * r + add;
      g = fs * g + add;
      b = fs * b + add;
    }
    out[i * 3] = static_cast<uint8_t>(
        std::min(std::max(r, 0.0f), 1.0f) * 255.0f + 0.5f);
    out[i * 3 + 1] = static_cast<uint8_t>(
        std::min(std::max(g, 0.0f), 1.0f) * 255.0f + 0.5f);
    out[i * 3 + 2] = static_cast<uint8_t>(
        std::min(std::max(b, 0.0f), 1.0f) * 255.0f + 0.5f);
  }
}

}  // namespace

extern "C" {

void wut_make_affine(int h, int w, const float* u6, float degrees,
                     int resized_crop, float scale_lo, float scale_hi,
                     float ratio_lo, float ratio_hi, int hflip, int out_size,
                     float* mat6) {
  MakeAffine(h, w, u6, degrees, resized_crop, scale_lo, scale_hi, ratio_lo,
             ratio_hi, hflip, out_size, mat6);
}

int wut_augment_u8(const uint8_t* src, int h, int w, const float* mat6,
                   const float* jitter3, int out_size, uint8_t* out) {
  if (h <= 0 || w <= 0 || out_size <= 0) return -1;
  std::vector<float> scratch;
  AugmentU8(src, h, w, mat6, jitter3, out_size, out, &scratch);
  return 0;
}

int wut_decode_augment_file(const char* path, const float* u6,
                            const float* jitter3, float degrees,
                            int resized_crop, float scale_lo, float scale_hi,
                            float ratio_lo, float ratio_hi, int hflip,
                            int out_size, uint8_t* out) {
  std::vector<uint8_t> rgb;
  int h = 0, w = 0;
  int rc = wut::DecodeToRgb(path, out_size, &rgb, &h, &w);
  if (rc != 0) return rc;
  float mat[6];
  MakeAffine(h, w, u6, degrees, resized_crop, scale_lo, scale_hi, ratio_lo,
             ratio_hi, hflip, out_size, mat);
  std::vector<float> scratch;
  AugmentU8(rgb.data(), h, w, mat, jitter3, out_size, out, &scratch);
  return 0;
}

}  // extern "C"
