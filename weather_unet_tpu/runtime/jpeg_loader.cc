// Native data-loader runtime: JPEG decode + bilinear resize, C ABI.
//
// The reference leans on torch DataLoader worker *processes* for decode
// throughput (SURVEY.md §2.9); here a libjpeg(-turbo) decode + fused resize
// runs in C++ with the GIL released, so the Python BatchLoader's thread pool
// achieves real parallelism feeding the TPU's host pipeline.
//
// Exposed C ABI (see runtime/__init__.py ctypes binding):
//   wut_decode_file(path, out_size, out_rgb)       -> 0 on success
//   wut_decode_batch(paths, n, out_size, out, nthreads) -> number decoded
//
// Build: make -C weather_unet_tpu/runtime   (produces libwut_loader.so)

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <algorithm>
#include <atomic>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

#include "runtime_internal.h"

namespace {

struct ErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void error_exit(j_common_ptr cinfo) {
  ErrorMgr* err = reinterpret_cast<ErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Bilinear resize HWC uint8 -> out_size x out_size (align_corners=false,
// PIL-like pixel centers; decode-side resize feeds the device pipeline which
// does the exact model-side resizing).
void resize_bilinear(const uint8_t* src, int h, int w, int c,
                     uint8_t* dst, int out) {
  const float sy = static_cast<float>(h) / out;
  const float sx = static_cast<float>(w) / out;
  for (int oy = 0; oy < out; ++oy) {
    float fy = (oy + 0.5f) * sy - 0.5f;
    int y0 = std::max(0, std::min(h - 1, static_cast<int>(std::floor(fy))));
    int y1 = std::min(h - 1, y0 + 1);
    float wy = std::max(0.0f, std::min(1.0f, fy - y0));
    for (int ox = 0; ox < out; ++ox) {
      float fx = (ox + 0.5f) * sx - 0.5f;
      int x0 = std::max(0, std::min(w - 1, static_cast<int>(std::floor(fx))));
      int x1 = std::min(w - 1, x0 + 1);
      float wx = std::max(0.0f, std::min(1.0f, fx - x0));
      for (int ch = 0; ch < c; ++ch) {
        float v00 = src[(y0 * w + x0) * c + ch];
        float v01 = src[(y0 * w + x1) * c + ch];
        float v10 = src[(y1 * w + x0) * c + ch];
        float v11 = src[(y1 * w + x1) * c + ch];
        float v = v00 * (1 - wx) * (1 - wy) + v01 * wx * (1 - wy) +
                  v10 * (1 - wx) * wy + v11 * wx * wy;
        dst[(oy * out + ox) * c + ch] = static_cast<uint8_t>(v + 0.5f);
      }
    }
  }
}

int decode_one(const char* path, int out_size, uint8_t* out_rgb) {
  std::vector<uint8_t> full;
  int h = 0, w = 0;
  int rc = wut::DecodeToRgb(path, out_size, &full, &h, &w);
  if (rc != 0) return rc;
  if (out_size > 0 && (w != out_size || h != out_size)) {
    resize_bilinear(full.data(), h, w, 3, out_rgb, out_size);
  } else {
    std::memcpy(out_rgb, full.data(),
                static_cast<size_t>(out_size) * out_size * 3);
  }
  return 0;
}

}  // namespace

namespace wut {

int DecodeToRgb(const char* path, int target_hint, std::vector<uint8_t>* rgb,
                int* out_h, int* out_w) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;

  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return -2;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  // DCT-domain downscale: pick the smallest scale >= 2x the target to keep
  // the resample pass cheap while preserving quality.
  if (target_hint > 0) {
    int full_dim = std::max(static_cast<int>(cinfo.image_width),
                            static_cast<int>(cinfo.image_height));
    cinfo.scale_num = 1;
    cinfo.scale_denom = 1;
    while (cinfo.scale_denom < 8 &&
           full_dim / static_cast<int>(cinfo.scale_denom * 2) >=
               2 * target_hint) {
      cinfo.scale_denom *= 2;
    }
  }
  jpeg_start_decompress(&cinfo);
  const int w = cinfo.output_width;
  const int h = cinfo.output_height;
  const int c = cinfo.output_components;  // 3 for RGB
  std::vector<uint8_t> full(static_cast<size_t>(w) * h * c);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row =
        full.data() + static_cast<size_t>(cinfo.output_scanline) * w * c;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  std::fclose(f);

  if (c != 3) {  // expand gray to RGB
    std::vector<uint8_t> expanded(static_cast<size_t>(w) * h * 3);
    for (size_t i = 0; i < static_cast<size_t>(w) * h; ++i) {
      expanded[i * 3] = expanded[i * 3 + 1] = expanded[i * 3 + 2] = full[i * c];
    }
    full.swap(expanded);
  }
  rgb->swap(full);
  *out_h = h;
  *out_w = w;
  return 0;
}

int DecodeBytesToRgb(const uint8_t* data, size_t len, int target_hint,
                     std::vector<uint8_t>* rgb, int* out_h, int* out_w) {
  // Memory-source twin of DecodeToRgb (serving uploads arrive as bytes, not
  // paths).  Kept as a sibling rather than factored: setjmp-based libjpeg
  // error recovery must live in the frame owning the cinfo.
  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return -2;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<unsigned char*>(data),
               static_cast<unsigned long>(len));
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  if (target_hint > 0) {
    int full_dim = std::max(static_cast<int>(cinfo.image_width),
                            static_cast<int>(cinfo.image_height));
    cinfo.scale_num = 1;
    cinfo.scale_denom = 1;
    while (cinfo.scale_denom < 8 &&
           full_dim / static_cast<int>(cinfo.scale_denom * 2) >=
               2 * target_hint) {
      cinfo.scale_denom *= 2;
    }
  }
  jpeg_start_decompress(&cinfo);
  const int w = cinfo.output_width;
  const int h = cinfo.output_height;
  const int c = cinfo.output_components;
  std::vector<uint8_t> full(static_cast<size_t>(w) * h * c);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row =
        full.data() + static_cast<size_t>(cinfo.output_scanline) * w * c;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);

  if (c != 3) {
    std::vector<uint8_t> expanded(static_cast<size_t>(w) * h * 3);
    for (size_t i = 0; i < static_cast<size_t>(w) * h; ++i) {
      expanded[i * 3] = expanded[i * 3 + 1] = expanded[i * 3 + 2] = full[i * c];
    }
    full.swap(expanded);
  }
  rgb->swap(full);
  *out_h = h;
  *out_w = w;
  return 0;
}

}  // namespace wut

extern "C" {

int wut_decode_file(const char* path, int out_size, uint8_t* out_rgb) {
  return decode_one(path, out_size, out_rgb);
}

// Decode a JPEG from memory (HTTP upload) to out_size^2 RGB u8.
int wut_decode_bytes(const uint8_t* data, long len, int out_size,
                     uint8_t* out_rgb) {
  std::vector<uint8_t> full;
  int h = 0, w = 0;
  int rc = wut::DecodeBytesToRgb(data, static_cast<size_t>(len), out_size,
                                 &full, &h, &w);
  if (rc != 0) return rc;
  if (out_size > 0 && (w != out_size || h != out_size)) {
    resize_bilinear(full.data(), h, w, 3, out_rgb, out_size);
  } else {
    std::memcpy(out_rgb, full.data(),
                static_cast<size_t>(out_size) * out_size * 3);
  }
  return 0;
}

// Decode n files in parallel; out is (n, out_size, out_size, 3) contiguous.
// Returns the number of successful decodes; failed slots are zero-filled and
// flagged -1 in ok[i].
int wut_decode_batch(const char** paths, int n, int out_size, uint8_t* out,
                     int* ok, int n_threads) {
  if (n_threads <= 0) n_threads = std::thread::hardware_concurrency();
  std::atomic<int> next(0), good(0);
  const size_t stride = static_cast<size_t>(out_size) * out_size * 3;
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) break;
      int rc = decode_one(paths[i], out_size, out + stride * i);
      ok[i] = rc;
      if (rc == 0) {
        good.fetch_add(1);
      } else {
        std::memset(out + stride * i, 0, stride);
      }
    }
  };
  std::vector<std::thread> threads;
  int nt = std::min(n_threads, n);
  threads.reserve(nt);
  for (int t = 0; t < nt; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return good.load();
}

}  // extern "C"
