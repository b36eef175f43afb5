// Native input-pipeline kernels: fused JPEG-decode -> center-crop ->
// antialiased bilinear resize -> float32 NHWC, multithreaded over the
// batch.
//
// Rationale: the TPU step consumes >200k images/sec (bench.py); the
// reference feeds its GPUs with torch DataLoader worker processes
// (/root/reference/dataset.py:100-166). The TPU-native equivalent is a
// single-process host pipeline, so the per-image work must be native.
// This file replaces, per image, one PIL decode + a float->uint8->float
// per-channel PIL resize round-trip with one libjpeg decode and one
// separable triangle-filter resampling pass (the same algorithm PIL's
// BILINEAR uses, so outputs match the reference transform to ~1 LSB).
//
// Exposed C ABI (ctypes, see native/__init__.py):
//   ctvae_crop_resize_u8   — uint8 NHWC batch -> float32 NHWC batch
//   ctvae_crop_resize_f32  — float32 NHWC batch -> float32 NHWC batch
//   ctvae_load_jpeg_batch  — paths -> decode+crop+resize -> float32 NHWC

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <functional>
#include <thread>
#include <vector>

#include <csetjmp>
#include <jpeglib.h>

namespace {

// ---------------------------------------------------------------------
// Separable resampling with a triangle (bilinear) filter, antialiased on
// downscale — PIL-compatible: out pixel x covers input center
// (x + 0.5) * scale with support = filterscale.
// ---------------------------------------------------------------------

struct ResampleTable {
  int ksize = 0;
  std::vector<int> xmin;          // per-out-pixel first input index
  std::vector<float> coefs;       // [out, ksize] normalized weights
};

ResampleTable build_table(int in_size, int out_size) {
  ResampleTable t;
  double scale = static_cast<double>(in_size) / out_size;
  double filterscale = std::max(scale, 1.0);
  double support = filterscale;   // bilinear filter support = 1.0
  t.ksize = static_cast<int>(std::ceil(support)) * 2 + 1;
  t.xmin.resize(out_size);
  t.coefs.assign(static_cast<size_t>(out_size) * t.ksize, 0.0f);
  for (int x = 0; x < out_size; ++x) {
    double center = (x + 0.5) * scale;
    int lo = std::max(0, static_cast<int>(center - support + 0.5));
    int hi = std::min(in_size, static_cast<int>(center + support + 0.5));
    t.xmin[x] = lo;
    double total = 0.0;
    std::vector<double> w(hi - lo);
    for (int j = lo; j < hi; ++j) {
      double d = std::abs((j + 0.5 - center) / filterscale);
      w[j - lo] = d < 1.0 ? 1.0 - d : 0.0;
      total += w[j - lo];
    }
    if (total <= 0.0) { w[0] = 1.0; total = 1.0; }
    for (int j = 0; j < hi - lo; ++j)
      t.coefs[static_cast<size_t>(x) * t.ksize + j] =
          static_cast<float>(w[j] / total);
  }
  return t;
}

// One image: [in_h, in_w, c] float -> [out_h, out_w, c] float.
void resample_image(const float* in, int in_h, int in_w, int c,
                    const ResampleTable& th, const ResampleTable& tw,
                    int out_h, int out_w, float* out, float* tmp) {
  // horizontal pass: [in_h, out_w, c] into tmp
  for (int y = 0; y < in_h; ++y) {
    const float* row = in + static_cast<size_t>(y) * in_w * c;
    float* trow = tmp + static_cast<size_t>(y) * out_w * c;
    for (int x = 0; x < out_w; ++x) {
      const float* co = &tw.coefs[static_cast<size_t>(x) * tw.ksize];
      int lo = tw.xmin[x];
      for (int ch = 0; ch < c; ++ch) {
        float acc = 0.0f;
        for (int j = 0; j < tw.ksize; ++j) {
          int src = lo + j;
          if (src >= in_w || co[j] == 0.0f) break;
          acc += co[j] * row[static_cast<size_t>(src) * c + ch];
        }
        trow[static_cast<size_t>(x) * c + ch] = acc;
      }
    }
  }
  // vertical pass: tmp [in_h, out_w, c] -> out [out_h, out_w, c]
  for (int y = 0; y < out_h; ++y) {
    const float* co = &th.coefs[static_cast<size_t>(y) * th.ksize];
    int lo = th.xmin[y];
    float* orow = out + static_cast<size_t>(y) * out_w * c;
    std::memset(orow, 0, sizeof(float) * out_w * c);
    for (int j = 0; j < th.ksize; ++j) {
      int src = lo + j;
      if (src >= in_h || co[j] == 0.0f) break;
      const float* trow = tmp + static_cast<size_t>(src) * out_w * c;
      float w = co[j];
      for (int i = 0; i < out_w * c; ++i) orow[i] += w * trow[i];
    }
  }
}

// Center-crop (zero-pad when smaller — torchvision CenterCrop semantics,
// cf. ctvae_tpu/data/transforms.py center_crop) into a float buffer.
template <typename T>
void crop_to_float(const T* in, int in_h, int in_w, int c, int crop,
                   float scale, float* out) {
  std::memset(out, 0, sizeof(float) * crop * crop * c);
  int src_top = std::max(0, (in_h - crop) / 2);
  int src_left = std::max(0, (in_w - crop) / 2);
  int dst_top = std::max(0, (crop - in_h) / 2);
  int dst_left = std::max(0, (crop - in_w) / 2);
  int copy_h = std::min(in_h, crop);
  int copy_w = std::min(in_w, crop);
  for (int y = 0; y < copy_h; ++y) {
    const T* src = in + (static_cast<size_t>(src_top + y) * in_w + src_left) * c;
    float* dst = out + (static_cast<size_t>(dst_top + y) * crop + dst_left) * c;
    for (int i = 0; i < copy_w * c; ++i)
      dst[i] = static_cast<float>(src[i]) * scale;
  }
}

void parallel_for(int n, int n_threads, const std::function<void(int)>& fn) {
  n_threads = std::max(1, std::min(n_threads, n));
  if (n_threads == 1) {
    for (int i = 0; i < n; ++i) fn(i);
    return;
  }
  std::atomic<int> next(0);
  std::vector<std::thread> pool;
  pool.reserve(n_threads);
  for (int t = 0; t < n_threads; ++t)
    pool.emplace_back([&] {
      for (int i = next.fetch_add(1); i < n; i = next.fetch_add(1)) fn(i);
    });
  for (auto& th : pool) th.join();
}

template <typename T>
void crop_resize_batch(const T* in, int n, int in_h, int in_w, int c,
                       int crop, int out_h, int out_w, float scale,
                       float* out, int n_threads) {
  int work_h = crop > 0 ? crop : in_h;
  int work_w = crop > 0 ? crop : in_w;
  ResampleTable th = build_table(work_h, out_h);
  ResampleTable tw = build_table(work_w, out_w);
  size_t in_stride = static_cast<size_t>(in_h) * in_w * c;
  size_t out_stride = static_cast<size_t>(out_h) * out_w * c;
  parallel_for(n, n_threads, [&](int i) {
    std::vector<float> cropped(static_cast<size_t>(work_h) * work_w * c);
    std::vector<float> tmp(static_cast<size_t>(work_h) * out_w * c);
    const T* src = in + static_cast<size_t>(i) * in_stride;
    if (crop > 0) {
      crop_to_float(src, in_h, in_w, c, crop, scale, cropped.data());
    } else {
      for (size_t j = 0; j < cropped.size(); ++j)
        cropped[j] = static_cast<float>(src[j]) * scale;
    }
    resample_image(cropped.data(), work_h, work_w, c, th, tw, out_h, out_w,
                   out + static_cast<size_t>(i) * out_stride, tmp.data());
  });
}

// -------------------------- JPEG decode ------------------------------

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jb, 1);
}

// Returns true on success; fills rgb (HWC uint8) + dims.
bool decode_jpeg(const char* path, std::vector<uint8_t>* rgb, int* h, int* w) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  *h = cinfo.output_height;
  *w = cinfo.output_width;
  rgb->resize(static_cast<size_t>(*h) * *w * 3);
  JSAMPROW row;
  while (cinfo.output_scanline < cinfo.output_height) {
    row = rgb->data() + static_cast<size_t>(cinfo.output_scanline) * *w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  std::fclose(f);
  return true;
}

}  // namespace

extern "C" {

// uint8 NHWC -> float32 NHWC in [0,1]; crop<=0 disables cropping.
void ctvae_crop_resize_u8(const uint8_t* in, int n, int in_h, int in_w,
                          int c, int crop, int out_h, int out_w,
                          float* out, int n_threads) {
  crop_resize_batch(in, n, in_h, in_w, c, crop, out_h, out_w,
                    1.0f / 255.0f, out, n_threads);
}

// float32 NHWC (already [0,1]) -> float32 NHWC.
void ctvae_crop_resize_f32(const float* in, int n, int in_h, int in_w,
                           int c, int crop, int out_h, int out_w,
                           float* out, int n_threads) {
  crop_resize_batch(in, n, in_h, in_w, c, crop, out_h, out_w, 1.0f, out,
                    n_threads);
}

// Fused fancy-gather + uint8 -> float32 [0,1] conversion, threaded over
// the gathered rows. Replaces the cached-batch hot path's numpy triple
// pass (`cache[idxs]` gather write, `.astype` read+write, `/255`
// read+write) with ONE read of the source rows and ONE write of the
// float output — the host-side batch-assembly bottleneck once images
// are pre-materialized (see data/disent_data.py get_batch).
void ctvae_gather_u8_to_f32(const uint8_t* src, const int64_t* idxs, int n,
                            int64_t row_elems, float* out, int n_threads) {
  // 256-entry LUT of v / 255.0f: bit-identical to numpy's
  // `astype(float32) / 255.0` (multiplying by the reciprocal is 1 ULP
  // off for some values).
  float lut[256];
  for (int v = 0; v < 256; ++v) lut[v] = static_cast<float>(v) / 255.0f;
  parallel_for(n, n_threads, [&](int i) {
    const uint8_t* s = src + static_cast<size_t>(idxs[i]) * row_elems;
    float* d = out + static_cast<size_t>(i) * row_elems;
    for (int64_t j = 0; j < row_elems; ++j) d[j] = lut[s[j]];
  });
}

// JPEG paths -> decode + crop + resize -> float32 NHWC [0,1].
// Returns the number of images that failed to decode (their slots are
// zero-filled).
int ctvae_load_jpeg_batch(const char** paths, int n, int crop, int out_h,
                          int out_w, float* out, int n_threads) {
  ResampleTable* tables = nullptr;  // built lazily per size; CelebA is uniform
  (void)tables;
  std::atomic<int> failures(0);
  size_t out_stride = static_cast<size_t>(out_h) * out_w * 3;
  parallel_for(n, n_threads, [&](int i) {
    std::vector<uint8_t> rgb;
    int h = 0, w = 0;
    float* dst = out + static_cast<size_t>(i) * out_stride;
    if (!decode_jpeg(paths[i], &rgb, &h, &w)) {
      std::memset(dst, 0, sizeof(float) * out_stride);
      failures.fetch_add(1);
      return;
    }
    int work = crop > 0 ? crop : std::min(h, w);
    std::vector<float> cropped(static_cast<size_t>(work) * work * 3);
    crop_to_float(rgb.data(), h, w, 3, work, 1.0f / 255.0f, cropped.data());
    ResampleTable th = build_table(work, out_h);
    ResampleTable tw = build_table(work, out_w);
    std::vector<float> tmp(static_cast<size_t>(work) * out_w * 3);
    resample_image(cropped.data(), work, work, 3, th, tw, out_h, out_w, dst,
                   tmp.data());
  });
  return failures.load();
}

}  // extern "C"
