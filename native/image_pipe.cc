// Native image preprocessing pipeline: JPEG decode -> TargetPad/SquarePad ->
// PIL-compatible bicubic resize (short side) -> center crop -> CLIP normalize
// -> float32 HWC.
//
// This is the framework's C++ data-loader path (the reference's equivalent
// work happens inside Pillow's C core, driven one image at a time from
// Python). Exposed via a C ABI and bound with ctypes
// (candidate_reranking_cir_tpu/data/native_pipe.py); the Python PIL path
// remains the pixel-parity reference for evaluation.
//
// Resize parity: implements PIL's convolution resampling — a cubic kernel
// (Catmull-Rom a=-0.5, PIL's "bicubic") whose support is stretched by the
// scale factor on downscale (area-adaptive antialiasing), separable H then V,
// with PIL's clipping to [0,255] between passes. Matches Pillow to within a
// couple of 8-bit LSBs (PIL quantizes to uint8 between passes).
//
// Build: make -C native   (produces libimagepipe.so)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <atomic>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <csetjmp>

namespace {

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jump;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jump, 1);
}

// ---- decode ---------------------------------------------------------------

bool decode_jpeg(const uint8_t* data, size_t len, std::vector<uint8_t>* rgb,
                 int* w, int* h) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_error_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, len);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  *w = cinfo.output_width;
  *h = cinfo.output_height;
  rgb->resize(static_cast<size_t>(*w) * *h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = rgb->data() + static_cast<size_t>(cinfo.output_scanline) * *w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

// ---- PIL-style bicubic resampling ----------------------------------------

inline double cubic_filter(double x) {
  // PIL's bicubic: a = -0.5 (Catmull-Rom), support 2
  constexpr double a = -0.5;
  x = std::fabs(x);
  if (x < 1.0) return ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0;
  if (x < 2.0) return (((x - 5.0) * x + 8.0) * x - 4.0) * a;
  return 0.0;
}

struct Weights {
  std::vector<int> bounds;   // [out] first source index
  std::vector<int> counts;   // [out] number of taps
  std::vector<double> coef;  // [out * kmax]
  int kmax;
};

Weights precompute(int in_size, int out_size) {
  const double scale = static_cast<double>(in_size) / out_size;
  const double filterscale = std::max(scale, 1.0);
  const double support = 2.0 * filterscale;
  const int kmax = static_cast<int>(std::ceil(support)) * 2 + 1;

  Weights w;
  w.kmax = kmax;
  w.bounds.resize(out_size);
  w.counts.resize(out_size);
  w.coef.assign(static_cast<size_t>(out_size) * kmax, 0.0);

  for (int xx = 0; xx < out_size; ++xx) {
    double center = (xx + 0.5) * scale;
    int xmin = static_cast<int>(center - support + 0.5);
    if (xmin < 0) xmin = 0;
    int xmax = static_cast<int>(center + support + 0.5);
    if (xmax > in_size) xmax = in_size;
    int n = xmax - xmin;
    double* k = &w.coef[static_cast<size_t>(xx) * kmax];
    double total = 0.0;
    for (int i = 0; i < n; ++i) {
      double weight = cubic_filter((xmin + i - center + 0.5) / filterscale);
      k[i] = weight;
      total += weight;
    }
    if (total != 0.0)
      for (int i = 0; i < n; ++i) k[i] /= total;
    w.bounds[xx] = xmin;
    w.counts[xx] = n;
  }
  return w;
}

inline uint8_t clip8(double v) {
  return static_cast<uint8_t>(std::lround(std::min(255.0, std::max(0.0, v))));
}

// horizontal+vertical separable resample, uint8 in/out (PIL quantizes between
// passes)
std::vector<uint8_t> resample(const std::vector<uint8_t>& src, int sw, int sh,
                              int dw, int dh) {
  Weights wx = precompute(sw, dw);
  std::vector<uint8_t> tmp(static_cast<size_t>(dw) * sh * 3);
  for (int y = 0; y < sh; ++y) {
    const uint8_t* srow = src.data() + static_cast<size_t>(y) * sw * 3;
    uint8_t* trow = tmp.data() + static_cast<size_t>(y) * dw * 3;
    for (int x = 0; x < dw; ++x) {
      const double* k = &wx.coef[static_cast<size_t>(x) * wx.kmax];
      int x0 = wx.bounds[x], n = wx.counts[x];
      double acc[3] = {0, 0, 0};
      for (int i = 0; i < n; ++i) {
        const uint8_t* p = srow + static_cast<size_t>(x0 + i) * 3;
        acc[0] += p[0] * k[i];
        acc[1] += p[1] * k[i];
        acc[2] += p[2] * k[i];
      }
      trow[x * 3 + 0] = clip8(acc[0]);
      trow[x * 3 + 1] = clip8(acc[1]);
      trow[x * 3 + 2] = clip8(acc[2]);
    }
  }

  Weights wy = precompute(sh, dh);
  std::vector<uint8_t> dst(static_cast<size_t>(dw) * dh * 3);
  for (int y = 0; y < dh; ++y) {
    const double* k = &wy.coef[static_cast<size_t>(y) * wy.kmax];
    int y0 = wy.bounds[y], n = wy.counts[y];
    uint8_t* drow = dst.data() + static_cast<size_t>(y) * dw * 3;
    for (int x = 0; x < dw; ++x) {
      double acc[3] = {0, 0, 0};
      for (int i = 0; i < n; ++i) {
        const uint8_t* p = tmp.data() +
            (static_cast<size_t>(y0 + i) * dw + x) * 3;
        acc[0] += p[0] * k[i];
        acc[1] += p[1] * k[i];
        acc[2] += p[2] * k[i];
      }
      drow[x * 3 + 0] = clip8(acc[0]);
      drow[x * 3 + 1] = clip8(acc[1]);
      drow[x * 3 + 2] = clip8(acc[2]);
    }
  }
  return dst;
}

constexpr float kMean[3] = {0.48145466f, 0.4578275f, 0.40821073f};
constexpr float kStd[3] = {0.26862954f, 0.26130258f, 0.27577711f};

// full pipeline for one decoded image
bool process(const std::vector<uint8_t>& rgb0, int w, int h, int dim,
             double target_ratio, int square_pad, float* out) {
  // pad (TargetPad: only when aspect ratio exceeds target; SquarePad: always
  // to square) — zero fill, centered (data_utils.py:23-68)
  std::vector<uint8_t> padded;
  const std::vector<uint8_t>* img = &rgb0;
  int pw = w, ph = h;
  int hp = 0, vp = 0;
  if (square_pad) {
    int m = std::max(w, h);
    hp = (m - w) / 2;
    vp = (m - h) / 2;
  } else {
    double ratio = static_cast<double>(std::max(w, h)) / std::min(w, h);
    if (ratio >= target_ratio) {
      double scaled = std::max(w, h) / target_ratio;
      hp = std::max(static_cast<int>((scaled - w) / 2), 0);
      vp = std::max(static_cast<int>((scaled - h) / 2), 0);
    }
  }
  if (hp > 0 || vp > 0) {
    pw = w + 2 * hp;
    ph = h + 2 * vp;
    padded.assign(static_cast<size_t>(pw) * ph * 3, 0);
    for (int y = 0; y < h; ++y) {
      std::memcpy(padded.data() + (static_cast<size_t>(y + vp) * pw + hp) * 3,
                  rgb0.data() + static_cast<size_t>(y) * w * 3,
                  static_cast<size_t>(w) * 3);
    }
    img = &padded;
  }

  // short side -> dim (torchvision Resize(int) semantics). Python round()
  // is half-to-even; std::nearbyint matches it in the default FP mode.
  int nw, nh;
  if (pw <= ph) {
    nw = dim;
    nh = std::max(static_cast<int>(std::nearbyint(
        static_cast<double>(ph) * dim / pw)), dim);
  } else {
    nh = dim;
    nw = std::max(static_cast<int>(std::nearbyint(
        static_cast<double>(pw) * dim / ph)), dim);
  }
  std::vector<uint8_t> resized = resample(*img, pw, ph, nw, nh);

  // center crop dim x dim (same half-to-even rounding as the host path)
  int left = static_cast<int>(std::nearbyint((nw - dim) / 2.0));
  int top = static_cast<int>(std::nearbyint((nh - dim) / 2.0));

  for (int y = 0; y < dim; ++y) {
    const uint8_t* srow = resized.data() +
        (static_cast<size_t>(y + top) * nw + left) * 3;
    float* drow = out + static_cast<size_t>(y) * dim * 3;
    for (int x = 0; x < dim; ++x) {
      for (int c = 0; c < 3; ++c) {
        drow[x * 3 + c] =
            (srow[x * 3 + c] / 255.0f - kMean[c]) / kStd[c];
      }
    }
  }
  return true;
}

}  // namespace

extern "C" {

// Decode + preprocess one JPEG buffer -> out [dim, dim, 3] float32.
// square_pad: 0 = TargetPad(target_ratio), 1 = SquarePad. Returns 0 on
// success, nonzero on decode failure.
int ip_process_jpeg(const uint8_t* data, int64_t len, int dim,
                    double target_ratio, int square_pad, float* out) {
  std::vector<uint8_t> rgb;
  int w = 0, h = 0;
  if (!decode_jpeg(data, static_cast<size_t>(len), &rgb, &w, &h)) return 1;
  if (w <= 0 || h <= 0) return 2;
  return process(rgb, w, h, dim, target_ratio, square_pad, out) ? 0 : 3;
}

// Preprocess an already-decoded RGB8 image (for non-JPEG sources).
int ip_process_rgb(const uint8_t* rgb, int w, int h, int dim,
                   double target_ratio, int square_pad, float* out) {
  std::vector<uint8_t> buf(rgb, rgb + static_cast<size_t>(w) * h * 3);
  return process(buf, w, h, dim, target_ratio, square_pad, out) ? 0 : 3;
}

// Decode + preprocess a BATCH of JPEG buffers with a native thread pool —
// GIL-free parallelism for the data-loader hot path (one ctypes call per
// batch instead of one per image). out: [n, dim, dim, 3] float32;
// rcs: per-image return codes (0 = ok). Returns the number of failures.
int ip_process_jpeg_batch(const uint8_t** datas, const int64_t* lens,
                          int32_t n, int dim, double target_ratio,
                          int square_pad, int32_t num_threads, float* out,
                          int32_t* rcs) {
  if (num_threads <= 0) {
    num_threads = static_cast<int32_t>(std::thread::hardware_concurrency());
    if (num_threads <= 0) num_threads = 4;
  }
  if (num_threads > n) num_threads = n;
  std::atomic<int32_t> next(0);
  const size_t stride = static_cast<size_t>(dim) * dim * 3;
  auto worker = [&]() {
    for (;;) {
      int32_t i = next.fetch_add(1);
      if (i >= n) return;
      rcs[i] = ip_process_jpeg(datas[i], lens[i], dim, target_ratio,
                               square_pad, out + stride * i);
    }
  };
  std::vector<std::thread> threads;
  threads.reserve(num_threads);
  for (int32_t t = 0; t < num_threads; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  int32_t failures = 0;
  for (int32_t i = 0; i < n; ++i) failures += rcs[i] != 0;
  return failures;
}

}  // extern "C"
