// Native host-side data-path kernels for egohmr_tpu.
//
// The reference's host pipeline leans on OpenCV C++ (cv2.imread /
// cv2.warpAffine, reference dataloaders/augmentation.py:149,346) and torch
// DataLoader worker processes. This library provides the TPU-framework
// equivalents with a C ABI consumed via ctypes (egohmr_tpu/native.py):
//
//   * decode_jpeg_file   — libjpeg RGB decode
//   * warp_affine_norm   — fused bilinear affine crop + per-channel color
//                          scale + mean/std normalization, HWC uint8 ->
//                          CHW float32 (one pass instead of warp + 3
//                          elementwise passes in numpy)
//   * load_batch         — thread-pool batch assembly: decode + warp +
//                          normalize each item concurrently into a
//                          preallocated [B, S, S, 3] float buffer
//
// Build: make -C native   (produces libegohmr_native.so)

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <atomic>
#include <cmath>
#include <condition_variable>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <functional>
#include <mutex>
#include <queue>
#include <thread>
#include <vector>

extern "C" {

// ---------------------------------------------------------------- jpeg
struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

static void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jb, 1);
}

// Decode a JPEG file to RGB. Returns 0 on success; fills *out (caller
// buffer of capacity cap bytes), *h, *w. Returns -1 on open/parse failure,
// -2 if the buffer is too small.
int decode_jpeg_file(const char* path, uint8_t* out, int64_t cap,
                     int32_t* h, int32_t* w) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;

  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return -1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  const int64_t W = cinfo.output_width, H = cinfo.output_height;
  if (W * H * 3 > cap) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return -2;
  }
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out + int64_t(cinfo.output_scanline) * W * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  *h = int32_t(H);
  *w = int32_t(W);
  return 0;
}

// ------------------------------------------------------- warp + normalize
// trans: [2,3] row-major SRC->DST affine (cv2.warpAffine convention); the
// inverse is computed here. Border: constant 0 (cv2 default). Output CHW
// when chw != 0, else HWC.
void warp_affine_norm(const uint8_t* src, int32_t src_h, int32_t src_w,
                      const float* trans, int32_t out_size, float* out,
                      const float* color_scale, const float* mean,
                      const float* std_, int32_t chw) {
  // invert [a b c; d e f]
  const float a = trans[0], b = trans[1], c = trans[2];
  const float d = trans[3], e = trans[4], f = trans[5];
  const float det = a * e - b * d;
  const float ia = e / det, ib = -b / det, id = -d / det, ie = a / det;
  const float ic = -(ia * c + ib * f);
  const float if_ = -(id * c + ie * f);

  const float inv_std[3] = {1.0f / std_[0], 1.0f / std_[1], 1.0f / std_[2]};
  const int64_t plane = int64_t(out_size) * out_size;

  for (int32_t y = 0; y < out_size; ++y) {
    for (int32_t x = 0; x < out_size; ++x) {
      const float sx = ia * x + ib * y + ic;
      const float sy = id * x + ie * y + if_;
      float px[3] = {0.f, 0.f, 0.f};
      const int32_t x0 = int32_t(std::floor(sx));
      const int32_t y0 = int32_t(std::floor(sy));
      if (x0 >= -1 && x0 < src_w && y0 >= -1 && y0 < src_h) {
        const float fx = sx - x0, fy = sy - y0;
        const float w00 = (1 - fx) * (1 - fy), w01 = fx * (1 - fy);
        const float w10 = (1 - fx) * fy, w11 = fx * fy;
        for (int ch = 0; ch < 3; ++ch) {
          float acc = 0.f;
          if (x0 >= 0 && y0 >= 0)
            acc += w00 * src[(int64_t(y0) * src_w + x0) * 3 + ch];
          if (x0 + 1 < src_w && y0 >= 0)
            acc += w01 * src[(int64_t(y0) * src_w + x0 + 1) * 3 + ch];
          if (x0 >= 0 && y0 + 1 < src_h)
            acc += w10 * src[(int64_t(y0 + 1) * src_w + x0) * 3 + ch];
          if (x0 + 1 < src_w && y0 + 1 < src_h)
            acc += w11 * src[(int64_t(y0 + 1) * src_w + x0 + 1) * 3 + ch];
          px[ch] = acc;
        }
      }
      for (int ch = 0; ch < 3; ++ch) {
        float v = px[ch] * color_scale[ch];
        v = v < 0.f ? 0.f : (v > 255.f ? 255.f : v);
        v = (v - mean[ch]) * inv_std[ch];
        if (chw)
          out[ch * plane + int64_t(y) * out_size + x] = v;
        else
          out[(int64_t(y) * out_size + x) * 3 + ch] = v;
      }
    }
  }
}

// ------------------------------------------------------------ batch loader
// Decode + flip + warp + normalize `n` jpegs concurrently.
// paths: n C strings; trans: [n,2,3]; flips: [n] (0/1, horizontal flip
// BEFORE the warp, matching reference augmentation.py:143-148);
// color_scales: [n,3]; out: [n, S, S, 3] float32 (HWC).
// Returns the number of failed items (their slots are zero-filled).
int load_batch(const char** paths, int32_t n, const float* trans,
               const uint8_t* flips, const float* color_scales,
               const float* mean, const float* std_, int32_t out_size,
               float* out, int32_t num_threads) {
  std::atomic<int> next(0), failures(0);
  const int64_t item_stride = int64_t(out_size) * out_size * 3;
  const int64_t max_src = 4096LL * 4096 * 3;

  auto worker = [&]() {
    std::vector<uint8_t> buf(max_src);
    std::vector<uint8_t> flipped;
    while (true) {
      const int i = next.fetch_add(1);
      if (i >= n) break;
      int32_t h = 0, w = 0;
      float* dst = out + int64_t(i) * item_stride;
      if (decode_jpeg_file(paths[i], buf.data(), max_src, &h, &w) != 0) {
        std::memset(dst, 0, item_stride * sizeof(float));
        failures.fetch_add(1);
        continue;
      }
      const uint8_t* src = buf.data();
      if (flips[i]) {
        flipped.resize(int64_t(h) * w * 3);
        for (int32_t y = 0; y < h; ++y)
          for (int32_t x = 0; x < w; ++x)
            std::memcpy(&flipped[(int64_t(y) * w + x) * 3],
                        &buf[(int64_t(y) * w + (w - 1 - x)) * 3], 3);
        src = flipped.data();
      }
      warp_affine_norm(src, h, w, trans + i * 6, out_size, dst,
                       color_scales + i * 3, mean, std_, /*chw=*/0);
    }
  };

  int nt = num_threads > 0 ? num_threads
                           : int(std::thread::hardware_concurrency());
  if (nt < 1) nt = 1;
  if (nt > n) nt = n;
  std::vector<std::thread> threads;
  for (int t = 1; t < nt; ++t) threads.emplace_back(worker);
  worker();
  for (auto& t : threads) t.join();
  return failures.load();
}

}  // extern "C"
