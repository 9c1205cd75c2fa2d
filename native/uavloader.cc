// uavloader — native host-side image pipeline for uavdet_tpu.
//
// The reference feeds its GPU from 32 python DataLoader workers doing PIL
// decode + albumentations resize (dataset/_helper.py:176-179). This library
// replaces that host path with a C++ thread pool: JPEG decode (libjpeg),
// bilinear resize, and [0,1] float normalization straight into a caller-
// provided NHWC float32 buffer (zero python-side copies). Exposed as a thin
// C API consumed via ctypes (no pybind11 in this environment).
//
// Build: see native/Makefile (g++ -O3 -fPIC -shared, links -ljpeg -lpthread).

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <atomic>
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

namespace {

struct JpegErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Decode a JPEG file into an RGB8 buffer. Returns false on failure.
bool DecodeJpeg(const char* path, std::vector<uint8_t>* pixels, int* w,
                int* h) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;

  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return false;
  }

  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);

  *w = cinfo.output_width;
  *h = cinfo.output_height;
  const int stride = *w * 3;
  pixels->resize(static_cast<size_t>(stride) * *h);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = pixels->data() +
                   static_cast<size_t>(cinfo.output_scanline) * stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return true;
}

// Bilinear resize RGB8 (h, w) → float32 [0,1] NHWC (size, size).
// x-coordinate tables are precomputed per image and rows are expanded to
// planar float spans first, so the inner loops auto-vectorize.
void ResizeNormalize(const uint8_t* src, int w, int h, float* dst, int size) {
  const float sx = static_cast<float>(w) / size;
  const float sy = static_cast<float>(h) / size;

  std::vector<int> x0(size), x1(size);
  std::vector<float> wx(size);
  for (int x = 0; x < size; ++x) {
    // align_corners=false convention (cv2.INTER_LINEAR / PIL BILINEAR)
    float fx = (x + 0.5f) * sx - 0.5f;
    if (fx < 0) fx = 0;
    x0[x] = static_cast<int>(fx);
    x1[x] = x0[x] + 1 < w ? x0[x] + 1 : w - 1;
    wx[x] = fx - x0[x];
  }

  // horizontally-resampled rows cache: row y of src → (size, 3) floats
  std::vector<float> row_a(size * 3), row_b(size * 3);
  int cached_a = -1, cached_b = -1;

  auto hresample = [&](int y, float* out_row) {
    const uint8_t* r = src + static_cast<size_t>(y) * w * 3;
    for (int x = 0; x < size; ++x) {
      const uint8_t* p0 = r + x0[x] * 3;
      const uint8_t* p1 = r + x1[x] * 3;
      const float t = wx[x];
      out_row[x * 3 + 0] = p0[0] + (p1[0] - p0[0]) * t;
      out_row[x * 3 + 1] = p0[1] + (p1[1] - p0[1]) * t;
      out_row[x * 3 + 2] = p0[2] + (p1[2] - p0[2]) * t;
    }
  };

  const float inv = 1.0f / 255.0f;
  for (int y = 0; y < size; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    if (fy < 0) fy = 0;
    int y0 = static_cast<int>(fy);
    int y1 = y0 + 1 < h ? y0 + 1 : h - 1;
    float t = fy - y0;

    if (cached_a != y0) {
      if (cached_b == y0) {  // shift: reuse the bottom row as the new top
        std::swap(row_a, row_b);
        std::swap(cached_a, cached_b);
      } else {
        hresample(y0, row_a.data());
        cached_a = y0;
      }
    }
    if (cached_b != y1) {
      hresample(y1, row_b.data());
      cached_b = y1;
    }

    float* out = dst + static_cast<size_t>(y) * size * 3;
    const float* a = row_a.data();
    const float* b = row_b.data();
    for (int i = 0; i < size * 3; ++i) {
      out[i] = (a[i] + (b[i] - a[i]) * t) * inv;
    }
  }
}

class ThreadPool {
 public:
  explicit ThreadPool(int n) {
    for (int i = 0; i < n; ++i) {
      workers_.emplace_back([this] {
        for (;;) {
          std::function<void()> job;
          {
            std::unique_lock<std::mutex> lk(mu_);
            cv_.wait(lk, [this] { return stop_ || !jobs_.empty(); });
            if (stop_ && jobs_.empty()) return;
            job = std::move(jobs_.front());
            jobs_.pop();
          }
          job();
        }
      });
    }
  }

  ~ThreadPool() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& t : workers_) t.join();
  }

  void Submit(std::function<void()> job) {
    {
      std::lock_guard<std::mutex> lk(mu_);
      jobs_.push(std::move(job));
    }
    cv_.notify_one();
  }

 private:
  std::vector<std::thread> workers_;
  std::queue<std::function<void()>> jobs_;
  std::mutex mu_;
  std::condition_variable cv_;
  bool stop_ = false;
};

ThreadPool* g_pool = nullptr;
int g_pool_size = 0;
std::mutex g_pool_mu;

ThreadPool* GetPool(int threads) {
  std::lock_guard<std::mutex> lk(g_pool_mu);
  if (g_pool == nullptr || g_pool_size != threads) {
    delete g_pool;
    g_pool = new ThreadPool(threads);
    g_pool_size = threads;
  }
  return g_pool;
}

}  // namespace

extern "C" {

// Decode+resize+normalize a batch of JPEG files into out (n, size, size, 3)
// float32 NHWC. Returns the number of successfully decoded images; failed
// slots are zero-filled and flagged 0 in ok[i].
int uav_decode_resize_batch(const char** paths, int n, int size, float* out,
                            uint8_t* ok, int threads) {
  if (threads < 1) threads = 1;
  ThreadPool* pool = GetPool(threads);

  std::atomic<int> done{0}, good{0};
  std::mutex done_mu;
  std::condition_variable done_cv;

  const size_t img_floats = static_cast<size_t>(size) * size * 3;
  for (int i = 0; i < n; ++i) {
    pool->Submit([&, i] {
      std::vector<uint8_t> pixels;
      int w = 0, h = 0;
      float* dst = out + img_floats * i;
      if (DecodeJpeg(paths[i], &pixels, &w, &h) && w > 0 && h > 0) {
        ResizeNormalize(pixels.data(), w, h, dst, size);
        ok[i] = 1;
        good.fetch_add(1);
      } else {
        memset(dst, 0, img_floats * sizeof(float));
        ok[i] = 0;
      }
      if (done.fetch_add(1) + 1 == n) {
        std::lock_guard<std::mutex> lk(done_mu);
        done_cv.notify_all();
      }
    });
  }

  std::unique_lock<std::mutex> lk(done_mu);
  done_cv.wait(lk, [&] { return done.load() == n; });
  return good.load();
}

// Single-image variant; returns 1 on success.
int uav_decode_resize(const char* path, int size, float* out) {
  std::vector<uint8_t> pixels;
  int w = 0, h = 0;
  if (!DecodeJpeg(path, &pixels, &w, &h)) return 0;
  ResizeNormalize(pixels.data(), w, h, out, size);
  return 1;
}

}  // extern "C"
