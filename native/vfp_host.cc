// vfp_host: native host-side preprocessing runtime.
//
// The TPU compute path is JAX/XLA/Pallas; this library is the native part of
// the *host* runtime around it (SURVEY.md §2: decode/preprocess is the
// framework's only unavoidable host-side work — the reference outsources it
// to the cv2/PyAV wheels and a Python loop; here the per-frame loop is C++
// with a thread pool, writing straight into the pinned staging buffer that
// feeds jax.device_put).
//
// Semantics mirror data/preprocess.py::resize_short_side_center_crop:
//   aspect-preserving short-side resize to `size` (area-average for
//   downscale, bilinear for upscale), center crop, uint8 RGB -> float32
//   [0,1] HWC. The Python cv2 path remains the default where bit-exactness
//   with the reference matters; this is the throughput path.
//
// Build: g++ -O3 -shared -fPIC -std=c++17 -pthread vfp_host.cc -o libvfp_host.so

#include <algorithm>
#include <atomic>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <functional>
#include <mutex>
#include <queue>
#include <thread>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// Thread pool (persistent; sized once at init)
// ---------------------------------------------------------------------------
class ThreadPool {
 public:
  explicit ThreadPool(int n) : stop_(false) {
    for (int i = 0; i < n; ++i) {
      workers_.emplace_back([this] {
        for (;;) {
          std::function<void()> task;
          {
            std::unique_lock<std::mutex> lk(mu_);
            cv_.wait(lk, [this] { return stop_ || !tasks_.empty(); });
            if (stop_ && tasks_.empty()) return;
            task = std::move(tasks_.front());
            tasks_.pop();
          }
          task();
          // The final decrement+notify must hold done_mu_: otherwise the
          // notify can land between wait_all()'s predicate check and its
          // sleep (lost wakeup -> wait_all blocks forever).
          if (--inflight_ == 0) {
            std::lock_guard<std::mutex> lk(done_mu_);
            done_cv_.notify_all();
          }
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
    for (auto& w : workers_) w.join();
  }

  void submit(std::function<void()> f) {
    ++inflight_;
    {
      std::lock_guard<std::mutex> lk(mu_);
      tasks_.push(std::move(f));
    }
    cv_.notify_one();
  }

  void wait_all() {
    std::unique_lock<std::mutex> lk(done_mu_);
    done_cv_.wait(lk, [this] { return inflight_.load() == 0; });
  }

  int size() const { return static_cast<int>(workers_.size()); }

 private:
  std::vector<std::thread> workers_;
  std::queue<std::function<void()>> tasks_;
  std::mutex mu_, done_mu_;
  std::condition_variable cv_, done_cv_;
  std::atomic<int> inflight_{0};
  bool stop_;
};

ThreadPool* g_pool = nullptr;

// ---------------------------------------------------------------------------
// Resize kernels (RGB interleaved uint8)
// ---------------------------------------------------------------------------

// Area-average resize (downscale): each dst pixel averages the exact source
// box it covers (fractional edges weighted) — cv2 INTER_AREA equivalent.
void resize_area(const uint8_t* src, int sh, int sw, uint8_t* dst, int dh,
                 int dw) {
  const double sy = static_cast<double>(sh) / dh;
  const double sx = static_cast<double>(sw) / dw;
  for (int y = 0; y < dh; ++y) {
    const double y0 = y * sy, y1 = (y + 1) * sy;
    const int iy0 = static_cast<int>(y0);
    const int iy1 = std::min(sh, static_cast<int>(std::ceil(y1)));
    for (int x = 0; x < dw; ++x) {
      const double x0 = x * sx, x1 = (x + 1) * sx;
      const int ix0 = static_cast<int>(x0);
      const int ix1 = std::min(sw, static_cast<int>(std::ceil(x1)));
      double acc[3] = {0, 0, 0};
      double wsum = 0;
      for (int yy = iy0; yy < iy1; ++yy) {
        const double wy =
            std::min<double>(yy + 1, y1) - std::max<double>(yy, y0);
        const uint8_t* row = src + (static_cast<size_t>(yy) * sw) * 3;
        for (int xx = ix0; xx < ix1; ++xx) {
          const double wx =
              std::min<double>(xx + 1, x1) - std::max<double>(xx, x0);
          const double w = wx * wy;
          const uint8_t* p = row + xx * 3;
          acc[0] += w * p[0];
          acc[1] += w * p[1];
          acc[2] += w * p[2];
          wsum += w;
        }
      }
      uint8_t* q = dst + (static_cast<size_t>(y) * dw + x) * 3;
      for (int c = 0; c < 3; ++c)
        q[c] = static_cast<uint8_t>(std::lround(acc[c] / wsum));
    }
  }
}

// Bilinear resize (upscale), half-pixel centers like cv2 INTER_LINEAR.
void resize_bilinear(const uint8_t* src, int sh, int sw, uint8_t* dst, int dh,
                     int dw) {
  const double sy = static_cast<double>(sh) / dh;
  const double sx = static_cast<double>(sw) / dw;
  for (int y = 0; y < dh; ++y) {
    double fy = (y + 0.5) * sy - 0.5;
    fy = std::max(0.0, std::min(fy, static_cast<double>(sh - 1)));
    const int y0 = static_cast<int>(fy);
    const int y1 = std::min(y0 + 1, sh - 1);
    const double wy = fy - y0;
    for (int x = 0; x < dw; ++x) {
      double fx = (x + 0.5) * sx - 0.5;
      fx = std::max(0.0, std::min(fx, static_cast<double>(sw - 1)));
      const int x0 = static_cast<int>(fx);
      const int x1 = std::min(x0 + 1, sw - 1);
      const double wx = fx - x0;
      uint8_t* q = dst + (static_cast<size_t>(y) * dw + x) * 3;
      for (int c = 0; c < 3; ++c) {
        const double v00 = src[(static_cast<size_t>(y0) * sw + x0) * 3 + c];
        const double v01 = src[(static_cast<size_t>(y0) * sw + x1) * 3 + c];
        const double v10 = src[(static_cast<size_t>(y1) * sw + x0) * 3 + c];
        const double v11 = src[(static_cast<size_t>(y1) * sw + x1) * 3 + c];
        const double v = (1 - wy) * ((1 - wx) * v00 + wx * v01) +
                         wy * ((1 - wx) * v10 + wx * v11);
        q[c] = static_cast<uint8_t>(std::lround(v));
      }
    }
  }
}

// Short-side resize + center crop + normalize into float32 HWC [0,1].
void preprocess_one(const uint8_t* src, int sh, int sw, float* dst, int size) {
  int nh, nw;
  if (sh < sw) {
    nh = size;
    nw = static_cast<int>(static_cast<int64_t>(sw) * size / sh);
  } else {
    nw = size;
    nh = static_cast<int>(static_cast<int64_t>(sh) * size / sw);
  }
  std::vector<uint8_t> tmp(static_cast<size_t>(nh) * nw * 3);
  if (nh <= sh && nw <= sw)
    resize_area(src, sh, sw, tmp.data(), nh, nw);
  else
    resize_bilinear(src, sh, sw, tmp.data(), nh, nw);

  const int oy = (nh - size) / 2;
  const int ox = (nw - size) / 2;
  constexpr float kInv = 1.0f / 255.0f;
  for (int y = 0; y < size; ++y) {
    const uint8_t* row = tmp.data() + ((static_cast<size_t>(y + oy)) * nw + ox) * 3;
    float* out = dst + static_cast<size_t>(y) * size * 3;
    const int n = size * 3;
    for (int i = 0; i < n; ++i) out[i] = row[i] * kInv;
  }
}

}  // namespace

extern "C" {

int vfp_init(int num_threads) {
  if (g_pool) return g_pool->size();
  if (num_threads <= 0) {
    num_threads = static_cast<int>(std::thread::hardware_concurrency());
    if (num_threads <= 0) num_threads = 1;
  }
  g_pool = new ThreadPool(num_threads);
  return num_threads;
}

// Preprocess `n` same-sized frames (T,H,W,3 u8) into (T,size,size,3) f32,
// fanned out over the pool.
void vfp_preprocess_frames(const uint8_t* frames, int n, int h, int w,
                           float* out, int size) {
  if (!g_pool) vfp_init(0);
  const size_t in_stride = static_cast<size_t>(h) * w * 3;
  const size_t out_stride = static_cast<size_t>(size) * size * 3;
  if (n == 1 || g_pool->size() == 1) {
    for (int i = 0; i < n; ++i)
      preprocess_one(frames + i * in_stride, h, w, out + i * out_stride, size);
    return;
  }
  for (int i = 0; i < n; ++i) {
    const uint8_t* src = frames + i * in_stride;
    float* dst = out + i * out_stride;
    g_pool->submit([src, h, w, dst, size] { preprocess_one(src, h, w, dst, size); });
  }
  g_pool->wait_all();
}

// Assemble a zero-padded batch row: copy (t,size,size,3) f32 clip into slot
// `row` of a (B,bucket,size,size,3) f32 buffer and zero the tail.
void vfp_fill_batch_row(const float* clip, int t, float* batch, int row,
                        int bucket, int size) {
  const size_t frame = static_cast<size_t>(size) * size * 3;
  float* dst = batch + static_cast<size_t>(row) * bucket * frame;
  std::memcpy(dst, clip, static_cast<size_t>(t) * frame * sizeof(float));
  std::memset(dst + static_cast<size_t>(t) * frame, 0,
              static_cast<size_t>(bucket - t) * frame * sizeof(float));
}

}  // extern "C"
