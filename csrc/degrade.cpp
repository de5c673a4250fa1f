// Native degradation engine: the C++ runtime component of the data pipeline.
//
// One call degrades a batch of GT images through the full VSPBFR chain
// (random mixed blur kernel -> optional hazy blend -> random bilinear
// downscale -> gaussian noise -> JPEG round-trip -> upscale -> uint8
// quantize; semantics of dataset.py:327-372 + my_basicsr/my_degradations.py)
// with an internal std::thread pool, one deterministic RNG stream per
// (seed) — the Python loader threads stay free for I/O and the device feed.
//
// Exposed via a C ABI for ctypes (no pybind11 in this image).
//
// Build: see csrc/build.sh (g++ -O3 -shared, links OpenCV core/imgproc/imgcodecs).

#include <opencv2/core.hpp>
#include <opencv2/imgcodecs.hpp>
#include <opencv2/imgproc.hpp>

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <random>
#include <thread>
#include <vector>

namespace {

struct Params {
  int blur_half_lo = 19, blur_half_hi = 20;  // kernel = 2*randint+1
  float sigma_lo = 0.1f, sigma_hi = 10.0f;
  float down_lo = 0.8f, down_hi = 8.0f;
  float noise_lo = 0.0f, noise_hi = 20.0f;   // sigma in /255 units
  float jpeg_lo = 60.0f, jpeg_hi = 100.0f;
  float hazy_prob = 0.008f;
  float hazy_lo = 0.75f, hazy_hi = 0.95f;
};

float uniform(std::mt19937& g, float lo, float hi) {
  return std::uniform_real_distribution<float>(lo, hi)(g);
}

// iso/aniso bivariate gaussian (my_degradations.py:77-99)
cv::Mat sample_kernel(std::mt19937& g, const Params& p) {
  int half = std::uniform_int_distribution<int>(p.blur_half_lo, p.blur_half_hi)(g);
  int ks = half * 2 + 1;
  bool iso = std::uniform_int_distribution<int>(0, 1)(g) == 0;
  float sx = uniform(g, p.sigma_lo, p.sigma_hi);
  float sy = uniform(g, p.sigma_lo, p.sigma_hi);
  float th = uniform(g, -static_cast<float>(M_PI), static_cast<float>(M_PI));

  double a, b, c;  // inverse covariance entries [[a, b], [b, c]]
  if (iso) {
    a = c = 1.0 / (static_cast<double>(sx) * sx);
    b = 0.0;
  } else {
    double ct = std::cos(th), st = std::sin(th);
    double ix = 1.0 / (static_cast<double>(sx) * sx);
    double iy = 1.0 / (static_cast<double>(sy) * sy);
    // inv(U D U^T) = U inv(D) U^T
    a = ct * ct * ix + st * st * iy;
    b = ct * st * (ix - iy);
    c = st * st * ix + ct * ct * iy;
  }
  cv::Mat k(ks, ks, CV_32F);
  double sum = 0.0;
  int c0 = ks / 2;
  for (int y = 0; y < ks; ++y) {
    for (int x = 0; x < ks; ++x) {
      double dx = x - c0, dy = y - c0;
      double q = a * dx * dx + 2.0 * b * dx * dy + c * dy * dy;
      double v = std::exp(-0.5 * q);
      k.at<float>(y, x) = static_cast<float>(v);
      sum += v;
    }
  }
  k /= static_cast<float>(sum);
  return k;
}

void degrade_one(const float* gt, float* out, int h, int w, uint64_t seed,
                 const Params& p) {
  std::mt19937 g(static_cast<uint32_t>(seed ^ (seed >> 32)));
  cv::Mat src(h, w, CV_32FC3, const_cast<float*>(gt));

  // 1. blur
  cv::Mat k = sample_kernel(g, p);
  cv::Mat lq;
  cv::filter2D(src, lq, -1, k, cv::Point(-1, -1), 0.0, cv::BORDER_REFLECT_101);

  // 2. hazy blend
  if (uniform(g, 0.f, 1.f) < p.hazy_prob) {
    float alpha = uniform(g, p.hazy_lo, p.hazy_hi);
    lq = lq * alpha + cv::Scalar::all(1.0f - alpha);
  }

  // 3. random downscale
  float scale = uniform(g, p.down_lo, p.down_hi);
  int dw = std::max(1, static_cast<int>(w / scale));
  int dh = std::max(1, static_cast<int>(h / scale));
  cv::resize(lq, lq, cv::Size(dw, dh), 0, 0, cv::INTER_LINEAR);

  // 4. gaussian noise (sigma in /255 units), clipped to [0,1]
  float sigma = uniform(g, p.noise_lo, p.noise_hi) / 255.0f;
  std::normal_distribution<float> nd(0.f, 1.f);
  for (int y = 0; y < lq.rows; ++y) {
    float* row = lq.ptr<float>(y);
    for (int i = 0; i < lq.cols * 3; ++i) {
      row[i] = std::min(1.0f, std::max(0.0f, row[i] + sigma * nd(g)));
    }
  }

  // 5. JPEG round-trip
  int quality = static_cast<int>(uniform(g, p.jpeg_lo, p.jpeg_hi));
  cv::Mat u8;
  lq.convertTo(u8, CV_8UC3, 255.0);
  std::vector<uchar> buf;
  cv::imencode(".jpg", u8, buf, {cv::IMWRITE_JPEG_QUALITY, quality});
  cv::Mat dec = cv::imdecode(buf, cv::IMREAD_COLOR);
  dec.convertTo(lq, CV_32FC3, 1.0 / 255.0);

  // 6. resize back + uint8 quantize
  cv::resize(lq, lq, cv::Size(w, h), 0, 0, cv::INTER_LINEAR);
  cv::Mat q;
  lq.convertTo(q, CV_8UC3, 255.0);
  cv::Mat dst(h, w, CV_32FC3, out);
  q.convertTo(dst, CV_32FC3, 1.0 / 255.0);
}

}  // namespace

extern "C" {

// gt/out: (n, h, w, 3) float32, [0, 1]. seeds: (n,) uint64.
// Returns 0 on success.
int vspbfr_degrade_batch(const float* gt, float* out, int n, int h, int w,
                         const uint64_t* seeds, int n_threads) {
  Params p;
  if (n_threads < 1) n_threads = 1;
  std::vector<std::thread> pool;
  std::atomic<int> next(0);
  auto work = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      degrade_one(gt + static_cast<size_t>(i) * h * w * 3,
                  out + static_cast<size_t>(i) * h * w * 3, h, w, seeds[i], p);
    }
  };
  int t = std::min(n_threads, n);
  pool.reserve(t);
  for (int i = 0; i < t; ++i) pool.emplace_back(work);
  for (auto& th : pool) th.join();
  return 0;
}

int vspbfr_degrade_abi_version() { return 1; }

}  // extern "C"
