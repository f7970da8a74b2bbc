// Oracle fuzz for the restructured conv kernels (model.cc).
//
// The production conv2d_same / depthwise_same run tap-outer branch-free
// loops with SIMD-cloned row kernels; this binary sweeps a shape grid
// (H, W, Cin, Cout, kh/kw, stride, bias, f32/int8, 1 and 3 threads)
// against naive per-pixel bounds-checked implementations of the same
// SAME-padding contract (the shape the original code had).  The int8
// oracle shares ops::quantize_acts and the exact final-scaling
// expression, so the comparison there is bit-exact.  Exits nonzero with
// a message on the first mismatch.  Run by tests/test_native.py.
#include <cmath>
#include <cstdio>
#include <limits>
#include <random>
#include <vector>

#include "model.h"
#include "parallel.h"

using tsc::Tensor;

static void pad_for(int in, int k, int stride, int* out, int* pad_lo) {
  *out = (in + stride - 1) / stride;
  int total = std::max((*out - 1) * stride + k - in, 0);
  *pad_lo = total / 2;
}

// naive per-pixel SAME conv, float path
static void naive_conv(const std::vector<float>& in, int H, int W, int Cin,
                       const Tensor& kernel, const float* bias, int stride,
                       std::vector<float>& out, int& Ho, int& Wo) {
  const int kh = kernel.shape[0], kw = kernel.shape[1];
  const int Cout = kernel.shape[3];
  int ph, pw;
  pad_for(H, kh, stride, &Ho, &ph);
  pad_for(W, kw, stride, &Wo, &pw);
  out.assign(static_cast<size_t>(Ho) * Wo * Cout, 0.0f);
  for (int oy = 0; oy < Ho; ++oy)
    for (int ox = 0; ox < Wo; ++ox) {
      float* dst = &out[(static_cast<size_t>(oy) * Wo + ox) * Cout];
      for (int ky = 0; ky < kh; ++ky) {
        const int iy = oy * stride + ky - ph;
        if (iy < 0 || iy >= H) continue;
        for (int kx = 0; kx < kw; ++kx) {
          const int ix = ox * stride + kx - pw;
          if (ix < 0 || ix >= W) continue;
          const float* src = &in[(static_cast<size_t>(iy) * W + ix) * Cin];
          const float* wr =
              &kernel.data[((static_cast<size_t>(ky) * kw + kx) * Cin) * Cout];
          for (int ci = 0; ci < Cin; ++ci)
            for (int co = 0; co < Cout; ++co)
              dst[co] += src[ci] * wr[ci * Cout + co];
        }
      }
      if (bias)
        for (int co = 0; co < Cout; ++co) dst[co] += bias[co];
    }
}

// naive int8 conv sharing the production quantization and the exact
// final-scaling expression -> bit-exact comparison
static void naive_conv_i8(const std::vector<float>& in, int H, int W, int Cin,
                          const Tensor& kernel, const float* bias, int stride,
                          std::vector<float>& out, int& Ho, int& Wo) {
  const int kh = kernel.shape[0], kw = kernel.shape[1];
  const int Cout = kernel.shape[3];
  int ph, pw;
  pad_for(H, kh, stride, &Ho, &ph);
  pad_for(W, kw, stride, &Wo, &pw);
  std::vector<int8_t> qin;
  const float in_scale = tsc::ops::quantize_acts(in.data(), in.size(), qin);
  out.assign(static_cast<size_t>(Ho) * Wo * Cout, 0.0f);
  std::vector<int32_t> acc(Cout);
  for (int oy = 0; oy < Ho; ++oy)
    for (int ox = 0; ox < Wo; ++ox) {
      std::fill(acc.begin(), acc.end(), 0);
      for (int ky = 0; ky < kh; ++ky) {
        const int iy = oy * stride + ky - ph;
        if (iy < 0 || iy >= H) continue;
        for (int kx = 0; kx < kw; ++kx) {
          const int ix = ox * stride + kx - pw;
          if (ix < 0 || ix >= W) continue;
          const int8_t* src = &qin[(static_cast<size_t>(iy) * W + ix) * Cin];
          const int8_t* wr =
              &kernel.qdata[((static_cast<size_t>(ky) * kw + kx) * Cin) * Cout];
          for (int ci = 0; ci < Cin; ++ci)
            for (int co = 0; co < Cout; ++co)
              acc[co] += static_cast<int32_t>(src[ci]) *
                         static_cast<int32_t>(wr[ci * Cout + co]);
        }
      }
      float* dst = &out[(static_cast<size_t>(oy) * Wo + ox) * Cout];
      for (int co = 0; co < Cout; ++co)
        dst[co] = acc[co] * in_scale * kernel.scales[co] +
                  (bias ? bias[co] : 0.0f);
    }
}

// naive depthwise twins
static void naive_dw(const std::vector<float>& in, int H, int W, int C,
                     const Tensor& kernel, int stride, std::vector<float>& out,
                     int& Ho, int& Wo) {
  const int kh = kernel.shape[0], kw = kernel.shape[1];
  int ph, pw;
  pad_for(H, kh, stride, &Ho, &ph);
  pad_for(W, kw, stride, &Wo, &pw);
  out.assign(static_cast<size_t>(Ho) * Wo * C, 0.0f);
  for (int oy = 0; oy < Ho; ++oy)
    for (int ox = 0; ox < Wo; ++ox) {
      float* dst = &out[(static_cast<size_t>(oy) * Wo + ox) * C];
      for (int ky = 0; ky < kh; ++ky) {
        const int iy = oy * stride + ky - ph;
        if (iy < 0 || iy >= H) continue;
        for (int kx = 0; kx < kw; ++kx) {
          const int ix = ox * stride + kx - pw;
          if (ix < 0 || ix >= W) continue;
          const float* src = &in[(static_cast<size_t>(iy) * W + ix) * C];
          const float* wr =
              &kernel.data[(static_cast<size_t>(ky) * kw + kx) * C];
          for (int c = 0; c < C; ++c) dst[c] += src[c] * wr[c];
        }
      }
    }
}

static void naive_dw_i8(const std::vector<float>& in, int H, int W, int C,
                        const Tensor& kernel, int stride,
                        std::vector<float>& out, int& Ho, int& Wo) {
  const int kh = kernel.shape[0], kw = kernel.shape[1];
  int ph, pw;
  pad_for(H, kh, stride, &Ho, &ph);
  pad_for(W, kw, stride, &Wo, &pw);
  std::vector<int8_t> qin;
  const float in_scale = tsc::ops::quantize_acts(in.data(), in.size(), qin);
  out.assign(static_cast<size_t>(Ho) * Wo * C, 0.0f);
  std::vector<int32_t> acc(C);
  for (int oy = 0; oy < Ho; ++oy)
    for (int ox = 0; ox < Wo; ++ox) {
      std::fill(acc.begin(), acc.end(), 0);
      for (int ky = 0; ky < kh; ++ky) {
        const int iy = oy * stride + ky - ph;
        if (iy < 0 || iy >= H) continue;
        for (int kx = 0; kx < kw; ++kx) {
          const int ix = ox * stride + kx - pw;
          if (ix < 0 || ix >= W) continue;
          const int8_t* src = &qin[(static_cast<size_t>(iy) * W + ix) * C];
          const int8_t* wr =
              &kernel.qdata[(static_cast<size_t>(ky) * kw + kx) * C];
          for (int c = 0; c < C; ++c)
            acc[c] += static_cast<int32_t>(src[c]) *
                      static_cast<int32_t>(wr[c]);
        }
      }
      float* dst = &out[(static_cast<size_t>(oy) * Wo + ox) * C];
      for (int c = 0; c < C; ++c)
        dst[c] = acc[c] * in_scale * kernel.scales[c];
    }
}

static int check(const char* what, const std::vector<float>& got,
                 const std::vector<float>& want, float tol) {
  if (got.size() != want.size()) {
    std::fprintf(stderr, "%s: size %zu != %zu\n", what, got.size(),
                 want.size());
    return 1;
  }
  for (size_t i = 0; i < got.size(); ++i) {
    const float scale = std::max(1.0f, std::fabs(want[i]));
    if (std::fabs(got[i] - want[i]) > tol * scale) {
      std::fprintf(stderr, "%s: [%zu] got %g want %g\n", what, i, got[i],
                   want[i]);
      return 1;
    }
  }
  return 0;
}

// symmetric per-last-axis int8 quantization of a float kernel
static Tensor quantize_kernel(const Tensor& ker, int last) {
  Tensor q;
  q.shape = ker.shape;
  q.scales.resize(last);
  for (int co = 0; co < last; ++co) {
    float amax = 0.0f;
    for (size_t i = co; i < ker.data.size(); i += last)
      amax = std::max(amax, std::fabs(ker.data[i]));
    q.scales[co] = amax > 0 ? amax / 127.0f : 1.0f;
  }
  q.qdata.resize(ker.data.size());
  for (size_t i = 0; i < ker.data.size(); ++i)
    q.qdata[i] =
        static_cast<int8_t>(std::lrintf(ker.data[i] / q.scales[i % last]));
  return q;
}

static int run_sweep() {
  std::mt19937 rng(7);
  std::uniform_real_distribution<float> u(-1.0f, 1.0f);
  int cases = 0;
  const int dims[] = {1, 2, 3, 5, 8, 15};
  const int chans[] = {1, 3, 16, 33};
  for (int H : dims)
    for (int W : dims)
      for (int Cin : chans)
        for (int Cout : {1, 16, 32})
          for (int k : {1, 3})
            for (int stride : {1, 2})
              for (int with_bias : {0, 1}) {
                std::vector<float> in(static_cast<size_t>(H) * W * Cin);
                for (auto& v : in) v = u(rng);
                Tensor ker;
                ker.shape = {static_cast<uint32_t>(k),
                             static_cast<uint32_t>(k),
                             static_cast<uint32_t>(Cin),
                             static_cast<uint32_t>(Cout)};
                ker.data.resize(ker.size());
                for (auto& v : ker.data) v = u(rng);
                std::vector<float> bias(Cout);
                for (auto& v : bias) v = u(rng);
                const float* bp = with_bias ? bias.data() : nullptr;

                std::vector<float> got, want;
                int ho1, wo1, ho2, wo2;
                tsc::ops::conv2d_same(in, H, W, Cin, ker, bp, stride, got,
                                      ho1, wo1);
                naive_conv(in, H, W, Cin, ker, bp, stride, want, ho2, wo2);
                if (ho1 != ho2 || wo1 != wo2) {
                  std::fprintf(stderr, "conv dims mismatch\n");
                  return -1;
                }
                int failures = check("conv_f32", got, want, 1e-5f);
                ++cases;

                // int8 against the exact int8 oracle (same quantization,
                // same scaling expression): bit-exact
                Tensor qker = quantize_kernel(ker, Cout);
                tsc::ops::conv2d_same(in, H, W, Cin, qker, bp, stride, got,
                                      ho1, wo1);
                naive_conv_i8(in, H, W, Cin, qker, bp, stride, want, ho2,
                              wo2);
                failures += check("conv_i8", got, want, 0.0f);
                ++cases;

                if (failures) {
                  std::fprintf(stderr,
                               "at H=%d W=%d Cin=%d Cout=%d k=%d s=%d b=%d "
                               "threads=%d\n",
                               H, W, Cin, Cout, k, stride, with_bias,
                               tsc::ThreadPool::instance().threads());
                  return -1;
                }
              }

  // depthwise sweep, f32 + exact int8
  for (int H : dims)
    for (int W : dims)
      for (int C : chans)
        for (int stride : {1, 2}) {
          std::vector<float> in(static_cast<size_t>(H) * W * C);
          for (auto& v : in) v = u(rng);
          Tensor ker;
          ker.shape = {3, 3, 1, static_cast<uint32_t>(C)};
          ker.data.resize(ker.size());
          for (auto& v : ker.data) v = u(rng);
          std::vector<float> got, want;
          int ho1, wo1, ho2, wo2;
          tsc::ops::depthwise_same(in, H, W, C, ker, stride, got, ho1, wo1);
          naive_dw(in, H, W, C, ker, stride, want, ho2, wo2);
          if (ho1 != ho2 || wo1 != wo2) {
            std::fprintf(stderr, "dw dims mismatch\n");
            return -1;
          }
          int failures = check("dw_f32", got, want, 1e-5f);
          ++cases;

          Tensor qker = quantize_kernel(ker, C);
          tsc::ops::depthwise_same(in, H, W, C, qker, stride, got, ho1, wo1);
          naive_dw_i8(in, H, W, C, qker, stride, want, ho2, wo2);
          failures += check("dw_i8", got, want, 0.0f);
          ++cases;

          if (failures) {
            std::fprintf(stderr, "at dw H=%d W=%d C=%d s=%d threads=%d\n", H,
                         W, C, stride,
                         tsc::ThreadPool::instance().threads());
            return -1;
          }
        }
  return cases;
}

// accuracy lock for the vectorized activation passes (fast_expf based)
static int check_activations() {
  const int n = 24001;
  std::vector<float> xs(n), sig(n), th(n);
  for (int i = 0; i < n; ++i) xs[i] = -30.0f + 60.0f * i / (n - 1);
  sig = xs;
  th = xs;
  tsc::ops::sigmoid_inplace(sig.data(), n);
  tsc::ops::tanh_inplace(th.data(), n);
  double max_sig = 0.0, max_tanh = 0.0;
  for (int i = 0; i < n; ++i) {
    const double x = xs[i];
    max_sig = std::max(max_sig, std::fabs(sig[i] - 1.0 / (1.0 + std::exp(-x))));
    max_tanh = std::max(max_tanh, std::fabs(th[i] - std::tanh(x)));
  }
  if (max_sig > 1e-6 || max_tanh > 2e-6) {
    std::fprintf(stderr, "activation error too large: sigmoid %g tanh %g\n",
                 max_sig, max_tanh);
    return -1;
  }
  // NaN must PROPAGATE through the fast-exp path (not collapse to a
  // plausible finite score via an undefined int convert)
  float bad[2] = {std::numeric_limits<float>::quiet_NaN(), 0.0f};
  tsc::ops::sigmoid_inplace(bad, 2);
  if (bad[0] == bad[0] || std::fabs(bad[1] - 0.5f) > 1e-6f) {
    std::fprintf(stderr, "sigmoid NaN propagation broken: %g %g\n",
                 bad[0], bad[1]);
    return -1;
  }
  bad[0] = std::numeric_limits<float>::quiet_NaN();
  bad[1] = 0.0f;
  tsc::ops::tanh_inplace(bad, 2);
  if (bad[0] == bad[0] || std::fabs(bad[1]) > 1e-6f) {
    std::fprintf(stderr, "tanh NaN propagation broken: %g %g\n",
                 bad[0], bad[1]);
    return -1;
  }
  return 2 * n + 4;
}

int main() {
  int total = 0;
  for (int threads : {1, 3}) {
    tsc::ThreadPool::instance().set_threads(threads);
    const int cases = run_sweep();
    if (cases < 0) return 1;
    total += cases;
  }
  const int act = check_activations();
  if (act < 0) return 1;
  total += act;
  std::printf("conv oracle fuzz: %d cases OK (1 and 3 threads)\n", total);
  return 0;
}
