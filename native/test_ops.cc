// Oracle fuzz for the restructured conv kernels (model.cc).
//
// The production conv2d_same / depthwise_same run tap-outer branch-free
// loops with SIMD-cloned row kernels; this binary sweeps a shape grid
// (H, W, Cin, Cout, kh/kw, stride, bias, f32/int8) against a naive
// per-pixel bounds-checked implementation of the same SAME-padding
// contract (the shape the original code had).  Exits nonzero with a
// message on the first mismatch.  Run by tests/test_native.py.
#include <cmath>
#include <cstdio>
#include <random>
#include <vector>

#include "model.h"

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

// naive depthwise twin
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

int main() {
  std::mt19937 rng(7);
  std::uniform_real_distribution<float> u(-1.0f, 1.0f);
  int failures = 0, cases = 0;
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
                  return 1;
                }
                failures += check("conv_f32", got, want, 1e-5f);
                ++cases;

                // int8: same kernel quantized symmetric per-Cout;
                // compare against the f32 naive result loosely (the
                // quantization itself is the dominant error)
                Tensor qker;
                qker.shape = ker.shape;
                qker.scales.resize(Cout);
                for (int co = 0; co < Cout; ++co) {
                  float amax = 0.0f;
                  for (size_t i = co; i < ker.data.size(); i += Cout)
                    amax = std::max(amax, std::fabs(ker.data[i]));
                  qker.scales[co] = amax > 0 ? amax / 127.0f : 1.0f;
                }
                qker.qdata.resize(ker.data.size());
                for (size_t i = 0; i < ker.data.size(); ++i)
                  qker.qdata[i] = static_cast<int8_t>(
                      std::lrintf(ker.data[i] / qker.scales[i % Cout]));
                tsc::ops::conv2d_same(in, H, W, Cin, qker, bp, stride, got,
                                      ho1, wo1);
                failures += check("conv_i8", got, want,
                                  0.05f * std::sqrt(float(k * k * Cin)));
                ++cases;

                if (failures) {
                  std::fprintf(stderr,
                               "at H=%d W=%d Cin=%d Cout=%d k=%d s=%d b=%d\n",
                               H, W, Cin, Cout, k, stride, with_bias);
                  return 1;
                }
              }

  // depthwise sweep
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
            return 1;
          }
          failures += check("dw_f32", got, want, 1e-5f);
          ++cases;
          if (failures) {
            std::fprintf(stderr, "at dw H=%d W=%d C=%d s=%d\n", H, W, C,
                         stride);
            return 1;
          }
        }

  std::printf("conv oracle fuzz: %d cases OK\n", cases);
  return 0;
}
