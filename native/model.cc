#include "model.h"

#include "parallel.h"
#include "simd.h"

#include <cassert>
#include <cmath>
#include <cstring>
#include <fstream>
#include <stdexcept>

#include "json.h"

namespace tsc {

// ---- binary format ---------------------------------------------------------

NativeModel NativeModel::load(const std::string& path) {
  std::ifstream f(path, std::ios::binary);
  if (!f) throw std::runtime_error("cannot open model file: " + path);
  char magic[4];
  f.read(magic, 4);
  if (std::memcmp(magic, "TSCM", 4) != 0)
    throw std::runtime_error("bad magic in " + path);
  uint32_t version = 0, meta_len = 0;
  f.read(reinterpret_cast<char*>(&version), 4);
  f.read(reinterpret_cast<char*>(&meta_len), 4);
  if (version != 1 && version != 2)
    throw std::runtime_error("unsupported model version");

  NativeModel m;
  // bounds below reject absurd header fields from corrupt/truncated files
  // BEFORE they turn into multi-GB allocations; every payload read is
  // stream-checked so a truncated file errors instead of loading a
  // zero-filled kernel tail (silently wrong predictions)
  constexpr uint32_t kMaxMetaLen = 16u << 20;
  constexpr uint32_t kMaxNameLen = 4096;
  constexpr uint32_t kMaxNdim = 8;
  constexpr size_t kMaxElems = size_t(1) << 30;
  if (!f || meta_len > kMaxMetaLen)
    throw std::runtime_error("corrupt model header in " + path);
  m.meta_json.resize(meta_len);
  f.read(m.meta_json.data(), meta_len);
  if (!f) throw std::runtime_error("truncated model metadata in " + path);

  while (true) {
    uint32_t name_len = 0;
    f.read(reinterpret_cast<char*>(&name_len), 4);
    if (!f) break;  // clean EOF between records
    if (name_len == 0 || name_len > kMaxNameLen)
      throw std::runtime_error("corrupt tensor record in " + path);
    std::string name(name_len, '\0');
    f.read(name.data(), name_len);
    uint32_t ndim = 0;
    f.read(reinterpret_cast<char*>(&ndim), 4);
    if (!f || ndim > kMaxNdim)
      throw std::runtime_error("corrupt tensor record in " + path);
    Tensor t;
    t.shape.resize(ndim);
    f.read(reinterpret_cast<char*>(t.shape.data()), 4 * ndim);
    if (!f) throw std::runtime_error("corrupt tensor record in " + path);
    size_t numel = 1;  // overflow-safe product: Tensor::size() could wrap
    for (auto d : t.shape) {
      if (d != 0 && numel > kMaxElems / d)
        throw std::runtime_error("corrupt tensor shape in " + path);
      numel *= d;
    }
    uint8_t dtype = 0;  // v1 records are implicitly float32
    if (version >= 2) f.read(reinterpret_cast<char*>(&dtype), 1);
    if (dtype == 0) {
      t.data.resize(t.size());
      f.read(reinterpret_cast<char*>(t.data.data()), 4 * t.size());
    } else if (dtype == 1) {  // symmetric per-channel int8 (last axis)
      uint32_t n_scales = 0;
      f.read(reinterpret_cast<char*>(&n_scales), 4);
      // reject a bad scale count BEFORE any allocation: a crafted header
      // must not be able to force a multi-GiB transient resize
      if (!f || ndim == 0 || t.shape[ndim - 1] != n_scales)
        throw std::runtime_error("quantized tensor scale count mismatch: " +
                                 name);
      t.scales.resize(n_scales);
      f.read(reinterpret_cast<char*>(t.scales.data()), 4 * n_scales);
      t.qdata.resize(t.size());
      f.read(reinterpret_cast<char*>(t.qdata.data()), t.size());
    } else {
      throw std::runtime_error("unknown tensor dtype in " + path);
    }
    if (!f)
      throw std::runtime_error("truncated tensor payload for '" + name +
                               "' in " + path);
    m.tensors.emplace(std::move(name), std::move(t));
  }

  // parse meta
  json::Value meta = json::parse(m.meta_json);
  m.model_type = meta.get_string("model_type", "simple_cnn");
  m.bark = meta.get_string("feature_type", "mfcc") == "bark";
  m.num_classes = static_cast<int>(meta.get_number("num_classes", 0));
  for (const auto& c : meta.get_array("classes"))
    m.class_names.push_back(c.as_string());
  const json::Value& p = meta["params"];
  if (p.is_object()) {
    m.sample_rate = static_cast<int>(p.get_number("sample_rate", 16000));
    double window_t = p.get_number("window_t", 0.064);
    double hop_t = p.get_number("hop_t", 0.032);
    double buffer_t = p.get_number("buffer_t", 1.0);
    m.window_samples = static_cast<int>(m.sample_rate * window_t + 0.5);
    m.hop_samples = static_cast<int>(m.sample_rate * hop_t + 0.5);
    int buffer_samples = static_cast<int>(m.sample_rate * buffer_t + 0.5);
    buffer_samples = m.hop_samples * (buffer_samples / m.hop_samples);
    m.buffer_samples = buffer_samples;
    m.max_samples = static_cast<int>(buffer_t * m.sample_rate);
    m.n_features = 1 + (buffer_samples - m.window_samples) / m.hop_samples;
    m.n_fft = static_cast<int>(p.get_number("n_fft", 1024));
    m.n_filt = static_cast<int>(p.get_number("n_filt", 20));
    m.n_mfcc = static_cast<int>(p.get_number("n_mfcc", 20));
    m.use_delta = p.get_number("use_delta", 0) != 0;
    m.threshold_center = p.get_number("threshold_center", 0.2);
    const json::Value& tc = p["threshold_config"];
    if (tc.is_array() && !tc.get_array(nullptr).empty()) {
      // keep EVERY (mu, std) mixture component — the python Listener
      // passes the full config to ThresholdDecoder (streaming/listener.py)
      std::vector<std::pair<double, double>> mixture;
      for (const auto& comp : tc.get_array(nullptr)) {
        const auto& pair = comp.get_array(nullptr);
        if (pair.size() == 2)
          mixture.emplace_back(pair[0].as_number(), pair[1].as_number());
      }
      if (!mixture.empty()) m.threshold_config = std::move(mixture);
    }
  }

  // cross-check meta num_classes against the real head width: the C API
  // caller sizes its score buffer from num_classes, so a mismatch would
  // let predict() memcpy past the buffer (heap corruption), defeating
  // the loader hardening above
  auto head = m.tensors.find("params/score_predict/bias");
  if (head != m.tensors.end()) {
    const int head_width = static_cast<int>(head->second.size());
    if (m.num_classes <= 0) {
      m.num_classes = head_width;
    } else if (m.num_classes != head_width) {
      throw std::runtime_error(
          "meta num_classes " + std::to_string(m.num_classes) +
          " != score_predict head width " + std::to_string(head_width) +
          " in " + path);
    }
  }
  return m;
}

// ---- kernels ---------------------------------------------------------------

namespace ops {

// SIMD clones of the hot f32 MAC loops (simd.h): measured ~2.4x on the
// CNN invoke on an AVX-512 host vs the plain -O3 build (together with
// the tap-outer restructure below).

// one conv tap over one output row: dst[ox,:] += src[ox*stride+x_off,:] @ w
TSC_SIMD_CLONES
static void conv_row_tap(const float* __restrict__ in_row,
                         const float* __restrict__ wrow,
                         float* __restrict__ out_row, int ox_lo, int ox_hi,
                         int stride, int x_off, int Cin, int Cout) {
  for (int ox = ox_lo; ox < ox_hi; ++ox) {
    const float* __restrict__ src = &in_row[(ox * stride + x_off) * Cin];
    float* __restrict__ dst = &out_row[ox * Cout];
    for (int ci = 0; ci < Cin; ++ci)
      for (int co = 0; co < Cout; ++co)
        dst[co] += src[ci] * wrow[ci * Cout + co];
  }
}

// int8 twin of conv_row_tap: int32 accumulation (scaled to float later)
TSC_SIMD_CLONES
static void conv_row_tap_i8(const int8_t* __restrict__ in_row,
                            const int8_t* __restrict__ wrow,
                            int32_t* __restrict__ out_row, int ox_lo,
                            int ox_hi, int stride, int x_off, int Cin,
                            int Cout) {
  for (int ox = ox_lo; ox < ox_hi; ++ox) {
    const int8_t* __restrict__ src = &in_row[(ox * stride + x_off) * Cin];
    int32_t* __restrict__ dst = &out_row[ox * Cout];
    for (int ci = 0; ci < Cin; ++ci) {
      const int32_t v = src[ci];
      for (int co = 0; co < Cout; ++co)
        dst[co] += v * static_cast<int32_t>(wrow[ci * Cout + co]);
    }
  }
}

// out[:] += x @ w  for a (D, U) row-major w
TSC_SIMD_CLONES
static void matvec_f32(const float* __restrict__ x, int D,
                       const float* __restrict__ w, int U,
                       float* __restrict__ out) {
  for (int d = 0; d < D; ++d) {
    const float v = x[d];
    const float* __restrict__ row = &w[static_cast<size_t>(d) * U];
    for (int u = 0; u < U; ++u) out[u] += v * row[u];
  }
}

// depthwise conv taps: per-channel multiply, no channel reduction
TSC_SIMD_CLONES
static void dw_row_tap(const float* __restrict__ in_row,
                       const float* __restrict__ wrow,
                       float* __restrict__ out_row, int ox_lo, int ox_hi,
                       int stride, int x_off, int C) {
  for (int ox = ox_lo; ox < ox_hi; ++ox) {
    const float* __restrict__ src = &in_row[(ox * stride + x_off) * C];
    float* __restrict__ dst = &out_row[ox * C];
    for (int c = 0; c < C; ++c) dst[c] += src[c] * wrow[c];
  }
}

TSC_SIMD_CLONES
static void dw_row_tap_i8(const int8_t* __restrict__ in_row,
                          const int8_t* __restrict__ wrow,
                          int32_t* __restrict__ out_row, int ox_lo, int ox_hi,
                          int stride, int x_off, int C) {
  for (int ox = ox_lo; ox < ox_hi; ++ox) {
    const int8_t* __restrict__ src = &in_row[(ox * stride + x_off) * C];
    int32_t* __restrict__ dst = &out_row[ox * C];
    for (int c = 0; c < C; ++c)
      dst[c] += static_cast<int32_t>(src[c]) * static_cast<int32_t>(wrow[c]);
  }
}

// Branch-free expf for the activation passes: 2^round(x*log2e) * 2^f
// with a degree-6 polynomial on f in [-0.5, 0.5]; relative error < 2e-7
// (validated against std::exp in native/test_ops.cc), far inside the
// 1e-4 score-parity tolerances.  Every op (rint, int convert, exponent
// bit assembly) vectorizes, unlike libm exp calls under strict FP.
static inline float fast_expf(float v) {
  // NaN must propagate (a corrupt blob / inf-inf gate accumulation would
  // otherwise turn into a plausible finite score via the UB int convert
  // below); select-based like every other op here, so it still vectorizes.
  const bool keep = v == v;
  float vc = v < -87.0f ? -87.0f : (v > 88.0f ? 88.0f : v);
  vc = keep ? vc : 0.0f;
  const float z = vc * 1.4426950408889634f;  // log2(e)
  const float zr = std::rint(z);
  const float f = z - zr;  // [-0.5, 0.5]
  // exp(f*ln2), Horner; c_k = ln2^k / k!
  float p = 1.5403530393381609e-4f;
  p = p * f + 1.3333558146428443e-3f;
  p = p * f + 9.6181291076284772e-3f;
  p = p * f + 5.5504108664821580e-2f;
  p = p * f + 2.4022650695910072e-1f;
  p = p * f + 6.9314718055994531e-1f;
  p = p * f + 1.0f;
  union {
    uint32_t u;
    float f32;
  } s;
  s.u = static_cast<uint32_t>(static_cast<int>(zr) + 127) << 23;
  return keep ? p * s.f32 : v;
}

TSC_SIMD_CLONES
void sigmoid_inplace(float* __restrict__ x, int n) {
  for (int i = 0; i < n; ++i) x[i] = 1.0f / (1.0f + fast_expf(-x[i]));
}

TSC_SIMD_CLONES
void tanh_inplace(float* __restrict__ x, int n) {
  for (int i = 0; i < n; ++i)
    x[i] = 2.0f / (1.0f + fast_expf(-2.0f * x[i])) - 1.0f;
}

// int8 twin: int32 accumulation
TSC_SIMD_CLONES
static void matvec_i8(const int8_t* __restrict__ qx, int D,
                      const int8_t* __restrict__ w, int U,
                      int32_t* __restrict__ acc) {
  for (int d = 0; d < D; ++d) {
    const int32_t v = qx[d];
    if (v == 0) continue;
    const int8_t* __restrict__ row = &w[static_cast<size_t>(d) * U];
    for (int u = 0; u < U; ++u) acc[u] += v * static_cast<int32_t>(row[u]);
  }
}

static void pad_amounts(int in, int k, int stride, int* out, int* pad_lo) {
  *out = (in + stride - 1) / stride;  // ceil — SAME padding
  int total = std::max((*out - 1) * stride + k - in, 0);
  *pad_lo = total / 2;
}

// Valid output range [tap_lo, tap_hi) of one conv tap k: the o for which
// 0 <= o*stride + k - pad < n.  Numerators are clamped non-negative
// before the ceil-division (C++ int division truncates toward zero).
static int tap_lo(int pad, int k, int stride) {
  return pad - k <= 0 ? 0 : (pad - k + stride - 1) / stride;
}
static int tap_hi(int n, int pad, int k, int stride, int out_n) {
  return std::min(out_n, std::max(n + pad - k + stride - 1, 0) / stride);
}

// abs-max reduction with 8 independent partials (vectorizable under
// strict FP, same result — max is associative)
TSC_SIMD_CLONES
static float absmax_f32(const float* __restrict__ x, size_t n) {
  float m[8] = {0, 0, 0, 0, 0, 0, 0, 0};
  size_t i = 0;
  for (; i + 8 <= n; i += 8)
    for (int l = 0; l < 8; ++l) m[l] = std::max(m[l], std::fabs(x[i + l]));
  float r = std::max(std::max(std::max(m[0], m[1]), std::max(m[2], m[3])),
                     std::max(std::max(m[4], m[5]), std::max(m[6], m[7])));
  for (; i < n; ++i) r = std::max(r, std::fabs(x[i]));
  return r;
}

TSC_SIMD_CLONES
static void scale_round_i8(const float* __restrict__ x, size_t n, float inv,
                           int8_t* __restrict__ q) {
  // rintf vectorizes (round-to-nearest-even, matching lrintf's default
  // rounding mode); the products are within int8 range by construction
  for (size_t i = 0; i < n; ++i)
    q[i] = static_cast<int8_t>(std::rintf(x[i] * inv));
}

float quantize_acts(const float* x, size_t n, std::vector<int8_t>& q) {
  const float amax = absmax_f32(x, n);
  const float scale = amax > 0 ? amax / 127.0f : 1.0f;
  q.resize(n);
  scale_round_i8(x, n, 1.0f / scale, q.data());
  return scale;
}

void conv2d_same(const std::vector<float>& in, int H, int W, int Cin,
                 const Tensor& kernel, const float* bias, int stride,
                 std::vector<float>& out, int& Ho, int& Wo) {
  const int kh = kernel.shape[0], kw = kernel.shape[1];
  const int Cout = kernel.shape[3];
  assert(static_cast<int>(kernel.shape[2]) == Cin);
  int ph, pw;
  pad_amounts(H, kh, stride, &Ho, &ph);
  pad_amounts(W, kw, stride, &Wo, &pw);
  out.assign(static_cast<size_t>(Ho) * Wo * Cout, 0.0f);
  const int Ho_v = Ho, Wo_v = Wo, ph_v = ph, pw_v = pw;
  // tap-outer loops — for each (ky, kx) the valid (oy, ox) window is
  // computed once, so the hot pixel loops run branch-free (the per-pixel
  // in-bounds tests cost more than the MACs on these tiny feature maps).
  // oy valid iff 0 <= oy*stride + ky - ph < H (ox symmetric); numerators
  // below are clamped non-negative before the ceil-division.
  if (kernel.quantized()) {
    // dynamic-range int8: per-tensor activation scale, int32 accumulation,
    // per-output-channel weight scales (symmetric — zero padding is exact).
    // Same tap-outer structure as the f32 path below, with an int32
    // accumulator plane scaled to float at the end.
    std::vector<int8_t> qin;
    const float in_scale = quantize_acts(in.data(), in.size(), qin);
    std::vector<int32_t> acc(static_cast<size_t>(Ho_v) * Wo_v * Cout, 0);
    parallel_for(Ho_v, [&](int oy_begin, int oy_end) {
      for (int ky = 0; ky < kh; ++ky) {
        const int oy_lo = std::max(oy_begin, tap_lo(ph_v, ky, stride));
        const int oy_hi =
            std::min(oy_end, tap_hi(H, ph_v, ky, stride, Ho_v));
        for (int kx = 0; kx < kw; ++kx) {
          const int ox_lo = tap_lo(pw_v, kx, stride);
          const int ox_hi = tap_hi(W, pw_v, kx, stride, Wo_v);
          const int8_t* wrow =
              &kernel.qdata[((static_cast<size_t>(ky) * kw + kx) * Cin) * Cout];
          for (int oy = oy_lo; oy < oy_hi; ++oy) {
            const int iy = oy * stride + ky - ph_v;
            conv_row_tap_i8(&qin[static_cast<size_t>(iy) * W * Cin], wrow,
                            &acc[(static_cast<size_t>(oy) * Wo_v) * Cout],
                            ox_lo, ox_hi, stride, kx - pw_v, Cin, Cout);
          }
        }
      }
      for (int oy = oy_begin; oy < oy_end; ++oy) {
        const int32_t* arow = &acc[(static_cast<size_t>(oy) * Wo_v) * Cout];
        float* drow = &out[(static_cast<size_t>(oy) * Wo_v) * Cout];
        for (int ox = 0; ox < Wo_v; ++ox)
          for (int co = 0; co < Cout; ++co)
            drow[ox * Cout + co] =
                arow[ox * Cout + co] * in_scale * kernel.scales[co] +
                (bias ? bias[co] : 0.0f);
      }
    });
    return;
  }
  // f32: `out` accumulates across taps in place; it starts at the bias.
  if (bias) {
    for (size_t px = 0; px < static_cast<size_t>(Ho_v) * Wo_v; ++px)
      std::copy(bias, bias + Cout, &out[px * Cout]);
  }
  parallel_for(Ho_v, [&](int oy_begin, int oy_end) {
    for (int ky = 0; ky < kh; ++ky) {
      const int oy_lo = std::max(oy_begin, tap_lo(ph_v, ky, stride));
      const int oy_hi = std::min(oy_end, tap_hi(H, ph_v, ky, stride, Ho_v));
      for (int kx = 0; kx < kw; ++kx) {
        const int ox_lo = tap_lo(pw_v, kx, stride);
        const int ox_hi = tap_hi(W, pw_v, kx, stride, Wo_v);
        const float* wrow =
            &kernel.data[((static_cast<size_t>(ky) * kw + kx) * Cin) * Cout];
        for (int oy = oy_lo; oy < oy_hi; ++oy) {
          const int iy = oy * stride + ky - ph_v;
          conv_row_tap(&in[static_cast<size_t>(iy) * W * Cin], wrow,
                       &out[(static_cast<size_t>(oy) * Wo_v) * Cout],
                       ox_lo, ox_hi, stride, kx - pw_v, Cin, Cout);
        }
      }
    }
  });
}

void depthwise_same(const std::vector<float>& in, int H, int W, int C,
                    const Tensor& kernel, int stride, std::vector<float>& out,
                    int& Ho, int& Wo) {
  const int kh = kernel.shape[0], kw = kernel.shape[1];
  assert(kernel.shape[2] == 1 && static_cast<int>(kernel.shape[3]) == C);
  int ph, pw;
  pad_amounts(H, kh, stride, &Ho, &ph);
  pad_amounts(W, kw, stride, &Wo, &pw);
  out.assign(static_cast<size_t>(Ho) * Wo * C, 0.0f);
  const int Ho_v = Ho, Wo_v = Wo, ph_v = ph, pw_v = pw;
  // same tap-outer branch-free structure as conv2d_same
  if (kernel.quantized()) {
    std::vector<int8_t> qin;
    const float in_scale = quantize_acts(in.data(), in.size(), qin);
    std::vector<int32_t> acc(static_cast<size_t>(Ho_v) * Wo_v * C, 0);
    parallel_for(Ho_v, [&](int oy_begin, int oy_end) {
      for (int ky = 0; ky < kh; ++ky) {
        const int oy_lo = std::max(oy_begin, tap_lo(ph_v, ky, stride));
        const int oy_hi =
            std::min(oy_end, tap_hi(H, ph_v, ky, stride, Ho_v));
        for (int kx = 0; kx < kw; ++kx) {
          const int ox_lo = tap_lo(pw_v, kx, stride);
          const int ox_hi = tap_hi(W, pw_v, kx, stride, Wo_v);
          const int8_t* wrow =
              &kernel.qdata[(static_cast<size_t>(ky) * kw + kx) * C];
          for (int oy = oy_lo; oy < oy_hi; ++oy) {
            const int iy = oy * stride + ky - ph_v;
            dw_row_tap_i8(&qin[static_cast<size_t>(iy) * W * C], wrow,
                          &acc[(static_cast<size_t>(oy) * Wo_v) * C],
                          ox_lo, ox_hi, stride, kx - pw_v, C);
          }
        }
      }
      for (int oy = oy_begin; oy < oy_end; ++oy) {
        const int32_t* arow = &acc[(static_cast<size_t>(oy) * Wo_v) * C];
        float* drow = &out[(static_cast<size_t>(oy) * Wo_v) * C];
        for (int ox = 0; ox < Wo_v; ++ox)
          for (int c = 0; c < C; ++c)
            drow[ox * C + c] =
                arow[ox * C + c] * in_scale * kernel.scales[c];
      }
    });
    return;
  }
  parallel_for(Ho_v, [&](int oy_begin, int oy_end) {
    for (int ky = 0; ky < kh; ++ky) {
      const int oy_lo = std::max(oy_begin, tap_lo(ph_v, ky, stride));
      const int oy_hi = std::min(oy_end, tap_hi(H, ph_v, ky, stride, Ho_v));
      for (int kx = 0; kx < kw; ++kx) {
        const int ox_lo = tap_lo(pw_v, kx, stride);
        const int ox_hi = tap_hi(W, pw_v, kx, stride, Wo_v);
        const float* wrow =
            &kernel.data[(static_cast<size_t>(ky) * kw + kx) * C];
        for (int oy = oy_lo; oy < oy_hi; ++oy) {
          const int iy = oy * stride + ky - ph_v;
          dw_row_tap(&in[static_cast<size_t>(iy) * W * C], wrow,
                     &out[(static_cast<size_t>(oy) * Wo_v) * C],
                     ox_lo, ox_hi, stride, kx - pw_v, C);
        }
      }
    }
  });
}

void relu6(std::vector<float>& x) {
  for (auto& v : x) v = std::min(std::max(v, 0.0f), 6.0f);
}

void relu(std::vector<float>& x) {
  for (auto& v : x) v = std::max(v, 0.0f);
}

void maxpool2(const std::vector<float>& in, int H, int W, int C,
              std::vector<float>& out, int& Ho, int& Wo) {
  Ho = H / 2;
  Wo = W / 2;  // VALID 2x2 stride 2 (Keras MaxPooling2D default)
  out.resize(static_cast<size_t>(Ho) * Wo * C);
  for (int oy = 0; oy < Ho; ++oy)
    for (int ox = 0; ox < Wo; ++ox)
      for (int c = 0; c < C; ++c) {
        float m = -1e30f;
        for (int dy = 0; dy < 2; ++dy)
          for (int dx = 0; dx < 2; ++dx)
            m = std::max(
                m, in[((static_cast<size_t>(oy * 2 + dy)) * W + ox * 2 + dx) * C + c]);
        out[(static_cast<size_t>(oy) * Wo + ox) * C + c] = m;
      }
}

void matvec_accum(const float* x, int D, const Tensor& kernel,
                  std::vector<float>& out) {
  const int U = kernel.shape[1];
  assert(static_cast<int>(kernel.shape[0]) == D);
  assert(static_cast<int>(out.size()) == U);
  if (kernel.quantized()) {
    std::vector<int8_t> qx;
    const float in_scale = quantize_acts(x, D, qx);
    std::vector<int32_t> acc(U, 0);
    matvec_i8(qx.data(), D, kernel.qdata.data(), U, acc.data());
    for (int u = 0; u < U; ++u)
      out[u] += acc[u] * in_scale * kernel.scales[u];
    return;
  }
  matvec_f32(x, D, kernel.data.data(), U, out.data());
}

void dense(const std::vector<float>& in, const Tensor& kernel,
           const float* bias, std::vector<float>& out) {
  const int D = kernel.shape[0], U = kernel.shape[1];
  assert(static_cast<int>(in.size()) == D);
  out.assign(U, 0.0f);
  matvec_accum(in.data(), D, kernel, out);
  if (bias)
    for (int u = 0; u < U; ++u) out[u] += bias[u];
}

void softmax(std::vector<float>& x) {
  float mx = -1e30f;
  for (float v : x) mx = std::max(mx, v);
  float sum = 0.0f;
  for (auto& v : x) {
    v = std::exp(v - mx);
    sum += v;
  }
  for (auto& v : x) v /= sum;
}

}  // namespace ops

// ---- model forward ---------------------------------------------------------

namespace {

const Tensor& get(const std::map<std::string, Tensor>& t, const std::string& k) {
  auto it = t.find(k);
  if (it == t.end()) throw std::runtime_error("missing tensor: " + k);
  return it->second;
}

// y = scale*(x-mean)/sqrt(var+eps) + bias, per channel (Keras eps 1e-3)
void batchnorm(std::vector<float>& x, int C, const Tensor& scale,
               const Tensor& bias, const Tensor& mean, const Tensor& var) {
  const float eps = 1e-3f;
  std::vector<float> a(C), b(C);
  for (int c = 0; c < C; ++c) {
    a[c] = scale.data[c] / std::sqrt(var.data[c] + eps);
    b[c] = bias.data[c] - mean.data[c] * a[c];
  }
  const size_t n = x.size() / C;
  for (size_t i = 0; i < n; ++i)
    for (int c = 0; c < C; ++c) x[i * C + c] = x[i * C + c] * a[c] + b[c];
}

struct BlockSpec {
  int features;
  int stride;
  bool inline_relu;
  bool pool;
};

std::vector<float> cnn_forward(const NativeModel& m,
                               const std::vector<float>& features,
                               bool separable) {
  const int T = m.n_features;
  const int F = m.use_delta ? 2 * m.n_mfcc : m.n_mfcc;
  std::vector<float> x = features;  // (T, F, 1) NHWC
  int H = T, W = F, C = 1;

  // inline relu on block 4 (both variants) and block 3 (lite only) —
  // mirrors models/cnn.py block placement
  const BlockSpec blocks[4] = {
      {16, 1, false, true},
      {32, 1, false, true},
      {64, 2, separable, false},
      {128, 1, true, true},
  };
  for (int bi = 0; bi < 4; ++bi) {
    const std::string base = "params/block" + std::to_string(bi + 1) + "/";
    const std::string stats = "batch_stats/block" + std::to_string(bi + 1) + "/";
    std::vector<float> y;
    int Ho, Wo;
    if (separable) {
      std::vector<float> mid;
      ops::depthwise_same(x, H, W, C, get(m.tensors, base + "depthwise/kernel"),
                          blocks[bi].stride, mid, Ho, Wo);
      const Tensor& pk = get(m.tensors, base + "pointwise/kernel");
      const Tensor& pb = get(m.tensors, base + "pointwise/bias");
      std::vector<float> tmp;
      int H2, W2;
      ops::conv2d_same(mid, Ho, Wo, C, pk, pb.data.data(), 1, tmp, H2, W2);
      y.swap(tmp);
      Ho = H2;
      Wo = W2;
    } else {
      ops::conv2d_same(x, H, W, C, get(m.tensors, base + "conv/kernel"), nullptr,
                       blocks[bi].stride, y, Ho, Wo);
    }
    C = blocks[bi].features;
    if (blocks[bi].inline_relu) ops::relu(y);
    batchnorm(y, C, get(m.tensors, base + "bn/scale"),
              get(m.tensors, base + "bn/bias"), get(m.tensors, stats + "bn/mean"),
              get(m.tensors, stats + "bn/var"));
    ops::relu6(y);
    if (blocks[bi].pool) {
      std::vector<float> pooled;
      int Hp, Wp;
      ops::maxpool2(y, Ho, Wo, C, pooled, Hp, Wp);
      y.swap(pooled);
      Ho = Hp;
      Wo = Wp;
    }
    x.swap(y);
    H = Ho;
    W = Wo;
  }

  // flatten (HWC order) -> feature_dense -> relu6 -> score head
  std::vector<float> feat;
  ops::dense(x, get(m.tensors, "params/feature_dense/kernel"),
             get(m.tensors, "params/feature_dense/bias").data.data(), feat);
  ops::relu6(feat);
  std::vector<float> logits;
  ops::dense(feat, get(m.tensors, "params/score_predict/kernel"),
             get(m.tensors, "params/score_predict/bias").data.data(), logits);
  ops::softmax(logits);
  return logits;
}

std::vector<float> rnn_forward(const NativeModel& m,
                               const std::vector<float>& features, bool lstm) {
  const int T = m.n_features;
  // stacked layers (models/rnn.py num_layers; reference rnn.py:28-35 —
  // mid layers return the full sequence, the last returns the final state)
  const std::string unit = lstm ? "lstm_unit_" : "gru_unit_";
  int n_layers = 0;
  while (m.tensors.count("params/backbone/" + unit +
                         std::to_string(n_layers) + "/kernel"))
    ++n_layers;
  if (n_layers == 0)
    throw std::runtime_error("no " + unit + "0 tensors in model");

  std::vector<float> seq = features;  // (T, D) row-major
  int D = m.use_delta ? 2 * m.n_mfcc : m.n_mfcc;
  std::vector<float> h;
  for (int li = 0; li < n_layers; ++li) {
    const std::string cell =
        "params/backbone/" + unit + std::to_string(li) + "/";
    const Tensor& K = get(m.tensors, cell + "kernel");
    const Tensor& R = get(m.tensors, cell + "recurrent_kernel");
    const int U = R.shape[0];
    const bool last = li == n_layers - 1;
    std::vector<float> out_seq(last ? 0 : static_cast<size_t>(T) * U);
    h.assign(U, 0.0f);
    std::vector<float> c(U, 0.0f);

    if (!lstm) {
      const Tensor& bi = get(m.tensors, cell + "bias_input");
      const Tensor& br = get(m.tensors, cell + "bias_recurrent");
      // gate buffers hoisted out of the timestep loop: the streaming apps
      // call predict per chunk, so per-t allocations sit on the latency path
      std::vector<float> xw(3 * U), hw(3 * U), zr(2 * U);
      for (int t = 0; t < T; ++t) {
        const float* x = &seq[static_cast<size_t>(t) * D];
        std::fill(xw.begin(), xw.end(), 0.0f);
        std::fill(hw.begin(), hw.end(), 0.0f);
        ops::matvec_accum(x, D, K, xw);
        ops::matvec_accum(h.data(), U, R, hw);
        for (int u = 0; u < 3 * U; ++u) {
          xw[u] += bi.data[u];
          hw[u] += br.data[u];
        }
        // z and r gates as one vectorized sigmoid pass
        for (int u = 0; u < 2 * U; ++u) zr[u] = xw[u] + hw[u];
        ops::sigmoid_inplace(zr.data(), 2 * U);
        for (int u = 0; u < U; ++u) {
          const float z = zr[u], r = zr[U + u];
          const float cand = xw[2 * U + u] + r * hw[2 * U + u];  // linear act
          h[u] = z * h[u] + (1.0f - z) * cand;
        }
        if (!last)
          std::copy(h.begin(), h.end(), out_seq.begin() + static_cast<size_t>(t) * U);
      }
    } else {
      const Tensor& B = get(m.tensors, cell + "bias");
      std::vector<float> g(4 * U), tc(U);
      for (int t = 0; t < T; ++t) {
        const float* x = &seq[static_cast<size_t>(t) * D];
        std::fill(g.begin(), g.end(), 0.0f);
        ops::matvec_accum(x, D, K, g);
        ops::matvec_accum(h.data(), U, R, g);
        for (int u = 0; u < 4 * U; ++u) g[u] += B.data[u];
        // Keras gate order i|f|cand|o: vectorized activation passes over
        // each contiguous block (the LSTM's 6U transcendentals per step
        // dominated the scalar-libm invoke time)
        ops::sigmoid_inplace(g.data(), 2 * U);           // i, f
        ops::tanh_inplace(g.data() + 2 * U, U);          // cand
        ops::sigmoid_inplace(g.data() + 3 * U, U);       // o
        for (int u = 0; u < U; ++u) {
          c[u] = g[U + u] * c[u] + g[u] * g[2 * U + u];
          tc[u] = c[u];
        }
        ops::tanh_inplace(tc.data(), U);
        for (int u = 0; u < U; ++u) h[u] = g[3 * U + u] * tc[u];
        if (!last)
          std::copy(h.begin(), h.end(), out_seq.begin() + static_cast<size_t>(t) * U);
      }
    }
    seq.swap(out_seq);
    D = U;
  }

  std::vector<float> logits;
  ops::dense(h, get(m.tensors, "params/score_predict/kernel"),
             get(m.tensors, "params/score_predict/bias").data.data(), logits);
  ops::softmax(logits);
  return logits;
}

}  // namespace

std::vector<float> NativeModel::predict(const std::vector<float>& features) const {
  // validate BEFORE the kernels index into the buffer — a short vector
  // would be read out of bounds (the apps and the C API size the input
  // from the model header, but hand-rolled callers may not)
  const size_t width = use_delta ? 2u * n_mfcc : static_cast<size_t>(n_mfcc);
  const size_t expected = static_cast<size_t>(n_features) * width;
  if (features.size() != expected)
    throw std::runtime_error(
        "predict: expected " + std::to_string(expected) + " features (" +
        std::to_string(n_features) + " x " + std::to_string(width) +
        "), got " + std::to_string(features.size()));
  if (model_type == "simple_cnn") return cnn_forward(*this, features, false);
  if (model_type == "simple_cnn_lite") return cnn_forward(*this, features, true);
  if (model_type == "simple_gru") return rnn_forward(*this, features, false);
  if (model_type == "simple_lstm") return rnn_forward(*this, features, true);
  throw std::runtime_error("unsupported model type: " + model_type);
}

}  // namespace tsc
