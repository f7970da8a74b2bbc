#include "dsp.h"

#include <algorithm>
#include <cmath>
#include <cstring>
#include <limits>
#include <map>
#include <stdexcept>

#include "simd.h"

namespace tsc {

namespace {
constexpr double kLogEps = std::numeric_limits<double>::epsilon();  // 2.22e-16

double hertz_to_mels(double f) { return 1127.0 * std::log(1.0 + f / 700.0); }
double mels_to_hertz(double m) { return 700.0 * (std::exp(m / 1127.0) - 1.0); }

double hz2bark(double f) { return 6.0 * std::asinh(f / 600.0); }
double bark2hz(double b) { return 600.0 * std::sinh(b / 6.0); }

// The reference bark helpers always map bins with these default constants
// regardless of the active config (see frontend/numpy_ref.py bark quirk).
constexpr int kBarkDefaultSr = 16000;
constexpr int kBarkDefaultNfft = 512;

double fft2bark_default(double j) {
  return hz2bark(j * kBarkDefaultSr / (kBarkDefaultNfft + 1));
}
double bark2fft_default(double fb) {
  return (kBarkDefaultNfft + 1) * bark2hz(fb) / kBarkDefaultSr;
}

double bark_gain(double fb, double fc) {
  if (fb >= fc - 2.5 && fb <= fc - 0.5) return std::pow(10.0, 2.5 * (fb - fc + 0.5));
  if (fb > fc - 0.5 && fb < fc + 0.5) return 1.0;
  if (fb >= fc + 0.5 && fb <= fc + 1.3) return std::pow(10.0, -2.5 * (fb - fc - 0.5));
  return 0.0;
}
}  // namespace

double safe_log(double x) { return std::log(std::max(x, kLogEps)); }

// n-term dot with 8 independent partial sums — a reassociation the
// compiler may not do on its own under strict FP, unlocking SIMD lanes
// (double-precision reassociation error ~1e-15 relative; parity
// tolerances are 1e-4).
TSC_SIMD_CLONES
static double dot8(const double* __restrict__ a,
                   const double* __restrict__ b, int n) {
  double acc[8] = {0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0};
  int i = 0;
  for (; i + 8 <= n; i += 8)
    for (int l = 0; l < 8; ++l) acc[l] += a[i + l] * b[i + l];
  double s = ((acc[0] + acc[1]) + (acc[2] + acc[3])) +
             ((acc[4] + acc[5]) + (acc[6] + acc[7]));
  for (; i < n; ++i) s += a[i] * b[i];
  return s;
}

// Per-size twiddle tables, built ONCE with the same incremental
// recurrence the in-loop version used (bit-identical outputs), so the
// butterfly stage below is a branch-free table walk the compiler can
// vectorize.  thread_local: frontends may run on pool threads.
struct FftTwiddles {
  size_t n = 0;
  // stage s handles len = 2^(s+1); wr/wi hold len/2 factors each
  std::vector<std::vector<double>> wr, wi;
};

static const FftTwiddles& fft_twiddles(size_t n) {
  // map keyed by n: alternating FFT sizes on one thread (e.g. two
  // frontend configs side by side) must not rebuild the tables per call
  thread_local std::map<size_t, FftTwiddles> cache;
  FftTwiddles& t = cache[n];
  if (t.n != n) {
    for (size_t len = 2; len <= n; len <<= 1) {
      const double ang = -2.0 * M_PI / static_cast<double>(len);
      const double wr = std::cos(ang), wi = std::sin(ang);
      std::vector<double> cr(len / 2), ci(len / 2);
      double cur_r = 1.0, cur_i = 0.0;
      for (size_t k = 0; k < len / 2; ++k) {
        cr[k] = cur_r;
        ci[k] = cur_i;
        const double nr = cur_r * wr - cur_i * wi;
        cur_i = cur_r * wi + cur_i * wr;
        cur_r = nr;
      }
      t.wr.push_back(std::move(cr));
      t.wi.push_back(std::move(ci));
    }
    t.n = n;
  }
  return t;
}

// one FFT stage: all butterflies of width len across the whole array
TSC_SIMD_CLONES
static void fft_stage(double* __restrict__ re, double* __restrict__ im,
                      size_t n, size_t len, const double* __restrict__ wr,
                      const double* __restrict__ wi) {
  const size_t half = len / 2;
  for (size_t i = 0; i < n; i += len) {
    double* __restrict__ ra = re + i;
    double* __restrict__ ia = im + i;
    double* __restrict__ rb = re + i + half;
    double* __restrict__ ib = im + i + half;
    for (size_t k = 0; k < half; ++k) {
      const double tr = rb[k] * wr[k] - ib[k] * wi[k];
      const double ti = rb[k] * wi[k] + ib[k] * wr[k];
      rb[k] = ra[k] - tr;
      ib[k] = ia[k] - ti;
      ra[k] += tr;
      ia[k] += ti;
    }
  }
}

void fft_radix2(std::vector<double>& re, std::vector<double>& im) {
  const size_t n = re.size();
  // bit-reversal permutation
  for (size_t i = 1, j = 0; i < n; ++i) {
    size_t bit = n >> 1;
    for (; j & bit; bit >>= 1) j ^= bit;
    j ^= bit;
    if (i < j) {
      std::swap(re[i], re[j]);
      std::swap(im[i], im[j]);
    }
  }
  const FftTwiddles& tw = fft_twiddles(n);
  size_t stage = 0;
  for (size_t len = 2; len <= n; len <<= 1, ++stage)
    fft_stage(re.data(), im.data(), n, len, tw.wr[stage].data(),
              tw.wi[stage].data());
}

double power_spectrum(const float* frame, int frame_len, int n_fft,
                      std::vector<double>& powers) {
  const int bins = n_fft / 2 + 1;
  const int used = std::min(frame_len, n_fft);
  std::vector<double> re, im;
  if ((n_fft & (n_fft - 1)) == 0) {
    re.assign(n_fft, 0.0);
    im.assign(n_fft, 0.0);
    for (int i = 0; i < used; ++i) re[i] = frame[i];
    fft_radix2(re, im);
  } else {
    // n_fft is not a power of two (fft_radix2 would silently corrupt);
    // fall back to a direct real DFT of the needed bins, matching the
    // Python frontend's any-size np.fft.rfft.
    re.assign(bins, 0.0);
    im.assign(bins, 0.0);
    for (int k = 0; k < bins; ++k) {
      const double w = -2.0 * M_PI * k / n_fft;
      double ar = 0.0, ai = 0.0;
      for (int i = 0; i < used; ++i) {
        ar += frame[i] * std::cos(w * i);
        ai += frame[i] * std::sin(w * i);
      }
      re[k] = ar;
      im[k] = ai;
    }
  }
  powers.resize(bins);
  double total = 0.0;
  for (int i = 0; i < bins; ++i) {
    const double p = (re[i] * re[i] + im[i] * im[i]) / n_fft;
    powers[i] = p;
    total += p;
  }
  return total;
}

std::vector<double> mel_filterbank(int sample_rate, int num_filt, int fft_len) {
  // num_filt+2 grid points from mel(0) to mel(sample_rate) — sonopy's
  // high-edge-at-sample_rate quirk — mapped to bins by integer truncation.
  std::vector<int> grid(num_filt + 2);
  const double lo = hertz_to_mels(0.0), hi = hertz_to_mels(sample_rate);
  for (int i = 0; i < num_filt + 2; ++i) {
    const double mel = lo + (hi - lo) * i / (num_filt + 1);
    grid[i] = static_cast<int>(mels_to_hertz(mel) * fft_len / sample_rate);
  }
  std::vector<double> banks(static_cast<size_t>(num_filt) * fft_len, 0.0);
  for (int i = 0; i < num_filt; ++i) {
    const int left = grid[i], middle = grid[i + 1], right = grid[i + 2];
    for (int j = std::max(left, 0); j < std::min(middle, fft_len); ++j)
      banks[i * fft_len + j] = double(j - left) / double(middle - left);
    for (int j = std::max(middle, 0); j < std::min(right, fft_len); ++j)
      banks[i * fft_len + j] = double(right - j) / double(right - middle);
  }
  return banks;
}

std::vector<double> bark_filterbank(int num_filt, int n_fft, int sample_rate) {
  const int fft_len = n_fft / 2 + 1;
  const double lo = hz2bark(0.0), hi = hz2bark(sample_rate / 2.0);
  std::vector<double> points(num_filt + 4);
  for (int i = 0; i < num_filt + 4; ++i)
    points[i] = lo + (hi - lo) * i / (num_filt + 3);
  std::vector<double> banks(static_cast<size_t>(num_filt) * fft_len, 0.0);
  for (int i = 0; i < num_filt; ++i) {
    const double fc = points[i + 2];
    const int lo_bin = static_cast<int>(std::floor(bark2fft_default(points[i])));
    const int hi_bin = static_cast<int>(std::floor(bark2fft_default(points[i + 4])));
    for (int j = lo_bin; j < hi_bin && j < fft_len; ++j) {
      if (j < 0) continue;
      banks[i * fft_len + j] = std::abs(bark_gain(fft2bark_default(j), fc));
    }
  }
  return banks;
}

std::vector<double> dct_matrix(int n) {
  std::vector<double> d(static_cast<size_t>(n) * n);
  const double scale = std::sqrt(2.0 / n);
  for (int k = 0; k < n; ++k) {
    const double row_scale = (k == 0) ? scale * std::sqrt(0.5) : scale;
    for (int m = 0; m < n; ++m)
      d[k * n + m] = row_scale * std::cos(M_PI * (2 * m + 1) * k / (2.0 * n));
  }
  return d;
}

Frontend::Frontend(const FrontendConfig& cfg) : cfg_(cfg) {
  // dct_ is (n_filt x n_filt); frame_features reads row k for every
  // kept coefficient, so n_mfcc > n_filt would index past it.  The
  // python frontend narrows output width to min(n_filt, n_mfcc)
  // (frontend/numpy_ref.py mfcc_spec) and never hits this.
  if (cfg.n_mfcc > cfg.n_filt)
    throw std::invalid_argument("n_mfcc must be <= n_filt");
  if (cfg.n_fft < 2 || cfg.window_samples < 1 || cfg.hop_samples < 1 ||
      cfg.n_filt < 1 || cfg.n_mfcc < 1)
    throw std::invalid_argument("invalid frontend config");
  fft_len_ = cfg.n_fft / 2 + 1;
  filterbank_ = cfg.bark
                    ? bark_filterbank(cfg.n_filt, cfg.n_fft, cfg.sample_rate)
                    : mel_filterbank(cfg.sample_rate, cfg.n_filt, fft_len_);
  dct_ = dct_matrix(cfg.n_filt);
  // nonzero support [lo, hi) of each filter row (empty rows -> lo == hi)
  bank_lo_.resize(cfg.n_filt);
  bank_hi_.resize(cfg.n_filt);
  for (int i = 0; i < cfg.n_filt; ++i) {
    const double* row = &filterbank_[static_cast<size_t>(i) * fft_len_];
    int lo = 0, hi = fft_len_;
    while (lo < hi && row[lo] == 0.0) ++lo;
    while (hi > lo && row[hi - 1] == 0.0) --hi;
    bank_lo_[i] = lo;
    bank_hi_[i] = hi;
  }
}

void Frontend::frame_features(const float* frame, int frame_len,
                              float* out) const {
  std::vector<double> powers;
  const double total = power_spectrum(frame, frame_len, cfg_.n_fft, powers);

  std::vector<double> mels(cfg_.n_filt);
  for (int i = 0; i < cfg_.n_filt; ++i) {
    // dot only over the filter's nonzero support (the sonopy mel high
    // edge at sample_rate leaves the upper filters mostly/entirely
    // zero — skipping exact zeros changes nothing numerically)
    const double* bank = &filterbank_[static_cast<size_t>(i) * fft_len_];
    const int lo = bank_lo_[i], hi = bank_hi_[i];
    mels[i] = safe_log(dot8(powers.data() + lo, bank + lo, hi - lo));
  }
  // DCT-II ortho, keep n_mfcc, coefficient 0 <- log total power
  out[0] = static_cast<float>(safe_log(total));
  for (int k = 1; k < cfg_.n_mfcc; ++k)
    out[k] = static_cast<float>(
        dot8(&dct_[static_cast<size_t>(k) * cfg_.n_filt], mels.data(),
             cfg_.n_filt));
}

int Frontend::segment_features(const float* audio, int n, float* out) const {
  const int frames = num_frames(n);
  const int width = cfg_.n_mfcc;
  std::vector<float> base(static_cast<size_t>(frames) * width);
  for (int t = 0; t < frames; ++t)
    frame_features(audio + static_cast<size_t>(t) * cfg_.hop_samples,
                   cfg_.window_samples, &base[static_cast<size_t>(t) * width]);
  if (cfg_.use_delta) {
    add_deltas(base.data(), frames, width, out);
  } else {
    std::memcpy(out, base.data(), base.size() * sizeof(float));
  }
  return frames;
}

void add_deltas(const float* in, int frames, int width, float* out) {
  for (int t = 0; t < frames; ++t) {
    const float* row = in + static_cast<size_t>(t) * width;
    float* orow = out + static_cast<size_t>(t) * 2 * width;
    std::memcpy(orow, row, width * sizeof(float));
    for (int j = 0; j < width; ++j)
      orow[width + j] = (t == 0) ? 0.0f : row[j] - row[j - width];
  }
}

}  // namespace tsc

// ---- C ABI -----------------------------------------------------------------
extern "C" {

tsc_frontend_t tsc_frontend_create(int sample_rate, int window_samples,
                                   int hop_samples, int n_fft, int n_filt,
                                   int n_mfcc, int use_delta, int bark) {
  tsc::FrontendConfig cfg;
  cfg.sample_rate = sample_rate;
  cfg.window_samples = window_samples;
  cfg.hop_samples = hop_samples;
  cfg.n_fft = n_fft;
  cfg.n_filt = n_filt;
  cfg.n_mfcc = n_mfcc;
  cfg.use_delta = use_delta != 0;
  cfg.bark = bark != 0;
  try {
    return new tsc::Frontend(cfg);
  } catch (const std::exception&) {
    // never unwind across the extern "C"/ctypes boundary (UB -> abort);
    // the Python binding raises on the nullptr instead
    return nullptr;
  }
}

void tsc_frontend_destroy(tsc_frontend_t fe) {
  delete static_cast<tsc::Frontend*>(fe);
}

int tsc_frontend_segment(tsc_frontend_t fe, const float* audio, int n,
                         float* out) {
  if (!fe || !audio || !out) return -1;
  return static_cast<tsc::Frontend*>(fe)->segment_features(audio, n, out);
}

int tsc_frontend_feature_size(tsc_frontend_t fe) {
  return fe ? static_cast<tsc::Frontend*>(fe)->feature_size() : -1;
}
}
