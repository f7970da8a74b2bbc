// Native DSP feature frontend for on-device deployment.
//
// C++ twin of tpu_speech_commands/frontend/numpy_ref.py — the same sonopy
// MFCC algorithm the training pipeline uses (reference behaviour documented
// at /root/reference/inference/tflite/mfcc.h, re-implemented fresh here):
//   rectangular-window framing, radix-2 FFT, power=(re^2+im^2)/n_fft,
//   mel filterbank with high edge at sample_rate (sonopy quirk) and
//   int(freq*fft_len/sample_rate) bin mapping, safe_log at float64 eps,
//   DCT-II ortho, coefficient 0 replaced with log total frame power.
// Also provides the bark/BFCC alternate frontend (with the reference's
// default-constant bin-mapping quirk) and backward-difference deltas.
#pragma once

#include <cstddef>
#include <cstdint>
#include <vector>

namespace tsc {

// log with clamp at float64 eps (matches numpy safe_log)
double safe_log(double x);

// In-place iterative radix-2 complex FFT; n must be a power of two.
void fft_radix2(std::vector<double>& re, std::vector<double>& im);

// Power spectrum of one frame: rfft bins (n_fft/2+1), (re^2+im^2)/n_fft.
// frame is zero-padded/truncated to n_fft. Returns total power.
double power_spectrum(const float* frame, int frame_len, int n_fft,
                      std::vector<double>& powers);

// Sonopy-convention triangular mel filterbank, (num_filt x fft_len) row-major.
std::vector<double> mel_filterbank(int sample_rate, int num_filt, int fft_len);

// Reference-convention bark filterbank, (num_filt x (n_fft/2+1)) row-major.
std::vector<double> bark_filterbank(int num_filt, int n_fft, int sample_rate);

// Orthonormal DCT-II matrix (n x n) row-major: y = D * x.
std::vector<double> dct_matrix(int n);

struct FrontendConfig {
  int sample_rate = 16000;
  int window_samples = 1024;
  int hop_samples = 512;
  int n_fft = 1024;
  int n_filt = 20;
  int n_mfcc = 20;
  bool use_delta = false;
  bool bark = false;  // BFCC instead of MFCC
};

// Stateless frontend: precomputes filterbank + DCT, then maps audio
// segments (or single frames) to cepstral features.
class Frontend {
 public:
  explicit Frontend(const FrontendConfig& cfg);

  // One frame -> n_mfcc coefficients (energy-substituted).
  void frame_features(const float* frame, int frame_len, float* out) const;

  // Full segment -> (num_frames(n) x feature_size) features, sonopy framing
  // (full windows only). Returns number of frames. out must hold
  // num_frames(n) * feature_size() floats.
  int segment_features(const float* audio, int n, float* out) const;

  int num_frames(int n_samples) const {
    if (n_samples < cfg_.window_samples) return 0;
    return 1 + (n_samples - cfg_.window_samples) / cfg_.hop_samples;
  }
  int feature_size() const { return cfg_.use_delta ? 2 * cfg_.n_mfcc : cfg_.n_mfcc; }
  const FrontendConfig& config() const { return cfg_; }

 private:
  FrontendConfig cfg_;
  int fft_len_;
  std::vector<double> filterbank_;  // (n_filt x fft_len) row-major
  std::vector<double> dct_;         // (n_mfcc x n_filt) rows of DCT matrix
  std::vector<int> bank_lo_, bank_hi_;  // nonzero support per filter row
};

// Backward-difference deltas appended on the feature axis:
// in (frames x width) -> out (frames x 2*width).
void add_deltas(const float* in, int frames, int width, float* out);

}  // namespace tsc

// ---- C ABI for ctypes binding / apps ---------------------------------------
extern "C" {

typedef void* tsc_frontend_t;

tsc_frontend_t tsc_frontend_create(int sample_rate, int window_samples,
                                   int hop_samples, int n_fft, int n_filt,
                                   int n_mfcc, int use_delta, int bark);
void tsc_frontend_destroy(tsc_frontend_t fe);
// audio (n floats) -> out ((1+(n-window)/hop) x feature_size) row-major.
// Returns the number of frames written, or -1 on error.
int tsc_frontend_segment(tsc_frontend_t fe, const float* audio, int n,
                         float* out);
int tsc_frontend_feature_size(tsc_frontend_t fe);
}
