// Shared per-chunk streaming engine for the native apps.
//
// One implementation of the ring-buffer audio append, incremental feature
// roll (C++ twin of tpu_speech_commands/streaming/feature_stream.py),
// model invoke, threshold decode and trigger detection — used by both the
// wav-replay app (speech_commands_stream.cc) and the ALSA live app
// (speech_commands_alsa.cc) so bounds checks and behavior can never drift
// between them (reference behavior: inference/tflite/
// speech_commands_stream.cpp:209-260 and speech_commands_alsa.cpp:353-420,
// which duplicate the same loop).
#pragma once

#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

#include "dsp.h"
#include "model.h"
#include "postprocess.h"

namespace tsc {

inline FrontendConfig frontend_config_for(const NativeModel& m) {
  FrontendConfig cfg;
  cfg.sample_rate = m.sample_rate;
  cfg.window_samples = m.window_samples;
  cfg.hop_samples = m.hop_samples;
  cfg.n_fft = m.n_fft;
  cfg.n_filt = m.n_filt;
  cfg.n_mfcc = m.n_mfcc;
  cfg.use_delta = m.use_delta;
  cfg.bark = m.bark;
  return cfg;
}

// Mirror the Python streamer's bounds (streaming/feature_stream.py): an
// oversized chunk would make (buffer_samples - chunk_size) negative
// (size_t wrap -> OOB memmove) or roll more feature rows than exist.
// Returns an empty string when chunk_size is valid, else the error text.
inline std::string check_chunk_size(const NativeModel& m, int chunk_size) {
  char buf[192];
  if (chunk_size < 1 ||
      m.window_samples + chunk_size - 1 > m.buffer_samples) {
    std::snprintf(buf, sizeof(buf),
                  "--chunk_size %d out of range: need 1 <= chunk_size <= "
                  "buffer_samples - window_samples + 1 = %d",
                  chunk_size, m.buffer_samples - m.window_samples + 1);
    return buf;
  }
  if (1 + (chunk_size - 1) / m.hop_samples > m.n_features) {
    std::snprintf(buf, sizeof(buf),
                  "--chunk_size %d produces more than n_features=%d new "
                  "frames per chunk; lower chunk_size",
                  chunk_size, m.n_features);
    return buf;
  }
  return "";
}

// Console confidence bar (reference print_bar, speech_commands.h:214-258):
// X up to the sensitivity cutoff, x above it, background inverted and bare.
inline void print_bar(const std::string& class_name, double score,
                      double sensitivity, bool background) {
  const int width = 80;
  const double shown = background ? 1.0 - score : score;
  const int units = static_cast<int>(shown * width + 0.5);
  const int cutoff = static_cast<int>(sensitivity * width + 0.5);
  std::string bar;
  for (int i = 0; i < width; ++i) {
    const bool on = i < units;
    bar += on ? (i < cutoff ? 'X' : 'x') : '-';
  }
  std::printf("%s%s\n", bar.c_str(), background ? "" : class_name.c_str());
}

class StreamRuntime {
 public:
  struct Step {
    int index = 0;
    std::string label;     // class name, or the index when out of range
    double score = 0.0;    // decoded for commands, raw for background
    bool background = false;
    bool triggered = false;
  };

  StreamRuntime(const NativeModel& model, int chunk_size, double sensitivity,
                int trigger_level)
      : model_(model),
        chunk_size_(chunk_size),
        frontend_(frontend_config_for(model)),
        decoder_(model.threshold_config, model.threshold_center),
        trigger_(chunk_size, model.class_names, sensitivity, trigger_level),
        width_(frontend_.feature_size() / (model.use_delta ? 2 : 1)),
        audio_(model.buffer_samples, 0.0f),
        feats_(static_cast<size_t>(model.n_features) * width_, 0.0f) {}

  // Feed one chunk of chunk_size float samples; runs ring append ->
  // incremental features -> predict -> decode -> trigger.
  Step step(const float* chunk) {
    const int buffer_samples = model_.buffer_samples;
    const FrontendConfig& cfg = frontend_.config();
    std::memmove(audio_.data(), audio_.data() + chunk_size_,
                 (buffer_samples - chunk_size_) * sizeof(float));
    std::memcpy(audio_.data() + buffer_samples - chunk_size_, chunk,
                chunk_size_ * sizeof(float));
    fill_ += chunk_size_;
    if (fill_ >= cfg.window_samples) {
      const int n_new = 1 + (fill_ - cfg.window_samples) / cfg.hop_samples;
      // roll features up by n_new rows
      std::memmove(
          feats_.data(), feats_.data() + static_cast<size_t>(n_new) * width_,
          (static_cast<size_t>(model_.n_features) - n_new) * width_ *
              sizeof(float));
      for (int j = 0; j < n_new; ++j) {
        const int start = buffer_samples - fill_ + j * cfg.hop_samples;
        frontend_.frame_features(
            audio_.data() + start, cfg.window_samples,
            feats_.data() +
                (static_cast<size_t>(model_.n_features) - n_new + j) * width_);
      }
      fill_ -= n_new * cfg.hop_samples;
    }

    std::vector<float> model_in = feats_;
    if (cfg.use_delta) {
      model_in.resize(static_cast<size_t>(model_.n_features) * 2 * width_);
      add_deltas(feats_.data(), model_.n_features, width_, model_in.data());
    }
    std::vector<float> scores = model_.predict(model_in);
    Step out;
    for (size_t k = 1; k < scores.size(); ++k)
      if (scores[k] > scores[out.index]) out.index = static_cast<int>(k);
    out.score = scores.empty() ? 0.0 : scores[out.index];
    // a model wider than its class list must not index past the vector
    const bool in_range =
        out.index < static_cast<int>(model_.class_names.size());
    out.label = in_range ? model_.class_names[out.index]
                         : std::to_string(out.index);
    out.background = in_range && out.label == "background";
    if (!out.background) out.score = decoder_.decode(out.score);
    out.triggered = trigger_.update(out.index, out.score);
    return out;
  }

 private:
  const NativeModel& model_;
  int chunk_size_;
  Frontend frontend_;
  ThresholdDecoder decoder_;
  TriggerDetector trigger_;
  int width_;
  std::vector<float> audio_;
  std::vector<float> feats_;
  int fill_ = 0;
};

}  // namespace tsc
