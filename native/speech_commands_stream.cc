// Streaming keyword-spotting app: chunked wav replay with the incremental
// feature path, threshold decoding and trigger detection.
//
// Native twin of the reference stream app
// (inference/tflite/speech_commands_stream.cpp behaviour): ring-buffer
// audio append, per-chunk feature update, model invoke, ThresholdDecoder
// (non-background only), TriggerDetector, console confidence bar.
// Optional --realtime sleeps chunk/rate per step to simulate live audio.
#include <algorithm>
#include <chrono>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

#include "dsp.h"
#include "model.h"
#include "parallel.h"
#include "postprocess.h"
#include "wav.h"

static void print_bar(const std::string& class_name, double score,
                      double sensitivity, bool background) {
  const int width = 80;
  double shown = background ? 1.0 - score : score;
  const int units = static_cast<int>(shown * width + 0.5);
  const int cutoff = static_cast<int>(sensitivity * width + 0.5);
  std::string bar;
  for (int i = 0; i < width; ++i) {
    const bool on = i < units;
    bar += on ? (i < cutoff ? 'X' : 'x') : '-';
  }
  std::printf("%s%s\n", bar.c_str(), background ? "" : class_name.c_str());
}

int main(int argc, char** argv) {
  std::string model_path, wav_path;
  int chunk_size = 1024, trigger_level = 3, threads = 1;
  double sensitivity = 0.5;
  bool realtime = false;
  for (int i = 1; i < argc; ++i) {
    std::string a = argv[i];
    auto next = [&]() -> std::string {
      if (i + 1 >= argc) { std::fprintf(stderr, "missing value\n"); std::exit(2); }
      return argv[++i];
    };
    if (a == "--model") model_path = next();
    else if (a == "--wav") wav_path = next();
    else if (a == "--chunk_size") chunk_size = std::atoi(next().c_str());
    else if (a == "--threads") threads = std::atoi(next().c_str());
    else if (a == "--sensitivity") sensitivity = std::atof(next().c_str());
    else if (a == "--trigger_level") trigger_level = std::atoi(next().c_str());
    else if (a == "--realtime") realtime = true;
    else {
      std::fprintf(stderr,
                   "usage: %s --model m.tscm --wav a.wav [--chunk_size N] "
                   "[--sensitivity S] [--trigger_level N] [--threads N] [--realtime]\n",
                   argv[0]);
      return 2;
    }
  }
  if (model_path.empty() || wav_path.empty()) {
    std::fprintf(stderr, "--model and --wav are required\n");
    return 2;
  }

  tsc::set_num_threads(threads);
  tsc::NativeModel model = tsc::NativeModel::load(model_path);
  tsc::WavData wav = tsc::read_wav(wav_path);
  if (wav.sample_rate != model.sample_rate) {
    std::fprintf(stderr, "wav sample rate %d != model %d\n", wav.sample_rate,
                 model.sample_rate);
    return 1;
  }

  // Mirror the Python streamer's bounds (streaming/feature_stream.py):
  // an oversized chunk would make (buffer_samples - chunk_size) negative
  // (size_t wrap -> OOB memmove) or roll more feature rows than exist.
  if (chunk_size < 1 ||
      model.window_samples + chunk_size - 1 > model.buffer_samples) {
    std::fprintf(stderr,
                 "--chunk_size %d out of range: need 1 <= chunk_size <= "
                 "buffer_samples - window_samples + 1 = %d\n",
                 chunk_size,
                 model.buffer_samples - model.window_samples + 1);
    return 2;
  }
  if (1 + (chunk_size - 1) / model.hop_samples > model.n_features) {
    std::fprintf(stderr,
                 "--chunk_size %d produces more than n_features=%d new "
                 "frames per chunk; lower chunk_size\n",
                 chunk_size, model.n_features);
    return 2;
  }

  tsc::FrontendConfig cfg;
  cfg.sample_rate = model.sample_rate;
  cfg.window_samples = model.window_samples;
  cfg.hop_samples = model.hop_samples;
  cfg.n_fft = model.n_fft;
  cfg.n_filt = model.n_filt;
  cfg.n_mfcc = model.n_mfcc;
  cfg.use_delta = model.use_delta;
  cfg.bark = model.bark;
  tsc::Frontend frontend(cfg);

  tsc::ThresholdDecoder decoder({{model.threshold_mu, model.threshold_std}},
                                model.threshold_center);
  tsc::TriggerDetector trigger(chunk_size, model.class_names, sensitivity,
                               trigger_level);

  // streaming state mirrors the python runtime: audio ring + pending count
  // + rolling feature buffer (streaming/feature_stream.py)
  const int buffer_samples = model.buffer_samples;
  std::vector<float> audio(buffer_samples, 0.0f);
  int fill = 0;
  const int width = frontend.feature_size() / (cfg.use_delta ? 2 : 1);
  std::vector<float> feats(static_cast<size_t>(model.n_features) * width, 0.0f);

  const int n_chunks = static_cast<int>(wav.samples.size()) / chunk_size;
  for (int ci = 0; ci < n_chunks; ++ci) {
    const float* chunk = &wav.samples[static_cast<size_t>(ci) * chunk_size];
    // ring append
    std::memmove(audio.data(), audio.data() + chunk_size,
                 (buffer_samples - chunk_size) * sizeof(float));
    std::memcpy(audio.data() + buffer_samples - chunk_size, chunk,
                chunk_size * sizeof(float));
    fill += chunk_size;
    if (fill >= cfg.window_samples) {
      const int n_new = 1 + (fill - cfg.window_samples) / cfg.hop_samples;
      // roll features up by n_new rows
      std::memmove(feats.data(), feats.data() + static_cast<size_t>(n_new) * width,
                   (static_cast<size_t>(model.n_features) - n_new) * width *
                       sizeof(float));
      for (int j = 0; j < n_new; ++j) {
        const int start = buffer_samples - fill + j * cfg.hop_samples;
        frontend.frame_features(
            audio.data() + start, cfg.window_samples,
            feats.data() +
                (static_cast<size_t>(model.n_features) - n_new + j) * width);
      }
      fill -= n_new * cfg.hop_samples;
    }

    std::vector<float> model_in = feats;
    if (cfg.use_delta) {
      model_in.resize(static_cast<size_t>(model.n_features) * 2 * width);
      tsc::add_deltas(feats.data(), model.n_features, width, model_in.data());
    }
    std::vector<float> scores = model.predict(model_in);
    int index = 0;
    for (size_t k = 1; k < scores.size(); ++k)
      if (scores[k] > scores[index]) index = static_cast<int>(k);
    double score = scores[index];
    const bool background = model.class_names[index] == "background";
    if (!background) score = decoder.decode(score);
    print_bar(model.class_names[index], score, sensitivity, background);
    if (trigger.update(index, score))
      std::printf("command %s detected!\n", model.class_names[index].c_str());

    if (realtime)
      std::this_thread::sleep_for(std::chrono::microseconds(
          static_cast<int64_t>(1e6 * chunk_size / model.sample_rate)));
  }
  return 0;
}
