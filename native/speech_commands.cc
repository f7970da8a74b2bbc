// Single-shot keyword-spotting app: wav file -> top-k class scores.
//
// Native twin of the reference on-device app
// (inference/tflite/speech_commands.cpp behaviour): load model + params,
// read wav, head/tail-align to the 1 s buffer (tail-align long audio,
// left-zero-pad short), run the DSP frontend + model, print timed top-k.
// Consumes the framework's own .tscm export instead of TFLite/MNN.
#include <algorithm>
#include <chrono>
#include <cstdio>
#include <cstring>
#include <numeric>
#include <string>
#include <vector>

#include "dsp.h"
#include "model.h"
#include "parallel.h"
#include "stream_runtime.h"
#include "wav.h"

using Clock = std::chrono::steady_clock;

static double ms_since(Clock::time_point t0) {
  return std::chrono::duration<double, std::milli>(Clock::now() - t0).count();
}

int main(int argc, char** argv) {
  std::string model_path, wav_path;
  int top_k = 3, warmup = 1, loop_count = 1, threads = 1;
  for (int i = 1; i < argc; ++i) {
    std::string a = argv[i];
    auto next = [&](const char* flag) -> std::string {
      if (i + 1 >= argc) {
        std::fprintf(stderr, "missing value for %s\n", flag);
        std::exit(2);
      }
      return argv[++i];
    };
    if (a == "--model") model_path = next("--model");
    else if (a == "--wav") wav_path = next("--wav");
    else if (a == "--top_k") top_k = std::atoi(next("--top_k").c_str());
    else if (a == "--loop_count") loop_count = std::atoi(next("--loop_count").c_str());
    else if (a == "--threads") threads = std::atoi(next("--threads").c_str());
    else {
      std::fprintf(stderr,
                   "usage: %s --model model.tscm --wav audio.wav "
                   "[--top_k N] [--loop_count N] [--threads N]\n",
                   argv[0]);
      return 2;
    }
  }
  if (model_path.empty() || wav_path.empty()) {
    std::fprintf(stderr, "--model and --wav are required\n");
    return 2;
  }

  tsc::set_num_threads(threads);
  try {
  tsc::NativeModel model = tsc::NativeModel::load(model_path);
  tsc::WavData wav = tsc::read_wav(wav_path);
  if (wav.sample_rate != model.sample_rate) {
    std::fprintf(stderr, "wav sample rate %d != model %d\n", wav.sample_rate,
                 model.sample_rate);
    return 1;
  }

  // align to max_samples: tail-align long audio, left-zero-pad short
  const int max_samples = model.max_samples;
  std::vector<float> audio(max_samples, 0.0f);
  const int n = static_cast<int>(wav.samples.size());
  if (n >= max_samples) {
    std::copy(wav.samples.end() - max_samples, wav.samples.end(), audio.begin());
  } else {
    std::copy(wav.samples.begin(), wav.samples.end(),
              audio.end() - n);
  }

  // one model->frontend mapping shared with the streaming apps: a new
  // FrontendConfig field added in only one place would silently split
  // the single-shot and streaming feature paths
  tsc::Frontend frontend(tsc::frontend_config_for(model));

  auto t0 = Clock::now();
  const int fs = frontend.feature_size();
  const int frames_cap =
      std::max(frontend.num_frames(max_samples), model.n_features);
  std::vector<float> features(static_cast<size_t>(frames_cap) * fs, 0.0f);
  const int got_frames =
      frontend.segment_features(audio.data(), max_samples, features.data());
  // model contract is n_features rows; when max_samples framing yields
  // extra frames for this hop/window rounding, keep the TAIL-aligned rows
  // (command sits at the buffer tail) — matching the python frontends
  // (frontend/dsp.py __call__, ops/pallas_frontend._trim_to_contract)
  if (got_frames > model.n_features) {
    features.erase(features.begin(),
                   features.begin() +
                       static_cast<size_t>(got_frames - model.n_features) * fs);
    if (model.use_delta) {
      // python trims BEFORE add_deltas, so the first kept row's delta
      // half (columns [fs/2, fs)) is zero
      std::fill(features.begin() + fs / 2, features.begin() + fs, 0.0f);
    }
  }
  features.resize(static_cast<size_t>(model.n_features) * fs);
  const double feat_ms = ms_since(t0);

  for (int i = 0; i < warmup; ++i) model.predict(features);
  t0 = Clock::now();
  std::vector<float> scores;
  for (int i = 0; i < loop_count; ++i) scores = model.predict(features);
  const double invoke_ms = ms_since(t0) / std::max(loop_count, 1);

  t0 = Clock::now();
  std::vector<int> order(scores.size());
  std::iota(order.begin(), order.end(), 0);
  std::sort(order.begin(), order.end(),
            [&](int a, int b) { return scores[a] > scores[b]; });
  const double post_ms = ms_since(t0);

  std::printf("feature vector extraction time: %.3f ms\n", feat_ms);
  std::printf("model invoke time: %.3f ms\n", invoke_ms);
  std::printf("speech_commands_postprocess time: %.3f ms\n", post_ms);
  for (int k = 0; k < top_k && k < static_cast<int>(order.size()); ++k) {
    const int idx = order[k];
    const std::string name = idx < static_cast<int>(model.class_names.size())
                                 ? model.class_names[idx]
                                 : std::to_string(idx);
    std::printf("%s: %.6f\n", name.c_str(), scores[idx]);
  }
  return 0;
  } catch (const std::exception& e) {
    // clean rejection instead of std::terminate/SIGABRT on bad inputs
    std::fprintf(stderr, "error: %s\n", e.what());
    return 1;
  }
}
