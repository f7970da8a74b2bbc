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

#include "model.h"
#include "parallel.h"
#include "stream_runtime.h"
#include "wav.h"

using tsc::print_bar;

int main(int argc, char** argv) {
  std::string model_path, wav_path;
  int chunk_size = 1024, trigger_level = 3, threads = 1;
  double sensitivity = 0.5;
  bool realtime = false, timing = false;
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
    else if (a == "--timing") timing = true;
    else {
      std::fprintf(stderr,
                   "usage: %s --model m.tscm --wav a.wav [--chunk_size N] "
                   "[--sensitivity S] [--trigger_level N] [--threads N] "
                   "[--realtime] [--timing]\n",
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

  const std::string chunk_err = tsc::check_chunk_size(model, chunk_size);
  if (!chunk_err.empty()) {
    std::fprintf(stderr, "%s\n", chunk_err.c_str());
    return 2;
  }

  tsc::StreamRuntime runtime(model, chunk_size, sensitivity, trigger_level);
  // zero-pad the ragged tail to a full chunk instead of dropping it —
  // same contract as the python listener's run_wav (a keyword ending in
  // the final partial chunk must still be scored)
  const int n_chunks =
      static_cast<int>((wav.samples.size() + chunk_size - 1) / chunk_size);
  std::vector<float> tail;
  double step_us = 0.0;
  for (int ci = 0; ci < n_chunks; ++ci) {
    const size_t lo = static_cast<size_t>(ci) * chunk_size;
    const float* chunk = &wav.samples[lo];
    if (lo + chunk_size > wav.samples.size()) {
      tail.assign(chunk_size, 0.0f);
      std::copy(wav.samples.begin() + lo, wav.samples.end(), tail.begin());
      chunk = tail.data();
    }
    const auto t0 = std::chrono::steady_clock::now();
    const tsc::StreamRuntime::Step step = runtime.step(chunk);
    step_us += std::chrono::duration<double, std::micro>(
                   std::chrono::steady_clock::now() - t0)
                   .count();
    print_bar(step.label, step.score, sensitivity, step.background);
    if (step.triggered)
      std::printf("command %s detected!\n", step.label.c_str());

    if (realtime)
      std::this_thread::sleep_for(std::chrono::microseconds(
          static_cast<int64_t>(1e6 * chunk_size / model.sample_rate)));
  }
  if (timing && n_chunks > 0) {
    // per-chunk budget is the chunk's own duration (real-time bound)
    const double budget_us = 1e6 * chunk_size / model.sample_rate;
    std::printf("per-chunk step time: %.1f us avg over %d chunks "
                "(budget %.0f us, %.1fx real-time headroom)\n",
                step_us / n_chunks, n_chunks, budget_us,
                budget_us / (step_us / n_chunks));
  }
  return 0;
  } catch (const std::exception& e) {
    // clean rejection instead of std::terminate/SIGABRT on bad inputs
    std::fprintf(stderr, "error: %s\n", e.what());
    return 1;
  }
}
