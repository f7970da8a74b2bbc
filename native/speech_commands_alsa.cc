// Live-microphone keyword-spotting app via ALSA capture.
//
// Native twin of the reference ALSA app
// (inference/tflite/speech_commands_alsa.cpp behaviour): capture PCM
// S16_LE mono at the model rate with period=chunk, EPIPE overrun recovery,
// then the same incremental-feature / decode / trigger loop as the stream
// app.  The capture loop itself lives in capture_loop.h behind the
// PcmReader seam; this file contributes only the ALSA-backed reader.
// Built against real libasound when available, else against
// compat/alsa_fake (a file-backed fake with deterministic overrun
// injection) so the app is runnable — not just compilable — everywhere.
#include <alsa/asoundlib.h>

#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

#include "capture_loop.h"
#include "model.h"
#include "stream_runtime.h"

static snd_pcm_t* prepare_alsa(const char* device, int rate, int chunk) {
  snd_pcm_t* pcm = nullptr;
  if (snd_pcm_open(&pcm, device, SND_PCM_STREAM_CAPTURE, 0) < 0) return nullptr;
  snd_pcm_hw_params_t* hw;
  snd_pcm_hw_params_alloca(&hw);
  snd_pcm_hw_params_any(pcm, hw);
  snd_pcm_hw_params_set_access(pcm, hw, SND_PCM_ACCESS_RW_INTERLEAVED);
  snd_pcm_hw_params_set_format(pcm, hw, SND_PCM_FORMAT_S16_LE);
  snd_pcm_hw_params_set_channels(pcm, hw, 1);
  unsigned int r = rate;
  snd_pcm_hw_params_set_rate_near(pcm, hw, &r, nullptr);
  if (r != static_cast<unsigned int>(rate)) {
    // a device granting e.g. 48 kHz would feed time-stretched audio
    // through a 16 kHz frontend — refuse instead of silently misscoring
    std::fprintf(stderr, "device granted rate %u != model rate %d\n", r,
                 rate);
    snd_pcm_close(pcm);
    return nullptr;
  }
  snd_pcm_uframes_t period = chunk;
  snd_pcm_hw_params_set_period_size_near(pcm, hw, &period, nullptr);
  snd_pcm_uframes_t buffer = rate / 2;  // <= 0.5 s
  snd_pcm_hw_params_set_buffer_size_near(pcm, hw, &buffer);
  if (snd_pcm_hw_params(pcm, hw) < 0) {
    snd_pcm_close(pcm);
    return nullptr;
  }
  snd_pcm_prepare(pcm);
  return pcm;
}

// ALSA-backed PcmReader: the one production implementation of the seam.
class AlsaPcmReader : public tsc::PcmReader {
 public:
  explicit AlsaPcmReader(snd_pcm_t* pcm) : pcm_(pcm) {}
  long readi(int16_t* buffer, long frames) override {
    return snd_pcm_readi(pcm_, buffer, frames);
  }
  int recover() override { return snd_pcm_prepare(pcm_); }
  const char* error_string(long err) override {
    return snd_strerror(static_cast<int>(err));
  }

 private:
  snd_pcm_t* pcm_;
};

int main(int argc, char** argv) {
  std::string model_path, device = "default";
  int chunk_size = 1024, trigger_level = 3;
  double sensitivity = 0.5;
  bool show_bars = false;
  for (int i = 1; i < argc; ++i) {
    std::string a = argv[i];
    auto next = [&]() -> std::string {
      if (i + 1 >= argc) { std::fprintf(stderr, "missing value\n"); std::exit(2); }
      return argv[++i];
    };
    if (a == "--model") model_path = next();
    else if (a == "--device") device = next();
    else if (a == "--chunk_size") chunk_size = std::atoi(next().c_str());
    else if (a == "--sensitivity") sensitivity = std::atof(next().c_str());
    else if (a == "--trigger_level") trigger_level = std::atoi(next().c_str());
    else if (a == "--bars") show_bars = true;
    else {
      std::fprintf(stderr,
                   "usage: %s --model m.tscm [--device default] "
                   "[--chunk_size N] [--sensitivity S] [--trigger_level N] "
                   "[--bars]\n",
                   argv[0]);
      return 2;
    }
  }
  if (model_path.empty()) {
    std::fprintf(stderr, "--model is required\n");
    return 2;
  }

  try {
  tsc::NativeModel model = tsc::NativeModel::load(model_path);
  // same bounds as the wav-replay app (and the Python streamer's asserts);
  // an unchecked oversized chunk would wrap the ring-buffer memmove size
  const std::string chunk_err = tsc::check_chunk_size(model, chunk_size);
  if (!chunk_err.empty()) {
    std::fprintf(stderr, "%s\n", chunk_err.c_str());
    return 2;
  }
  snd_pcm_t* pcm = prepare_alsa(device.c_str(), model.sample_rate, chunk_size);
  if (!pcm) {
    std::fprintf(stderr, "cannot open ALSA capture device %s\n", device.c_str());
    return 1;
  }

  tsc::StreamRuntime runtime(model, chunk_size, sensitivity, trigger_level);
  AlsaPcmReader reader(pcm);
  const tsc::CaptureStats stats = tsc::run_capture_loop(
      reader, runtime, chunk_size,
      [&](const tsc::StreamRuntime::Step& step) {
        if (show_bars)
          tsc::print_bar(step.label, step.score, sensitivity, step.background);
        if (step.triggered)
          std::printf("command %s detected!\n", step.label.c_str());
      });
  snd_pcm_close(pcm);
  // observable evidence for tests / ops: how the capture session ended,
  // including the per-chunk step cost vs the real-time chunk budget
  const double budget_us = 1e6 * chunk_size / model.sample_rate;
  std::printf("capture done: chunks=%ld overruns_recovered=%ld "
              "short_reads=%ld step_us_avg=%.1f budget_us=%.0f\n",
              stats.chunks, stats.overruns_recovered, stats.short_reads,
              stats.chunks > 0 ? stats.step_us / stats.chunks : 0.0,
              budget_us);
  return stats.failed ? 1 : 0;
  } catch (const std::exception& e) {
    // clean rejection instead of std::terminate/SIGABRT on bad inputs
    std::fprintf(stderr, "error: %s\n", e.what());
    return 1;
  }
}
