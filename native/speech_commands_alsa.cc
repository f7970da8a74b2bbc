// Live-microphone keyword-spotting app via ALSA capture.
//
// Native twin of the reference ALSA app
// (inference/tflite/speech_commands_alsa.cpp behaviour): capture PCM
// S16_LE mono at the model rate with period=chunk, EPIPE overrun recovery,
// then the same incremental-feature / decode / trigger loop as the stream
// app.  Built only when ALSA headers are available (see CMakeLists.txt).
#include <alsa/asoundlib.h>

#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

#include "dsp.h"
#include "model.h"
#include "postprocess.h"

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

int main(int argc, char** argv) {
  std::string model_path, device = "default";
  int chunk_size = 1024, trigger_level = 3;
  double sensitivity = 0.5;
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
    else {
      std::fprintf(stderr,
                   "usage: %s --model m.tscm [--device default] "
                   "[--chunk_size N] [--sensitivity S] [--trigger_level N]\n",
                   argv[0]);
      return 2;
    }
  }
  if (model_path.empty()) {
    std::fprintf(stderr, "--model is required\n");
    return 2;
  }

  tsc::NativeModel model = tsc::NativeModel::load(model_path);
  snd_pcm_t* pcm = prepare_alsa(device.c_str(), model.sample_rate, chunk_size);
  if (!pcm) {
    std::fprintf(stderr, "cannot open ALSA capture device %s\n", device.c_str());
    return 1;
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

  const int buffer_samples = model.buffer_samples;
  std::vector<float> audio(buffer_samples, 0.0f);
  std::vector<int16_t> pcm_buf(chunk_size);
  int fill = 0;
  const int width = model.n_mfcc;
  std::vector<float> feats(static_cast<size_t>(model.n_features) * width, 0.0f);

  while (true) {
    long got = snd_pcm_readi(pcm, pcm_buf.data(), chunk_size);
    if (got == -EPIPE) {  // overrun: recover and retry
      snd_pcm_prepare(pcm);
      continue;
    }
    if (got < 0) {
      std::fprintf(stderr, "alsa read error: %s\n", snd_strerror(got));
      break;
    }
    if (got < chunk_size) continue;

    std::memmove(audio.data(), audio.data() + chunk_size,
                 (buffer_samples - chunk_size) * sizeof(float));
    for (int i = 0; i < chunk_size; ++i)
      audio[buffer_samples - chunk_size + i] = pcm_buf[i] / 32768.0f;
    fill += chunk_size;
    if (fill >= cfg.window_samples) {
      const int n_new = 1 + (fill - cfg.window_samples) / cfg.hop_samples;
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
    if (model.class_names[index] != "background") score = decoder.decode(score);
    if (trigger.update(index, score))
      std::printf("command %s detected!\n", model.class_names[index].c_str());
  }
  snd_pcm_close(pcm);
  return 0;
}
