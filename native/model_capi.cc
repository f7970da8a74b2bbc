// C ABI around NativeModel for the Python ctypes binding (parity tests and
// host-side use of the native runtime without any Python NN dependency).
#include <cstring>
#include <string>

#include "model.h"
#include "stream_runtime.h"

extern "C" {

typedef void* tsc_model_t;

tsc_model_t tsc_model_load(const char* path) {
  try {
    return new tsc::NativeModel(tsc::NativeModel::load(path));
  } catch (const std::exception&) {
    return nullptr;
  }
}

void tsc_model_destroy(tsc_model_t m) { delete static_cast<tsc::NativeModel*>(m); }

int tsc_model_num_classes(tsc_model_t m) {
  return m ? static_cast<tsc::NativeModel*>(m)->num_classes : -1;
}

int tsc_model_n_features(tsc_model_t m) {
  return m ? static_cast<tsc::NativeModel*>(m)->n_features : -1;
}

int tsc_model_feature_width(tsc_model_t m) {
  if (!m) return -1;
  const auto* nm = static_cast<tsc::NativeModel*>(m);
  return nm->use_delta ? 2 * nm->n_mfcc : nm->n_mfcc;
}

// features: (n_features x width) row-major; scores out: num_classes floats.
int tsc_model_predict(tsc_model_t m, const float* features, int count,
                      float* scores_out) {
  if (!m || !features || !scores_out) return -1;
  const auto* nm = static_cast<tsc::NativeModel*>(m);
  try {
    std::vector<float> in(features, features + count);
    std::vector<float> out = nm->predict(in);
    std::memcpy(scores_out, out.data(), out.size() * sizeof(float));
    return static_cast<int>(out.size());
  } catch (const std::exception&) {
    return -1;
  }
}

// ---- streaming engine (StreamRuntime) --------------------------------------
// The full per-chunk pipeline — ring append, incremental features,
// invoke, ThresholdDecoder, TriggerDetector — as used by the native
// stream/ALSA apps (stream_runtime.h).  The model handle must outlive
// the stream handle.

typedef void* tsc_stream_t;

tsc_stream_t tsc_stream_create(tsc_model_t model, int chunk_size,
                               double sensitivity, int trigger_level) {
  if (!model) return nullptr;
  const auto* nm = static_cast<tsc::NativeModel*>(model);
  if (!tsc::check_chunk_size(*nm, chunk_size).empty()) return nullptr;
  try {
    return new tsc::StreamRuntime(*nm, chunk_size, sensitivity,
                                  trigger_level);
  } catch (const std::exception&) {
    return nullptr;
  }
}

void tsc_stream_destroy(tsc_stream_t s) {
  delete static_cast<tsc::StreamRuntime*>(s);
}

// chunk: chunk_size float samples in [-1, 1].  Outputs: top class index,
// its score (ThresholdDecoder-decoded for commands, raw softmax for
// background), background flag, trigger flag.  Returns 0, or -1 on error.
int tsc_stream_step(tsc_stream_t s, const float* chunk, int* index_out,
                    float* score_out, int* background_out,
                    int* triggered_out) {
  if (!s || !chunk) return -1;
  try {
    const tsc::StreamRuntime::Step step =
        static_cast<tsc::StreamRuntime*>(s)->step(chunk);
    if (index_out) *index_out = step.index;
    if (score_out) *score_out = static_cast<float>(step.score);
    if (background_out) *background_out = step.background ? 1 : 0;
    if (triggered_out) *triggered_out = step.triggered ? 1 : 0;
    return 0;
  } catch (const std::exception&) {
    return -1;
  }
}
}
