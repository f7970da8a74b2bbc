// C ABI around NativeModel for the Python ctypes binding (parity tests and
// host-side use of the native runtime without any Python NN dependency).
#include <cstring>
#include <string>

#include "model.h"

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
}
