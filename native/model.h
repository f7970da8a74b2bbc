// Dependency-free native inference runtime for exported .tscm models.
//
// Executes the four model families of the framework (simple_cnn,
// simple_cnn_lite, simple_gru, simple_lstm — see
// tpu_speech_commands/models/) directly from the flax parameter layout,
// NHWC, with BatchNorm applied from running stats as a (cheap)
// elementwise pass per block.  This replaces the reference's
// dependence on TFLite/MNN engines for on-device deployment
// (inference/{tflite,MNN}/speech_commands.cpp) with a self-contained
// runtime consuming the framework's own export format.
#pragma once

#include <cstdint>
#include <map>
#include <string>
#include <utility>
#include <vector>

namespace tsc {

struct Tensor {
  std::vector<uint32_t> shape;
  std::vector<float> data;     // float32 payload (empty when quantized)
  std::vector<int8_t> qdata;   // symmetric int8 payload (.tscm v2 dtype 1)
  std::vector<float> scales;   // per-channel scales over the LAST axis
  bool quantized() const { return !qdata.empty(); }
  size_t size() const {
    size_t n = 1;
    for (auto d : shape) n *= d;
    return n;
  }
};

struct NativeModel {
  std::string model_type;
  int num_classes = 0;
  std::vector<std::string> class_names;
  std::string meta_json;  // raw meta blob (params etc.)
  std::map<std::string, Tensor> tensors;

  // audio params parsed from meta (defaults match params.py)
  int sample_rate = 16000;
  int window_samples = 1024;
  int hop_samples = 512;
  int n_fft = 1024;
  int n_filt = 20;
  int n_mfcc = 20;
  int n_features = 30;
  int buffer_samples = 15872;
  int max_samples = 16000;
  bool use_delta = false;
  bool bark = false;  // BFCC frontend (meta feature_type == "bark")
  // full (mu, std) mixture from meta threshold_config — the python
  // Listener passes every component to ThresholdDecoder, so must we
  std::vector<std::pair<double, double>> threshold_config{{6.0, 4.0}};
  double threshold_center = 0.2;

  static NativeModel load(const std::string& path);

  // features (n_features x feature_size) row-major -> softmax scores
  // (num_classes).
  std::vector<float> predict(const std::vector<float>& features) const;
};

// layer kernels (NHWC, float32) — exposed for tests
namespace ops {

// SAME-padding conv2d: in (H,W,Cin), kernel (kh,kw,Cin,Cout) HWIO.
void conv2d_same(const std::vector<float>& in, int H, int W, int Cin,
                 const Tensor& kernel, const float* bias, int stride,
                 std::vector<float>& out, int& Ho, int& Wo);

// depthwise 3x3 SAME: kernel (kh,kw,1,C).
void depthwise_same(const std::vector<float>& in, int H, int W, int C,
                    const Tensor& kernel, int stride, std::vector<float>& out,
                    int& Ho, int& Wo);

void relu6(std::vector<float>& x);
void relu(std::vector<float>& x);
void maxpool2(const std::vector<float>& in, int H, int W, int C,
              std::vector<float>& out, int& Ho, int& Wo);
void dense(const std::vector<float>& in, const Tensor& kernel,
           const float* bias, std::vector<float>& out);
// out += x @ kernel for a (D, U) kernel (RNN gate matmuls); out must be
// pre-sized to U.  Handles float and quantized kernels.
void matvec_accum(const float* x, int D, const Tensor& kernel,
                  std::vector<float>& out);
void softmax(std::vector<float>& x);

// dynamic-range activation quantization: scale = max|x|/127,
// q = round(x/scale).  Used by the int8 kernel paths.
float quantize_acts(const float* x, size_t n, std::vector<int8_t>& q);

// Vectorized in-place activations using a branch-free expf approximation
// (relative error < 2e-7; accuracy locked by native/test_ops.cc).
void sigmoid_inplace(float* x, int n);
void tanh_inplace(float* x, int n);

}  // namespace ops

}  // namespace tsc
