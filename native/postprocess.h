// Post-processing for the native apps: ThresholdDecoder + TriggerDetector.
//
// C++ twins of tpu_speech_commands/streaming/{decoder,trigger}.py (behaviour
// of the reference listen.py:452-559).  Unlike the reference C++ decoder
// (single (mu,std) pair, threshold_decoder.h:22-27), this one supports the
// full mixture like the python contract.
#pragma once

#include <algorithm>
#include <cmath>
#include <cstddef>
#include <stdexcept>
#include <string>
#include <utility>
#include <vector>

namespace tsc {

class ThresholdDecoder {
 public:
  ThresholdDecoder(const std::vector<std::pair<double, double>>& mu_stds,
                   double center = 0.5, int resolution = 200,
                   double min_z = -4.0, double max_z = 4.0)
      : center_(center) {
    double lo = 1e30, hi = -1e30;
    for (const auto& ms : mu_stds) {
      if (ms.second < 0)  // python twin raises at construction too
        throw std::invalid_argument("threshold_config std must be >= 0");
    }
    for (const auto& ms : mu_stds) {
      lo = std::min(lo, ms.first + min_z * ms.second);
      hi = std::max(hi, ms.first + max_z * ms.second);
    }
    min_out_ = static_cast<int>(lo);
    max_out_ = static_cast<int>(hi);
    out_range_ = max_out_ - min_out_;
    if (out_range_ > 0) {
      const size_t n = static_cast<size_t>(resolution) * out_range_;
      cd_.resize(n);
      double acc = 0.0;
      for (size_t i = 0; i < n; ++i) {
        const double x =
            min_out_ + (max_out_ - min_out_) * double(i) / double(n - 1);
        double pd = 0.0;
        for (const auto& ms : mu_stds) {
          if (ms.second == 0) continue;
          pd += (1.0 / (ms.second * std::sqrt(2.0 * M_PI))) *
                std::exp(-(x - ms.first) * (x - ms.first) /
                         (2.0 * ms.second * ms.second));
        }
        acc += pd / (resolution * double(mu_stds.size()));
        cd_[i] = acc;
      }
    }
  }

  double decode(double raw) const {
    if (raw == 1.0 || raw == 0.0) return raw;
    double cp;
    if (out_range_ <= 0 || cd_.empty()) {  // degenerate config: step fn
      cp = raw > min_out_ ? 1.0 : 0.0;
    } else {
      double ratio = (asigmoid(raw) - min_out_) / out_range_;
      ratio = std::min(std::max(ratio, 0.0), 1.0);
      cp = cd_[static_cast<size_t>(ratio * (cd_.size() - 1) + 0.5)];
    }
    if (cp < center_) return 0.5 * cp / center_;
    return 0.5 + 0.5 * (cp - center_) / (1.0 - center_);
  }

 private:
  static double asigmoid(double x) {
    return (x > 0.0 && x < 1.0) ? -std::log(1.0 / x - 1.0) : -10.0;
  }

  int min_out_ = 0, max_out_ = 0, out_range_ = 0;
  double center_;
  std::vector<double> cd_;
};

class TriggerDetector {
 public:
  TriggerDetector(int chunk_size, std::vector<std::string> class_names,
                  double sensitivity = 0.5, int trigger_level = 3)
      : chunk_size_(chunk_size),
        class_names_(std::move(class_names)),
        sensitivity_(sensitivity),
        trigger_level_(trigger_level) {}

  // Feed one prediction; returns whether it fired an activation.
  bool update(int index, double score) {
    const bool chunk_activated = score > sensitivity_;
    // out-of-range index (model wider than its class list) counts as
    // background rather than indexing past the vector
    const bool is_command =
        index >= 0 && index < static_cast<int>(class_names_.size()) &&
        class_names_[index] != "background";
    if (is_command && index == record_index_ && chunk_activated) {
      ++activation_;
      if (activation_ > trigger_level_) {
        // python floor division: -(8*2048)//chunk == -ceil(16384/chunk)
        activation_ = -((8 * 2048 + chunk_size_ - 1) / chunk_size_);
        record_index_ = index;
        return true;
      }
    } else if (activation_ < 0) {
      ++activation_;
    } else if (activation_ > 0) {
      --activation_;
    }
    record_index_ = index;
    return false;
  }

  void reset() {
    activation_ = 0;
    record_index_ = -1;
  }

 private:
  int chunk_size_;
  std::vector<std::string> class_names_;
  double sensitivity_;
  int trigger_level_;
  int activation_ = 0;
  int record_index_ = -1;
};

}  // namespace tsc
