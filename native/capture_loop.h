// Live-capture loop shared by the ALSA app and its tests.
//
// The reference reads snd_pcm_readi inline in main
// (inference/tflite/speech_commands_alsa.cpp:157-188), which makes the
// chunking and EPIPE-overrun recovery untestable without a microphone.
// Here the loop depends only on the PcmReader seam; the real app injects
// an ALSA-backed reader, tests inject a file-backed one (or link the
// whole app against compat/alsa_fake) and drive overruns deterministically.
#pragma once

#include <cerrno>
#include <chrono>
#include <cstdint>
#include <cstdio>
#include <vector>

#include "stream_runtime.h"

namespace tsc {

// Abstract PCM capture source (int16 mono frames).
class PcmReader {
 public:
  virtual ~PcmReader() = default;
  // Read up to `frames` frames into buffer.  Returns frames read, 0 at
  // end of stream, or a negative errno (-EPIPE = capture overrun).
  virtual long readi(int16_t* buffer, long frames) = 0;
  // Re-prepare the device after an overrun; 0 on success.
  virtual int recover() = 0;
  virtual const char* error_string(long err) = 0;
};

struct CaptureStats {
  long chunks = 0;              // full chunks fed through the runtime
  long overruns_recovered = 0;  // -EPIPE reads followed by recover()==0
  long short_reads = 0;         // partial periods dropped
  double step_us = 0.0;         // total StreamRuntime::step wall time
  bool failed = false;          // ended on an unrecoverable error
};

// Capture until end-of-stream or a fatal error.  Mirrors the reference
// loop semantics: overrun -> re-prepare and retry the read; short read ->
// drop the partial period; full chunk -> decode int16 to [-1,1) floats
// (x/32768, buffer_to_audio convention) and run the streaming step.
template <typename OnStep>
CaptureStats run_capture_loop(PcmReader& reader, StreamRuntime& runtime,
                              int chunk_size, OnStep&& on_step) {
  CaptureStats stats;
  std::vector<int16_t> pcm_buf(chunk_size);
  std::vector<float> chunk(chunk_size);
  while (true) {
    const long got = reader.readi(pcm_buf.data(), chunk_size);
    if (got == -EPIPE) {  // overrun: recover and retry
      if (reader.recover() == 0) {
        ++stats.overruns_recovered;
        continue;
      }
      std::fprintf(stderr, "alsa overrun recovery failed\n");
      stats.failed = true;
      break;
    }
    if (got == 0) break;  // end of stream (file-backed readers)
    if (got < 0) {
      std::fprintf(stderr, "alsa read error: %s\n",
                   reader.error_string(got));
      stats.failed = true;
      break;
    }
    if (got < chunk_size) {
      ++stats.short_reads;
      continue;
    }
    for (int i = 0; i < chunk_size; ++i) chunk[i] = pcm_buf[i] / 32768.0f;
    const auto t0 = std::chrono::steady_clock::now();
    const StreamRuntime::Step step = runtime.step(chunk.data());
    stats.step_us += std::chrono::duration<double, std::micro>(
                         std::chrono::steady_clock::now() - t0)
                         .count();
    ++stats.chunks;
    on_step(step);
  }
  return stats;
}

}  // namespace tsc
