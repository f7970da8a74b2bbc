// Minimal RIFF/WAVE PCM reader/writer (mono-capable, 8/16/32-bit int).
// Replaces the reference's vendored AudioFile.h with a ~100-line
// self-contained implementation sufficient for the speech-commands
// deployment contract (mono 16 kHz 16-bit PCM, speech_commands.h:186-211).
#pragma once

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <fstream>
#include <stdexcept>
#include <string>
#include <vector>

namespace tsc {

struct WavData {
  int sample_rate = 0;
  int num_channels = 0;
  int bits_per_sample = 0;
  std::vector<float> samples;  // interleaved, normalized to [-1, 1)
};

inline WavData read_wav(const std::string& path) {
  std::ifstream f(path, std::ios::binary);
  if (!f) throw std::runtime_error("cannot open wav: " + path);
  f.seekg(0, std::ios::end);
  const uint64_t file_size = static_cast<uint64_t>(f.tellg());
  f.seekg(0, std::ios::beg);
  char riff[4], wave[4];
  uint32_t riff_size = 0;
  f.read(riff, 4);
  f.read(reinterpret_cast<char*>(&riff_size), 4);
  f.read(wave, 4);
  if (std::memcmp(riff, "RIFF", 4) != 0 || std::memcmp(wave, "WAVE", 4) != 0)
    throw std::runtime_error("not a RIFF/WAVE file: " + path);

  WavData wav;
  uint16_t audio_format = 1;
  bool have_fmt = false;
  while (f) {
    char id[4];
    uint32_t size = 0;
    f.read(id, 4);
    f.read(reinterpret_cast<char*>(&size), 4);
    if (!f) break;
    if (std::memcmp(id, "fmt ", 4) == 0) {
      // a PCM fmt chunk is >= 16 bytes; anything shorter is malformed and
      // would put the field reads below out of bounds
      if (size < 16) throw std::runtime_error("malformed wav fmt chunk: " + path);
      std::vector<char> fmt(size + (size & 1));
      f.read(fmt.data(), size + (size & 1));
      if (!f) throw std::runtime_error("truncated wav fmt chunk: " + path);
      audio_format = *reinterpret_cast<uint16_t*>(&fmt[0]);
      wav.num_channels = *reinterpret_cast<uint16_t*>(&fmt[2]);
      wav.sample_rate = *reinterpret_cast<uint32_t*>(&fmt[4]);
      wav.bits_per_sample = *reinterpret_cast<uint16_t*>(&fmt[14]);
      // WAVE_FORMAT_EXTENSIBLE: real format is the first 2 bytes of the
      // SubFormat GUID at offset 24
      if (audio_format == 0xFFFE && size >= 26)
        audio_format = *reinterpret_cast<uint16_t*>(&fmt[24]);
      if (wav.num_channels < 1)
        throw std::runtime_error("wav declares zero channels: " + path);
      if (wav.bits_per_sample != 8 && wav.bits_per_sample != 16 &&
          wav.bits_per_sample != 24 && wav.bits_per_sample != 32)
        throw std::runtime_error("unsupported wav bit depth");
      have_fmt = true;
    } else if (std::memcmp(id, "data", 4) == 0) {
      if (!have_fmt) throw std::runtime_error("wav data before fmt chunk");
      // bound the allocation by the bytes actually left in the file: a
      // crafted size field (up to 4 GiB) must not drive the allocation
      const uint64_t pos = static_cast<uint64_t>(f.tellg());
      const uint64_t remaining = file_size > pos ? file_size - pos : 0;
      const uint32_t to_read =
          static_cast<uint32_t>(std::min<uint64_t>(size, remaining));
      std::vector<char> raw(to_read);
      // tolerate a truncated final chunk: decode only the bytes present
      size_t got = 0;
      if (to_read > 0) {
        f.read(raw.data(), to_read);
        got = static_cast<size_t>(f.gcount());
      }
      const int bytes = wav.bits_per_sample / 8;
      const size_t n = got / bytes;
      wav.samples.resize(n);
      for (size_t i = 0; i < n; ++i) {
        if (wav.bits_per_sample == 16) {
          int16_t v;
          std::memcpy(&v, &raw[i * 2], 2);
          wav.samples[i] = static_cast<float>(v) / 32768.0f;
        } else if (wav.bits_per_sample == 8) {
          wav.samples[i] = (static_cast<uint8_t>(raw[i]) - 128) / 128.0f;
        } else if (wav.bits_per_sample == 24) {
          int32_t v = static_cast<uint8_t>(raw[i * 3]) |
                      (static_cast<uint8_t>(raw[i * 3 + 1]) << 8) |
                      (static_cast<uint8_t>(raw[i * 3 + 2]) << 16);
          if (v >= (1 << 23)) v -= (1 << 24);
          wav.samples[i] = static_cast<float>(v) / 8388608.0f;
        } else if (wav.bits_per_sample == 32) {
          int32_t v;
          std::memcpy(&v, &raw[i * 4], 4);
          wav.samples[i] = static_cast<float>(v) / 2147483648.0f;
        } else {
          throw std::runtime_error("unsupported wav bit depth");
        }
      }
      break;  // done
    } else {
      f.seekg(size + (size & 1), std::ios::cur);  // skip (pad to even)
    }
  }
  if (audio_format != 1)
    throw std::runtime_error("only PCM wav supported: " + path);
  // mono mixdown by channel average
  if (wav.num_channels > 1) {
    const int ch = wav.num_channels;
    std::vector<float> mono(wav.samples.size() / ch);
    for (size_t i = 0; i < mono.size(); ++i) {
      float acc = 0.0f;
      for (int c = 0; c < ch; ++c) acc += wav.samples[i * ch + c];
      mono[i] = acc / ch;
    }
    wav.samples.swap(mono);
    wav.num_channels = 1;
  }
  return wav;
}

inline void write_wav(const std::string& path, const std::vector<float>& samples,
                      int sample_rate) {
  std::ofstream f(path, std::ios::binary);
  if (!f) throw std::runtime_error("cannot write wav: " + path);
  const uint32_t data_size = static_cast<uint32_t>(samples.size() * 2);
  const uint32_t riff_size = 36 + data_size;
  const uint16_t fmt = 1, channels = 1, bits = 16;
  const uint32_t byte_rate = sample_rate * 2;
  const uint16_t block_align = 2;
  const uint32_t fmt_size = 16;
  f.write("RIFF", 4);
  f.write(reinterpret_cast<const char*>(&riff_size), 4);
  f.write("WAVE", 4);
  f.write("fmt ", 4);
  f.write(reinterpret_cast<const char*>(&fmt_size), 4);
  f.write(reinterpret_cast<const char*>(&fmt), 2);
  f.write(reinterpret_cast<const char*>(&channels), 2);
  f.write(reinterpret_cast<const char*>(&sample_rate), 4);
  f.write(reinterpret_cast<const char*>(&byte_rate), 4);
  f.write(reinterpret_cast<const char*>(&block_align), 2);
  f.write(reinterpret_cast<const char*>(&bits), 2);
  f.write("data", 4);
  f.write(reinterpret_cast<const char*>(&data_size), 4);
  for (float s : samples) {
    int16_t v = static_cast<int16_t>(std::max(-1.0f, std::min(1.0f, s)) * 32767.0f);
    f.write(reinterpret_cast<const char*>(&v), 2);
  }
}

}  // namespace tsc
