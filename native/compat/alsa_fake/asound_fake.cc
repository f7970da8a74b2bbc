// File-backed fake implementation of the ALSA PCM capture API subset the
// live-mic app uses (declared in compat/alsa_stub/alsa/asoundlib.h).
//
// This environment ships no libasound, so instead of leaving
// speech_commands_alsa.cc as a compile check, CMake links the real app
// binary against this fake: the capture "device" streams int16 frames
// from the file named by TSC_FAKE_ALSA_PCM, with deterministic fault
// injection so the EPIPE overrun-recovery branch actually executes:
//
//   TSC_FAKE_ALSA_PCM           raw int16 LE mono file to stream (required)
//   TSC_FAKE_ALSA_OVERRUN_EVERY inject -EPIPE before every Nth read (0=off)
//   TSC_FAKE_ALSA_SHORT_READ_AT deliver a half period on read #N (-1=off)
//
// Protocol checking: after an injected overrun the device is DOWN — a
// readi without an intervening snd_pcm_prepare returns -EIO, so a capture
// loop that forgets to re-prepare fails loudly instead of silently
// continuing (the recovery contract of snd_pcm_readi after -EPIPE).
#include <alsa/asoundlib.h>

#include <cerrno>
#include <cstdio>
#include <cstdlib>
#include <cstring>

struct _snd_pcm {
  FILE* file = nullptr;
  long reads = 0;            // successful reads served
  long overrun_every = 0;    // inject -EPIPE before every Nth read
  long short_read_at = -1;   // serve a half period on this read index
  bool need_prepare = false; // true after an injected overrun
};

struct _snd_pcm_hw_params {
  char unused;
};

extern "C" {

int snd_pcm_open(snd_pcm_t** pcm, const char* name, snd_pcm_stream_t stream,
                 int mode) {
  (void)name; (void)mode;
  if (stream != SND_PCM_STREAM_CAPTURE) return -EINVAL;
  const char* path = std::getenv("TSC_FAKE_ALSA_PCM");
  if (!path) {
    std::fprintf(stderr,
                 "alsa_fake: set TSC_FAKE_ALSA_PCM to a raw int16 file\n");
    return -ENODEV;
  }
  FILE* f = std::fopen(path, "rb");
  if (!f) return -ENOENT;
  auto* h = new _snd_pcm();
  h->file = f;
  const char* every = std::getenv("TSC_FAKE_ALSA_OVERRUN_EVERY");
  if (every) h->overrun_every = std::atol(every);
  const char* short_at = std::getenv("TSC_FAKE_ALSA_SHORT_READ_AT");
  if (short_at) h->short_read_at = std::atol(short_at);
  *pcm = h;
  return 0;
}

int snd_pcm_close(snd_pcm_t* pcm) {
  if (pcm) {
    if (pcm->file) std::fclose(pcm->file);
    delete pcm;
  }
  return 0;
}

int snd_pcm_prepare(snd_pcm_t* pcm) {
  pcm->need_prepare = false;
  return 0;
}

snd_pcm_sframes_t snd_pcm_readi(snd_pcm_t* pcm, void* buffer,
                                snd_pcm_uframes_t size) {
  if (pcm->need_prepare) return -EIO;  // read without post-overrun prepare
  const long attempt = pcm->reads + 1;
  if (pcm->overrun_every > 0 && attempt % pcm->overrun_every == 0) {
    // count the overrun as an attempt so the post-prepare retry succeeds
    ++pcm->reads;
    pcm->need_prepare = true;
    return -EPIPE;
  }
  snd_pcm_uframes_t want = size;
  if (pcm->short_read_at >= 0 && attempt == pcm->short_read_at)
    want = size / 2;  // partial hardware period
  const size_t got =
      std::fread(buffer, sizeof(int16_t), want, pcm->file);
  ++pcm->reads;
  return static_cast<snd_pcm_sframes_t>(got);  // 0 at end of stream
}

const char* snd_strerror(int errnum) { return std::strerror(-errnum); }

size_t snd_pcm_hw_params_sizeof(void) { return sizeof(_snd_pcm_hw_params); }
int snd_pcm_hw_params_any(snd_pcm_t*, snd_pcm_hw_params_t*) { return 0; }
int snd_pcm_hw_params(snd_pcm_t*, snd_pcm_hw_params_t*) { return 0; }
int snd_pcm_hw_params_set_access(snd_pcm_t*, snd_pcm_hw_params_t*,
                                 snd_pcm_access_t) { return 0; }
int snd_pcm_hw_params_set_format(snd_pcm_t*, snd_pcm_hw_params_t*,
                                 snd_pcm_format_t) { return 0; }
int snd_pcm_hw_params_set_channels(snd_pcm_t*, snd_pcm_hw_params_t*,
                                   unsigned int) { return 0; }
int snd_pcm_hw_params_set_rate_near(snd_pcm_t*, snd_pcm_hw_params_t*,
                                    unsigned int*, int*) { return 0; }
int snd_pcm_hw_params_set_buffer_size_near(snd_pcm_t*, snd_pcm_hw_params_t*,
                                           snd_pcm_uframes_t*) { return 0; }
int snd_pcm_hw_params_set_period_size_near(snd_pcm_t*, snd_pcm_hw_params_t*,
                                           snd_pcm_uframes_t*, int*) {
  return 0;
}

}  // extern "C"
