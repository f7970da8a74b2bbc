/* Compile-check stub for <alsa/asoundlib.h>.
 *
 * This environment ships no libasound development package, so the live-
 * microphone app (speech_commands_alsa.cc — the twin of the reference's
 * inference/tflite/speech_commands_alsa.cpp) could never be compiled here.
 * This header declares exactly the subset of the ALSA PCM capture API the
 * app uses, with signatures matching alsa-lib's pcm.h, so CMake can build
 * the translation unit as a compile check (object only, never linked).
 * On a real target with ALSA installed, CMake finds the genuine headers
 * and library instead and this file is not on the include path.
 */
#ifndef TSC_ALSA_STUB_ASOUNDLIB_H_
#define TSC_ALSA_STUB_ASOUNDLIB_H_

#include <alloca.h>
#include <cerrno>
#include <cstddef>

extern "C" {

typedef struct _snd_pcm snd_pcm_t;
typedef struct _snd_pcm_hw_params snd_pcm_hw_params_t;
typedef unsigned long snd_pcm_uframes_t;
typedef long snd_pcm_sframes_t;

typedef enum _snd_pcm_stream {
  SND_PCM_STREAM_PLAYBACK = 0,
  SND_PCM_STREAM_CAPTURE = 1,
} snd_pcm_stream_t;

typedef enum _snd_pcm_access {
  SND_PCM_ACCESS_MMAP_INTERLEAVED = 0,
  SND_PCM_ACCESS_MMAP_NONINTERLEAVED = 1,
  SND_PCM_ACCESS_MMAP_COMPLEX = 2,
  SND_PCM_ACCESS_RW_INTERLEAVED = 3,
  SND_PCM_ACCESS_RW_NONINTERLEAVED = 4,
} snd_pcm_access_t;

typedef enum _snd_pcm_format {
  SND_PCM_FORMAT_UNKNOWN = -1,
  SND_PCM_FORMAT_S8 = 0,
  SND_PCM_FORMAT_U8 = 1,
  SND_PCM_FORMAT_S16_LE = 2,
  SND_PCM_FORMAT_S16_BE = 3,
} snd_pcm_format_t;

int snd_pcm_open(snd_pcm_t **pcm, const char *name,
                 snd_pcm_stream_t stream, int mode);
int snd_pcm_close(snd_pcm_t *pcm);
int snd_pcm_prepare(snd_pcm_t *pcm);
snd_pcm_sframes_t snd_pcm_readi(snd_pcm_t *pcm, void *buffer,
                                snd_pcm_uframes_t size);
const char *snd_strerror(int errnum);

size_t snd_pcm_hw_params_sizeof(void);
int snd_pcm_hw_params_any(snd_pcm_t *pcm, snd_pcm_hw_params_t *params);
int snd_pcm_hw_params(snd_pcm_t *pcm, snd_pcm_hw_params_t *params);
int snd_pcm_hw_params_set_access(snd_pcm_t *pcm, snd_pcm_hw_params_t *params,
                                 snd_pcm_access_t access);
int snd_pcm_hw_params_set_format(snd_pcm_t *pcm, snd_pcm_hw_params_t *params,
                                 snd_pcm_format_t format);
int snd_pcm_hw_params_set_channels(snd_pcm_t *pcm,
                                   snd_pcm_hw_params_t *params,
                                   unsigned int val);
int snd_pcm_hw_params_set_rate_near(snd_pcm_t *pcm,
                                    snd_pcm_hw_params_t *params,
                                    unsigned int *val, int *dir);
int snd_pcm_hw_params_set_buffer_size_near(snd_pcm_t *pcm,
                                           snd_pcm_hw_params_t *params,
                                           snd_pcm_uframes_t *val);
int snd_pcm_hw_params_set_period_size_near(snd_pcm_t *pcm,
                                           snd_pcm_hw_params_t *params,
                                           snd_pcm_uframes_t *val, int *dir);

}  // extern "C"

#define snd_pcm_hw_params_alloca(ptr)                                       \
  do {                                                                       \
    *(ptr) = (snd_pcm_hw_params_t *)alloca(snd_pcm_hw_params_sizeof());     \
  } while (0)

#endif  // TSC_ALSA_STUB_ASOUNDLIB_H_
