// Native audio IO for whisper-tpu: WAV parsing, downmix, resampling.
//
// TPU-native counterpart of the reference's vendored AudioFile.h reader and
// the stereo downmix in cpp/src/api/ax_whisper_api.cpp:109-113, exposed as a
// C ABI so both the C++ CLI/API and the Python runtime (via ctypes) share one
// fast host-side IO path.
#ifndef WHISPER_TPU_AUDIO_IO_H
#define WHISPER_TPU_AUDIO_IO_H

#include <stddef.h>
#include <stdint.h>

#ifdef __cplusplus
extern "C" {
#endif

// Parse a RIFF/WAVE byte buffer into interleaved-free mono float32 samples
// resampled to target_rate (pass 0 to keep the native rate).
// Returns 0 on success; *out_samples is malloc'd (free with wt_free).
int wt_load_wav(const uint8_t* data, size_t len, int target_rate,
                float** out_samples, int64_t* out_n, int* out_rate);

// Resample mono float32 audio with a windowed-sinc lowpass.
// Returns 0 on success; *out is malloc'd (free with wt_free).
int wt_resample(const float* in, int64_t n, int in_rate, int out_rate,
                float** out, int64_t* out_n);

// Character-level Levenshtein distance over UTF-32 codepoint arrays
// (hot loop of the WER harness; reference python/test_wer.py:209-235).
int64_t wt_edit_distance(const uint32_t* a, int64_t na,
                         const uint32_t* b, int64_t nb);

void wt_free(void* p);

const char* wt_last_error(void);

#ifdef __cplusplus
}
#endif

#endif  // WHISPER_TPU_AUDIO_IO_H
