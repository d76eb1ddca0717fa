// Stable C ABI for the whisper-tpu serving stack.
//
// Counterpart of the reference's AX_WHISPER_* surface
// (cpp/src/api/ax_whisper_api.h:54-101): opaque handle, WAV-file and raw-PCM
// entry points, malloc'd result strings. Where the reference binds to an
// on-device NPU runtime, this client binds to a whisper-tpu serving endpoint
// (the TPU fleet) — audio parsing/resampling happens natively in-process,
// inference rides the continuous-batching server.
#ifndef WHISPER_TPU_API_H
#define WHISPER_TPU_API_H

#include <stdint.h>

#ifdef __cplusplus
extern "C" {
#endif

typedef void* WT_HANDLE;

typedef struct {
  const char* host;      // serving host, e.g. "127.0.0.1"
  int port;              // serving port
  const char* language;  // "zh", "en", ... or "auto"
  const char* task;      // "transcribe" | "translate"
  int timeout_ms;        // per-request timeout (default 300000 if <= 0)
} WT_InitAttr;

// Connects (validates /health) and returns a handle. NULL on failure.
WT_HANDLE WT_Init(const WT_InitAttr* attr);

// Transcribe a WAV file on disk (any supported format/rate; parsed and
// resampled natively). *result is malloc'd UTF-8, free with WT_FreeResult.
int WT_RunFile(WT_HANDLE h, const char* wav_path, char** result);

// Transcribe mono float32 PCM at 16 kHz.
int WT_RunPCM(WT_HANDLE h, const float* samples, int64_t n, char** result);

void WT_FreeResult(char* result);

void WT_Uninit(WT_HANDLE h);

const char* WT_LastError(void);

#ifdef __cplusplus
}
#endif

#endif  // WHISPER_TPU_API_H
