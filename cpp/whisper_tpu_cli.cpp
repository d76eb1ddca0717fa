// Native CLI — counterpart of the reference's cpp/whisper_cli.cpp:19-110:
// parse args, init, transcribe a WAV, print text + RTF. The NPU-SDK init
// (AX_SYS/AX_ENGINE) is replaced by a serving-endpoint handshake; audio
// parsing and resampling run natively in-process.

#include <chrono>
#include <cstdio>
#include <cstring>
#include <string>

#include "src/whisper_tpu_api.h"

namespace {

void usage(const char* prog) {
  std::fprintf(stderr,
               "usage: %s --wav FILE [--host H] [--port P] [--language L] "
               "[--task transcribe|translate]\n",
               prog);
}

}  // namespace

int main(int argc, char** argv) {
  std::string wav, host = "127.0.0.1", language = "zh", task = "transcribe";
  int port = 8000;
  for (int i = 1; i < argc; ++i) {
    auto next = [&](const char* flag) -> const char* {
      if (i + 1 >= argc) {
        std::fprintf(stderr, "%s needs a value\n", flag);
        std::exit(2);
      }
      return argv[++i];
    };
    if (!std::strcmp(argv[i], "--wav") || !std::strcmp(argv[i], "-w")) {
      wav = next("--wav");
    } else if (!std::strcmp(argv[i], "--host")) {
      host = next("--host");
    } else if (!std::strcmp(argv[i], "--port")) {
      port = std::atoi(next("--port"));
    } else if (!std::strcmp(argv[i], "--language") || !std::strcmp(argv[i], "-l")) {
      language = next("--language");
    } else if (!std::strcmp(argv[i], "--task")) {
      task = next("--task");
    } else {
      usage(argv[0]);
      return 2;
    }
  }
  if (wav.empty()) {
    usage(argv[0]);
    return 2;
  }

  WT_InitAttr attr = {};
  attr.host = host.c_str();
  attr.port = port;
  attr.language = language.c_str();
  attr.task = task.c_str();
  attr.timeout_ms = 300000;

  auto t0 = std::chrono::steady_clock::now();
  WT_HANDLE h = WT_Init(&attr);
  if (!h) {
    std::fprintf(stderr, "init failed: %s\n", WT_LastError());
    return 1;
  }
  const double init_s =
      std::chrono::duration<double>(std::chrono::steady_clock::now() - t0).count();
  std::fprintf(stderr, "Init cost: %.3f s\n", init_s);

  char* result = nullptr;
  t0 = std::chrono::steady_clock::now();
  if (WT_RunFile(h, wav.c_str(), &result) != 0) {
    std::fprintf(stderr, "run failed: %s\n", WT_LastError());
    WT_Uninit(h);
    return 1;
  }
  const double wall =
      std::chrono::duration<double>(std::chrono::steady_clock::now() - t0).count();

  std::printf("%s\n", result);
  std::fprintf(stderr, "Run cost: %.3f s\n", wall);
  WT_FreeResult(result);
  WT_Uninit(h);
  return 0;
}
