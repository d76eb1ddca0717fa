#!/usr/bin/env bash
# Build the native components into cpp/build/ (counterpart of the
# reference's build_ax650.sh, without the BSP download/cross-compile).
set -euo pipefail
cd "$(dirname "$0")"
mkdir -p build
cd build
cmake -DCMAKE_BUILD_TYPE=Release .. >/dev/null
make -j"$(nproc)" 2>&1 | tail -2
echo "built: $(pwd)/libwhisper_tpu.so $(pwd)/whisper_tpu_cli"
