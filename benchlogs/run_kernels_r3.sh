#!/bin/bash
# Round-3 decode kernel shootout on the real chip. One process per variant
# (isolates env knobs and jit caches; env prefixes on bash FUNCTIONS leak,
# so tile overrides run in subshells).
cd /root/repo
run() {
  echo "=== $* tile=${WHISPER_TPU_FD_TILE:-512} $(date +%T) ==="
  timeout 1500 python benchmarks/decode_bench.py --model turbo --batch 64 --steps 64 --repeats 4 "$@" 2>&1 | grep -v "^WARNING\|xla_bridge"
}
run --variant full_xq_sq
run --variant pallas_cross_fd
(export WHISPER_TPU_FD_TILE=256; run --variant pallas_cross_fd)
(export WHISPER_TPU_FD_TILE=1536; run --variant pallas_cross_fd)
run --variant pallas_cross_dense
echo "=== done $(date +%T) ==="
