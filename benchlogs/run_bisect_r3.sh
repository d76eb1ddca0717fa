#!/bin/bash
# Round-3 int8 bisect at SHIPPED settings: int8 cross+self KV, bucketed
# kv_ctx=128 (what the engine/offline path runs at max_tokens=64).
cd /root/repo
run() {
  echo "=== $* $(date +%T) ==="
  timeout 1500 python benchmarks/decode_bench.py --model turbo --batch 64 --steps 64 --repeats 4 "$@" 2>&1 | grep -v "^WARNING\|xla_bridge"
}
run --variant full_xq_sq --kv_ctx 128
run --variant no_cross  --xq --sq --kv_ctx 128
run --variant no_self   --xq --sq --kv_ctx 128
run --variant no_mlp    --xq --sq --kv_ctx 128
run --variant no_logits --xq --sq --kv_ctx 128
echo "=== done $(date +%T) ==="
