#!/bin/bash
# Round-3 chip batch 2: waits for the bisect to finish, then runs
# 1) MXU probes (int8 speedup + dh=64 fill question)
# 2) encoder w8a8 shootout vs shipped
# 3) ragged-traffic engine bench (tiny first for sanity, then turbo)
cd /root/repo
while pgrep -f run_bisect_r3 > /dev/null; do sleep 30; done
echo "=== matmul_probe $(date +%T) ==="
timeout 1500 python benchmarks/matmul_probe.py --repeats 5 2>&1 | grep -v "^WARNING\|xla_bridge"
echo "=== encoder full (baseline re-measure) $(date +%T) ==="
WHISPER_TPU_GELU=tanh timeout 1500 python benchmarks/encoder_bench.py --variant full --model turbo --batch 64 --iters 3 --repeats 3 2>&1 | grep -v "^WARNING\|xla_bridge"
echo "=== encoder full_w8a8 $(date +%T) ==="
WHISPER_TPU_GELU=tanh timeout 1800 python benchmarks/encoder_bench.py --variant full_w8a8 --model turbo --batch 64 --iters 3 --repeats 3 2>&1 | grep -v "^WARNING\|xla_bridge"
echo "=== engine_bench tiny sanity $(date +%T) ==="
timeout 1500 python benchmarks/engine_bench.py --model tiny --slots 16 --requests 48 --kv_quant --self_kv_quant 2>&1 | grep -v "^WARNING\|xla_bridge"
echo "=== engine_bench turbo ragged $(date +%T) ==="
timeout 3000 python benchmarks/engine_bench.py --model turbo --slots 64 --requests 192 --kv_quant --self_kv_quant 2>&1 | grep -v "^WARNING\|xla_bridge"
echo "=== done $(date +%T) ==="
