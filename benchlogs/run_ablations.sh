#!/bin/bash
# Sequential decode-step ablations on the real chip (axon). One variant per
# process so env knobs and jit caches are isolated.
cd /root/repo
for v in full_xq_sq no_cross no_self no_mlp no_logits; do
  echo "=== variant $v $(date +%T) ==="
  timeout 1200 python benchmarks/decode_bench.py --variant "$v" --model turbo --batch 64 --steps 64 --repeats 4 2>&1 | grep -v "^WARNING\|xla_bridge"
done
echo "=== done $(date +%T) ==="
