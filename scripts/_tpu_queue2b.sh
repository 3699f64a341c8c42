#!/bin/bash
# TPU queue 2b — OOM retries, then the training queue.
cd /root/repo
exec > /tmp/tpu_queue2b.log 2>&1

echo "=== queue2b start $(date) ==="

echo "--- job 1: 2M rollout retry, smaller trajectory chunks ---"
python -m nbody_tpu.experiments.bh_rollout \
    --engine bh2 --n-bodies 2000000 --steps 1000 --block 128 \
    --bh-near 32 --coarse 16 --rc 48 --bh-refresh 8 --chunk-steps 20 \
    --out results/large_scale/bh_rollout_2m.json
echo "exit=$?"

echo "--- job 2: 10M retry, B=1024 shrinks the O(nb^2) partition pass 4x ---"
python -m nbody_tpu.experiments.treeforce_bench \
    --engine bh2 --n-bodies 10000000 --block 1024 --n-near 16 \
    --coarse 16 --rc 48 --reps 3 --exact-cap 0 --error-cap 0 \
    --out results/large_scale/bh2_10m.json
echo "exit=$?"

echo "=== queue2b done $(date) ==="
bash _tpu_queue3.sh
