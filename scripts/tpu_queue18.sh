#!/bin/bash
# TPU queue 18 (round 5): runs AFTER the 1M GNN retrain (launched directly
# with --train-time-budget 14400 so its eval is guaranteed chip time).
# Jobs, in value order per VERDICT r5 items 2 and 8:
#   1. ContConv 1M training through the kernel VJP, stride-1, with a
#      wall-clock training budget so ITS eval also always runs. Datasets
#      are validated npz (valid_npz gate) — the round-4 BadZipFile chain
#      is designed out.
#   2. crossover_r5: the 1M surrogate row re-timed with the retrained
#      GNN weights and labeled with the model it timed (--load-params),
#      plus the at-tier bh3 row; bh/bh2/direct carry over from
#      crossover_r4.json unchanged (same code paths, measured round 4).
# Logs go to results/logs/ (persistent), not /tmp (wiped twice in round 4).
cd /root/repo
exec > results/logs/r5_queue18.log 2>&1
set -x

echo "=== queue18 start $(date) ==="

echo "--- job 1: ContConv 1M training (kernel VJP), stride-1, budgeted ---"
timeout 9000 python -m nbody_tpu.experiments.train_large \
    --model contconv --conv-impl pallas --n-bodies 1000000 \
    --train-scenes 2 --epochs 20 --steps 100 --stride 1 --time-chunks 4 \
    --batch-size 1 --scan-chunk 8 --rollout-steps 96 \
    --save-every 1 --train-time-budget 6600 \
    --skip-datagen --data-dir results/large_scale/dataq1_ \
    --out results/large_scale/train_1m_contconv.json
echo "exit=$?"

echo "--- job 2: crossover_r5 surrogate row with the retrained model ---"
timeout 1800 python -m nbody_tpu.experiments.crossover \
    --n-bodies 1000000 --steps 10 --neighbors 8 --graph-refresh 8 \
    --knn-impl pallas --only surrogate \
    --load-params results/large_scale/train_1m_params.msgpack \
    --out results/large_scale/crossover_r5.json
echo "exit=$?"

echo "--- job 3: refresh the loss figure ---"
timeout 600 python scripts/plot_train_large.py
echo "exit=$?"

echo "=== queue18 done $(date) ==="
