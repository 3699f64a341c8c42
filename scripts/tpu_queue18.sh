#!/bin/bash
# TPU queue 18 (round 5): runs AFTER the 1M GNN retrain (launched directly
# with --train-time-budget 14400 so its eval is guaranteed chip time).
# Order: short bounded wins first (the round-4 lesson), the long budgeted
# training last with a deadline-computed budget so ITS eval also runs.
#   1. crossover_r5 — the 1M surrogate row re-timed with the retrained GNN
#      weights and labeled with the model it timed (--load-params);
#      bh/bh2/bh3/direct rows carry over from crossover_r4.json unchanged.
#   2. bh3 10M rollout AT THE ACCURACY TIER (M=48/rc=96/n_sub=64 — the
#      round-5 at-tier config): the committed 10M rollouts are bh2 M=16
#      speed-tier (1.14 s/step at 1.9% median endpoint err); this adds the
#      at-tier point (expected ~1.24 s/step at ~3x better endpoint err).
#   3. ContConv 1M training through the kernel VJP, stride-1, training
#      budget = time-to-deadline minus load+eval reserve (min 1200 s).
# Logs go to results/logs/ (persistent), not /tmp (wiped twice in round 4).
# DEADLINE: unix seconds when the round's chip work must wrap (default:
# now + 2h25m).
cd /root/repo
exec > results/logs/r5_queue18.log 2>&1
set -x
DEADLINE=${DEADLINE:-$(( $(date +%s) + 8700 ))}

echo "=== queue18 start $(date) ==="

echo "--- job 1: crossover_r5 surrogate row with the retrained model ---"
timeout 1800 python -m nbody_tpu.experiments.crossover \
    --n-bodies 1000000 --steps 10 --neighbors 8 --graph-refresh 8 \
    --knn-impl pallas --only surrogate \
    --load-params results/large_scale/train_1m_params.msgpack \
    --out results/large_scale/crossover_r5.json
echo "exit=$?"

echo "--- job 2: bh3 10M rollout at the accuracy tier ---"
timeout 1500 python -m nbody_tpu.experiments.bh_rollout \
    --n-bodies 10000000 --steps 50 --engine bh3 \
    --bh-near 48 --block 512 --coarse 16 --rc 96 --sub-block 32 --n-sub 64 \
    --bh-refresh 8 --chunk-steps 10 --no-energy-audit --error-sample 4096 \
    --out results/large_scale/bh_rollout_10m_bh3.json
echo "exit=$?"

echo "--- job 3: ContConv 1M training (kernel VJP), stride-1, budgeted ---"
# --train-time-budget counts from process start, so data loading is
# inside it already; reserve ~1200 s for the eval stages only
T=$(( DEADLINE - $(date +%s) ))
BUDGET=$(( T - 1200 )); [ "$BUDGET" -lt 1200 ] && BUDGET=1200
timeout $(( T > 600 ? T : 600 )) python -m nbody_tpu.experiments.train_large \
    --model contconv --conv-impl pallas --n-bodies 1000000 \
    --train-scenes 2 --epochs 20 --steps 100 --stride 1 --time-chunks 4 \
    --batch-size 1 --scan-chunk 8 --rollout-steps 96 \
    --save-every 1 --train-time-budget "$BUDGET" \
    --skip-datagen --data-dir results/large_scale/dataq1_ \
    --out results/large_scale/train_1m_contconv.json
echo "exit=$?"

echo "--- job 4: refresh the loss figure ---"
timeout 600 python scripts/plot_train_large.py
echo "exit=$?"

echo "=== queue18 done $(date) ==="
