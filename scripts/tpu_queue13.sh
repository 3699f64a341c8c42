#!/bin/bash
# TPU queue 13 (round 4, post-restart continuation): the session restart
# returned the chip; run the two VERDICT items that never got chip time,
# then the bh3 10M at-tier attempt. Order is strictly by VERDICT value:
#   1. GNN 1M retrain, stride-1 round-3 recipe x 60 epochs (VERDICT #2).
#      Datagen (dataq1_1000k: 2 scenes x 100 stride-1 snaps) runs first;
#      --save-every 2 + per-epoch artifact persistence means any cut
#      still leaves a resume point and evidence.
#      60 epochs = 12000 optimizer steps, the dose the 100k sweep showed
#      reaches the 0.0158-stepwise tier (16000 steps) at 100k.
#   2. ContConv 1M training through the kernel VJP (VERDICT #3),
#      reusing dataq1_1000k.
#   3. bh3 at 10M with the 1M at-tier recipe (n_near=48 rc=48 n_sub=48)
#      at B=512 — the config ROUND4_NOTES flagged as the missing
#      at-tier 10M row (current 10M bh3 row is speed-tier only).
cd /root/repo
exec > /tmp/tpu_queue13.log 2>&1
set -x

echo "=== queue13 start $(date) ==="

echo "--- job 1: GNN 1M retrain, stride-1 x 60 epochs (ckpt every 2) ---"
timeout 20000 python -m nbody_tpu.experiments.train_large \
    --model gnn --n-bodies 1000000 --train-scenes 2 --epochs 60 \
    --steps 100 --stride 1 --time-chunks 4 --neighbors 8 \
    --batch-size 1 --remat --rollout-steps 96 --scan-chunk 8 \
    --save-every 2 \
    --data-dir results/large_scale/dataq1_ \
    --out results/large_scale/train_1m.json
echo "exit=$?"

echo "--- job 2: ContConv 1M training (kernel VJP), stride-1 ---"
timeout 12000 python -m nbody_tpu.experiments.train_large \
    --model contconv --conv-impl pallas --n-bodies 1000000 \
    --train-scenes 2 --epochs 10 --steps 100 --stride 1 --time-chunks 4 \
    --batch-size 1 --scan-chunk 8 --rollout-steps 96 \
    --save-every 1 \
    --skip-datagen --data-dir results/large_scale/dataq1_ \
    --out results/large_scale/train_1m_contconv.json
echo "exit=$?"

echo "--- job 3: bh3 10M at the 1M at-tier recipe ---"
timeout 2400 python -m nbody_tpu.experiments.treeforce_bench \
    --n-bodies 10000000 --engine bh3 \
    --n-near 48 --block 512 --coarse 16 --rc 48 --sub-block 32 --n-sub 48 \
    --reps 3 --error-sample 4096 \
    --out results/large_scale/bh3_10m_tier.json
echo "exit=$?"

echo "=== queue13 done $(date) ==="
