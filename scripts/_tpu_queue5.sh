#!/bin/bash
# TPU queue 5 — 1M-body surrogate training (remat EdgeConv backward).
# steps=100/stride=1 keeps the on-device trajectory at ~3.6 GB (400 steps
# would be 14+ GB) and time-chunks=4 keeps each device execution ~5 s
# (single executions beyond ~60 s crash the tunneled worker). Datagen
# runs with calc_energy=False (train_large sets it): the exact per-step
# PE at 1M was the >60 s execution that crashed the first two attempts.
# neighbors=8, not 10: the fused-EdgeConv backward materializes a
# (1M, k, 2d) cotangent whose k sublane axis pads to 16 — k=10 OOMed at
# 17.70/15.75 GB (7.63 GB on that one tensor); k=8 is exactly aligned.
cd /root/repo
exec > /tmp/tpu_queue5.log 2>&1

echo "=== queue5 start $(date) ==="

echo "--- job 1: GNN @1M, 2 scenes, 6 epochs, remat, k=8 ---"
python -m nbody_tpu.experiments.train_large \
    --model gnn --n-bodies 1000000 --train-scenes 2 --epochs 4 \
    --steps 100 --stride 1 --time-chunks 4 --neighbors 8 \
    --batch-size 1 --remat --rollout-steps 48 --scan-chunk 8 --skip-datagen \
    --out results/large_scale/train_1m.json
echo "exit=$?"

echo "=== queue5 done $(date) ==="
