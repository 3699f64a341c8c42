#!/bin/bash
# TPU queue 3 — larger 100k-body training runs (4 scenes, more epochs).
cd /root/repo
exec > /tmp/tpu_queue3.log 2>&1

echo "=== queue3 start $(date) ==="

echo "--- job 1: GNN @100k, 4 scenes, 40 epochs ---"
python -m nbody_tpu.experiments.train_large \
    --model gnn --n-bodies 100000 --train-scenes 4 --epochs 40 \
    --batch-size 1 --skip-datagen --rollout-steps 400 \
    --out results/large_scale/train_100k_r3.json
echo "exit=$?"

echo "--- job 2: ContConv @100k (kernel VJP), 4 scenes, 20 epochs ---"
python -m nbody_tpu.experiments.train_large \
    --model contconv --conv-impl pallas --n-bodies 100000 \
    --train-scenes 4 --epochs 20 --batch-size 1 --skip-datagen \
    --rollout-steps 400 \
    --out results/large_scale/train_100k_contconv_r3.json
echo "exit=$?"

echo "=== queue3 done $(date) ==="
