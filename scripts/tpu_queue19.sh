#!/bin/bash
# TPU queue 19 (round 5, session 2): the previous builder session ended and
# killed the 1M GNN retrain at epoch 23/60 (checkpoints every 2 epochs
# survived — train_1m_ckpt/ has epoch 22). This queue:
#   0. resumes the stride-1 x 60-epoch GNN retrain from the epoch-22
#      checkpoint (same recipe as queue17 job 5 + the round-5 time budget
#      so the eval stages are guaranteed chip time), then
#   1-4. runs queue18's jobs (crossover_r5 with the retrained params,
#      bh3 10M at-tier rollout, budgeted ContConv 1M training, loss figure).
# DEADLINE: unix seconds when chip work must wrap (default: now + 6h40m,
# leaving margin for the driver's end-of-round bench on the same chip).
cd /root/repo
exec > results/logs/r5_queue19.log 2>&1
set -x
DEADLINE=${DEADLINE:-$(( $(date +%s) + 24000 ))}

echo "=== queue19 start $(date) deadline=$DEADLINE ==="

echo "--- job 0: resume 1M GNN retrain from epoch-22 ckpt (37 epochs left) ---"
# 37 epochs x ~236 s = ~8700 s; budget 10500 halts the loop gracefully if
# slower so the eval still runs inside the timeout.
timeout 13500 python -m nbody_tpu.experiments.train_large \
    --model gnn --n-bodies 1000000 --train-scenes 2 --epochs 60 \
    --steps 100 --stride 1 --time-chunks 4 --neighbors 8 \
    --batch-size 1 --remat --rollout-steps 96 --scan-chunk 8 \
    --save-every 2 --train-time-budget 10500 \
    --skip-datagen --data-dir results/large_scale/dataq1_ \
    --out results/large_scale/train_1m.json \
    >> results/logs/r5_train_1m_gnn.log 2>&1
echo "exit=$?"

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
    --out results/large_scale/train_1m_contconv.json \
    > results/logs/r5_train_1m_contconv.log 2>&1
echo "exit=$?"

echo "--- job 4: refresh the loss figure ---"
timeout 600 python scripts/plot_train_large.py
echo "exit=$?"

echo "=== queue19 done $(date) ==="
