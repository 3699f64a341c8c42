#!/bin/bash
# TPU queue 8 (round 4, post-restart replan of queue 7): the VM restart
# wiped queue 7 before it ran, and the remaining round budget is
# uncertain — so the order is strictly value-per-minute with graceful
# degradation: every early job is a small, complete artifact; the two
# multi-hour 1M retrains run last WITH per-epoch persistence and
# checkpoint resume (train_large --save-every), so a mid-run cut still
# leaves evidence and a resume point for round 5.
#   1. bh3 clean frontier numbers at 1M/2M/4M        (VERDICT #1 done bar)
#   2. bh3 at 10M                                    (VERDICT #1 done bar)
#   3. bh3 1M x 1000-step rollout + exact energy audit
#   4. crossover row at 1M incl. bh2/bh3             (VERDICT #7)
#   5. 10M rollout refresh=4 + chunked exact-PE audit (VERDICT #6)
#   6. GNN 1M retrain, stride-1 round-3 recipe x 40 epochs (VERDICT #2)
#   7. ContConv 1M training through the kernel VJP   (VERDICT #3)
cd /root/repo
exec > /tmp/tpu_queue8.log 2>&1
set -x

BH3="--sub-block 32 --n-sub 24"

echo "=== queue8 start $(date) ==="

echo "--- job 1: bh3 1M/2M/4M ---"
timeout 1500 python -m nbody_tpu.experiments.treeforce_bench \
    --n-bodies 1000000 2000000 4000000 --engine bh3 \
    --n-near 32 --block 128 --coarse 16 --rc 24 $BH3 \
    --reps 5 --error-sample 4096 \
    --out results/large_scale/bh3.json
echo "exit=$?"

echo "--- job 2: bh3 10M ---"
timeout 1500 python -m nbody_tpu.experiments.treeforce_bench \
    --n-bodies 10000000 --engine bh3 \
    --n-near 32 --block 512 --coarse 16 --rc 24 --sub-block 64 --n-sub 16 \
    --reps 3 --error-sample 4096 \
    --out results/large_scale/bh3_10m.json
echo "exit=$?"

echo "--- job 3: bh3 1M x 1000-step rollout + exact energy audit ---"
timeout 1200 python -m nbody_tpu.experiments.bh_rollout \
    --n-bodies 1000000 --steps 1000 --engine bh3 \
    --bh-near 32 --block 128 --coarse 16 --rc 48 $BH3 \
    --bh-refresh 8 --chunk-steps 100 \
    --out results/large_scale/bh_rollout_1m_bh3.json
echo "exit=$?"

echo "--- job 4: crossover at 1M (direct vs bh/bh2/bh3 vs GNN) ---"
timeout 2400 python -m nbody_tpu.experiments.crossover \
    --n-bodies 1000000 --steps 10 --neighbors 8 --graph-refresh 1 8 \
    --bh --bh2 --bh3 --bh-near 32 --rc 48 \
    --out results/large_scale/crossover_r4.json
echo "exit=$?"

echo "--- job 5: 10M rollout refresh=4 + chunked exact-PE audit ---"
timeout 3000 python -m nbody_tpu.experiments.bh_rollout \
    --n-bodies 10000000 --steps 200 --engine bh2 \
    --bh-near 16 --block 512 --coarse 16 --rc 48 \
    --bh-refresh 4 --chunk-steps 10 --chunked-energy-audit 200000 \
    --out results/large_scale/bh_rollout_10m_refresh4.json
echo "exit=$?"

echo "--- job 6: GNN 1M retrain, stride-1 x 40 epochs (ckpt every 2) ---"
timeout 14000 python -m nbody_tpu.experiments.train_large \
    --model gnn --n-bodies 1000000 --train-scenes 2 --epochs 40 \
    --steps 100 --stride 1 --time-chunks 4 --neighbors 8 \
    --batch-size 1 --remat --rollout-steps 96 --scan-chunk 8 \
    --save-every 2 \
    --data-dir results/large_scale/dataq1_ \
    --out results/large_scale/train_1m.json
echo "exit=$?"

echo "--- job 7: ContConv 1M training (kernel VJP), stride-1 ---"
timeout 10000 python -m nbody_tpu.experiments.train_large \
    --model contconv --conv-impl pallas --n-bodies 1000000 \
    --train-scenes 2 --epochs 10 --steps 100 --stride 1 --time-chunks 4 \
    --batch-size 1 --scan-chunk 8 --rollout-steps 96 \
    --save-every 1 \
    --skip-datagen --data-dir results/large_scale/dataq1_ \
    --out results/large_scale/train_1m_contconv.json
echo "exit=$?"

echo "=== queue8 done $(date) ==="
