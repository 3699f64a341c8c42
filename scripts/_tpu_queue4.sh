#!/bin/bash
# TPU queue 4 — 10M-body frontier with the plane-layout multipole kernels.
cd /root/repo
exec > /tmp/tpu_queue4.log 2>&1

echo "=== queue4 start $(date) ==="

echo "--- job 1: 10M bh2 bench, B=1024 (safe partition), sampled error ---"
python -m nbody_tpu.experiments.treeforce_bench \
    --engine bh2 --n-bodies 10000000 --block 1024 --n-near 16 \
    --coarse 16 --rc 48 --reps 3 --exact-cap 0 --error-cap 0 \
    --error-sample 4096 \
    --out results/large_scale/bh2_10m_b1024.json
echo "exit=$?"

echo "--- job 2: 10M bh2 bench, B=512/M=16 ---"
python -m nbody_tpu.experiments.treeforce_bench \
    --engine bh2 --n-bodies 10000000 --block 512 --n-near 16 \
    --coarse 16 --rc 48 --reps 3 --exact-cap 0 --error-cap 0 \
    --error-sample 4096 \
    --out results/large_scale/bh2_10m_b512.json
echo "exit=$?"

echo "--- job 3: 10M bh2 bench, B=512/M=32 (1M-recipe accuracy tier) ---"
python -m nbody_tpu.experiments.treeforce_bench \
    --engine bh2 --n-bodies 10000000 --block 512 --n-near 32 \
    --coarse 16 --rc 48 --reps 3 --exact-cap 0 --error-cap 0 \
    --error-sample 4096 \
    --out results/large_scale/bh2_10m_b512_m32.json
echo "exit=$?"

echo "--- job 3b: 10M bh2 bench, B=512/M=8 (matches 1M recipe's 4096 near pairs/particle) ---"
python -m nbody_tpu.experiments.treeforce_bench \
    --engine bh2 --n-bodies 10000000 --block 512 --n-near 8 \
    --coarse 16 --rc 48 --reps 3 --exact-cap 0 --error-cap 0 \
    --error-sample 4096 \
    --out results/large_scale/bh2_10m_b512_m8.json
echo "exit=$?"

echo "--- job 4: 10M-body 200-step rollout, sampled endpoint audit ---"
python -m nbody_tpu.experiments.bh_rollout \
    --engine bh2 --n-bodies 10000000 --steps 200 --block 512 \
    --bh-near 16 --coarse 16 --rc 48 --bh-refresh 8 --chunk-steps 10 \
    --no-energy-audit --error-sample 4096 \
    --out results/large_scale/bh_rollout_10m.json
echo "exit=$?"

echo "=== queue4 done $(date) ==="
bash _tpu_queue5.sh
