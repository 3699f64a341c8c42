#!/bin/bash
# TPU queue 2 — artifact refresh + frontier extension. Clean exits only.
cd /root/repo
exec > /tmp/tpu_queue2.log 2>&1

echo "=== queue2 start $(date) ==="

echo "--- job 1: refresh stale direct rows in crossover_pallas.json ---"
python -m nbody_tpu.experiments.crossover \
    --n-bodies 10000 20000 50000 100000 200000 --steps 50 \
    --only direct --out results/large_scale/crossover_pallas.json
echo "exit=$?"

echo "--- job 2: 2M-body 1000-step bh2 rollout with exact energy audit ---"
python -m nbody_tpu.experiments.bh_rollout \
    --engine bh2 --n-bodies 2000000 --steps 1000 --block 128 \
    --bh-near 32 --coarse 16 --rc 48 --bh-refresh 8 --chunk-steps 100 \
    --out results/large_scale/bh_rollout_2m.json
echo "exit=$?"

echo "--- job 2b: 4M retry without the exact-force error eval (worker crashed on the 1.6e13-pair exact kernel) ---"
python -m nbody_tpu.experiments.treeforce_bench \
    --engine bh2 --n-bodies 4000000 --block 256 --n-near 32 \
    --coarse 16 --rc 48 --reps 5 --exact-cap 0 --error-cap 0 \
    --out results/large_scale/bh2_4m.json
echo "exit=$?"

echo "--- job 3: 10M-body bh2 force eval (B=512 keeps partition in HBM) ---"
python -m nbody_tpu.experiments.treeforce_bench \
    --engine bh2 --n-bodies 10000000 --block 512 --n-near 32 \
    --coarse 16 --rc 48 --reps 3 --exact-cap 0 --error-cap 0 \
    --out results/large_scale/bh2_10m.json
echo "exit=$?"

echo "=== queue2 done $(date) ==="
