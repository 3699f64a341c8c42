#!/bin/bash
# Sequential TPU job queue — each job is a clean-exiting python process.
# NO timeout-kills here: SIGTERM'ing an axon client wedges the pool grant
# for a long server-side timeout (measured ~30-60 min this session).
cd /root/repo
exec > /tmp/tpu_queue.log 2>&1

echo "=== queue start $(date) ==="

echo "--- job 1: scatter/gather probe ---"
python _probe2.py
echo "exit=$?"

echo "--- job 2: bh2 at 2M (adopted config B=128 M=32 C=16 rc=48) ---"
python -m nbody_tpu.experiments.treeforce_bench \
    --engine bh2 --n-bodies 2000000 --block 128 --n-near 32 \
    --coarse 16 --rc 48 --reps 10 --exact-cap 0 --error-cap 2000000 \
    --out results/large_scale/bh2_2m.json
echo "exit=$?"

echo "--- job 3: bh2 at 4M (B=256 keeps the O(nb^2) partition pass in HBM) ---"
python -m nbody_tpu.experiments.treeforce_bench \
    --engine bh2 --n-bodies 4000000 --block 256 --n-near 32 \
    --coarse 16 --rc 48 --reps 5 --exact-cap 0 --error-cap 4000000 \
    --out results/large_scale/bh2_4m.json
echo "exit=$?"

echo "--- job 4: crossover refresh (post mask-removal direct kernel) ---"
python -m nbody_tpu.experiments.crossover \
    --n-bodies 20000 50000 100000 --steps 50 --graph-refresh 8 \
    --knn-impl pallas --knn-copies 2 \
    --out results/large_scale/crossover_r3.json
echo "exit=$?"

echo "=== queue done $(date) ==="
