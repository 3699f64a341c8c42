#!/bin/bash
# TPU queue 6 (round 4) — close the 1M training-quality gap (VERDICT.md #2).
#
# Round 3 proved the pipeline at 1M (4 epochs x 2 scenes, stepwise 0.047)
# and the 100k sweep proved quality scales with compute: 4000 optimizer
# steps -> 0.028 stepwise, 16000 -> 0.0158 / 11.8% median endpoint force
# error. This run scales the 1M recipe to 12000 optimizer steps while
# staying inside the proven 8 GB device-resident bucket budget:
#   4 scenes x 50 snapshots (steps=100, stride=2) = 200 batches/epoch
#   (same HBM footprint as round 3's 2 x 100), 60 epochs at the measured
#   235 s/epoch ~= 3.9 h. k=8 (sublane-exact), remat, scan_chunk=8 —
#   the three 1M enablers from ROUND3_NOTES.
# Rollout horizon 96 (2x round 3) with the exact direct-sum endpoint audit.
cd /root/repo
exec > /tmp/tpu_queue6.log 2>&1

echo "=== queue6 start $(date) ==="

echo "--- job 1: GNN @1M, 4 scenes x 50 snaps, 60 epochs ---"
python -m nbody_tpu.experiments.train_large \
    --model gnn --n-bodies 1000000 --train-scenes 4 --epochs 60 \
    --steps 100 --stride 2 --time-chunks 4 --neighbors 8 \
    --batch-size 1 --remat --rollout-steps 96 --scan-chunk 8 \
    --skip-datagen \
    --data-dir results/large_scale/dataq_ \
    --out results/large_scale/train_1m.json
echo "exit=$?"

echo "=== queue6 done $(date) ==="
