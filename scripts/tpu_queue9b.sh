#!/bin/bash
# bh3 sweep, part 2: widen the Verlet candidate pool. bh2's own sweep shows
# its med 8.7e-3 @ M=32 includes near-SET truncation (M=48 reaches 5.3e-3 at
# 106 ms), so bh3 with M=48 near blocks — sub-quadrupoles cover the wider
# pool, K exact sub-blocks stay few — may beat bh2 on BOTH time and error.
cd /root/repo
exec > /tmp/tpu_queue9b.log 2>&1
set -x
if [ -n "$1" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 10; done
fi
echo "=== queue9b start $(date) ==="
for NS in 32 48; do
  echo "--- bh3 1M M=48 rc=48 sub_block=32 n_sub=$NS ---"
  timeout 900 python -m nbody_tpu.experiments.treeforce_bench \
      --n-bodies 1000000 --engine bh3 \
      --n-near 48 --block 128 --coarse 16 --rc 48 --sub-block 32 --n-sub $NS \
      --reps 5 --error-sample 4096 \
      --out results/large_scale/bh3_1m_m48_ns$NS.json
  echo "exit=$?"
done
echo "=== queue9b done $(date) ==="
