#!/bin/bash
# Round-4 bh3 tier sweep (follows queue8 job 1, which measured the
# max-speed tier: rc=24, n_sub=24 -> 48.5 ms @1M but med rel err 2.3e-2).
# VERDICT #1's done bar is "~60 ms at the SAME error tier" as the bh2
# recipe (B=128, M=32, C=16, rc=48: 86.3 ms, med 8.7e-3, p99 0.129), so
# sweep n_sub at rc=48 to find the config that matches the tier.
cd /root/repo
exec > /tmp/tpu_queue9a.log 2>&1
set -x

# wait for queue8's in-flight job 1 (pid passed as $1) to release the chip
if [ -n "$1" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 10; done
fi

echo "=== queue9a start $(date) ==="
for NS in 32 48 64; do
  echo "--- bh3 1M rc=48 sub_block=32 n_sub=$NS ---"
  timeout 900 python -m nbody_tpu.experiments.treeforce_bench \
      --n-bodies 1000000 --engine bh3 \
      --n-near 32 --block 128 --coarse 16 --rc 48 --sub-block 32 --n-sub $NS \
      --reps 5 --error-sample 4096 \
      --out results/large_scale/bh3_1m_rc48_ns$NS.json
  echo "exit=$?"
done
echo "=== queue9a done $(date) ==="
