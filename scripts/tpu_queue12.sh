#!/bin/bash
# Round-4 last job: queue10 job 4 (10M refresh=4 rollout, 200 steps,
# chunked exact-PE audit) hit its 900 s cap — the two 10M exact-PE
# audits (~5e13 pairs each) plus 50 partition rebuilds don't fit. Retry
# at 50 steps: same refresh=4 cadence and the same conservation
# evidence (audit cost is step-count independent), a shorter horizon.
cd /root/repo
exec > /tmp/tpu_queue12.log 2>&1
set -x
DEADLINE=${DEADLINE:-1787088400}
if [ -n "$1" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 5; done
fi
T=$(( DEADLINE - $(date +%s) ))
[ "$T" -gt 240 ] || { echo "skipped: only ${T}s left"; exit 0; }

echo "=== queue12 start $(date) T=${T}s ==="
timeout "$T" python -m nbody_tpu.experiments.bh_rollout \
    --n-bodies 10000000 --steps 50 --engine bh2 \
    --bh-near 16 --block 512 --coarse 16 --rc 48 \
    --bh-refresh 4 --chunk-steps 10 --chunked-energy-audit 200000 \
    --out results/large_scale/bh_rollout_10m_refresh4.json
echo "exit=$?"
echo "=== queue12 done $(date) ==="
