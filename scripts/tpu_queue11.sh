#!/bin/bash
# Round-4 coda: the crossover-at-1M direct leg killed the TPU worker
# (one fused 10-step x 1e12-pair scan dispatch ~68 s — apparently past
# the worker watchdog; queue10 log has the UNAVAILABLE traceback), so
# re-run the 1M crossover WITHOUT the direct leg (--only, incremental
# merge) and measure direct separately with a 2-step scan (~13 s
# dispatch) into its own artifact (mixing scan lengths in one artifact
# is rejected by design).
cd /root/repo
exec > /tmp/tpu_queue11.log 2>&1
set -x
DEADLINE=${DEADLINE:-1787088400}
if [ -n "$1" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 5; done
fi

left() { echo $(( DEADLINE - $(date +%s) )); }
guard() { local t=$(left); [ "$t" -gt 90 ] || { echo ""; return; }
  [ "$t" -lt "$1" ] && echo "$t" || echo "$1"; }

echo "=== queue11 start $(date) left=$(left)s ==="

T=$(guard 700); [ -n "$T" ] && {
echo "--- crossover 1M, non-direct modes ---"
timeout "$T" python -m nbody_tpu.experiments.crossover \
    --n-bodies 1000000 --steps 10 --neighbors 8 --graph-refresh 1 8 \
    --bh --bh2 --bh3 --bh-near 32 --rc 48 \
    --only surrogate bh bh2 bh3 \
    --out results/large_scale/crossover_r4.json
echo "exit=$?"
}

T=$(guard 300); [ -n "$T" ] && {
echo "--- crossover 1M, direct leg, 2-step scan, separate artifact ---"
timeout "$T" python -m nbody_tpu.experiments.crossover \
    --n-bodies 1000000 --steps 2 --only direct \
    --out results/large_scale/crossover_r4_direct.json
echo "exit=$?"
}

echo "=== queue11 done $(date) left=$(left)s ==="
