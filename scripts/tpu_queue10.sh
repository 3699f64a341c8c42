#!/bin/bash
# Round-4 final queue: ~55 min of chip time left before the driver's
# cut, so every job is deadline-guarded — DEADLINE is the absolute
# epoch by which the chip must be free (driver runs bench.py on it at
# round end). Strictly value-per-minute, each job a complete artifact:
#   1. bh3 1M x 1000-step rollout + exact energy audit (VERDICT #1 done bar:
#      "rollout artifacts re-measured"), at-tier config from the 9a/9b sweep.
#   2. bh3 at 10M, tier-scaled + speed configs          (VERDICT #1: "10M <= ~1.1 s")
#   3. crossover row at 1M incl. bh2/bh3                (VERDICT #7)
#   4. 10M rollout refresh=4 + chunked exact-PE audit   (VERDICT #6)
# The 1M retrains (VERDICT #2/#3) do NOT fit in the remaining budget
# (>= 235 s/epoch x 40); left for round 5 with the --save-every resume
# machinery already in place (see ROUND4_NOTES).
cd /root/repo
exec > /tmp/tpu_queue10.log 2>&1
set -x
DEADLINE=${DEADLINE:-1787088400}

left() { echo $(( DEADLINE - $(date +%s) )); }
guard() { # guard MAXSECS -> bounded timeout or empty if out of budget
  local t=$(left); [ "$t" -gt 90 ] || { echo ""; return; }
  [ "$t" -lt "$1" ] && echo "$t" || echo "$1"
}

echo "=== queue10 start $(date) deadline=$DEADLINE left=$(left)s ==="

T=$(guard 600); [ -n "$T" ] && {
echo "--- job 1: bh3 1M x 1000-step rollout + exact energy audit ---"
timeout "$T" python -m nbody_tpu.experiments.bh_rollout \
    --n-bodies 1000000 --steps 1000 --engine bh3 \
    --bh-near 48 --block 128 --coarse 16 --rc 48 --sub-block 32 --n-sub 48 \
    --bh-refresh 8 --chunk-steps 100 \
    --out results/large_scale/bh_rollout_1m_bh3.json
echo "exit=$?"
}

T=$(guard 480); [ -n "$T" ] && {
echo "--- job 2a: bh3 10M tier-scaled ---"
timeout "$T" python -m nbody_tpu.experiments.treeforce_bench \
    --n-bodies 10000000 --engine bh3 \
    --n-near 48 --block 512 --coarse 16 --rc 48 --sub-block 64 --n-sub 24 \
    --reps 3 --error-sample 4096 \
    --out results/large_scale/bh3_10m.json
echo "exit=$?"
}

T=$(guard 420); [ -n "$T" ] && {
echo "--- job 2b: bh3 10M speed tier ---"
timeout "$T" python -m nbody_tpu.experiments.treeforce_bench \
    --n-bodies 10000000 --engine bh3 \
    --n-near 32 --block 512 --coarse 16 --rc 24 --sub-block 64 --n-sub 16 \
    --reps 3 --error-sample 4096 \
    --out results/large_scale/bh3_10m_speed.json
echo "exit=$?"
}

T=$(guard 900); [ -n "$T" ] && {
echo "--- job 3: crossover at 1M (direct vs bh/bh2/bh3 vs GNN) ---"
timeout "$T" python -m nbody_tpu.experiments.crossover \
    --n-bodies 1000000 --steps 10 --neighbors 8 --graph-refresh 1 8 \
    --bh --bh2 --bh3 --bh-near 32 --rc 48 \
    --out results/large_scale/crossover_r4.json
echo "exit=$?"
}

T=$(guard 900); [ -n "$T" ] && {
echo "--- job 4: 10M rollout refresh=4 + chunked exact-PE audit ---"
timeout "$T" python -m nbody_tpu.experiments.bh_rollout \
    --n-bodies 10000000 --steps 200 --engine bh2 \
    --bh-near 16 --block 512 --coarse 16 --rc 48 \
    --bh-refresh 4 --chunk-steps 10 --chunked-energy-audit 200000 \
    --out results/large_scale/bh_rollout_10m_refresh4.json
echo "exit=$?"
}

echo "=== queue10 done $(date) left=$(left)s ==="
