#!/bin/bash
# TPU queue 21 (round 5, session 4): post-queue20 top-up. Queue20's job 0
# trains the 1M GNN for 5500 s (~epoch 17-18, loss ~0.045); round 4 showed
# the curve reaches 0.0355 by epoch 39. This queue waits for queue20 to
# release the chip, then spends every remaining second before the driver's
# bench window on:
#   1. GNN top-up — resume from the committed Orbax checkpoint, train with
#      --train-time-budget until DEADLINE minus an eval reserve, then the
#      full eval rewrites train_1m.json + params msgpack.
#   2. crossover_r5 re-timed + relabeled with the FINAL weights (VERDICT r4
#      item 8: the row should name the model it timed).
#   3. loss-figure refresh + final evidence commit.
# Durability: same countermeasures as queue20 (detached via setsid from the
# launcher; the autocommit watchdog from scripts/autocommit_watchdog.sh is
# already running and covers the same artifact globs).
cd /root/repo
mkdir -p results/logs
exec > results/logs/r5_queue21.log 2>&1
set -x
# leave the chip free ~25 min before the builder session ends so the
# driver's bench.py run is uncontended
DEADLINE=${DEADLINE:-$(date -d '2026-08-20 00:50 UTC' +%s)}

echo "=== queue21 start $(date) deadline=$DEADLINE ==="

# --- job W: wait for queue20 to exit. /tmp/queue20.pid holds the launcher
# shell, not the queue script (pid 924 this boot), so poll the script pid
# directly and also accept the log's completion marker.
Q20=${Q20:-924}
while kill -0 "$Q20" 2>/dev/null && \
      ! grep -q "queue20 done" results/logs/r5_queue20.log 2>/dev/null; do
  if [ "$(date +%s)" -ge "$DEADLINE" ]; then
    echo "deadline hit while waiting for queue20; exiting"; exit 0
  fi
  sleep 60
done
echo "queue20 gone at $(date)"
sleep 15  # let queue20's final commit land before we start staging

commit_evidence() {
  git add -f results/large_scale/train_1m_ckpt \
             results/large_scale/train_1m_contconv_ckpt 2>/dev/null
  git add results/large_scale/train_1m*.json \
          results/large_scale/train_1m*epoch_loss.csv \
          results/large_scale/train_1m*params.msgpack \
          results/large_scale/crossover_r5.json \
          figures/ results/logs/*.log 2>/dev/null
  git diff --cached --quiet || git commit -q -m "$1"
}

# --- job 1: GNN top-up from the latest committed checkpoint ---
T=$(( DEADLINE - $(date +%s) ))
BUDGET=$(( T - 1500 ))
if [ "$BUDGET" -gt 400 ]; then
  timeout $(( T - 100 )) python -m nbody_tpu.experiments.train_large \
      --model gnn --n-bodies 1000000 --train-scenes 2 --epochs 60 \
      --steps 100 --stride 1 --time-chunks 4 --neighbors 8 \
      --batch-size 1 --remat --rollout-steps 96 --scan-chunk 8 \
      --save-every 2 --train-time-budget "$BUDGET" \
      --skip-datagen --data-dir results/large_scale/dataq1_ \
      --out results/large_scale/train_1m.json \
      >> results/logs/r5_train_1m_gnn.log 2>&1
  echo "job1 exit=$?"
  commit_evidence "1M GNN top-up: resumed training + refreshed eval (queue21)"
else
  echo "only ${T}s left; skipping top-up"
fi

# --- job 2: relabel crossover_r5 with the final weights ---
T=$(( DEADLINE - $(date +%s) ))
if [ "$T" -gt 700 ]; then
  timeout $(( T - 100 )) python -m nbody_tpu.experiments.crossover \
      --n-bodies 1000000 --steps 10 --neighbors 8 --graph-refresh 8 \
      --knn-impl pallas --only surrogate \
      --load-params results/large_scale/train_1m_params.msgpack \
      --out results/large_scale/crossover_r5.json \
      >> results/logs/r5_crossover_r5.log 2>&1
  echo "job2 exit=$?"
  commit_evidence "crossover_r5: surrogate row re-timed with the final 1M model"
fi

# --- job 3: refresh the loss figure ---
timeout 600 python scripts/plot_train_large.py >> results/logs/r5_queue21.log 2>&1
commit_evidence "queue21 final: 1M training evidence + figures"
echo "=== queue21 done $(date) ==="
