#!/bin/bash
# TPU queue 21 (round 5, session 4): post-queue20 top-up + rescue. Queue20
# trains the 1M GNN for 5500 s (stopped after epoch 22, loss 0.0437) and
# gives ContConv only the leftover window before its 23:08 deadline — its
# eval may be cut by the job timeout. This queue waits for queue20 to
# release the chip, then:
#   R. ContConv rescue — if the durable params msgpack exists but
#      train_1m_contconv.json is missing or lacks its rollout section,
#      rerun the eval stages only (--load-params, no retraining); if even
#      the params are missing, give ContConv one bounded training+eval
#      window so VERDICT item 2 has a complete artifact either way.
#   1. GNN top-up — resume from the committed Orbax checkpoint, train with
#      --train-time-budget until DEADLINE minus an eval reserve, then the
#      full eval rewrites train_1m.json + params msgpack.
#   2. loss-figure refresh + final evidence commit.
# Durability: detached via setsid from the launcher; the autocommit
# watchdog (scripts/autocommit_watchdog.sh) covers the same artifact globs.
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

CC_JSON=results/large_scale/train_1m_contconv.json
CC_PARAMS=results/large_scale/train_1m_contconv_params.msgpack
cc_complete() { grep -q rollout_horizon "$CC_JSON" 2>/dev/null; }

# --- job R: ContConv rescue ---
if ! cc_complete; then
  T=$(( DEADLINE - $(date +%s) ))
  if [ -f "$CC_PARAMS" ] && [ "$T" -gt 1000 ]; then
    echo "--- job R: ContConv eval-only rerun from durable params ---"
    timeout 2400 python -m nbody_tpu.experiments.train_large \
        --model contconv --conv-impl pallas --n-bodies 1000000 \
        --train-scenes 2 --epochs 20 --steps 100 --stride 1 --time-chunks 4 \
        --batch-size 1 --scan-chunk 8 --rollout-steps 96 \
        --skip-datagen --data-dir results/large_scale/dataq1_ \
        --load-params "$CC_PARAMS" \
        --out "$CC_JSON" \
        >> results/logs/r5_train_1m_contconv.log 2>&1
    echo "jobR exit=$?"
  elif [ "$T" -gt 3000 ]; then
    echo "--- job R: ContConv bounded fresh train+eval (no params found) ---"
    timeout 3400 python -m nbody_tpu.experiments.train_large \
        --model contconv --conv-impl pallas --n-bodies 1000000 \
        --train-scenes 2 --epochs 20 --steps 100 --stride 1 --time-chunks 4 \
        --batch-size 1 --scan-chunk 8 --rollout-steps 96 \
        --save-every 1 --train-time-budget 1100 \
        --skip-datagen --data-dir results/large_scale/dataq1_ \
        --out "$CC_JSON" \
        >> results/logs/r5_train_1m_contconv.log 2>&1
    echo "jobR exit=$?"
  fi
  commit_evidence "ContConv 1M rescue: completed eval artifact (queue21)"
fi

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

# --- job 2: refresh the loss figure ---
timeout 600 python scripts/plot_train_large.py >> results/logs/r5_queue21.log 2>&1
commit_evidence "queue21 final: 1M training evidence + figures"
echo "=== queue21 done $(date) ==="
