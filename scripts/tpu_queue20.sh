#!/bin/bash
# TPU queue 20 (round 5, session 3): the VM was re-provisioned at 19:33 —
# the 1M dataset, the epoch-23 checkpoint, and every queue-18/19 artifact
# not in git are gone. This queue restarts the round-5 chip plan from
# scratch with two durability fixes the three wipes taught us:
#   * a git-autocommit watchdog commits checkpoints + epoch CSVs + logs
#     every 7 min, so the NEXT wipe costs at most one checkpoint interval
#     (Orbax step dirs are atomic: tmp dir + rename, safe to snapshot);
#   * the queue runs detached (setsid from the launcher), so builder-
#     session end no longer kills training (queue-19's failure mode).
# Jobs (chip-time budgeted against DEADLINE, default now + 3h15m):
#   0. 1M GNN stride-1 retrain — datagen regenerated in-process (atomic,
#      validated), --train-time-budget 5500 so eval ALWAYS runs, durable
#      params msgpack + committed Orbax ckpts.
#   1. crossover_r5 — the 1M surrogate row re-timed with the retrained
#      weights and labeled with the model it timed.
#   2. ContConv 1M training through the kernel VJP — the first-ever
#      ContConv artifact at this scale; budget = time-to-deadline minus
#      an eval reserve (min 600 s: even ~1 epoch + eval answers the
#      feasibility question VERDICT item 2 asks).
#   3. loss-figure refresh.
#   4. OPTIONAL GNN top-up: if >2200 s remain before DEADLINE (e.g. a
#      fast ContConv exit), resume the GNN from its latest checkpoint,
#      train the slack away, and re-run the eval.
cd /root/repo
mkdir -p results/logs
exec > results/logs/r5_queue20.log 2>&1
set -x
DEADLINE=${DEADLINE:-$(( $(date +%s) + 11700 ))}

echo "=== queue20 start $(date) deadline=$DEADLINE ==="

commit_evidence() {
  git add -f results/large_scale/train_1m_ckpt \
             results/large_scale/train_1m_contconv_ckpt 2>/dev/null
  git add results/large_scale/train_1m*.json \
          results/large_scale/train_1m*epoch_loss.csv \
          results/large_scale/train_1m*params.msgpack \
          results/large_scale/crossover_r5.json \
          results/logs/*.log 2>/dev/null
  git diff --cached --quiet || git commit -q -m "$1"
}

( while true; do sleep 420
    commit_evidence "wip: autosave 1M training evidence (ckpt + epoch CSV + logs)"
  done ) &
echo $! > /tmp/autocommit.pid

echo "--- job 0: 1M GNN stride-1 retrain (fresh datagen after VM wipe) ---"
timeout 10500 python -m nbody_tpu.experiments.train_large \
    --model gnn --n-bodies 1000000 --train-scenes 2 --epochs 60 \
    --steps 100 --stride 1 --time-chunks 4 --neighbors 8 \
    --batch-size 1 --remat --rollout-steps 96 --scan-chunk 8 \
    --save-every 2 --train-time-budget 5500 \
    --skip-datagen --data-dir results/large_scale/dataq1_ \
    --out results/large_scale/train_1m.json \
    >> results/logs/r5_train_1m_gnn.log 2>&1
echo "job0 exit=$?"
commit_evidence "1M GNN retrain: training + eval artifacts (queue20 job 0)"

echo "--- job 1: crossover_r5 surrogate row with the retrained model ---"
timeout 1500 python -m nbody_tpu.experiments.crossover \
    --n-bodies 1000000 --steps 10 --neighbors 8 --graph-refresh 8 \
    --knn-impl pallas --only surrogate \
    --load-params results/large_scale/train_1m_params.msgpack \
    --out results/large_scale/crossover_r5.json \
    >> results/logs/r5_crossover_r5.log 2>&1
echo "job1 exit=$?"
commit_evidence "crossover_r5: 1M surrogate row timed with the retrained GNN"

echo "--- job 2: ContConv 1M training (kernel VJP), stride-1, budgeted ---"
T=$(( DEADLINE - $(date +%s) ))
BUDGET=$(( T - 1400 )); [ "$BUDGET" -lt 600 ] && BUDGET=600
timeout $(( T > 900 ? T : 900 )) python -m nbody_tpu.experiments.train_large \
    --model contconv --conv-impl pallas --n-bodies 1000000 \
    --train-scenes 2 --epochs 20 --steps 100 --stride 1 --time-chunks 4 \
    --batch-size 1 --scan-chunk 8 --rollout-steps 96 \
    --save-every 1 --train-time-budget "$BUDGET" \
    --skip-datagen --data-dir results/large_scale/dataq1_ \
    --out results/large_scale/train_1m_contconv.json \
    > results/logs/r5_train_1m_contconv.log 2>&1
echo "job2 exit=$?"
commit_evidence "ContConv 1M training through the kernel VJP (queue20 job 2)"

echo "--- job 3: refresh the loss figure ---"
timeout 600 python scripts/plot_train_large.py >> results/logs/r5_queue20.log 2>&1
echo "job3 exit=$?"

T=$(( DEADLINE - $(date +%s) ))
if [ "$T" -gt 2200 ]; then
  echo "--- job 4: GNN top-up with the remaining $T s ---"
  timeout $(( T - 200 )) python -m nbody_tpu.experiments.train_large \
      --model gnn --n-bodies 1000000 --train-scenes 2 --epochs 60 \
      --steps 100 --stride 1 --time-chunks 4 --neighbors 8 \
      --batch-size 1 --remat --rollout-steps 96 --scan-chunk 8 \
      --save-every 2 --train-time-budget $(( T - 1400 )) \
      --skip-datagen --data-dir results/large_scale/dataq1_ \
      --out results/large_scale/train_1m.json \
      >> results/logs/r5_train_1m_gnn.log 2>&1
  echo "job4 exit=$?"
  timeout 600 python scripts/plot_train_large.py >> results/logs/r5_queue20.log 2>&1
fi

kill "$(cat /tmp/autocommit.pid)" 2>/dev/null
commit_evidence "queue20 final: 1M training evidence"
git add figures/ results/logs/*.log 2>/dev/null
git diff --cached --quiet || git commit -q -m "queue20: refreshed loss figures + final logs"
echo "=== queue20 done $(date) ==="
