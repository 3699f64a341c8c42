#!/bin/bash
# Durability watchdog (round 5): commit 1M training evidence every 7 min so
# a VM wipe costs at most one checkpoint interval. Replaces queue20's inline
# loop, whose single `git add` died whole on any non-matching pathspec
# (unexpanded globs for not-yet-written artifacts), staging nothing — each
# path is guarded individually here.
cd /root/repo || exit 1
while true; do
  sleep "${AUTOCOMMIT_INTERVAL:-420}"
  for p in results/large_scale/train_1m_ckpt \
           results/large_scale/train_1m_contconv_ckpt; do
    [ -d "$p" ] && git add -f "$p" 2>/dev/null
  done
  for f in results/large_scale/train_1m*.json \
           results/large_scale/train_1m*epoch_loss.csv \
           results/large_scale/train_1m*params.msgpack \
           results/large_scale/crossover_r5.json \
           results/logs/*.log figures/train_large_loss.png; do
    [ -f "$f" ] && git add "$f" 2>/dev/null
  done
  git diff --cached --quiet || git commit -q \
    -m "wip: autosave 1M training evidence (ckpt + epoch CSV + logs)"
done
