#!/bin/bash
# TPU queue 17 (round 4, final session): queue 16's job 1 was killed
# mid-datagen — this host has ONE CPU core, and 1M datagen's host side
# (snapshot DMA-over-tunnel + npz writes) ran ~25 min/scene under pytest
# contention, so the 2700 s cap would have expired before a single
# ContConv epoch. Reorder: the two bounded measurements that can still
# land *committed* this session go first; the two long training jobs run
# last with generous caps (per-epoch CSV + checkpoints mean whatever the
# round boundary cuts is still a committed artifact via the driver's
# end-of-round commit, and round 5 resumes from the checkpoints).
# Both training jobs use --skip-datagen: train_0.npz (scene 1) survived,
# and train_large regenerates only the missing scenes.
cd /root/repo
exec > /tmp/tpu_queue17.log 2>&1
set -x

echo "=== queue17 start $(date) ==="

echo "--- job 1: bh3 10M at the 1M at-tier recipe ---"
timeout 2400 python -m nbody_tpu.experiments.treeforce_bench \
    --n-bodies 10000000 --engine bh3 \
    --n-near 48 --block 512 --coarse 16 --rc 48 --sub-block 32 --n-sub 48 \
    --reps 3 --error-sample 4096 \
    --out results/large_scale/bh3_10m_tier.json
echo "exit=$?"

echo "--- job 2: 1M windowed-kernel crossover rows ---"
timeout 1800 python -m nbody_tpu.experiments.crossover \
    --n-bodies 1000000 --steps 10 --neighbors 8 --graph-refresh 8 \
    --knn-impl pallas --windowed --only surrogate \
    --out results/large_scale/crossover_window.json
echo "exit=$?"

echo "--- job 3: gather-rate microbench at 1M ---"
timeout 600 python - <<'PYEOF'
import jax, jax.numpy as jnp, json
from nbody_tpu.utils.compile_cache import enable_persistent_cache
from nbody_tpu.utils.timing import device_time
enable_persistent_cache()
key = jax.random.PRNGKey(0)
out = {}
for n in (250_000, 1_000_000):
    k, d = 8, 64
    mk = jax.jit(lambda key: (jax.random.normal(key, (n, d)),
                              jax.random.randint(key, (n, k), 0, n)))
    v, idx = mk(key)
    g = jax.jit(lambda v, idx: v[idx])
    o = g(v, idx); device_time(lambda: o)
    _, el = device_time(lambda: g(v, idx))
    out[f"xla_gather_{n}"] = el * 1e3
    print(n, "gather ms:", el * 1e3, flush=True)
with open("results/large_scale/gather_microbench.json", "w") as f:
    json.dump(out, f, indent=1)
PYEOF
echo "exit=$?"

echo "--- job 4: ContConv 1M training (kernel VJP), stride-1 ---"
timeout 14400 python -m nbody_tpu.experiments.train_large \
    --model contconv --conv-impl pallas --n-bodies 1000000 \
    --train-scenes 2 --epochs 20 --steps 100 --stride 1 --time-chunks 4 \
    --batch-size 1 --scan-chunk 8 --rollout-steps 96 \
    --save-every 1 \
    --skip-datagen --data-dir results/large_scale/dataq1_ \
    --out results/large_scale/train_1m_contconv.json
echo "exit=$?"

echo "--- job 5: GNN 1M retrain, stride-1 x 60 epochs (ckpt every 2) ---"
timeout 20000 python -m nbody_tpu.experiments.train_large \
    --model gnn --n-bodies 1000000 --train-scenes 2 --epochs 60 \
    --steps 100 --stride 1 --time-chunks 4 --neighbors 8 \
    --batch-size 1 --remat --rollout-steps 96 --scan-chunk 8 \
    --save-every 2 \
    --skip-datagen --data-dir results/large_scale/dataq1_ \
    --out results/large_scale/train_1m.json
echo "exit=$?"

echo "=== queue17 done $(date) ==="
